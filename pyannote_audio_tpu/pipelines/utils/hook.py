"""Pipeline observability hooks: progress, timing, artifact capture.

Parity: /root/reference/src/pyannote/audio/pipelines/utils/hook.py
(ArtifactHook :37, ProgressHook :85, TimingHook :150, Hooks :206). The hook
protocol — ``hook(step_name, artifact, file=..., total=..., completed=...)``
— is API surface and kept verbatim (SURVEY.md §5).
"""

from __future__ import annotations

import time
from copy import deepcopy
from typing import Any, Mapping, Optional, Text


class ArtifactHook:
    """Capture intermediate artifacts into file["artifact"]."""

    def __init__(self, *artifacts: Text, file_key: Text = "artifact"):
        self.artifacts = artifacts
        self.file_key = file_key

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        pass

    def __call__(self, step_name: Text, step_artifact: Any,
                 file: Optional[Mapping] = None, total: Optional[int] = None,
                 completed: Optional[int] = None):
        if step_artifact is None or file is None:
            return
        if self.artifacts and step_name not in self.artifacts:
            return
        file.setdefault(self.file_key, {})[step_name] = \
            deepcopy(step_artifact)


class ProgressHook:
    """Rich progress bars per pipeline step."""

    def __init__(self, transient: bool = False):
        self.transient = transient
        self._progress = None
        self._task = None
        self._step_name = None

    def __enter__(self):
        from rich.progress import Progress
        self._progress = Progress(transient=self.transient)
        self._progress.__enter__()
        return self

    def __exit__(self, *exc):
        if self._progress is not None:
            self._progress.__exit__(*exc)
            self._progress = None

    def __call__(self, step_name: Text, step_artifact: Any,
                 file: Optional[Mapping] = None, total: Optional[int] = None,
                 completed: Optional[int] = None):
        if self._progress is None:
            return
        if completed is None:
            total = completed = 1
        if step_name != self._step_name:
            self._step_name = step_name
            self._task = self._progress.add_task(step_name,
                                                 total=total or 1)
        self._progress.update(self._task, total=total or 1,
                              completed=completed)
        self._progress.refresh()


class TimingHook:
    """Per-step wall time written into file[file_key]."""

    def __init__(self, file_key: Text = "timing"):
        self.file_key = file_key
        self._timing = {}
        self._start = None
        self._current = None

    def __enter__(self):
        self._timing = {}
        self._current = None
        self._start = time.time()
        self._file = None
        return self

    def __exit__(self, *exc):
        # flush the still-open final stage (otherwise the last step before
        # the pipeline returns is never accounted for)
        if self._current is not None and self._file is not None:
            self._timing[self._current] = \
                self._timing.get(self._current, 0.0) + \
                (time.time() - self._start)
            self._current = None
            self._file[self.file_key] = dict(self._timing)

    def __call__(self, step_name: Text, step_artifact: Any,
                 file: Optional[Mapping] = None, total: Optional[int] = None,
                 completed: Optional[int] = None):
        now = time.time()
        if self._current != step_name:
            if self._current is not None:
                # accumulate: steps recur non-consecutively (e.g. an
                # embeddings artifact hook after speaker_counting), so
                # assignment would overwrite the earlier span
                self._timing[self._current] = \
                    self._timing.get(self._current, 0.0) + \
                    (now - self._start)
            self._current = step_name
            self._start = now
        else:
            self._timing[step_name] = \
                self._timing.get(step_name, 0.0) + (now - self._start)
            self._start = now
        if file is not None:
            self._file = file
            file[self.file_key] = dict(self._timing)


class TraceHook:
    """jax.profiler annotations per pipeline step (SURVEY.md §5).

    Wrapping a pipeline apply in ``with TraceHook("/tmp/trace"):`` captures
    a TensorBoard-compatible device trace with one named region per
    pipeline step.
    """

    def __init__(self, log_dir: Optional[Text] = None):
        self.log_dir = log_dir
        self._current = None
        self._span = None

    def __enter__(self):
        import jax
        if self.log_dir is not None:
            jax.profiler.start_trace(self.log_dir)
        return self

    def __exit__(self, *exc):
        import jax
        if self._span is not None:
            self._span.__exit__(None, None, None)
            self._span = None
        if self.log_dir is not None:
            jax.profiler.stop_trace()

    def __call__(self, step_name: Text, step_artifact: Any,
                 file: Optional[Mapping] = None, total: Optional[int] = None,
                 completed: Optional[int] = None):
        import jax
        if step_name != self._current:
            if self._span is not None:
                self._span.__exit__(None, None, None)
            self._span = jax.profiler.TraceAnnotation(step_name)
            self._span.__enter__()
            self._current = step_name


class Hooks:
    """Compose several hooks into one callable."""

    def __init__(self, *hooks):
        self.hooks = hooks

    def __enter__(self):
        for hook in self.hooks:
            if hasattr(hook, "__enter__"):
                hook.__enter__()
        return self

    def __exit__(self, *exc):
        for hook in self.hooks:
            if hasattr(hook, "__exit__"):
                hook.__exit__(*exc)

    def __call__(self, *args, **kwargs):
        for hook in self.hooks:
            hook(*args, **kwargs)
