"""Config-driven pipeline composition.

TPU-native rebuild of the reference's ``Pipeline`` base
(/root/reference/src/pyannote/audio/core/pipeline.py) merged with the
relevant machinery of its external base class ``pyannote.pipeline.Pipeline``
(SURVEY.md §1.7): YAML config loading, ``$model/{subfolder}`` expansion,
hyperparameter declaration/instantiate/freeze, model/inference registries and
batch apply. Device movement is a no-op under JAX (XLA owns placement);
``to()`` is kept for API parity.
"""

from __future__ import annotations

import importlib
from pathlib import Path
from typing import Any, Callable, Dict, Iterable, List, Optional, Text, Union

import yaml

from .parameter import ParamDict, Parameter
from .io import AudioFile
from .model import Model

PIPELINE_CONFIG = "config.yaml"


def expand_subfolders(config: Any, model_id: str, token=None,
                      cache_dir=None) -> Any:
    """Expand ``$model/{subfolder}[@revision]`` placeholders in a config.

    Parity: expand_subfolders (reference core/pipeline.py:50-148). Given a
    root checkpoint id/path, rewrites string values like ``$model/embedding``
    into ``{checkpoint: <root>, subfolder: embedding}`` dicts; the caller's
    hub auth rides along (reference :62-63) so sub-model loads of a gated
    repo authenticate.
    """
    if isinstance(config, dict):
        return {k: expand_subfolders(v, model_id, token, cache_dir)
                for k, v in config.items()}
    if isinstance(config, list):
        return [expand_subfolders(v, model_id, token, cache_dir)
                for v in config]
    if isinstance(config, str) and config.startswith("$model"):
        rest = config[len("$model"):]
        revision = None
        if "@" in rest:
            rest, revision = rest.split("@", 1)
        subfolder = rest.lstrip("/")
        out: Dict[str, Any] = {"checkpoint": model_id}
        if subfolder:
            out["subfolder"] = subfolder
        if revision:
            out["revision"] = revision
        if token is not None:
            out["token"] = token
        if cache_dir is not None:
            out["cache_dir"] = cache_dir
        return out
    return config


def get_class_by_name(name: str,
                      default_module_name: Optional[str] = None) -> type:
    """Import ``pkg.module.Class`` (reference delegates to pyannote.core)."""
    tokens = name.split(".")
    if len(tokens) == 1:
        if default_module_name is None:
            raise ValueError(f"cannot resolve class name {name!r}")
        module_name, class_name = default_module_name, name
    else:
        module_name = ".".join(tokens[:-1])
        class_name = tokens[-1]
    # transparently map reference class paths onto ours
    module_name = module_name.replace("pyannote.audio", "pyannote_audio_tpu")
    return getattr(importlib.import_module(module_name), class_name)


class Pipeline:
    """Base pipeline: declared hyperparameters + sub-pipelines + models."""

    def __init__(self):
        # registries (parity: reference pipeline.py:336-410 __setattr__)
        self.__dict__["_models"]: Dict[str, Model] = {}
        self.__dict__["_inferences"]: Dict[str, Any] = {}
        self.__dict__["_parameters"]: Dict[str, Parameter] = {}
        self.__dict__["_instantiated"]: Dict[str, Any] = {}
        self.__dict__["_pipelines"]: Dict[str, "Pipeline"] = {}
        self.__dict__["_frozen"]: Dict[str, Any] = {}
        self.__dict__["_preprocessors"]: Dict[str, Callable] = {}
        self.training = False

    # -- attribute registries ---------------------------------------------

    def __setattr__(self, name: str, value: Any):
        from .inference import Inference
        for registry in ("_models", "_inferences", "_parameters",
                         "_pipelines", "_instantiated"):
            self.__dict__.setdefault(registry, {}).pop(name, None)
        if isinstance(value, Model):
            self.__dict__["_models"][name] = value
        elif isinstance(value, Inference):
            self.__dict__["_inferences"][name] = value
        elif isinstance(value, Parameter):
            self.__dict__["_parameters"][name] = value
        elif isinstance(value, Pipeline):
            self.__dict__["_pipelines"][name] = value
        else:
            object.__setattr__(self, name, value)
            return
        object.__setattr__(self, name, value)

    # -- hyperparameters ---------------------------------------------------

    def parameters(self, instantiated: bool = False) -> Dict[str, Any]:
        """Flat view of (possibly nested) parameters.

        With ``instantiated=True``, returns the current concrete values
        (parity: pyannote.pipeline Pipeline.parameters) — used e.g. as
        the optimizer's warm start.
        """
        if instantiated:
            params = dict(self.__dict__["_instantiated"])
            for name, sub in self.__dict__["_pipelines"].items():
                for k, v in sub.parameters(instantiated=True).items():
                    params[f"{name}.{k}"] = v
            return params
        params = dict(self.__dict__["_parameters"])
        for name, sub in self.__dict__["_pipelines"].items():
            for k, v in sub.parameters().items():
                params[f"{name}.{k}"] = v
        return params

    def instantiate(self, params: Dict[str, Any]) -> "Pipeline":
        """Set concrete values for declared hyperparameters."""
        for name, value in (params or {}).items():
            self._instantiate_one(name, value)
        self.instantiated = True
        return self

    def _instantiate_one(self, name: str, value: Any):
        from .parameter import Frozen
        declared = self.__dict__["_parameters"].get(name)
        if isinstance(declared, ParamDict) and isinstance(value, dict):
            prev = self.__dict__["_instantiated"].get(name) or {}
            merged = {}
            for k in declared:
                # frozen sub-keys stay pinned (a config/optimizer value
                # must not override an explicit freeze); keys absent
                # from a partial dict keep their current value
                if isinstance(declared[k], Frozen):
                    merged[k] = declared[k].value
                else:
                    merged[k] = value.get(k, prev.get(k))
            self.__dict__["_instantiated"][name] = merged
            object.__setattr__(self, name, _DotDict(merged))
        elif declared is not None:
            if isinstance(declared, Frozen):
                value = declared.value
            self.__dict__["_instantiated"][name] = value
            object.__setattr__(self, name, value)
        elif name in self.__dict__["_pipelines"]:
            self.__dict__["_pipelines"][name].instantiate(value)
        elif isinstance(value, dict) and hasattr(self, name) and \
                isinstance(getattr(self, name), Pipeline):
            getattr(self, name).instantiate(value)
        else:
            # undeclared parameter: set it anyway (forward compat)
            object.__setattr__(self, name, value)

    def freeze(self, params: Dict[str, Any]) -> "Pipeline":
        """Pin a subset of hyperparameters (excluded from optimization).

        The declared Parameter is REPLACED with ``Frozen(value)`` so the
        optimizer's flatten_space skips it and instantiate() cannot
        override the pinned value (reference pyannote.pipeline freeze
        contract; config.yaml ``freeze:`` sections rely on this)."""
        from .parameter import Frozen
        for name, value in (params or {}).items():
            if name in self.__dict__["_pipelines"]:
                self.__dict__["_pipelines"][name].freeze(value)
                continue
            declared = self.__dict__["_parameters"].get(name)
            if isinstance(declared, ParamDict) and isinstance(value, dict):
                for k, v in value.items():
                    if k in declared:
                        declared[k] = Frozen(v)
            elif declared is not None:
                self.__dict__["_parameters"][name] = Frozen(value)
                object.__setattr__(self, name, Frozen(value))
            self.__dict__["_frozen"][name] = value
            self._instantiate_one(name, value)
        return self

    def default_parameters(self) -> Dict[str, Any]:
        raise NotImplementedError(
            f"{type(self).__name__} has no default parameters")

    # -- loading -----------------------------------------------------------

    @classmethod
    def from_pretrained(
        cls,
        checkpoint: Union[Dict, Text, Path],
        **kwargs,
    ) -> Optional["Pipeline"]:
        """Load a pipeline from a config dict / yaml file / directory /
        hub id.

        Parity: Pipeline.from_pretrained (reference
        core/pipeline.py:152-334); hub ids resolve through
        utils/hf_hub.py (local snapshot roots, then an HTTP download of
        ``config.yaml``).
        """
        token = kwargs.pop("use_auth_token", kwargs.pop("token", None))
        cache_dir = kwargs.pop("cache_dir", None)
        revision = kwargs.pop("revision", None)
        if isinstance(checkpoint, dict):
            config = checkpoint
            model_id = config.get("checkpoint", ".")
        else:
            path = Path(checkpoint)
            if not path.exists() and isinstance(checkpoint, str):
                from ..utils.hf_hub import (AssetFileName,
                                            download_from_hf_hub,
                                            looks_like_hub_id)
                if looks_like_hub_id(checkpoint):
                    try:
                        path = download_from_hf_hub(
                            checkpoint, AssetFileName.Pipeline,
                            revision=revision, token=token,
                            cache_dir=cache_dir)
                    except FileNotFoundError:
                        pass
            if path.is_dir():
                config_yml = path / PIPELINE_CONFIG
                model_id = str(path)
            elif path.is_file():
                config_yml = path
                model_id = str(path.parent)
            else:
                raise ValueError(
                    f"{checkpoint} is neither a directory, a config file, "
                    "nor a resolvable hub id")
            with open(config_yml) as f:
                config = yaml.safe_load(f)

        config = expand_subfolders(config, model_id, token=token,
                                   cache_dir=cache_dir)

        if "pipeline" not in config:
            raise ValueError("config has no 'pipeline' section")
        pipeline_name = config["pipeline"]["name"]
        Klass = get_class_by_name(
            pipeline_name,
            default_module_name="pyannote_audio_tpu.pipelines")
        params = dict(config["pipeline"].get("params") or {})
        params.update(kwargs.pop("pipeline_params", {}))
        # hub auth for sub-model loads (reference pipeline.py:276-277) —
        # only when the pipeline class takes the kwarg, so third-party
        # pipelines without hub access keep working
        import inspect
        try:
            accepted = inspect.signature(Klass.__init__).parameters
        except (TypeError, ValueError):
            accepted = {}
        for key, value in (("token", token), ("cache_dir", cache_dir)):
            if value is not None and key in accepted:
                params.setdefault(key, value)
        pipeline = Klass(**params)

        # freeze / instantiate (reference pipeline.py:285-294)
        if "freeze" in config:
            pipeline.freeze(config["freeze"])
        if "params" in config:
            pipeline.instantiate(config["params"])

        # preprocessors (reference pipeline.py:296-324)
        preprocessors = {}
        for key, preproc in (config.get("preprocessors") or {}).items():
            if isinstance(preproc, dict) and "name" in preproc:
                PreprocKlass = get_class_by_name(
                    preproc["name"],
                    default_module_name="pyannote_audio_tpu.utils."
                                        "preprocessors")
                preprocessors[key] = PreprocKlass(
                    **(preproc.get("params") or {}))
            else:
                preprocessors[key] = preproc
        if preprocessors:
            pipeline.__dict__["_preprocessors"] = preprocessors
        return pipeline

    def dump_config(self) -> Dict[str, Any]:
        """Serializable config (inverse of from_pretrained for params)."""
        return {
            "pipeline": {
                "name": f"{type(self).__module__}.{type(self).__name__}",
            },
            "params": dict(self.__dict__["_instantiated"]),
        }

    def save_config(self, path: Union[str, Path]):
        path = Path(path)
        path.mkdir(parents=True, exist_ok=True)
        with open(path / PIPELINE_CONFIG, "w") as f:
            yaml.safe_dump(self.dump_config(), f)

    # -- applying ----------------------------------------------------------

    def prepare_one(self, file: AudioFile) -> Dict:
        from .io import Audio
        file = Audio.validate_file(file)
        for key, preproc in self.__dict__["_preprocessors"].items():
            file[key] = preproc(file)
        return file

    def default_hook(self) -> Callable:
        def hook(step_name, step_artifact, file=None, total=None,
                 completed=None):
            pass
        return hook

    def setup_hook(self, file: AudioFile,
                   hook: Optional[Callable] = None) -> Callable:
        """Bind ``file`` into ``hook`` (or a noop when None).

        Parity: Pipeline.setup_hook (reference core/pipeline.py:412-417;
        a staticmethod there — instance method here so subclasses with a
        device hot path can override)."""
        if hook is None:
            return lambda *args, **kwargs: None
        import functools
        return functools.partial(hook, file=file)

    def classes(self):
        """Classes returned by the pipeline: a finite list when known in
        advance, or an infinite iterator when file-dependent (e.g.
        "SPEAKER_00", "SPEAKER_01", ...).

        Parity: Pipeline.classes (reference core/pipeline.py:422-447);
        subclasses override."""
        raise NotImplementedError()

    def __call__(self, file: AudioFile, hook: Optional[Callable] = None,
                 **kwargs):
        # deterministic inference entry (parity: fix_reproducibility is
        # called at every reference Pipeline.__call__, pipeline.py:543)
        from ..utils.reproducibility import fix_reproducibility
        fix_reproducibility()
        from ..telemetry import track_pipeline_apply
        track_pipeline_apply(self, file,
                             num_speakers=kwargs.get("num_speakers"),
                             min_speakers=kwargs.get("min_speakers"),
                             max_speakers=kwargs.get("max_speakers"))
        if not getattr(self, "instantiated", False):
            try:
                self.instantiate(self.default_parameters())
            except NotImplementedError:
                concrete = self.parameters(instantiated=True)
                missing = [k for k in self.parameters()
                           if k not in concrete]
                if missing:
                    # declared hyperparameters without concrete values
                    # and no defaults: running would crash later with a
                    # confusing AttributeError deep in the pipeline —
                    # fail clearly here instead
                    raise RuntimeError(
                        f"{type(self).__name__} has no default parameters"
                        f" and {missing} are not instantiated; call"
                        " instantiate(...) before applying it."
                    ) from None
                self.instantiated = True
        from collections.abc import Mapping as _Mapping
        if isinstance(file, (list, tuple)) or (
                hasattr(file, "__iter__")
                and not isinstance(file, (str, Path, _Mapping))
                and not hasattr(file, "read")):
            return self._apply_batch(list(file), hook=hook, **kwargs)
        file = self.prepare_one(file)
        if hook is not None:
            # bind the prepared file into every hook call so stateful hooks
            # (TimingHook/ArtifactHook) can write back into it (parity:
            # functools.partial(hook, file=file), reference pipeline.py:545)
            inner, bound = hook, file

            def hook(step_name, step_artifact, file=None, total=None,
                     completed=None):
                return inner(step_name, step_artifact,
                             file=bound if file is None else file,
                             total=total, completed=completed)
        return self.apply(file, hook=hook, **kwargs)

    def _apply_batch(self, files: List[AudioFile],
                     hook: Optional[Callable] = None, **kwargs):
        """Batch apply (reference pipeline.py:489-508 is sequential).

        The NN executables are shared across files automatically (static
        shapes + buckets), and host decode overlaps device compute: a
        worker thread decodes file N+1 while the device runs file N
        (ctypes releases the GIL inside the C++ decoder, so the overlap
        is real). Subclasses may still define ``apply_batch`` for custom
        batching; they get the parallel C++ pre-decode instead.
        """
        apply_batch = getattr(self, "apply_batch", None)
        files = [self.prepare_one(f) for f in files]
        # NB: duplicate URIs are fine — results are positional and the
        # per-file device caches live in each prepared dict, so distinct
        # files that happen to share a stem (sessions/a/rec.wav vs
        # sessions/b/rec.wav) never collide
        if apply_batch is not None:
            # subclasses that stream their own decode (diarization's
            # staged apply_batch) skip the eager whole-batch pre-decode:
            # it adds its full wall time as dead lead before the first
            # device dispatch (benchmarks/batch_timeline.py)
            if not getattr(self, "STREAMS_DECODE", False):
                self._predecode_batch(files)
            return apply_batch(files, hook=hook, **kwargs)

        import threading

        prefetch: Dict[int, threading.Thread] = {}
        results = []
        for i in range(len(files)):
            t = prefetch.pop(i, None)
            if t is not None:
                t.join()
            else:
                self._decode_into(files[i])
            if i + 1 < len(files):
                t = threading.Thread(target=self._decode_into,
                                     args=(files[i + 1],), daemon=True)
                t.start()
                prefetch[i + 1] = t
            # bind the prepared file into the hook like the single-file
            # __call__ path (stateful TimingHook/ArtifactHook write into
            # the file dict; an unbound hook gets file=None and drops
            # everything silently)
            if hook is not None:
                def bound_hook(step_name, step_artifact, file=None,
                               total=None, completed=None,
                               _f=files[i], _h=hook):
                    return _h(step_name, step_artifact,
                              file=_f if file is None else file,
                              total=total, completed=completed)
            else:
                bound_hook = None
            results.append(self.apply(files[i], hook=bound_hook, **kwargs))
            if isinstance(files[i], dict):
                # release the per-file device buffer AND, for dicts this
                # machinery decoded itself, the host waveform: the files
                # list stays alive for the whole batch, so HBM/RAM use
                # would otherwise grow linearly with batch size (~230 MB
                # host f32 per audio-hour)
                files[i].pop("_device_waveform", None)
                files[i].pop("_longfile_uploads", None)
                if files[i].pop("_batch_decoded", None):
                    files[i].pop("waveform", None)
                    files[i].pop("sample_rate", None)
        return results

    def _decode_into(self, f, preload: bool = True) -> None:
        """Decode a path-backed file dict in place (worker-thread safe).

        Shared by the sequential batch path and subclass streamed
        apply_batch workers — one decode implementation, so exception
        coverage and file-dict handling cannot diverge. Errors are
        swallowed; the consuming ``apply``/``_stage`` re-decodes and
        surfaces the real exception. ``preload`` additionally uploads
        the device buffer early (pipelines whose staging orders uploads
        itself pass False — worker-thread uploads contend with staging
        on the serialized relay)."""
        from collections.abc import MutableMapping

        from .io import Audio
        audio = getattr(self, "_audio", None) or \
            Audio(sample_rate=16000, mono="downmix")
        if isinstance(f, MutableMapping) and "waveform" not in f \
                and isinstance(f.get("audio"), (str, Path)):
            try:
                waveform, sample_rate = audio(f)
            except (ValueError, OSError):
                return             # consumer surfaces the real error
            f["waveform"] = waveform
            f["sample_rate"] = sample_rate
            # mark machinery-decoded dicts so batch eviction can drop
            # the host waveform too (path-backed: re-decodable); user
            # dicts that CAME with a waveform are never evicted
            f["_batch_decoded"] = True
        if preload:
            try:
                # overlap the host->device transfer with the device
                # compute of the previous file (no-op by default)
                self.preload(f)
            except Exception:
                pass               # consumer re-uploads if needed

    def _predecode_batch(self, files: List[Dict]) -> None:
        """Decode+downmix+resample path-backed files in parallel (C++)."""
        from .. import native
        if not native.available():
            return
        from .io import get_audio_metadata
        pending = [f for f in files
                   if "waveform" not in f
                   and isinstance(f.get("audio"), (str, Path))]
        if len(pending) < 2:
            return
        try:
            target_rate = 16000
            max_seconds = max(
                get_audio_metadata(f).duration for f in pending)
            decoded = native.batch_decode_resample(
                [str(f["audio"]) for f in pending], target_rate,
                max_seconds=max_seconds + 0.1)
            if decoded is None:
                return
            out, lengths = decoded
            for f, row, n in zip(pending, out, lengths):
                f["waveform"] = row[None, :int(n)].copy()
                f["sample_rate"] = target_rate
        except (ValueError, OSError):
            return

    def preload(self, file: Dict) -> None:
        """Optional early device upload hook for streaming batch apply;
        subclasses with a device hot path override this (e.g. diarization
        delegates to its segmentation ``Inference.preload``)."""

    def apply(self, file: Dict, hook: Optional[Callable] = None, **kwargs):
        raise NotImplementedError

    # -- device management (API parity; placement is XLA's job) ------------

    def to(self, device) -> "Pipeline":
        self.device = device
        return self

    def cuda(self, device=None) -> "Pipeline":
        """torch-habit compat (reference core/pipeline.py:613-624): maps
        to the accelerator device — on this stack, jax's default device."""
        import jax
        return self.to(jax.devices()[0] if device is None else device)


class _DotDict(dict):
    """Attribute access over instantiated ParamDict values."""

    __getattr__ = dict.__getitem__

    def __setattr__(self, k, v):
        self[k] = v
