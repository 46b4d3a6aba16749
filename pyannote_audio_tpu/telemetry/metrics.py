"""Opt-in anonymous usage telemetry.

Parity: /root/reference/src/pyannote/audio/telemetry/metrics.py
(track_model_init :50, track_pipeline_init :70, track_pipeline_apply
:91-135, env gate ``PYANNOTE_METRICS_ENABLED`` :138-156, persisted opt-in
:177-191). The reference exports OTLP spans via OpenTelemetry; this
environment has no egress and no OTLP dependency, so events are appended
to a local JSONL spool (same event schema) that an exporter could ship.
Disabled by default; enable via ``PYANNOTE_TPU_METRICS_ENABLED=1`` or
``set_telemetry_metrics(True)``.
"""

from __future__ import annotations

import json
import os
import time
from pathlib import Path
from typing import Optional

_STATE = {"enabled": None}
_SPOOL = Path(os.environ.get("PYANNOTE_TPU_METRICS_SPOOL",
                             "~/.cache/pyannote_audio_tpu/telemetry.jsonl"))


def telemetry_enabled() -> bool:
    if _STATE["enabled"] is not None:
        return _STATE["enabled"]
    env = os.environ.get("PYANNOTE_TPU_METRICS_ENABLED",
                         os.environ.get("PYANNOTE_METRICS_ENABLED", "0"))
    return env.lower() in ("1", "true", "yes", "on")


def set_telemetry_metrics(enabled: bool,
                          persist: Optional[bool] = None) -> None:
    """Toggle telemetry for this process (parity: metrics.py:177-191)."""
    _STATE["enabled"] = bool(enabled)


def _emit(event: str, **attributes) -> None:
    if not telemetry_enabled():
        return
    record = {"event": event, "time": time.time(), **attributes}
    try:
        path = _SPOOL.expanduser()
        path.parent.mkdir(parents=True, exist_ok=True)
        with open(path, "a") as f:
            f.write(json.dumps(record) + "\n")
    except OSError:
        pass


def track_model_init(model) -> None:
    _emit("model_init", architecture=type(model).__name__)


def track_pipeline_init(pipeline) -> None:
    _emit("pipeline_init", pipeline=type(pipeline).__name__)


def track_pipeline_apply(pipeline, file, duration: Optional[float] = None,
                         num_speakers: Optional[int] = None,
                         min_speakers: Optional[int] = None,
                         max_speakers: Optional[int] = None) -> None:
    _emit("pipeline_apply", pipeline=type(pipeline).__name__,
          duration=duration, num_speakers=num_speakers,
          min_speakers=min_speakers, max_speakers=max_speakers)


def is_metrics_enabled() -> bool:
    """Parity alias (reference telemetry/metrics.py:143-151)."""
    return telemetry_enabled()


def set_opentelemetry_log_level(level: str) -> None:
    """Quiet the telemetry backend's own logging.

    Parity: set_opentelemetry_log_level (reference telemetry/metrics.py:
    194-210). This build spools events to local JSONL instead of OTLP
    (no egress), so the knob maps to the spool's logger level.
    """
    import logging
    logging.getLogger(__name__).setLevel(
        getattr(logging, str(level).upper(), logging.ERROR))
