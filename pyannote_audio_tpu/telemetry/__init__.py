from .metrics import (set_telemetry_metrics, telemetry_enabled,
                      track_model_init, track_pipeline_apply,
                      track_pipeline_init)

__all__ = [
    "set_telemetry_metrics",
    "telemetry_enabled",
    "track_model_init",
    "track_pipeline_apply",
    "track_pipeline_init",
]
