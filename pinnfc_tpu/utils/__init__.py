from pinnfc_tpu.utils.checkpoint import (
    load_checkpoint,
    load_params_npz,
    save_checkpoint,
    save_params_npz,
)
from pinnfc_tpu.utils.observability import MetricsLogger, StepTimer, profile_trace

__all__ = [
    "load_checkpoint",
    "load_params_npz",
    "save_checkpoint",
    "save_params_npz",
    "MetricsLogger",
    "StepTimer",
    "profile_trace",
]
