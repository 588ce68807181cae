from pinnfc_tpu.utils.checkpoint import (
    load_checkpoint,
    load_checkpoint_meta,
    load_params_npz,
    save_checkpoint,
    save_params_npz,
)
from pinnfc_tpu.utils.observability import MetricsLogger, StepTimer, profile_trace
from pinnfc_tpu.utils.compilation_cache import enable_compilation_cache
from pinnfc_tpu.utils.report import build_report, write_report
from pinnfc_tpu.utils.tbevents import EventFileWriter, read_events

__all__ = [
    "EventFileWriter",
    "read_events",
    "build_report",
    "write_report",
    "load_checkpoint",
    "load_checkpoint_meta",
    "load_params_npz",
    "save_checkpoint",
    "save_params_npz",
    "MetricsLogger",
    "enable_compilation_cache",
    "StepTimer",
    "profile_trace",
]
