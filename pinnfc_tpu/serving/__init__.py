from pinnfc_tpu.serving.monitor import (
    DiagnosisHead,
    MonitorOutput,
    MonitorState,
    OnlineMonitor,
)
from pinnfc_tpu.serving.exported import (
    build_scorer_fn,
    export_monitor_fleet_step,
    export_monitor_step,
    export_scorer,
    load_scorer,
    monitor_from_artifact,
)
from pinnfc_tpu.serving.replay import FleetConditionResult, fleet_replay
from pinnfc_tpu.serving.server import make_server, serve

__all__ = [
    "DiagnosisHead",
    "build_scorer_fn",
    "export_monitor_fleet_step",
    "export_monitor_step",
    "export_scorer",
    "load_scorer",
    "monitor_from_artifact",
    "FleetConditionResult",
    "MonitorOutput",
    "MonitorState",
    "OnlineMonitor",
    "fleet_replay",
    "make_server",
    "serve",
]
