from pinnfc_tpu.serving.monitor import (
    DiagnosisHead,
    MonitorOutput,
    MonitorState,
    OnlineMonitor,
)
from pinnfc_tpu.serving.replay import FleetConditionResult, fleet_replay
from pinnfc_tpu.serving.server import make_server, serve

__all__ = [
    "DiagnosisHead",
    "FleetConditionResult",
    "MonitorOutput",
    "MonitorState",
    "OnlineMonitor",
    "fleet_replay",
    "make_server",
    "serve",
]
