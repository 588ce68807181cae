from pinnfc_tpu.serving.monitor import (
    DiagnosisHead,
    MonitorOutput,
    MonitorState,
    OnlineMonitor,
)
from pinnfc_tpu.serving.server import make_server, serve

__all__ = [
    "DiagnosisHead",
    "MonitorOutput",
    "MonitorState",
    "OnlineMonitor",
    "make_server",
    "serve",
]
