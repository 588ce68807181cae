from pinnfc_tpu.serving.monitor import (
    DiagnosisHead,
    MonitorOutput,
    MonitorState,
    OnlineMonitor,
)

__all__ = ["DiagnosisHead", "MonitorOutput", "MonitorState", "OnlineMonitor"]
