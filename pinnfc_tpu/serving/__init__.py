from pinnfc_tpu.serving.monitor import MonitorOutput, MonitorState, OnlineMonitor

__all__ = ["MonitorOutput", "MonitorState", "OnlineMonitor"]
