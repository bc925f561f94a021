from mmtpu.monitor.monitor import ExperimentMonitor
from mmtpu.monitor.storage import MonitorStorage

__all__ = ["ExperimentMonitor", "MonitorStorage"]
