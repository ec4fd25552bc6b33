from unimedvl_tpu.utils.profiling import PhaseTimer, device_memory_stats, trace
from unimedvl_tpu.utils.logging import get_logger

__all__ = ["PhaseTimer", "device_memory_stats", "trace", "get_logger"]
