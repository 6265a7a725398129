from .logging import setup_logging, get_logger
from .timing import Timer, block_until_ready_timed
from .prng import KeySeq
from .memory import device_memory_stats, report_memory

__all__ = [
    "setup_logging",
    "get_logger",
    "Timer",
    "block_until_ready_timed",
    "KeySeq",
    "device_memory_stats",
    "report_memory",
]
