"""Host-side utilities: logging, meters, visualization."""

from .logger import create_logger
from .meters import AverageMeter, ProgressMeter, time_synchronized

__all__ = ["AverageMeter", "ProgressMeter", "create_logger", "time_synchronized"]
