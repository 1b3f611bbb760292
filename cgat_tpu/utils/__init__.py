from . import profiling
from .profiling import ThroughputMeter, annotate, trace

__all__ = ["profiling", "ThroughputMeter", "annotate", "trace"]
