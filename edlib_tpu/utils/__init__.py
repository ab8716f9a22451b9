"""Utilities: profiling, counters."""

from edlib_tpu.utils.profiling import Timer, gcups, trace

__all__ = ["Timer", "gcups", "trace"]
