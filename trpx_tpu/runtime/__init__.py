"""Run-level services: streaming encode with resume, metrics, profiling."""

from .metrics import RunReport, StageTimer
from .stream import StreamingEncoder, iter_decode

__all__ = ["RunReport", "StageTimer", "StreamingEncoder", "iter_decode"]
