"""Host I/O layer: greyscale TIFF container + .trpx file assembly."""

from .tiff import (
    TiffError,
    TiffStack,
    TiffStream,
    read_tiff,
    write_tiff,
)
from .trpx import read_trpx, write_trpx

__all__ = [
    "TiffError",
    "TiffStack",
    "TiffStream",
    "read_tiff",
    "write_tiff",
    "read_trpx",
    "write_trpx",
]
