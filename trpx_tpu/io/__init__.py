"""Host I/O layer: greyscale TIFF container + .trpx file assembly."""

from .tiff import (
    TiffError,
    TiffStack,
    TiffStream,
    TiffWriter,
    read_tiff,
    write_tiff,
)
from .trpx import frame_offsets, read_trpx, subset_frames, write_trpx

__all__ = [
    "TiffError",
    "TiffStack",
    "TiffStream",
    "TiffWriter",
    "read_tiff",
    "write_tiff",
    "frame_offsets",
    "read_trpx",
    "subset_frames",
    "write_trpx",
]
