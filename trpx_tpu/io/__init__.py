"""Host I/O layer: greyscale TIFF container + .trpx file assembly."""

from .tiff import (
    TiffError,
    TiffStack,
    TiffStream,
    TiffWriter,
    read_tiff,
    write_tiff,
)
from .trpx import cached_frame_offsets, read_trpx, subset_frames, write_trpx

__all__ = [
    "TiffError",
    "TiffStack",
    "TiffStream",
    "TiffWriter",
    "read_tiff",
    "write_tiff",
    "cached_frame_offsets",
    "read_trpx",
    "subset_frames",
    "write_trpx",
]
