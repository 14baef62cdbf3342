""".trpx file read/write: one XML header + raw bitstream (Terse.hpp:454-496).

Thin file-boundary helpers over format.TrpxArchive; kept separate from the
codec so streaming/multi-file pipelines have a single place for file I/O.
"""

from __future__ import annotations

import os

from ..format.pycodec import TrpxArchive


def read_trpx(src) -> TrpxArchive:
    """Read a ``.trpx`` file (path, bytes, or file object) into an archive."""
    if isinstance(src, (str, os.PathLike)):
        with open(src, "rb") as f:
            data = f.read()
    elif isinstance(src, (bytes, bytearray, memoryview)):
        data = bytes(src)
    else:
        data = src.read()
    return TrpxArchive.from_bytes(data)


def write_trpx(archive: TrpxArchive, dst) -> None:
    """Write an archive as a ``.trpx`` file (path or file object)."""
    blob = archive.to_bytes()
    if isinstance(dst, (str, os.PathLike)):
        with open(dst, "wb") as f:
            f.write(blob)
    else:
        dst.write(blob)
