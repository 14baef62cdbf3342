""".trpx file read/write: one XML header + raw bitstream (Terse.hpp:454-496).

Thin file-boundary helpers over format.TrpxArchive; kept separate from the
codec so streaming/multi-file pipelines have a single place for file I/O.

Sidecar frame index (`<file>.trpx.idx`, NON-normative framework
extension): ``TRPXIDX1`` magic + little-endian u64 frame count + u64
payload size + F×u64 absolute payload byte offsets. With it, the decode
prepass walks all frames in parallel (native OpenMP walk) instead of
chaining through the stream; without it everything still works — the
``.trpx`` bytes themselves are always exactly the reference format.
"""

from __future__ import annotations

import os
import struct
from pathlib import Path

import numpy as np

from ..format.pycodec import TrpxArchive

_IDX_MAGIC = b"TRPXIDX1"


def _idx_path(path) -> Path:
    p = Path(path)
    return p.with_name(p.name + ".idx")


def write_index(path, offsets, payload_size: int) -> None:
    """Write the sidecar index for the ``.trpx`` at ``path``."""
    offs = np.ascontiguousarray(offsets, dtype="<u8")
    blob = (_IDX_MAGIC + struct.pack("<QQ", offs.shape[0], payload_size)
            + offs.tobytes())
    _idx_path(path).write_bytes(blob)


def read_index(path, n_frames: int, payload_size: int):
    """Load the sidecar index if present and consistent, else None."""
    p = _idx_path(path)
    try:
        data = p.read_bytes()
    except OSError:
        return None
    if len(data) < 24 or data[:8] != _IDX_MAGIC:
        return None
    count, size = struct.unpack("<QQ", data[8:24])
    if count != n_frames or size != payload_size:
        return None  # stale sidecar
    if len(data) != 24 + 8 * count:
        return None
    return np.frombuffer(data, dtype="<u8", offset=24).astype(np.int64)


def read_trpx(src) -> TrpxArchive:
    """Read a ``.trpx`` file (path, bytes, or file object) into an archive.

    When reading from a path, a consistent ``.trpx.idx`` sidecar is
    attached as ``archive.frame_index`` (enables the parallel walk)."""
    path = None
    if isinstance(src, (str, os.PathLike)):
        path = src
        with open(src, "rb") as f:
            data = f.read()
    elif isinstance(src, (bytes, bytearray, memoryview)):
        data = bytes(src)
    else:
        data = src.read()
    arch = TrpxArchive.from_bytes(data)
    if path is not None:
        arch.frame_index = read_index(
            path, arch.meta.number_of_frames, arch.meta.memory_size
        )
    return arch


def write_trpx(archive: TrpxArchive, dst, index: bool = False) -> None:
    """Write an archive as a ``.trpx`` file (path or file object).

    ``index=True`` (path destinations only) also writes the ``.trpx.idx``
    sidecar, computing frame offsets with the native walker if the
    archive doesn't carry them."""
    blob = archive.to_bytes()
    if isinstance(dst, (str, os.PathLike)):
        with open(dst, "wb") as f:
            f.write(blob)
        if index:
            offs = archive.frame_index
            if offs is None:
                offs = _compute_offsets(archive)
            write_index(dst, offs, archive.meta.memory_size)
    else:
        if index:
            raise ValueError("sidecar index needs a path destination")
        dst.write(blob)


def _compute_offsets(archive: TrpxArchive):
    meta = archive.meta
    try:
        from .. import native

        if native.available():
            _, _, fstarts = native.walk(
                archive.payload, meta.number_of_frames,
                meta.number_of_values, meta.block,
            )
            return fstarts[:-1]
    except Exception:
        pass
    from ..format.pycodec import frame_offsets

    return np.asarray(frame_offsets(archive), dtype=np.int64)
