"""High-level public API: compress/decompress arrays, device path by default.

This is the surface a reference-library user lands on:

* ``compress(frames)``    ≈ ``jpa::Terse t(frames); t.write(...)``
  (Terse.hpp:249,454) — returns a :class:`TrpxArchive`
* ``decompress(archive)`` ≈ ``t.prolix(out)`` (Terse.hpp:333) — returns
  pixels, with the output dtype chosen the way the ``prolix`` CLI does
  (prolix.cpp:69-92) but with the 32-bit dispatch bug B3 fixed and 64-bit
  streams supported.

Routing: frames whose dtype the TPU path supports ((u)int8/16/32) are
encoded/decoded on device (``trpx_tpu.ops``); 64-bit and float inputs take
the host codec (``trpx_tpu.format.pycodec``). Floats are truncated through
int64 exactly like the reference CLI (terse.cpp:120-123).
"""

from __future__ import annotations

import numpy as np

from .format import pycodec
from .format.header import TrpxMeta
from .format.pycodec import TrpxArchive
from .format.spec import DEFAULT_BLOCK

_DEVICE_KINDS = {
    np.dtype(np.uint8), np.dtype(np.uint16), np.dtype(np.uint32),
    np.dtype(np.int8), np.dtype(np.int16), np.dtype(np.int32),
}

#: auto mode (device=None) keeps workloads below this on the host codec
_DEVICE_MIN_BYTES = 4 << 20


def _as_stack(frames) -> tuple[np.ndarray, tuple[int, ...]]:
    """Normalize input to (F, n) plus the dimensions attribute tuple."""
    frames = np.asarray(frames)
    dims: tuple[int, ...] = ()
    if frames.ndim == 1:
        frames = frames[None]
    elif frames.ndim == 2:
        # a single image: dimensions = (width, height) (terse.cpp:70-71)
        dims = (frames.shape[1], frames.shape[0])
        frames = frames.reshape(1, -1)
    elif frames.ndim == 3:
        dims = (frames.shape[2], frames.shape[1])
        frames = frames.reshape(frames.shape[0], -1)
    else:
        raise ValueError("frames must be 1-D, 2-D (one image) or 3-D (stack)")
    return frames, dims


def compress(
    frames,
    block: int = DEFAULT_BLOCK,
    dimensions: tuple[int, ...] | None = None,
    device: bool | None = None,
) -> TrpxArchive:
    """Losslessly compress integral frames into a TRPX archive.

    ``frames``: (n,), (h, w) or (F, h, w) array (or nested lists).
    ``dimensions``: overrides the dims stored in the header.
    ``device``: force the device (True) or host (False) path; default picks
    the device path whenever the dtype supports it.
    """
    frames = np.asarray(frames)
    if frames.dtype.kind == "f":
        # reference CLI truncates float TIFFs through int64 (terse.cpp:120-123)
        frames = frames.astype(np.int64)
    if frames.dtype.kind not in "iu":
        raise TypeError(f"only integral frames are encodable, got {frames.dtype}")
    stack, dims = _as_stack(frames)
    if dimensions is not None:
        dims = tuple(dimensions)
    use_device = device if device is not None else (
        stack.dtype in _DEVICE_KINDS
        # small workloads: the native host codec (~1 GB/s) finishes in
        # single-digit ms — under any device dispatch, and it sidesteps
        # per-odd-shape XLA compiles (a 4-value frame measured minutes
        # of compile on the tunneled chip, tools/tpu_size_matrix.py)
        and stack.nbytes >= _DEVICE_MIN_BYTES
    )
    if use_device:
        from . import ops  # deferred: jax import is heavy

        return ops.encode(stack, block=block, dimensions=dims)
    return _host_encode(stack, block, dims)


def _host_encode(stack, block, dims) -> TrpxArchive:
    from . import native

    if native.available():
        from .native import codec as ncodec

        return ncodec.encode(stack, block=block, dimensions=dims)
    return pycodec.encode(list(stack), block=block, dimensions=dims)


def output_dtype(meta: TrpxMeta) -> np.dtype:
    """Output pixel dtype the way the prolix CLI picks it (prolix.cpp:69-92),
    with bug B3 fixed (true 32-bit paths) and 64-bit supported."""
    bits = meta.prolix_bits
    if meta.signed:
        if bits <= 16:
            return np.dtype(np.int16)
        if bits <= 32:
            return np.dtype(np.int32)
        return np.dtype(np.int64)
    if bits <= 16:
        return np.dtype(np.uint16)
    if bits <= 32:
        return np.dtype(np.uint32)
    return np.dtype(np.uint64)


def decompress(
    archive: TrpxArchive | bytes,
    dtype=None,
    device: bool | None = None,
    frames=None,
) -> np.ndarray:
    """Decode an archive to pixels.

    ``archive`` may be a :class:`TrpxArchive` or the raw ``.trpx`` bytes.
    Returns (F, h, w) when the header carries 2-D dimensions, else (F, n);
    single-frame archives are squeezed to (h, w) / (n,).
    ``dtype`` defaults to :func:`output_dtype` of the stream.
    ``frames`` selects a subset to decode — an int (that frame, squeezed),
    slice, or sequence of indices; cost is O(selected frames), not
    O(archive) (frames are byte-aligned and independent, Terse.hpp:505).
    """
    if isinstance(archive, (bytes, bytearray, memoryview)):
        archive = TrpxArchive.from_bytes(bytes(archive))
    if frames is not None:
        from .io.trpx import subset_frames

        archive = subset_frames(archive, frames)
    meta = archive.meta
    dtype = np.dtype(dtype) if dtype is not None else output_dtype(meta)
    if meta.signed and dtype.kind == "u":
        raise TypeError(
            "signed streams must not be decoded into unsigned types "
            "(Terse.hpp:356-357)"
        )
    capacity = 8 * dtype.itemsize if dtype.kind in "iu" else 64
    device_ok = (
        dtype in _DEVICE_KINDS
        and meta.prolix_bits <= capacity + (1 if dtype.kind == "i" else 0)
    )
    raw_bytes = (meta.number_of_frames * meta.number_of_values
                 * dtype.itemsize)
    use_device = device if device is not None else (
        device_ok and raw_bytes >= _DEVICE_MIN_BYTES
    )
    if use_device and not device_ok:
        raise ValueError(
            f"device decode unavailable for dtype {dtype} with "
            f"prolix_bits={meta.prolix_bits}"
        )
    if use_device:
        from . import ops

        out = ops.decode(archive, dtype)
    else:
        from . import native

        if native.available():
            from .native import codec as ncodec

            out = ncodec.decode(archive, dtype)
        else:
            out = pycodec.decode(archive, dtype)
    if len(meta.dimensions) == 2:
        w, h = meta.dimensions
        if w * h == meta.number_of_values:
            out = out.reshape(meta.number_of_frames, h, w)
    if meta.number_of_frames == 1:
        out = out[0]
    return out
