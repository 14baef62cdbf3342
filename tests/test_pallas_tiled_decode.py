"""Tiled Pallas decode (big frames): exact inverse across tile windows.

Mirrors test_pallas_tiled.py: tiny tile size (64 blocks) in interpreter
mode so the (F, T) grid, the sub-word window shifts, and the cross-tile
repeat-coding chain are all exercised on CPU. Semantics under test:
/root/reference/include/Terse.hpp:352-389 (prolix block walk + unpack).
"""

import jax
import numpy as np
import pytest

from trpx_tpu.format import pycodec
from trpx_tpu.ops import pallas_unpack
from trpx_tpu.ops.coding import FrameSpec, narrow_values, walk_archive

TB = 64  # blocks per tile under test


def _decode_tiled(arch, spec, dtype):
    widths, _poffs, words = walk_archive(arch, spec)
    out = jax.device_get(
        pallas_unpack.decode_tiled_host(spec, words, widths,
                                        interpret=True, tile_blocks=TB)
    )
    out = pallas_unpack.flatten_decoded(out, spec.n)
    return narrow_values(out, np.dtype(dtype))


@pytest.mark.parametrize("n", [TB * 12 * 3 + 100, TB * 12 * 2, TB * 12 + 7])
def test_tiled_decode_roundtrip(n):
    rng = np.random.default_rng(n)
    frames = rng.poisson(3.0, size=(2, n)).astype(np.uint16)
    frames[0, 5] = 60000
    frames[1, n - 1] = 40000  # wide field at the very stream tail
    arch = pycodec.encode(list(frames))
    spec = FrameSpec.for_dtype(n, np.uint16)
    out = _decode_tiled(arch, spec, np.uint16)
    np.testing.assert_array_equal(out, frames)


def test_tiled_decode_repeat_chain_across_boundary():
    """Constant frames produce 1-bit repeat headers across tile
    boundaries: the prev0 width chain must carry into each tile."""
    n = TB * 12 * 4
    frames = np.full((1, n), 5, dtype=np.uint16)
    arch = pycodec.encode(frames[0])
    spec = FrameSpec.for_dtype(n, np.uint16)
    out = _decode_tiled(arch, spec, np.uint16)
    np.testing.assert_array_equal(out, frames)


def test_tiled_decode_signed_int32_wide_fields():
    n = TB * 12 * 3 + 50
    rng = np.random.default_rng(1)
    frames = rng.integers(-1000, 1000, size=(2, n)).astype(np.int32)
    frames[0, 0] = np.iinfo(np.int32).min  # width-33 field
    frames[1, TB * 12] = np.iinfo(np.int32).max  # first value of tile 1
    arch = pycodec.encode(list(frames))
    spec = FrameSpec.for_dtype(n, np.int32)
    out = _decode_tiled(arch, spec, np.int32)
    np.testing.assert_array_equal(out, frames)


def test_tiled_decode_sparse_zero_tiles():
    """Tiles that are entirely zero-width (empty streams) split cleanly."""
    n = TB * 12 * 4 + 30
    frames = np.zeros((2, n), np.uint16)
    frames[0, 3] = 900          # data only in tile 0
    frames[1, n - 2] = 1234     # data only in the last (partial) tile
    arch = pycodec.encode(list(frames))
    spec = FrameSpec.for_dtype(n, np.uint16)
    out = _decode_tiled(arch, spec, np.uint16)
    np.testing.assert_array_equal(out, frames)
