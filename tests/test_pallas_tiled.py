"""Tiled Pallas encode (big frames): bit-identity across tile boundaries."""

import jax
import numpy as np
import pytest

from trpx_tpu.format import pycodec
from trpx_tpu.ops import pallas_pack
from trpx_tpu.ops.coding import FrameSpec, assemble_archive


@pytest.fixture
def small_tiles(monkeypatch):
    monkeypatch.setattr(pallas_pack, "TILE_BLOCKS", 64)


def _run(frames, spec):
    padded = np.zeros((frames.shape[0], spec.tree_rows * spec.block),
                      frames.dtype)
    padded[:, : frames.shape[1]] = frames
    w, b, m, o = jax.device_get(
        pallas_pack.encode_batch_pallas_tiled(spec, padded, True)
    )
    return assemble_archive(spec, w, b, m), o


@pytest.mark.parametrize("n", [64 * 12 * 3 + 100, 64 * 12 * 2, 64 * 12 + 7])
def test_tiled_bit_identical(small_tiles, n):
    rng = np.random.default_rng(n)
    frames = rng.poisson(3.0, size=(2, n)).astype(np.uint16)
    frames[0, 5] = 60000
    spec = FrameSpec.for_dtype(n, np.uint16, cap_ratio=0.5)
    arch, over = _run(frames, spec)
    ref = pycodec.encode(list(frames))
    assert arch.payload == ref.payload
    assert arch.meta.prolix_bits == ref.meta.prolix_bits


def test_tiled_repeat_coding_across_boundary(small_tiles):
    """A constant frame keeps 1-bit repeat headers across every tile
    boundary — the prev-width scalar must carry, else headers regrow."""
    n = 64 * 12 * 4
    frames = np.full((1, n), 5, dtype=np.uint16)
    spec = FrameSpec.for_dtype(n, np.uint16, cap_ratio=0.5)
    arch, _ = _run(frames, spec)
    ref = pycodec.encode(frames[0])
    assert arch.payload == ref.payload


def test_tiled_signed_int32(small_tiles):
    n = 64 * 12 * 3 + 50
    rng = np.random.default_rng(1)
    frames = rng.integers(-1000, 1000, size=(2, n)).astype(np.int32)
    frames[0, 0] = np.iinfo(np.int32).min  # width-33 field
    spec = FrameSpec.for_dtype(n, np.int32, cap_ratio=0.5)
    arch, _ = _run(frames, spec)
    assert arch.payload == pycodec.encode(list(frames)).payload
