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


def test_placement_merge_matches_numpy_bit_concat():
    """_placement_merge (funnel shift + boundary patch + DUS chain) vs a
    plain numpy bit concatenation over random ragged tile lengths,
    including word-aligned boundaries (s == 0) and full tiles."""
    rng = np.random.default_rng(3)
    F, T, ow = 3, 5, 8
    bits = rng.integers(1, ow * 32 - 31, size=(F, T)).astype(np.int32)
    bits[0, 1] = 64          # exactly word-aligned boundary
    bits[1, 2] = ow * 32 - 31  # max-length tile
    words = np.zeros((F, T, ow), np.uint32)
    for f in range(F):
        for t in range(T):
            nb = int(bits[f, t])
            raw = rng.integers(0, 2, size=nb).astype(np.uint8)
            for i, bit in enumerate(raw):
                if bit:
                    words[f, t, i // 32] |= np.uint32(1) << np.uint32(i % 32)

    wfull, totals = jax.device_get(pallas_pack._placement_merge(
        jax.numpy.asarray(words), jax.numpy.asarray(bits)))

    for f in range(F):
        stream = []
        for t in range(T):
            nb = int(bits[f, t])
            flat = np.unpackbits(
                words[f, t].view(np.uint8), bitorder="little")[:nb]
            stream.append(flat)
        ref = np.concatenate(stream)
        assert int(totals[f]) == len(ref)
        got = np.unpackbits(
            np.asarray(wfull[f]).view(np.uint8),
            bitorder="little")[: len(ref)]
        np.testing.assert_array_equal(got, ref)
