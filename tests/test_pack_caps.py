"""Optimistic soft-capacity merge tree: overflow detection + fallback."""

import jax
import numpy as np
import pytest

from trpx_tpu import ops
from trpx_tpu.format import pycodec
from trpx_tpu.ops.coding import FrameSpec, encode_batch_device
from trpx_tpu.ops.pack import capacity_schedule, row_capacity


def test_capacity_schedule_shapes():
    caps = capacity_schedule(32768, 8, 204, 0.5)
    assert len(caps) == 16
    assert caps[0] == 8
    # small nodes keep generous slack (clustered hot pixels must fit);
    # large nodes converge to the ratio
    assert caps[3] <= 8 * 8
    assert caps[8] < 8 * 256 * 0.7
    assert caps[-1] < 8 * 32768 * 0.6
    full = capacity_schedule(32768, 8, 204, 1.0)
    assert full[-1] == 8 * 32768


def test_incompressible_overflows_and_fallback_matches():
    """Random full-range uint16 data does not compress: the ratio-0.25
    kernel must flag overflow, and ops.encode must still produce the
    bit-identical archive via the full-capacity fallback."""
    rng = np.random.default_rng(0)
    n = 480
    frames = rng.integers(0, 65536, size=(3, n), dtype=np.uint16)
    spec = FrameSpec.for_dtype(n, np.uint16, cap_ratio=0.25)
    padded = np.zeros((3, spec.n_padded), dtype=np.uint16)
    padded[:, :n] = frames
    _, _, _, over = jax.device_get(encode_batch_device(spec, padded))
    assert bool(np.any(over)), "expected overflow on incompressible data"

    arch = ops.encode(frames, cap_ratio=0.25)  # exercises the fallback
    ref = pycodec.encode(list(frames))
    assert arch.to_bytes() == ref.to_bytes()


def test_compressible_stays_fast_path():
    rng = np.random.default_rng(1)
    n = 480
    frames = rng.poisson(3.0, size=(3, n)).astype(np.uint16)
    spec = FrameSpec.for_dtype(n, np.uint16, cap_ratio=0.5)
    padded = np.zeros((3, spec.n_padded), dtype=np.uint16)
    padded[:, :n] = frames
    words, bits, maxw, over = jax.device_get(
        encode_batch_device(spec, padded)
    )
    assert not bool(np.any(over))
    arch = ops.encode(frames)
    assert arch.to_bytes() == pycodec.encode(list(frames)).to_bytes()


@pytest.mark.parametrize("ratio", [0.25, 0.5, 1.0])
def test_ratio_invariance_when_no_overflow(ratio):
    rng = np.random.default_rng(2)
    frames = rng.poisson(1.0, size=(2, 100)).astype(np.uint16)
    arch = ops.encode(frames, cap_ratio=ratio)
    assert arch.to_bytes() == pycodec.encode(list(frames)).to_bytes()


def test_out_words_smaller_with_ratio():
    spec_full = FrameSpec.for_dtype(512 * 512, np.uint16)
    spec_half = FrameSpec.for_dtype(512 * 512, np.uint16, cap_ratio=0.5)
    assert spec_half.out_words < spec_full.out_words
    assert row_capacity(spec_full.max_block_bits) == 8
