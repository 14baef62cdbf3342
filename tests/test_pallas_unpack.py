"""Pallas decode kernel: interpret-mode losslessness vs the normative codec."""

import numpy as np
import pytest

from trpx_tpu.format import pycodec
from trpx_tpu.ops import pallas_unpack

CASES = [
    (100, np.uint16),
    (5000, np.uint16),
    (50, np.uint8),
    (2000, np.int16),
    (64, np.int32),
    (777, np.uint32),
]


@pytest.mark.parametrize("n,dtype", CASES)
def test_interpret_lossless(n, dtype):
    rng = np.random.default_rng(n)
    if np.dtype(dtype).kind == "i":
        frames = rng.integers(-300, 300, size=(3, n)).astype(dtype)
        frames[0, 0] = np.iinfo(dtype).min
    else:
        frames = rng.poisson(3.0, size=(3, n)).astype(dtype)
        frames[0, 0] = np.iinfo(dtype).max
    arch = pycodec.encode(list(frames))
    out = pallas_unpack.decode(arch, dtype, interpret=True)
    np.testing.assert_array_equal(out, frames)


def test_interpret_zero_and_repeat_blocks():
    """All-zero frames exercise 1-bit repeat headers / zero-fill."""
    frames = np.zeros((2, 300), dtype=np.uint16)
    frames[1, 7] = 9
    arch = pycodec.encode(list(frames))
    out = pallas_unpack.decode(arch, np.uint16, interpret=True)
    np.testing.assert_array_equal(out, frames)


def test_interpret_i8_pair_fusing():
    """i8 (max_width 9) takes the PAIR extraction path; sign extension
    must apply per fused value."""
    import jax
    import jax.numpy as jnp

    from trpx_tpu.ops.coding import FrameSpec, narrow_values, walk_archive

    rng = np.random.default_rng(9)
    frames = rng.integers(-63, 64, size=(2, 500)).astype(np.int8)
    frames[0, :24] = 0
    arch = pycodec.encode(list(frames))
    spec = FrameSpec.for_dtype(500, np.int8)
    widths, _p, words = walk_archive(arch, spec)
    out = jax.device_get(pallas_unpack.decode_batch_pallas(
        spec, jnp.asarray(words), jnp.asarray(widths), True))
    np.testing.assert_array_equal(
        narrow_values(pallas_unpack.flatten_decoded(out, 500),
                      np.dtype(np.int8)), frames)


def test_staged_inputs_match_legacy_paths():
    """stage_decode_inputs' pre-staged word grid + width planes must
    decode identically to the legacy 2-D inputs (in-jit pad/reshape),
    and flatten_decoded must invert the pair-packed output exactly."""
    import jax
    import jax.numpy as jnp

    from trpx_tpu.ops.coding import FrameSpec, walk_archive
    from trpx_tpu.ops.pallas_unpack import (
        choose_schedule,
        flatten_decoded,
        stage_decode_inputs,
    )

    rng = np.random.default_rng(33)
    n = 3000
    frames = rng.poisson(3.0, size=(4, n)).astype(np.uint16)
    frames[0, 5] = 60000
    arch = pycodec.encode(list(frames))
    spec = FrameSpec.for_dtype(n, np.uint16)
    widths, _p, words = walk_archive(arch, spec)
    sched = choose_schedule(spec, widths)

    legacy = jax.device_get(pallas_unpack.decode_batch_pallas(
        spec, jnp.asarray(words), jnp.asarray(widths.astype(np.uint8)),
        True, sched))
    w3, d3 = stage_decode_inputs(spec, words, widths)
    staged = jax.device_get(pallas_unpack.decode_batch_pallas(
        spec, jnp.asarray(w3), jnp.asarray(d3), True, sched))
    np.testing.assert_array_equal(np.asarray(legacy), np.asarray(staged))
    np.testing.assert_array_equal(
        flatten_decoded(staged, n).astype(np.uint16), frames)
