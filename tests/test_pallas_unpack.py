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
