"""Pallas encode kernel: interpret-mode parity with the normative codec.

On CPU the kernel runs in the Pallas interpreter (bit semantics only);
real-TPU compilation/parity is exercised by tools/ probes and bench.py.
"""

import numpy as np
import pytest

from trpx_tpu.format import pycodec
from trpx_tpu.ops import pallas_pack

CASES = [
    (100, np.uint16),
    (5000, np.uint16),
    (50, np.uint8),
    (2000, np.int16),
    (64, np.int32),
    (777, np.uint32),
    (3000, np.int32),
    # S == 1 at the phase-2 transition (C == 128): the cyclic lifts'
    # sublane-carry roll degenerates to an effective-zero shift, which
    # interpret tolerates but Mosaic rejected on hardware (round-4
    # campaign trial 0; fixed with the S > 1 guard in _roll3_*). Kept
    # here for semantic coverage — the hardware lowering itself is only
    # exercised by tools/differential_campaign.py --device.
    (4095, np.uint32),
]


@pytest.mark.parametrize("n,dtype", CASES)
def test_interpret_bit_identical(n, dtype):
    rng = np.random.default_rng(n)
    if np.dtype(dtype).kind == "i":
        frames = rng.integers(-300, 300, size=(3, n)).astype(dtype)
        frames[0, 0] = np.iinfo(dtype).min  # widest field incl. sign
    else:
        frames = rng.poisson(3.0, size=(3, n)).astype(dtype)
        frames[0, 0] = np.iinfo(dtype).max
    arch = pallas_pack.encode(frames, interpret=True)
    ref = pycodec.encode(list(frames))
    assert arch.to_bytes() == ref.to_bytes()


def test_interpret_overflow_fallback():
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 65536, size=(2, 480), dtype=np.uint16)
    arch = pallas_pack.encode(frames, cap_ratio=0.25, interpret=True)
    assert arch.to_bytes() == pycodec.encode(list(frames)).to_bytes()


def test_interpret_hot_pixels_and_partial_block():
    rng = np.random.default_rng(1)
    frames = rng.poisson(3.0, size=(4, 1000)).astype(np.uint16)  # 1000%12!=0
    frames[rng.integers(0, 4, 10), rng.integers(0, 1000, 10)] = 65535
    arch = pallas_pack.encode(frames, interpret=True)
    assert arch.to_bytes() == pycodec.encode(list(frames)).to_bytes()
