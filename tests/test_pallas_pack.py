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


def test_pair_packed_input_bit_identity():
    """stage_natural's PAIR route (u16 values as u32 words through half
    the transpose) must stay bit-identical to the value route and the
    normative codec, including partial tail blocks and hot pixels."""
    import jax

    from trpx_tpu.ops.coding import FrameSpec, assemble_archive
    from trpx_tpu.ops.pallas_pack import encode_batch_pallas, stage_natural

    rng = np.random.default_rng(21)
    for n in (5000, 12 * 4096, 12 * 4096 + 7):
        spec = FrameSpec.for_dtype(n, np.uint16, cap_ratio=0.5)
        fr = rng.poisson(3.0, size=(3, n)).astype(np.uint16)
        fr[0, 7] = 60000
        fr[-1, n - 1] = 41234
        padded = np.zeros((3, spec.n_staged), np.uint16)
        padded[:, :n] = fr
        x3 = stage_natural(spec, padded)
        assert x3.dtype == np.uint32          # pair route taken
        w, b, m, o = jax.device_get(encode_batch_pallas(spec, x3, True))
        arch = assemble_archive(spec, w, b, m)
        assert arch.payload == pycodec.encode(list(fr)).payload, f"n={n}"


def test_pair_and_value_routes_agree_signed_excluded():
    """Signed dtypes must take the VALUE route (pair packing is
    unsigned-only); staging them stays 3-D of the original dtype."""
    from trpx_tpu.ops.coding import FrameSpec
    from trpx_tpu.ops.pallas_pack import stage_natural

    spec = FrameSpec.for_dtype(5000, np.int16, cap_ratio=0.5)
    padded = np.zeros((2, spec.n_staged), np.int16)
    x3 = stage_natural(spec, padded)
    assert x3.dtype == np.int16 and x3.ndim == 3


def test_tiled_pair_packed_input_bit_identity():
    """Tiled encode with host-staged 4-D pair input == normative codec
    across tile boundaries (cross-tile repeat chain intact)."""
    import jax

    from trpx_tpu.ops import pallas_pack as pp
    from trpx_tpu.ops.coding import FrameSpec, assemble_archive

    tb_save = pp.TILE_BLOCKS
    pp.TILE_BLOCKS = 128
    try:
        rng = np.random.default_rng(22)
        nt = 128 * 12 * 3 + 100
        fr = rng.poisson(3.0, size=(2, nt)).astype(np.uint16)
        fr[0, 5] = 60000
        spec = FrameSpec.for_dtype(nt, np.uint16, cap_ratio=0.5)
        T = -(-spec.nb // pp.TILE_BLOCKS)
        padded = np.zeros((2, T * pp.TILE_BLOCKS * 12), np.uint16)
        padded[:, :nt] = fr
        x4 = padded.view(np.uint32).reshape(2, T, 128, 6)
        w, b, m, o = jax.device_get(
            pp.encode_batch_pallas_tiled(spec, x4, True))
        assert not np.any(np.asarray(o))
        arch = assemble_archive(spec, w, b, m)
        assert arch.payload == pycodec.encode(list(fr)).payload
    finally:
        pp.TILE_BLOCKS = tb_save


def test_quad_packed_u8_input_bit_identity():
    """u8 QUAD route (four values per u32 word — quarter transpose)
    must stay bit-identical to the normative codec."""
    import jax

    from trpx_tpu.ops.coding import FrameSpec, assemble_archive
    from trpx_tpu.ops.pallas_pack import encode_batch_pallas, stage_natural

    rng = np.random.default_rng(23)
    for n in (5000, 12 * 4096 + 5):
        spec = FrameSpec.for_dtype(n, np.uint8, cap_ratio=0.5)
        fr = rng.poisson(2.0, size=(3, n)).astype(np.uint8)
        fr[0, 7] = 255
        padded = np.zeros((3, spec.n_staged), np.uint8)
        padded[:, :n] = fr
        x3 = stage_natural(spec, padded)
        assert x3.dtype == np.uint32          # quad route taken
        w, b, m, o = jax.device_get(encode_batch_pallas(spec, x3, True))
        arch = assemble_archive(spec, w, b, m)
        assert arch.payload == pycodec.encode(list(fr)).payload, f"n={n}"
