"""Property tests against the compiled *reference* implementation.

The reference encoder is the oracle: our encoder must produce bit-identical
``.trpx`` streams within the reference's verified-correct envelope
(SURVEY.md B5/B6): uint8/uint16 fully; uint32 < 2**31; uint64 < 2**32;
signed types with max|v| <= 2**(bits-2); int64 below 2**31.

The reference *decoder* is only trusted for frames 0 and 1 of block-aligned
streams (bugs B1/B2), so decode conformance is restricted accordingly.
"""

import subprocess

import numpy as np
import pytest

from trpx_tpu.format import decode_frame, encode, TrpxArchive

RNG = np.random.default_rng(1234)

# (dtype tag, numpy dtype, safe low, safe high) — within the verified envelope
ENVELOPE = [
    ("u8", np.uint8, 0, 2**8),
    ("u16", np.uint16, 0, 2**16),
    ("u32", np.uint32, 0, 2**31),
    ("u64", np.uint64, 0, 2**32),
    ("i8", np.int8, -(2**6) + 1, 2**6),
    ("i16", np.int16, -(2**14) + 1, 2**14),
    ("i32", np.int32, -(2**30) + 1, 2**30),
    ("i64", np.int64, -(2**30) + 1, 2**31),
]


def ref_reserve_bytes(size: int, block: int, itemsize: int) -> int:
    """The reference's worst-case output reservation (Terse.hpp:503).

    Bug B7 (found during conformance testing, not in SURVEY.md): this
    under-reserves for frames whose 12-bit partial-block headers and terminal
    byte exceed the amortized ``12/(block*8)`` bytes/value — e.g. a single
    uint16 value needs 4 bytes but only 3 are reserved — causing an
    out-of-bounds write in the reference. Oracle byte-comparisons are
    restricted to the bytes the reference wrote in bounds.
    """
    import math

    return math.ceil(size * (itemsize + 12.0 / (block * 8)))


def ref_encode(oracle, arr_frames: np.ndarray, tag: str, block: int,
               dims=()) -> bytes:
    nframes, size = arr_frames.shape
    cmd = [str(oracle["encode_shim"]), tag, str(block), str(nframes), str(size)]
    cmd += [str(d) for d in dims]
    res = subprocess.run(cmd, input=arr_frames.tobytes(), capture_output=True)
    assert res.returncode == 0, res.stderr.decode()
    return res.stdout


def ref_decode(oracle, trpx_bytes: bytes, tag: str, frame: int,
               dtype, nvalues: int, tmp_path) -> np.ndarray:
    p = tmp_path / "t.trpx"
    p.write_bytes(trpx_bytes)
    res = subprocess.run(
        [str(oracle["decode_shim"]), tag, str(frame), str(p)],
        capture_output=True)
    assert res.returncode == 0, res.stderr.decode()
    return np.frombuffer(res.stdout, dtype=dtype)[:nvalues]


@pytest.mark.parametrize("tag,dtype,lo,hi", ENVELOPE, ids=[e[0] for e in ENVELOPE])
@pytest.mark.parametrize("size", [1, 5, 12, 16, 24, 1000])
def test_encoder_bit_identical(oracle, tag, dtype, lo, hi, size):
    arr = RNG.integers(lo, hi, size=(1, size)).astype(dtype)
    # sprinkle zero runs to exercise repeat/zero-width headers
    arr[0, : size // 3] = 0
    arc = encode(arr[0], block=12)
    ours = arc.to_bytes()
    ref = ref_encode(oracle, arr, tag, 12)
    reserve = ref_reserve_bytes(size, 12, arr.dtype.itemsize)
    if arc.meta.memory_size > reserve:
        # reference bug B7: it overflowed its own buffer; its bytes past the
        # reservation are UB. Compare the in-bounds prefix only.
        hdr_len = len(ours) - arc.meta.memory_size
        assert ours[: hdr_len + reserve] == ref[: hdr_len + reserve]
    else:
        assert ours == ref


@pytest.mark.parametrize("tag,dtype,lo,hi",
                         [ENVELOPE[1], ENVELOPE[6]], ids=["u16", "i32"])
@pytest.mark.parametrize("block", [1, 3, 7, 12, 32, 100])
def test_encoder_bit_identical_blocks(oracle, tag, dtype, lo, hi, block):
    arr = RNG.integers(lo, hi, size=(1, 500)).astype(dtype)
    arr[0, ::7] = 0
    ours = encode(arr[0], block=block).to_bytes()
    ref = ref_encode(oracle, arr, tag, block)
    assert ours == ref


@pytest.mark.parametrize("tag,dtype", [("u16", np.uint16), ("i16", np.int16)])
def test_encoder_multiframe_bit_identical(oracle, tag, dtype):
    lo, hi = (0, 4096) if tag == "u16" else (-2048, 2048)
    arr = RNG.integers(lo, hi, size=(5, 100)).astype(dtype)
    ours = encode(list(arr), block=12).to_bytes()
    ref = ref_encode(oracle, arr, tag, 12)
    assert ours == ref


def test_encoder_dimensions_attribute(oracle):
    arr = RNG.integers(0, 100, size=(1, 64)).astype(np.uint16)
    ours = encode(arr[0].reshape(8, 8)).to_bytes()
    ref = ref_encode(oracle, arr, "u16", 12, dims=(8, 8))
    assert ours == ref


def test_encoder_poisson_diffraction_frame(oracle):
    """The BASELINE workload shape: Poisson background + hot pixels."""
    frame = RNG.poisson(3.0, size=128 * 128).astype(np.uint16)
    hot = RNG.integers(0, frame.size, size=50)
    frame[hot] = RNG.integers(1000, 65536, size=50).astype(np.uint16)
    ours = encode(frame, block=12).to_bytes()
    ref = ref_encode(oracle, frame[None], "u16", 12)
    assert ours == ref
    # compression should be well below 1
    assert len(ours) < frame.nbytes * 0.5


# u64 excluded: the reference decoder itself corrupts >=32-bit-wide fields
# into 64-bit targets (uint8 bit buffer shifted by >= 32 in get_range,
# Bit_pointer.hpp:774-780 — UB; verified empirically). Our decoder handles
# them; oracle comparison is meaningless there.
_DECODE_ENVELOPE = [e for e in ENVELOPE[:6] if e[0] != "u64"]


@pytest.mark.parametrize("tag,dtype,lo,hi", _DECODE_ENVELOPE,
                         ids=[e[0] for e in _DECODE_ENVELOPE])
def test_decode_conformance_frame0(oracle, tmp_path, tag, dtype, lo, hi):
    """Our encoder's output must decode identically through the *reference*
    decoder (frame 0 is trustworthy)."""
    arr = RNG.integers(lo, hi, size=(1, 999)).astype(dtype)
    ours = encode(arr[0], block=12)
    got = ref_decode(oracle, ours.to_bytes(), tag, 0, dtype, 999, tmp_path)
    np.testing.assert_array_equal(got, arr[0])


def test_decode_conformance_frame1_aligned(oracle, tmp_path):
    """Frame 1 of a block-aligned stream is also trustworthy (B1 avoided)."""
    arr = RNG.integers(0, 3000, size=(2, 240)).astype(np.uint16)
    ours = encode(list(arr), block=12)
    got = ref_decode(oracle, ours.to_bytes(), "u16", 1, np.uint16, 240, tmp_path)
    np.testing.assert_array_equal(got, arr[1])


def test_our_decoder_fixes_b2_deep_frames(oracle):
    """Reference-encoded 3-frame stacks decode correctly with OUR decoder for
    all frames (the reference's own decoder corrupts frame 2 — bug B2)."""
    arr = RNG.integers(0, 500, size=(4, 64)).astype(np.uint16)
    ref_bytes = ref_encode(oracle, arr, "u16", 12)
    arc = TrpxArchive.from_bytes(ref_bytes)
    for f in range(4):
        np.testing.assert_array_equal(decode_frame(arc, f, np.uint16), arr[f])
