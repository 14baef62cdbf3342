"""Golden-vector conformance tests for the normative format layer.

Vectors were captured byte-for-byte from the compiled reference encoder
(SURVEY.md Appendix A); each pins a distinct header form / edge rule.
"""

import numpy as np
import pytest

from trpx_tpu.format import (
    TrpxArchive,
    decode,
    emit_header,
    encode,
    parse_header,
)

GOLDEN = [
    # (name, values, dtype, block, expected_header_attrs, payload_hex)
    (
        "u16_one_full_block_w3",
        [3, 4, 2] * 4, np.uint16, 12,
        dict(prolix_bits=3, signed=0, block=12, memory_size=6,
             number_of_values=12, number_of_frames=1),
        "36 6a d4 a8 51 00",
    ),
    (
        "i16_signed_block3_w4",
        [-3, 4, 2], np.int16, 3,
        dict(prolix_bits=4, signed=1, block=3, memory_size=3,
             number_of_values=3, number_of_frames=1),
        "d8 24 00",
    ),
    (
        "u16_all_zero_two_blocks",
        [0] * 24, np.uint16, 12,
        dict(prolix_bits=0, signed=0, block=12, memory_size=1,
             number_of_values=24, number_of_frames=1),
        "03",
    ),
    (
        "u16_all_zero_partial_second_block",
        [0] * 16, np.uint16, 12,
        dict(prolix_bits=0, signed=0, block=12, memory_size=1,
             number_of_values=16, number_of_frames=1),
        "03",
    ),
    (
        "u16_const5_repeat_header",
        [5] * 24, np.uint16, 12,
        dict(prolix_bits=3, memory_size=10, number_of_values=24),
        "d6 b6 6d db b6 db b6 6d db 16",
    ),
    (
        "u16_max_width16",
        [0xFFFF] * 12, np.uint16, 12,
        dict(prolix_bits=16, memory_size=26),
        "be f1 " + "ff " * 23 + "0f",
    ),
    (
        "u16_width10_12bit_header",
        [512] * 12, np.uint16, 12,
        dict(prolix_bits=10, memory_size=17),
        "3e 00 20 80 00 02 08 20 80 00 02 08 20 80 00 02 08",
    ),
    (
        "u16_zero_block_then_w7_partial",
        [0] * 12 + [127, 127, 127], np.uint16, 12,
        dict(prolix_bits=7, memory_size=4, number_of_values=15),
        "9d ff ff 0f",
    ),
    (
        "u8_single_partial_block",
        [1, 2, 3, 4, 5], np.uint8, 12,
        dict(prolix_bits=3, memory_size=3, number_of_values=5),
        "16 8d 05",
    ),
    (
        "i32_width21_signed",
        [-1000000 + i for i in range(12)], np.int32, 12,
        dict(prolix_bits=21, signed=1, memory_size=34),
        "fe 02 dc 0b 83 7b a1 70 2f 1c ee 85 c4 bd b0 b8 17 1a f7 c2 e3 5e 88 "
        "dc 0b 93 7b a1 72 2f 5c ee 85 00",
    ),
]


@pytest.mark.parametrize("name,vals,dtype,block,attrs,payload_hex",
                         GOLDEN, ids=[g[0] for g in GOLDEN])
def test_golden_encode(name, vals, dtype, block, attrs, payload_hex):
    arr = np.array(vals, dtype=dtype)
    arc = encode(arr, block=block)
    expected_payload = bytes.fromhex(payload_hex.replace(" ", ""))
    assert arc.payload == expected_payload
    meta = arc.meta
    for k, v in attrs.items():
        got = getattr(meta, k)
        assert int(got) == v, f"{name}: meta.{k}={got} != {v}"


@pytest.mark.parametrize("name,vals,dtype,block,attrs,payload_hex",
                         GOLDEN, ids=[g[0] for g in GOLDEN])
def test_golden_roundtrip(name, vals, dtype, block, attrs, payload_hex):
    arr = np.array(vals, dtype=dtype)
    arc = encode(arr, block=block)
    # through bytes and back
    arc2 = TrpxArchive.from_bytes(arc.to_bytes())
    assert arc2.meta == arc.meta
    out = decode(arc2, dtype)
    np.testing.assert_array_equal(out[0], arr)


def test_exact_header_bytes():
    arr = np.array([3, 4, 2] * 4, dtype=np.uint16)
    arc = encode(arr)
    assert arc.to_bytes().startswith(
        b'<Terse prolix_bits="3" signed="0" block="12" memory_size="6" '
        b'number_of_values="12" number_of_frames="1"/>'
    )


def test_header_with_dimensions():
    arr = np.arange(12, dtype=np.uint16).reshape(3, 4)
    arc = encode(arr)
    hdr = emit_header(arc.meta)
    assert b'dimensions="4 3"' in hdr
    meta, off = parse_header(hdr + arc.payload)
    assert meta == arc.meta
    assert off == len(hdr)


def test_parse_skips_comments_and_cdata():
    arr = np.array([1, 2, 3], dtype=np.uint16)
    arc = encode(arr)
    noisy = b"<!-- <Terse fake='1'/> --><![CDATA[<Terse/>]]>" + arc.to_bytes()
    meta, off = parse_header(noisy)
    assert meta == arc.meta
    assert noisy[off : off + meta.memory_size] == arc.payload


def test_multiframe_offsets_and_roundtrip():
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 1000, size=(3, 16), dtype=np.uint16)  # partial blocks
    arc = encode(list(frames))  # list of 1-D frames -> 3-frame stack
    assert arc.meta.number_of_frames == 3
    out = decode(arc, np.uint16)
    np.testing.assert_array_equal(out, frames.reshape(3, -1))


def test_aligned_frame_gains_terminal_byte():
    # 40 payload+header bits -> exactly 5 bytes -> stored as 6 (Terse.hpp:547)
    arr = np.array([3, 4, 2] * 4, dtype=np.uint16)
    arc = encode(arr)
    assert arc.meta.memory_size == 6
    assert arc.payload[-1] == 0


def test_decode_clamp_and_sign_extension_semantics():
    # B4: unsigned stream, signed narrow target -> two's complement reinterpret
    arr = np.array([5, 127] + [0] * 10, dtype=np.uint16)
    arc = encode(np.array([5] * 12, dtype=np.uint16), block=12)  # width 3
    out = decode(arc, np.int64)
    # width 3, value 5 = 0b101 -> sign-extended to -3
    assert out[0][0] == -3
    # clamping: width wider than target
    wide = encode(np.array([300] * 12, dtype=np.uint16))  # width 9
    out8 = decode(wide, np.uint8)
    assert out8[0][0] == 255  # clamped to uint8 max
