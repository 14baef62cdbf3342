"""jpa::Terse-shaped adapter class (reference-API parity, Terse.hpp:228)."""

import io

import numpy as np
import pytest

from trpx_tpu import Terse
from trpx_tpu.format import pycodec


def test_doc_example_compression_rate():
    """The reference doc example: iota -500..499 compresses to ~0.29
    (Terse.hpp:130,144)."""
    data = np.arange(-500, 500, dtype=np.int32)
    t = Terse(data)
    assert t.number_of_frames == 1 and t.size == 1000
    assert t.is_signed
    rate = t.terse_size / data.nbytes
    assert abs(rate - 0.29) < 0.01
    np.testing.assert_array_equal(t.prolix(dtype=np.int32), data)


def test_push_back_write_read_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    frames = rng.poisson(3.0, size=(3, 32, 32)).astype(np.uint16)
    t = Terse()
    t.push_back(frames[0])          # single image
    t.push_back(frames[1:])         # stack append
    assert t.number_of_frames == 3
    assert t.dim() == (32, 32)
    buf = io.BytesIO()
    t.write(buf)
    # byte-identical to the normative encoder
    ref = pycodec.encode(
        list(frames.reshape(3, -1)), dimensions=(32, 32)
    ).to_bytes()
    assert buf.getvalue() == ref

    t2 = Terse.from_stream(buf.getvalue())
    assert t2.number_of_frames == 3 and t2.bits_per_val == t.bits_per_val
    for i in range(3):  # EVERY frame decodes (reference corrupts i >= 2)
        np.testing.assert_array_equal(t2.prolix(i), frames[i])


def test_validation():
    t = Terse(np.arange(10, dtype=np.uint16))
    with pytest.raises(ValueError):
        t.push_back(np.arange(11, dtype=np.uint16))  # size mismatch
    with pytest.raises(ValueError):
        t.push_back(np.arange(10, dtype=np.int16))   # signedness mismatch
    with pytest.raises(IndexError):
        t.prolix(5)
    with pytest.raises(ValueError):
        Terse().prolix()
    with pytest.raises(TypeError):
        Terse(np.array(["x"]))


def test_concat_archives_bit_identical():
    """Byte-concatenating per-stack archives == one whole-stack encode:
    frame streams are independent and byte-aligned (Terse.hpp:505,547)."""
    rng = np.random.default_rng(5)
    a = rng.poisson(3.0, (2, 300)).astype(np.uint16)
    b = rng.poisson(3.0, (3, 300)).astype(np.uint16)
    b[0, 7] = 60000  # prolix_bits must take the max over inputs
    cat = pycodec.concat_archives(pycodec.encode(list(a)),
                                  pycodec.encode(list(b)))
    whole = pycodec.encode(list(a) + list(b))
    assert cat.to_bytes() == whole.to_bytes()
    assert cat.frame_index is not None  # offsets survive concatenation
    assert list(cat.frame_index) == pycodec.frame_offsets(whole)


def test_concat_archives_validation():
    a = pycodec.encode(np.arange(24, dtype=np.uint16))
    with pytest.raises(ValueError):
        pycodec.concat_archives(a, pycodec.encode(np.arange(25, dtype=np.uint16)))
    with pytest.raises(ValueError):
        pycodec.concat_archives(a, pycodec.encode(np.arange(24, dtype=np.int16)))
    with pytest.raises(ValueError):
        pycodec.concat_archives(
            a, pycodec.encode(np.arange(24, dtype=np.uint16), block=6))
    with pytest.raises(ValueError):
        pycodec.concat_archives()


def test_push_back_after_from_stream():
    """Appending to a loaded Terse: no re-encode, bit-identical to a
    whole-stack encode; every frame (old and new) decodes correctly."""
    rng = np.random.default_rng(6)
    first = rng.poisson(3.0, (2, 24, 24)).astype(np.uint16)
    more = rng.poisson(3.0, (2, 24, 24)).astype(np.uint16)
    more[1, 3, 3] = 41000

    t = Terse(first)
    buf = io.BytesIO()
    t.write(buf)

    t2 = Terse.from_stream(buf.getvalue())
    t2.push_back(more)
    assert t2.number_of_frames == 4
    out = io.BytesIO()
    t2.write(out)
    allf = np.concatenate([first, more])
    ref = pycodec.encode(
        list(allf.reshape(4, -1)), dimensions=(24, 24)).to_bytes()
    assert out.getvalue() == ref
    for i in range(4):
        np.testing.assert_array_equal(t2.prolix(i), allf[i])
    # validation still applies against the loaded archive's geometry
    with pytest.raises(ValueError):
        t2.push_back(np.arange(7, dtype=np.uint16))
    with pytest.raises(ValueError):
        t2.push_back(first[0].reshape(-1).astype(np.int16))
