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
