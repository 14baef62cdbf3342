"""Memory-mapped TIFF streaming + CLI --stream mode."""

import numpy as np

from trpx_tpu.cli.main import terse_main
from trpx_tpu.format import pycodec
from trpx_tpu.io import TiffStream, read_tiff, write_tiff
from trpx_tpu.io.trpx import read_trpx


def test_tiff_stream_matches_eager(tmp_path):
    rng = np.random.default_rng(0)
    frames = rng.poisson(3.0, size=(37, 24, 16)).astype(np.uint16)
    p = tmp_path / "m.tif"
    write_tiff(frames, p)
    ts = TiffStream(p)
    assert len(ts) == 37
    assert ts.dims == (16, 24)
    assert ts.uniform()
    np.testing.assert_array_equal(ts.read(0, 37), frames)
    got = np.concatenate(list(ts.iter_chunks(chunk_frames=10)))
    np.testing.assert_array_equal(got, frames)
    # matches the eager reader
    np.testing.assert_array_equal(read_tiff(p).as_array(), frames)
    ts.close()


def test_cli_stream_mode(tmp_path):
    rng = np.random.default_rng(1)
    frames = rng.poisson(3.0, size=(25, 16, 16)).astype(np.uint16)
    src = tmp_path / "movie.tif"
    write_tiff(frames, src)
    assert terse_main([str(src), "--stream", "--chunk-frames", "7"]) == 0
    arch = read_trpx(tmp_path / "movie.trpx")
    assert arch.meta.number_of_frames == 25
    ref = pycodec.encode(list(frames.reshape(25, -1)), dimensions=(16, 16))
    assert arch.to_bytes() == ref.to_bytes()


def test_stream_big_endian_fallback(tmp_path):
    """A big-endian (MM) file must route around the native memcpy
    gather (memcpy would preserve foreign byte order) and come back
    value-correct through the numpy conversion fallback."""
    import struct

    img = np.arange(12, dtype=np.uint16).reshape(3, 4)
    out = bytearray(b"MM" + struct.pack(">HI", 42, 0))
    data_start = len(out)
    out += img.astype(">u2").tobytes()
    ifd_at = len(out)
    struct.pack_into(">I", out, 4, ifd_at)
    entries = [
        (0x0100, 3, 4), (0x0101, 3, 3), (0x0102, 3, 16),
        (0x0103, 3, 1), (0x0106, 3, 1), (0x0111, 4, data_start),
        (0x0153, 3, 1),
    ]
    out += struct.pack(">H", len(entries))
    for tag, t, v in entries:
        if t == 3:
            out += struct.pack(">HHIHH", tag, t, 1, v, 0)
        else:
            out += struct.pack(">HHII", tag, t, 1, v)
    out += struct.pack(">I", 0)
    p = tmp_path / "be.tif"
    p.write_bytes(bytes(out))
    ts = TiffStream(p)
    got = ts.read(0, 1)
    assert got.dtype.byteorder in ("=", "|", "<" if np.little_endian else ">")
    np.testing.assert_array_equal(got[0], img)
    ts.close()
