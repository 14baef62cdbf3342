"""TIFF container tests: round trips, validation, reference-binary interop.

The envelope under test mirrors Grey_tif.hpp (see trpx_tpu/io/tiff.py
docstring); interop tests drive the compiled reference CLIs end to end.
"""

import io
import shutil
import struct
import subprocess

import numpy as np
import pytest

from trpx_tpu.io import TiffError, read_tiff, write_tiff
from trpx_tpu.io.trpx import read_trpx, write_trpx
from trpx_tpu.format import pycodec

DTYPES = [
    np.uint8, np.uint16, np.uint32, np.uint64,
    np.int8, np.int16, np.int32, np.int64,
    np.float32, np.float64,
]


def _rand(dtype, shape, rng):
    dtype = np.dtype(dtype)
    if dtype.kind == "f":
        return rng.standard_normal(shape).astype(dtype) * 100
    info = np.iinfo(dtype)
    return rng.integers(info.min, info.max, size=shape, dtype=dtype)


@pytest.mark.parametrize("dtype", DTYPES)
def test_roundtrip_single(dtype):
    rng = np.random.default_rng(0)
    img = _rand(dtype, (17, 23), rng)
    stack = read_tiff(write_tiff(img))
    assert len(stack) == 1
    assert stack[0].dtype == img.dtype
    np.testing.assert_array_equal(stack[0], img)


def test_roundtrip_stack_and_dims():
    rng = np.random.default_rng(1)
    imgs = [_rand(np.uint16, (32, 48), rng) for _ in range(5)]
    stack = read_tiff(write_tiff(imgs))
    assert len(stack) == 5
    assert stack.dims == (48, 32)  # (width, height)
    assert stack.uniform()
    np.testing.assert_array_equal(stack.as_array(), np.stack(imgs))


def test_roundtrip_3d_array_and_file(tmp_path):
    rng = np.random.default_rng(2)
    arr = _rand(np.int16, (3, 8, 8), rng)
    p = tmp_path / "x.tif"
    write_tiff(arr, p)
    stack = read_tiff(p)
    np.testing.assert_array_equal(stack.as_array(), arr)
    # file-object read
    with open(p, "rb") as f:
        stack2 = read_tiff(f)
    np.testing.assert_array_equal(stack2.as_array(), arr)


def test_big_endian_read():
    """MM files are byte-swapped to native on read (Grey_tif.hpp:679-697)."""
    img = np.arange(12, dtype=np.uint16).reshape(3, 4)
    # hand-build a big-endian TIFF: header, pixels, one IFD
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
    stack = read_tiff(bytes(out))
    assert stack[0].dtype == np.uint16
    assert stack[0].dtype.byteorder in ("=", "|", "<" if np.little_endian else ">")
    np.testing.assert_array_equal(stack[0], img)


def test_rejects_bad_files():
    img = np.zeros((4, 4), dtype=np.uint16)
    good = bytearray(write_tiff(img))
    with pytest.raises(TiffError):
        read_tiff(b"nottiff!")
    with pytest.raises(TiffError):
        read_tiff(b"II\x2b\x00\x00\x00\x00\x00")  # magic 43 (BigTIFF)
    # corrupt compression tag (tag 0x0103 value -> 5)
    bad = bytes(good).replace(
        struct.pack("<HHIHH", 0x0103, 3, 1, 1, 0),
        struct.pack("<HHIHH", 0x0103, 3, 1, 5, 0),
    )
    with pytest.raises(TiffError, match="compressed"):
        read_tiff(bad)
    with pytest.raises(TiffError):
        write_tiff(np.zeros((4, 4), dtype=np.complex64))
    with pytest.raises(TiffError):
        write_tiff([])


def test_trpx_file_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    frames = rng.poisson(3.0, size=(4, 24, 24)).astype(np.uint16)
    arch = pycodec.encode(frames)
    p = tmp_path / "a.trpx"
    write_trpx(arch, p)
    arch2 = read_trpx(p)
    assert arch2.meta == arch.meta
    assert arch2.payload == arch.payload
    dec = pycodec.decode(arch2, np.uint16).reshape(frames.shape)
    np.testing.assert_array_equal(dec, frames)
    # buffer + file-object paths
    buf = io.BytesIO()
    write_trpx(arch, buf)
    assert read_trpx(buf.getvalue()).payload == arch.payload


# ------------------------------------------------------ reference interop ---


def test_reference_terse_reads_our_tiff(tmp_path, reference_cli):
    """Our TIFF -> reference `terse` -> .trpx our decoder can read."""
    rng = np.random.default_rng(4)
    img = rng.poisson(3.0, size=(64, 64)).astype(np.uint16)
    img[rng.integers(0, 64, 20), rng.integers(0, 64, 20)] = 40000
    p = tmp_path / "in.tif"
    write_tiff(img, p)
    subprocess.run([str(reference_cli["terse"]), str(p)], check=True,
                   capture_output=True, cwd=tmp_path)
    arch = read_trpx(tmp_path / "in.trpx")
    assert arch.meta.dimensions == (64, 64)
    dec = pycodec.decode(arch, np.uint16).reshape(64, 64)
    np.testing.assert_array_equal(dec, img)
    # and our encoder produces the identical archive bytes
    ours = pycodec.encode(img, dimensions=arch.meta.dimensions)
    assert ours.to_bytes() == arch.to_bytes()


def test_reference_prolix_tiff_read_by_us(tmp_path, reference_cli):
    """Our .trpx -> reference `prolix` -> TIFF we can parse, pixels equal."""
    rng = np.random.default_rng(5)
    img = rng.poisson(3.0, size=(48, 48)).astype(np.uint16)
    arch = pycodec.encode(img)
    p = tmp_path / "f.trpx"
    write_trpx(arch, p)
    subprocess.run([str(reference_cli["prolix"]), str(p)], check=True,
                   capture_output=True, cwd=tmp_path)
    stack = read_tiff(tmp_path / "f.tif")
    np.testing.assert_array_equal(stack[0], img)


def test_reference_roundtrip_multiframe_stack(tmp_path, reference_cli):
    """Uniform 3-frame stack: our TIFF -> reference terse -> our decode.

    The reference *decoder* corrupts frames >= 2 (SURVEY B2); ours must not.
    """
    rng = np.random.default_rng(6)
    frames = rng.poisson(3.0, size=(3, 24, 24)).astype(np.uint16)
    p = tmp_path / "stack.tif"
    write_tiff(frames, p)
    subprocess.run([str(reference_cli["terse"]), str(p)], check=True,
                   capture_output=True, cwd=tmp_path)
    arch = read_trpx(tmp_path / "stack.trpx")
    assert arch.meta.number_of_frames == 3
    dec = pycodec.decode(arch, np.uint16).reshape(frames.shape)
    np.testing.assert_array_equal(dec, frames)


def test_regularize_mixed_dtype_stack():
    """Grey_tif<T>::f_regularize parity (Grey_tif.hpp:627-673)."""
    from trpx_tpu.io.tiff import TiffStack

    a = np.arange(12, dtype=np.uint8).reshape(3, 4)
    b = (np.arange(12, dtype=np.uint16) * 100).reshape(3, 4)
    st = TiffStack(images=[a, b])
    assert not st.uniform()
    st.regularize()  # lossless promotion -> uint16
    assert st.uniform() and st[0].dtype == np.uint16
    np.testing.assert_array_equal(st[0], a.astype(np.uint16))
    np.testing.assert_array_equal(st[1], b)

    # same-size integral conversion REINTERPRETS bit patterns (:636-651)
    c = np.array([[-1, 2]], dtype=np.int16)
    st2 = TiffStack(images=[c.copy()]).regularize(np.uint16)
    assert st2[0].dtype == np.uint16 and st2[0][0, 0] == 0xFFFF

    # float -> int truncates through the integer lane (:645-650)
    f = np.array([[3.7, -2.9]], dtype=np.float32)
    st3 = TiffStack(images=[f]).regularize(np.int32)
    np.testing.assert_array_equal(st3[0], np.array([[3, -2]], np.int32))


def test_cli_encodes_mixed_dtype_stack(tmp_path):
    """A shape-uniform, dtype-mixed TIFF encodes via regularization."""
    from trpx_tpu.cli.main import terse_main
    from trpx_tpu.io.tiff import write_tiff
    from trpx_tpu.io.trpx import read_trpx
    from trpx_tpu import api

    a = np.arange(64, dtype=np.uint8).reshape(8, 8)
    b = (np.arange(64, dtype=np.uint16) * 7).reshape(8, 8)
    src = tmp_path / "mix.tif"
    with open(src, "wb") as fh:
        write_tiff([a, b], fh)
    assert terse_main([str(src), "--host"]) == 0
    arch = read_trpx(src.with_suffix(".trpx"))
    out = api.decompress(arch, device=False)
    np.testing.assert_array_equal(out[0], a.astype(np.uint16).reshape(8, 8))
    np.testing.assert_array_equal(out[1], b)


# ---------------------------------------------------------------------------
# BigTIFF (magic 43, 64-bit offsets) — framework extension past the
# reference's classic-TIFF envelope (Grey_tif.hpp uses uint32 offsets
# throughout, sharing the 4 GiB cap)
# ---------------------------------------------------------------------------


def test_bigtiff_roundtrip_and_writer_identity(tmp_path):
    from trpx_tpu.io.tiff import TiffStream, TiffWriter

    rng = np.random.default_rng(7)
    imgs = [_rand(np.uint16, (9, 13), rng), _rand(np.uint16, (9, 13), rng),
            _rand(np.int32, (9, 13), rng)]
    data = write_tiff(imgs, bigtiff=True)
    assert data[:4] == b"II\x2b\x00"  # magic 43
    assert struct.unpack("<HQ", data[4:14])[0] == 8  # 8-byte offsets
    stack = read_tiff(data)
    assert len(stack) == 3
    for got, want in zip(stack, imgs):
        np.testing.assert_array_equal(got, want)

    # incremental writer produces byte-identical BigTIFF
    buf = io.BytesIO()
    with TiffWriter(buf, bigtiff=True) as w:
        for im in imgs:
            w.append(im)
    assert buf.getvalue() == data

    # streaming reader parses the same file
    p = tmp_path / "big.tif"
    p.write_bytes(data)
    ts = TiffStream(p)
    assert len(ts) == 3
    np.testing.assert_array_equal(ts.read(1, 2)[0], imgs[1])
    ts.close()


def test_bigtiff_auto_keeps_small_files_classic():
    img = np.arange(64, dtype=np.uint16).reshape(8, 8)
    auto = write_tiff(img)                      # default bigtiff="auto"
    classic = write_tiff(img, bigtiff=False)
    assert auto == classic and auto[2:4] == b"\x2a\x00"  # magic 42


def test_bigtiff_rejects_bad_headers():
    with pytest.raises(TiffError, match="truncated BigTIFF"):
        read_tiff(b"II\x2b\x00\x00\x00\x00\x00")
    # offset size must be 8
    bad = b"II" + struct.pack("<HHHQ", 43, 4, 0, 16) + b"\x00" * 8
    with pytest.raises(TiffError, match="offset size"):
        read_tiff(bad)


def test_bigtiff_pixels_beyond_4gib_sparse(tmp_path):
    """64-bit offsets for real: a sparse file places pixels past 4 GiB;
    both readers must address them correctly (classic u32 offsets cannot
    represent this file at all)."""
    from trpx_tpu.io.tiff import TiffStream, _ifd_entry_big

    img = np.arange(32, dtype=np.uint16).reshape(4, 8)
    data_at = (1 << 32) + 4096          # past the classic cap
    p = tmp_path / "sparse_big.tif"
    with open(p, "wb") as f:
        ifd_at = data_at + img.nbytes
        f.write(b"II" + struct.pack("<HHHQ", 43, 8, 0, ifd_at))
        f.seek(data_at)
        f.write(img.astype("<u2").tobytes())
        entries = [
            _ifd_entry_big(0x0100, 3, 8),
            _ifd_entry_big(0x0101, 3, 4),
            _ifd_entry_big(0x0102, 3, 16),
            _ifd_entry_big(0x0103, 3, 1),
            _ifd_entry_big(0x0106, 3, 1),
            _ifd_entry_big(0x0111, 16, data_at),
            _ifd_entry_big(0x0117, 16, img.nbytes),
            _ifd_entry_big(0x0153, 3, 1),
        ]
        f.write(struct.pack("<Q", len(entries)))
        for e in entries:
            f.write(e)
        f.write(struct.pack("<Q", 0))
    ts = TiffStream(p)                   # memory-mapped: sparse-friendly
    assert ts.infos[0].offset == data_at
    np.testing.assert_array_equal(ts.read(0, 1)[0], img)
    ts.close()
