"""StreamingEncoder backend="host": native-codec chunks, no JAX at all.

`terse --stream --host` must not initialize any accelerator runtime
(on a box whose device plugin points at an unreachable backend, device
init hangs); the host backend encodes chunks with the native C++ codec
and must produce archives byte-identical to every other path.
"""

import numpy as np
import pytest

from trpx_tpu.format import pycodec
from trpx_tpu.io.trpx import read_trpx
from trpx_tpu.runtime.stream import StreamingEncoder


def test_host_backend_byte_identical(tmp_path):
    rng = np.random.default_rng(6)
    stack = rng.poisson(3.0, size=(10, 1000)).astype(np.uint16)
    stack[3, 7] = 65535
    dst = tmp_path / "h.trpx"
    enc = StreamingEncoder(dst, nvalues=1000, dtype=np.uint16,
                           backend="host")
    for lo in range(0, 10, 3):
        enc.add_frames(stack[lo:lo + 3])
    enc.finalize(verify=True, index=True)
    arch = read_trpx(dst)
    assert arch.to_bytes() == pycodec.encode(list(stack)).to_bytes()
    out = pycodec.decode(arch, np.uint16)
    np.testing.assert_array_equal(out, stack)


def test_host_backend_resume(tmp_path):
    rng = np.random.default_rng(7)
    stack = rng.poisson(3.0, size=(9, 500)).astype(np.uint16)
    dst = tmp_path / "r.trpx"
    enc = StreamingEncoder(dst, nvalues=500, dtype=np.uint16,
                           backend="host")
    enc.add_frames(stack[:3])
    enc.flush()
    del enc  # simulate a crash after one checkpointed chunk
    enc2 = StreamingEncoder(dst, nvalues=500, dtype=np.uint16,
                            backend="host")
    assert enc2.frames_done == 3
    enc2.add_frames(stack[3:])
    enc2.finalize(verify=True)
    arch = read_trpx(dst)
    assert arch.to_bytes() == pycodec.encode(list(stack)).to_bytes()


def test_cli_stream_host(tmp_path):
    from trpx_tpu.cli.main import terse_main
    from trpx_tpu.io import write_tiff

    rng = np.random.default_rng(8)
    stack = rng.poisson(3.0, size=(7, 48, 48)).astype(np.uint16)
    src = tmp_path / "m.tif"
    write_tiff(stack, src)
    assert terse_main([str(src), "--stream", "--host",
                       "--chunk-frames", "3"]) == 0
    arch = read_trpx(tmp_path / "m.trpx")
    assert arch.payload == pycodec.encode(
        list(stack.reshape(7, -1))).payload


def test_bad_backend_rejected(tmp_path):
    with pytest.raises(ValueError, match="backend"):
        StreamingEncoder(tmp_path / "x.trpx", nvalues=10,
                         dtype=np.uint16, backend="gpu")


def test_tiff_writer_byte_identical():
    """Incremental TiffWriter output equals write_tiff of the stack."""
    import io

    from trpx_tpu.io import write_tiff
    from trpx_tpu.io.tiff import TiffWriter

    rng = np.random.default_rng(12)
    stack = rng.poisson(3.0, size=(7, 33, 41)).astype(np.uint16)
    whole = write_tiff(stack)
    buf = io.BytesIO()
    with TiffWriter(buf) as w:
        w.append(stack[:3])
        w.append(stack[3])
        w.append(stack[4:])
    assert buf.getvalue() == whole


def test_cli_stream_decode(tmp_path):
    from trpx_tpu.cli.main import prolix_main, terse_main
    from trpx_tpu.io import read_tiff, write_tiff

    rng = np.random.default_rng(13)
    stack = rng.poisson(3.0, size=(9, 40, 40)).astype(np.uint16)
    write_tiff(stack, tmp_path / "m.tif")
    assert terse_main([str(tmp_path / "m.tif"), "--host"]) == 0
    out = tmp_path / "o"
    assert prolix_main([str(tmp_path / "m.trpx"), "--host", "--stream",
                        "--chunk-frames", "4", "--out-dir", str(out)]) == 0
    back = read_tiff(out / "m.tif")
    arrs = (np.stack([np.asarray(i) for i in back])
            if isinstance(back, list) else np.asarray(back))
    np.testing.assert_array_equal(arrs.reshape(stack.shape), stack)
    # streamed + frame-range selection compose
    assert prolix_main([str(tmp_path / "m.trpx"), "--host", "--stream",
                        "--frames", "2:7", "--chunk-frames", "2",
                        "--out-dir", str(tmp_path / "o2")]) == 0
    back = read_tiff(tmp_path / "o2" / "m.tif")
    arrs = (np.stack([np.asarray(i) for i in back])
            if isinstance(back, list) else np.asarray(back))
    np.testing.assert_array_equal(arrs.reshape(5, 40, 40), stack[2:7])


def test_cli_stream_index_writes_sidecar(tmp_path):
    """--stream --index must write the v2 sidecar (it used to vanish:
    the streaming path never forwarded the flag to finalize)."""
    from trpx_tpu.cli.main import terse_main
    from trpx_tpu.io import write_tiff
    from trpx_tpu.io.trpx import read_trpx

    rng = np.random.default_rng(21)
    stack = rng.poisson(3.0, size=(7, 24, 24)).astype(np.uint16)
    write_tiff(stack, tmp_path / "s.tif")
    assert terse_main([str(tmp_path / "s.tif"), "--host", "--stream",
                       "--index", "--chunk-frames", "3"]) == 0
    assert (tmp_path / "s.trpx.idx").exists()
    arch = read_trpx(tmp_path / "s.trpx")
    assert arch.width_table is not None  # v2: decode skips the walk
    np.testing.assert_array_equal(
        np.asarray(pycodec.decode(arch, np.uint16)).reshape(stack.shape),
        stack)


def test_host_stream_uint64(tmp_path):
    """64-bit dtypes stream through the host backend (no device-path
    FrameSpec restriction; only the device backend needs one)."""
    from trpx_tpu.runtime.stream import StreamingEncoder
    from trpx_tpu.io.trpx import read_trpx

    vals = (np.arange(3 * 20, dtype=np.uint64) << 35).reshape(3, 20)
    enc = StreamingEncoder(tmp_path / "w.trpx", nvalues=20,
                           dtype=np.uint64, backend="host")
    enc.add_frames(vals[:2])
    enc.add_frames(vals[2:])
    enc.finalize(verify=True, index=True)
    arch = read_trpx(tmp_path / "w.trpx")
    np.testing.assert_array_equal(
        np.asarray(pycodec.decode(arch, np.uint64)).reshape(3, 20), vals)
