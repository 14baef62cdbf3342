"""CLI + high-level API tests, incl. end-to-end interop with the reference."""

import subprocess

import numpy as np
import pytest

from trpx_tpu import api
from trpx_tpu.cli.main import main, prolix_main, terse_main
from trpx_tpu.format import pycodec
from trpx_tpu.io import read_tiff, write_tiff
from trpx_tpu.io.trpx import read_trpx, write_trpx


def _frame(rng, shape=(32, 32), dtype=np.uint16):
    img = rng.poisson(3.0, size=shape).astype(dtype)
    img.reshape(-1)[rng.integers(0, img.size, 10)] = 40000
    return img


# ------------------------------------------------------------------- api ---


def test_api_roundtrip_2d():
    rng = np.random.default_rng(0)
    img = _frame(rng)
    arch = api.compress(img)
    assert arch.meta.dimensions == (32, 32)
    out = api.decompress(arch)
    assert out.dtype == np.uint16
    np.testing.assert_array_equal(out, img)


def test_api_roundtrip_stack_host_and_device():
    rng = np.random.default_rng(1)
    frames = rng.poisson(3.0, size=(4, 16, 16)).astype(np.uint16)
    a_dev = api.compress(frames)
    a_host = api.compress(frames, device=False)
    assert a_dev.to_bytes() == a_host.to_bytes()
    np.testing.assert_array_equal(api.decompress(a_dev), frames)
    np.testing.assert_array_equal(api.decompress(a_host, device=False), frames)


def test_api_decompress_accepts_raw_bytes():
    rng = np.random.default_rng(2)
    img = _frame(rng)
    arch = api.compress(img)
    np.testing.assert_array_equal(api.decompress(arch.to_bytes()), img)


def test_api_float_truncates_like_reference():
    x = np.array([[1.9, -2.9], [3.5, 0.0]], dtype=np.float64)
    arch = api.compress(x)
    out = api.decompress(arch)
    np.testing.assert_array_equal(out, np.array([[1, -2], [3, 0]]))


def test_api_output_dtype_dispatch():
    from trpx_tpu.format.header import TrpxMeta

    def m(bits, signed):
        return TrpxMeta(prolix_bits=bits, signed=signed, block=12,
                        memory_size=1, number_of_values=1)

    assert api.output_dtype(m(7, False)) == np.uint16
    assert api.output_dtype(m(16, False)) == np.uint16
    assert api.output_dtype(m(17, False)) == np.uint32  # B3 fixed
    assert api.output_dtype(m(33, False)) == np.uint64
    assert api.output_dtype(m(16, True)) == np.int16
    assert api.output_dtype(m(30, True)) == np.int32
    assert api.output_dtype(m(40, True)) == np.int64


def test_api_int64_host_path():
    vals = np.array([2**40, -(2**40), 17], dtype=np.int64)
    arch = api.compress(vals)
    out = api.decompress(arch)
    assert out.dtype == np.int64
    np.testing.assert_array_equal(out, vals)


def test_api_errors():
    with pytest.raises(TypeError):
        api.compress(np.zeros(4, dtype=np.complex64))
    arch = api.compress(np.array([-1, 2], dtype=np.int16))
    with pytest.raises(TypeError):
        api.decompress(arch, dtype=np.uint16)


# ------------------------------------------------------------------- cli ---


def test_cli_encode_decode_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    frames = rng.poisson(3.0, size=(3, 24, 24)).astype(np.uint16)
    src = tmp_path / "movie.tif"
    write_tiff(frames, src)
    assert terse_main([str(src), "-verbose"]) == 0
    assert src.exists()  # no --delete-inputs -> kept
    trpx = tmp_path / "movie.trpx"
    assert trpx.exists()
    arch = read_trpx(trpx)
    assert arch.meta.number_of_frames == 3
    assert prolix_main([str(trpx), "--out-dir", str(tmp_path / "out")]) == 0
    stack = read_tiff(tmp_path / "out" / "movie.tif")
    np.testing.assert_array_equal(stack.as_array(), frames)


def test_cli_delete_inputs(tmp_path):
    rng = np.random.default_rng(3)
    src = tmp_path / "a.tif"
    write_tiff(_frame(rng), src)
    assert terse_main([str(src), "--delete-inputs"]) == 0
    assert not src.exists()
    assert (tmp_path / "a.trpx").exists()


def test_cli_skips_nonmatching_and_recovers(tmp_path, capsys):
    good = tmp_path / "ok.tif"
    write_tiff(np.zeros((4, 4), np.uint16), good)
    bad = tmp_path / "bad.tif"
    bad.write_bytes(b"not a tiff")
    other = tmp_path / "notes.txt"
    other.write_text("hi")
    assert terse_main([str(bad), str(other), str(good)]) == 0
    err = capsys.readouterr().err
    assert "bad.tif" in err
    assert (good.with_suffix(".trpx")).exists()
    assert not (tmp_path / "notes.trpx").exists()


def test_cli_square_fallback_when_no_dims(tmp_path):
    """Archives without a dimensions attribute decode to sqrt(size) squares
    (prolix.cpp:62-63)."""
    rng = np.random.default_rng(4)
    vals = rng.poisson(3.0, size=64).astype(np.uint16)
    arch = pycodec.encode(vals)  # 1-D: no dimensions attribute
    assert arch.meta.dimensions == ()
    p = tmp_path / "nodim.trpx"
    write_trpx(arch, p)
    assert prolix_main([str(p)]) == 0
    img = read_tiff(tmp_path / "nodim.tif")[0]
    assert img.shape == (8, 8)
    np.testing.assert_array_equal(img.reshape(-1), vals)


def test_trpx_umbrella(tmp_path, capsys):
    rng = np.random.default_rng(5)
    src = tmp_path / "x.tif"
    write_tiff(_frame(rng), src)
    assert main(["encode", str(src)]) == 0
    assert main(["info", str(tmp_path / "x.trpx")]) == 0
    out = capsys.readouterr().out
    assert "frames           1" in out
    assert main(["decode", str(tmp_path / "x.trpx"), "--out-dir",
                 str(tmp_path / "o")]) == 0
    np.testing.assert_array_equal(
        read_tiff(tmp_path / "o" / "x.tif")[0], read_tiff(src)[0]
    )


def test_cli_interop_with_reference(tmp_path, reference_cli):
    """Our terse output is decodable by reference prolix and vice versa."""
    rng = np.random.default_rng(6)
    img = _frame(rng, (48, 48))
    ours = tmp_path / "ours"
    ours.mkdir()
    write_tiff(img, ours / "f.tif")
    assert terse_main([str(ours / "f.tif")]) == 0
    subprocess.run([str(reference_cli["prolix"]), str(ours / "f.trpx")],
                   check=True, capture_output=True, cwd=ours)
    np.testing.assert_array_equal(read_tiff(ours / "f.tif")[0], img)

    theirs = tmp_path / "theirs"
    theirs.mkdir()
    write_tiff(img, theirs / "g.tif")
    subprocess.run([str(reference_cli["terse"]), str(theirs / "g.tif")],
                   check=True, capture_output=True, cwd=theirs)
    assert prolix_main([str(theirs / "g.trpx")]) == 0
    np.testing.assert_array_equal(read_tiff(theirs / "g.tif")[0], img)


def test_encode_index_sidecar(tmp_path):
    """--index writes a .trpx.idx sidecar that decode's walk consumes."""
    import numpy as np

    from trpx_tpu.cli.main import terse_main
    from trpx_tpu.io.tiff import write_tiff
    from trpx_tpu.io.trpx import read_trpx

    rng = np.random.default_rng(3)
    frames = rng.poisson(3.0, size=(4, 16, 16)).astype(np.uint16)
    src = tmp_path / "ix.tif"
    with open(src, "wb") as f:
        write_tiff(frames, f)
    assert terse_main([str(src), "--host", "--index"]) == 0
    assert (tmp_path / "ix.trpx.idx").exists()
    arch = read_trpx(tmp_path / "ix.trpx")
    assert arch.frame_index is not None and len(arch.frame_index) == 4


def test_trpx_verify(tmp_path, capsys):
    """trpx verify: OK for intact archives (forced re-walk, not the
    sidecar cache), nonzero + FAILED line for corrupt ones."""
    rng = np.random.default_rng(33)
    stack = rng.poisson(3.0, size=(3, 32, 32)).astype(np.uint16)
    good = tmp_path / "g.trpx"
    write_trpx(api.compress(stack), good, index=True)
    blob = api.compress(stack).to_bytes()
    bad = tmp_path / "b.trpx"
    bad.write_bytes(blob[: len(blob) // 2])
    assert main(["verify", str(good)]) == 0
    assert main(["verify", str(good), str(bad)]) == 1
    out = capsys.readouterr()
    assert "OK" in out.out and "FAILED" in out.err
    assert "v2, matches walk" in out.out


def test_trpx_verify_sidecar_checks(tmp_path, capsys):
    """trpx verify fails on a corrupt .idx (which decode itself would
    silently ignore) and on a structurally-valid sidecar whose tables
    disagree with the walked archive."""
    from trpx_tpu.io.trpx import _compute_offsets, write_index

    rng = np.random.default_rng(34)
    stack = rng.poisson(3.0, size=(4, 32, 32)).astype(np.uint16)
    p = tmp_path / "s.trpx"
    write_trpx(api.compress(stack), p, index=True)
    idx = tmp_path / "s.trpx.idx"

    blob = bytearray(idx.read_bytes())
    blob[10] ^= 0xFF                       # CRC now fails -> corrupt
    idx.write_bytes(bytes(blob))
    assert main(["verify", str(p)]) == 1
    assert "corrupt or stale" in capsys.readouterr().err

    # valid CRC, plausible structure, wrong widths -> must still fail
    arch = read_trpx(p)
    arch.frame_index = arch.width_table = None
    offs, wt = _compute_offsets(arch)
    wt = wt.copy()
    wt[0, 0] = int(wt[0, 0]) - 1 if wt[0, 0] > 0 else 1  # <= prolix_bits,
    # so the structural loader accepts it; only the walk cross-check can
    # catch the disagreement
    write_index(p, offs, arch.meta.memory_size, widths=wt)
    assert main(["verify", str(p)]) == 1
    assert "width tables disagree" in capsys.readouterr().err

    # 64-bit archives verify through the host codec (no device-path
    # dtype restriction)
    wide = tmp_path / "w.trpx"
    vals = (np.arange(24, dtype=np.uint64) << 33).reshape(2, 12)
    write_trpx(api.compress(vals), wide)
    assert main(["verify", str(wide)]) == 0
    assert "OK" in capsys.readouterr().out


def test_jobs_pool_encode_decode(tmp_path, capsys):
    """--jobs N processes files on a thread pool with the same per-file
    error recovery and verbose report as the serial loop."""
    from trpx_tpu.cli.main import prolix_main, terse_main
    from trpx_tpu.io.tiff import write_tiff as wtif

    rng = np.random.default_rng(41)
    frames = [rng.poisson(3.0, (32, 32)).astype(np.uint16)
              for _ in range(4)]
    names = []
    for k, f in enumerate(frames):
        p = tmp_path / f"j{k}.tif"
        wtif(f, p)
        names.append(str(p))
    bad = tmp_path / "bad.tif"
    bad.write_bytes(b"nottiff!")
    rc = terse_main(["-verbose", "--jobs", "3"] + names + [str(bad)])
    out = capsys.readouterr()
    assert rc == 0
    assert "Terse compressed: 4 files" in out.out
    assert "Error processing" in out.err
    rc = prolix_main(["--jobs", "3", "--out-dir", str(tmp_path / "d")]
                     + [str(tmp_path / f"j{k}.trpx") for k in range(4)])
    assert rc == 0
    for k, f in enumerate(frames):
        got = read_tiff(tmp_path / "d" / f"j{k}.tif")
        np.testing.assert_array_equal(np.stack(list(got))[0], f)


def test_jobs_duplicate_basenames_no_corruption(tmp_path):
    """Two inputs sharing a basename under --out-dir collide on one
    destination; with --jobs the temp files must still be unique so the
    final archive is a VALID last-writer-wins result, never interleaved
    bytes from both threads."""
    from trpx_tpu.cli.main import terse_main
    from trpx_tpu.io.tiff import write_tiff as wtif

    rng = np.random.default_rng(7)
    frames = [rng.poisson(3.0, (64, 64)).astype(np.uint16)
              for _ in range(2)]
    srcs = []
    for k, f in enumerate(frames):
        d = tmp_path / f"dir{k}"
        d.mkdir()
        wtif(f, d / "x.tif")
        srcs.append(str(d / "x.tif"))
    out = tmp_path / "out"
    out.mkdir()
    for _ in range(5):  # collision is timing-dependent; a few rounds
        rc = terse_main(srcs + ["--jobs", "2", "--out-dir", str(out)])
        assert rc == 0
        arch = read_trpx(out / "x.trpx")
        pix = np.asarray(api.decompress(arch)).reshape(64, 64)
        assert any(np.array_equal(pix, f) for f in frames)
        assert not list(out.glob("*.tmp"))


def test_atomic_write_honors_umask(tmp_path):
    """mkstemp temp files are 0600; the rename target must end up with
    normal umask-honoring permissions like a plain open() output."""
    import os as _os

    from trpx_tpu.cli.main import _atomic_write

    dst = tmp_path / "o.bin"
    _atomic_write(dst, lambda f: f.write(b"x"), durable=False)
    umask = _os.umask(0)
    _os.umask(umask)
    assert (dst.stat().st_mode & 0o777) == (0o666 & ~umask)


def test_jobs_stream_notice(tmp_path, capsys):
    """--jobs is a per-file pool; with --stream it must say it has no
    effect instead of silently dropping the flag."""
    from trpx_tpu.cli.main import terse_main
    from trpx_tpu.io.tiff import write_tiff as wtif

    rng = np.random.default_rng(8)
    src = tmp_path / "s.tif"
    wtif(rng.poisson(3.0, (32, 32)).astype(np.uint16), src)
    rc = terse_main([str(src), "--stream", "--host", "--jobs", "4"])
    assert rc == 0
    assert "--jobs has no effect with --stream" in capsys.readouterr().err


def test_trpx_concat(tmp_path, capsys):
    """``trpx concat`` merges archives bit-identically to a whole-stack
    encode (frame streams are independent and byte-aligned) and the
    merged archive decodes every frame; geometry mismatches fail."""
    rng = np.random.default_rng(9)
    a = rng.poisson(3.0, (2, 32, 32)).astype(np.uint16)
    b = rng.poisson(3.0, (3, 32, 32)).astype(np.uint16)
    pa, pb, pc = (tmp_path / n for n in ("a.trpx", "b.trpx", "c.trpx"))
    write_trpx(pycodec.encode(list(a.reshape(2, -1)), dimensions=(32, 32)), pa)
    write_trpx(pycodec.encode(list(b.reshape(3, -1)), dimensions=(32, 32)), pb)
    rc = main(["concat", str(pc), str(pa), str(pb), "--index", "-verbose"])
    assert rc == 0 and "5 frames" in capsys.readouterr().out
    whole = pycodec.encode(
        list(np.concatenate([a, b]).reshape(5, -1)), dimensions=(32, 32))
    assert pc.read_bytes() == whole.to_bytes()
    assert (tmp_path / "c.trpx.idx").exists()
    got = api.decompress(read_trpx(pc))
    np.testing.assert_array_equal(
        np.asarray(got).reshape(5, 32, 32), np.concatenate([a, b]))
    # geometry mismatch -> error, no output clobber
    bad = tmp_path / "bad.trpx"
    write_trpx(pycodec.encode(np.arange(7, dtype=np.uint16)), bad)
    rc = main(["concat", str(tmp_path / "d.trpx"), str(pa), str(bad)])
    assert rc == 1
    assert "values/frame differ" in capsys.readouterr().err
    assert not (tmp_path / "d.trpx").exists()
