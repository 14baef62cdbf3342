"""Streaming encoder (chunking + resume), metrics, multi-host shard writer."""

import json

import numpy as np
import pytest

from trpx_tpu.format import pycodec
from trpx_tpu.io.trpx import read_trpx
from trpx_tpu.ops.coding import FrameSpec
from trpx_tpu.parallel import ShardedCodec, default_mesh
from trpx_tpu.parallel.distributed import (
    local_archive,
    write_shard_file,
)
from trpx_tpu.runtime import RunReport, StageTimer, StreamingEncoder, iter_decode


def _frames(rng, F, n=50, dtype=np.uint16):
    return rng.poisson(3.0, size=(F, n)).astype(dtype)


def test_streaming_encode_matches_batch(tmp_path):
    rng = np.random.default_rng(0)
    frames = _frames(rng, 23)
    p = tmp_path / "s.trpx"
    enc = StreamingEncoder(p, nvalues=50, dtype=np.uint16,
                           dimensions=(50, 1))
    for lo in range(0, 23, 7):  # uneven chunks
        enc.add_frames(frames[lo : lo + 7])
    out = enc.finalize(verify=True)
    arch = read_trpx(out)
    ref = pycodec.encode(list(frames), dimensions=(50, 1))
    assert arch.to_bytes() == ref.to_bytes()
    assert not (tmp_path / "s.trpx.part").exists()
    assert not (tmp_path / "s.trpx.manifest").exists()


def test_streaming_resume(tmp_path):
    rng = np.random.default_rng(1)
    frames = _frames(rng, 12)
    p = tmp_path / "r.trpx"
    enc = StreamingEncoder(p, nvalues=50, dtype=np.uint16)
    enc.add_frames(frames[:4])
    enc.add_frames(frames[4:8])
    enc.flush()  # checkpoint both chunks (add_frames double-buffers)
    del enc  # "crash" after two checkpoints

    enc2 = StreamingEncoder(p, nvalues=50, dtype=np.uint16)
    assert enc2.frames_done == 8  # resume point
    enc2.add_frames(frames[8:])
    enc2.finalize()
    arch = read_trpx(p)
    assert arch.to_bytes() == pycodec.encode(list(frames)).to_bytes()


def test_streaming_resume_truncates_torn_tail(tmp_path):
    rng = np.random.default_rng(2)
    frames = _frames(rng, 6)
    p = tmp_path / "t.trpx"
    enc = StreamingEncoder(p, nvalues=50, dtype=np.uint16)
    enc.add_frames(frames[:3])
    enc.flush()
    # simulate a torn write past the checkpoint
    with open(tmp_path / "t.trpx.part", "ab") as f:
        f.write(b"\xff" * 17)
    enc2 = StreamingEncoder(p, nvalues=50, dtype=np.uint16)
    enc2.add_frames(frames[3:])
    enc2.finalize()
    assert read_trpx(p).to_bytes() == pycodec.encode(list(frames)).to_bytes()


def test_streaming_crash_loses_only_inflight_chunk(tmp_path):
    """add_frames double-buffers: a crash loses at most the un-flushed
    chunk, and resuming from frames_done re-encodes exactly it."""
    rng = np.random.default_rng(5)
    frames = _frames(rng, 12)
    p = tmp_path / "d.trpx"
    enc = StreamingEncoder(p, nvalues=50, dtype=np.uint16)
    enc.add_frames(frames[:4])
    enc.add_frames(frames[4:8])  # flushes chunk 1, chunk 2 in flight
    del enc
    enc2 = StreamingEncoder(p, nvalues=50, dtype=np.uint16)
    assert enc2.frames_done == 4  # in-flight chunk was lost
    enc2.add_frames(frames[4:])
    enc2.finalize()
    assert read_trpx(p).to_bytes() == pycodec.encode(list(frames)).to_bytes()


def test_streaming_config_mismatch(tmp_path):
    p = tmp_path / "m.trpx"
    StreamingEncoder(p, nvalues=50, dtype=np.uint16)
    with pytest.raises(ValueError):
        StreamingEncoder(p, nvalues=60, dtype=np.uint16)


def test_iter_decode_chunks(tmp_path):
    rng = np.random.default_rng(3)
    frames = _frames(rng, 19)
    arch = pycodec.encode(list(frames))
    got = np.concatenate(list(iter_decode(arch, np.uint16, chunk_frames=5)))
    np.testing.assert_array_equal(got, frames)


def test_iter_decode_device_resident(tmp_path):
    """fetch=False yields device-resident (C, n_padded) chunks whose
    sliced rows match the fetched decode, without a host round-trip."""
    rng = np.random.default_rng(13)
    frames = _frames(rng, 19)
    arch = pycodec.encode(list(frames))
    n = arch.meta.number_of_values
    parts = []
    for dev, nf in iter_decode(arch, np.uint16, chunk_frames=5,
                               device=True, fetch=False):
        parts.append(np.asarray(dev)[:nf, :n])
    got = np.concatenate(parts).astype(np.uint16)
    np.testing.assert_array_equal(got, frames)


def test_iter_decode_fetch_false_requires_device():
    rng = np.random.default_rng(14)
    arch = pycodec.encode(list(_frames(rng, 3)))
    with pytest.raises(ValueError):
        next(iter_decode(arch, np.uint16, device=False, fetch=False))


def test_iter_decode_caches_walk_tables():
    """The chunked pipeline must leave full walk tables on the archive
    (the CLI's default sidecar write then skips a second full walk —
    ADVICE r4), and those tables must match a direct walk."""
    from trpx_tpu import native
    from trpx_tpu.io.trpx import _compute_offsets

    if not native.available():
        pytest.skip("native walker required for the pipelined route")
    rng = np.random.default_rng(15)
    frames = _frames(rng, 19)
    arch = pycodec.encode(list(frames))
    arch2 = pycodec.TrpxArchive(meta=arch.meta, payload=arch.payload)
    list(iter_decode(arch2, np.uint16, chunk_frames=5, device=True))
    wt = getattr(arch2, "width_table", None)
    fidx = getattr(arch2, "frame_index", None)
    assert wt is not None and fidx is not None
    offs_ref, wt_ref = _compute_offsets(arch)
    np.testing.assert_array_equal(np.asarray(fidx), offs_ref)
    np.testing.assert_array_equal(wt, wt_ref)
    # and a second pass reuses them (walk-free) with identical output
    got = np.concatenate(list(iter_decode(arch2, np.uint16,
                                          chunk_frames=5, device=True)))
    np.testing.assert_array_equal(got, frames)


def test_metrics_report():
    t = StageTimer()
    with t.stage("kernel"):
        pass
    with t.stage("write"):
        pass
    r = RunReport(operation="encode", frames=100, raw_bytes=100 * 2 * 50,
                  compressed_bytes=2000, device_kind="TPU v5 lite",
                  n_devices=4, stage_seconds=t.seconds)
    d = r.to_dict()
    assert d["operation"] == "encode"
    assert d["compression_ratio"] == 0.2
    assert "hbm_sol_fraction" in d
    assert json.loads(r.to_json())["frames"] == 100
    assert "encode: 100 frames" in r.summary()
    assert r.scaling_efficiency(single_device_fps=r.frames_per_second / 4) == 1.0


# ------------------------------------------------- multi-host write path ---


def test_encode_shards_and_write_shard_file(tmp_path):
    """Single-process drill of the multi-host path: encode_shards +
    write_shard_file must produce the byte-identical .trpx file."""
    rng = np.random.default_rng(4)
    F, n = 10, 50
    frames = _frames(rng, F, n)
    spec = FrameSpec.for_dtype(n, np.uint16)
    codec = ShardedCodec(spec, default_mesh())
    Fp = -(-F // codec.ndev) * codec.ndev
    frames_padded = np.zeros((Fp, n), dtype=np.uint16)
    frames_padded[:F] = frames
    res = codec.encode_shards(frames_padded, n_frames=F)
    assert res.frame_lo == 0 and res.frame_hi == Fp
    # in-memory assembly equals the normative encoder (padding frames are
    # zero frames appended to the stream, so compare the F-frame prefix
    # through the file writer's meta)
    p = tmp_path / "dist.trpx"
    write_shard_file(p, res, spec, n_frames=F, dimensions=())
    arch = read_trpx(p)
    ref = pycodec.encode(list(frames))
    # mesh-padding zero frames are trimmed: fully byte-identical archive
    assert arch.to_bytes() == ref.to_bytes()
    dec = np.stack([
        pycodec.decode_frame(arch, f, np.uint16) for f in range(F)
    ])
    np.testing.assert_array_equal(dec, frames)
    # local_archive path agrees with the file
    arch2 = local_archive(res, spec, n_frames=F)
    assert arch2.to_bytes() == ref.to_bytes()


def test_streaming_resume_refuses_missing_part(tmp_path):
    """A surviving manifest with a deleted .part must raise, not silently
    resume over a zero-filled prefix (ADVICE r1)."""
    rng = np.random.default_rng(7)
    frames = _frames(rng, 4)
    p = tmp_path / "m.trpx"
    enc = StreamingEncoder(p, nvalues=50, dtype=np.uint16)
    enc.add_frames(frames)
    (tmp_path / "m.trpx.part").unlink()
    with pytest.raises(FileNotFoundError):
        StreamingEncoder(p, nvalues=50, dtype=np.uint16)


def test_iter_decode_tiled_failure_falls_back_to_jnp(monkeypatch, recwarn):
    """If the tiled Pallas route fails mid-stream, the fallback must go
    STRAIGHT to the jnp split tree (run() would route a big-frame spec
    right back into the same tiled machinery) and still decode exactly
    (round-5 review finding)."""
    import warnings

    import jax

    from trpx_tpu import _fallback
    from trpx_tpu.ops import pallas_unpack
    from trpx_tpu.runtime import stream as stream_mod

    rng = np.random.default_rng(17)
    n = 3000
    frames = rng.poisson(3.0, size=(6, n)).astype(np.uint16)
    arch = pycodec.encode(list(frames))

    # pretend we're on a TPU backend with a big-frame spec so the tiled
    # branch is taken, and make its prepass blow up like a Mosaic
    # lowering failure would
    monkeypatch.setattr(stream_mod.jax if hasattr(stream_mod, "jax")
                        else jax, "default_backend", lambda: "tpu")

    def boom(*a, **k):
        raise RuntimeError("synthetic Mosaic lowering failure")

    monkeypatch.setattr(pallas_unpack, "tile_prepass", boom)

    spec = FrameSpec.for_dtype(n, np.uint16)
    if spec.pallas_ok_decode:
        # force the tiled branch even for this (suite-sized) spec
        monkeypatch.setattr(
            FrameSpec, "pallas_ok_decode",
            property(lambda self: False))
    _fallback._seen.discard("stream.tiled_decode")
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        got = np.concatenate(list(stream_mod.iter_decode(
            arch, np.uint16, chunk_frames=3, device=True)))
    np.testing.assert_array_equal(got, frames)
