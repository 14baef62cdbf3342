"""Sidecar frame index + parallel native walk (non-normative extension)."""

import numpy as np
import pytest

from trpx_tpu import native, ops
from trpx_tpu.format import pycodec
from trpx_tpu.io.trpx import read_index, read_trpx, write_index, write_trpx
from trpx_tpu.ops.coding import FrameSpec, walk_archive
from trpx_tpu.runtime import StreamingEncoder


def _frames(rng, F=9, n=100):
    return rng.poisson(3.0, size=(F, n)).astype(np.uint16)


def test_encoder_carries_frame_index():
    rng = np.random.default_rng(0)
    frames = _frames(rng)
    arch = ops.encode(frames)
    assert arch.frame_index is not None
    offs = pycodec.frame_offsets(arch)
    np.testing.assert_array_equal(arch.frame_index, offs)


def test_sidecar_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    frames = _frames(rng)
    arch = ops.encode(frames)
    p = tmp_path / "a.trpx"
    write_trpx(arch, p, index=True)
    assert (tmp_path / "a.trpx.idx").exists()
    back = read_trpx(p)
    assert back.frame_index is not None
    np.testing.assert_array_equal(back.frame_index, arch.frame_index)
    # the .trpx bytes themselves are unchanged (sidecar is non-normative)
    assert back.to_bytes() == arch.to_bytes()
    # stale sidecar (wrong frame count) is ignored
    write_index(p, np.zeros(3, dtype=np.int64), arch.meta.memory_size)
    assert read_trpx(p).frame_index is None


@pytest.mark.skipif(not native.available(), reason="no native runtime")
def test_parallel_walk_matches_serial():
    rng = np.random.default_rng(2)
    frames = _frames(rng, F=16, n=250)
    arch = ops.encode(frames)
    w1, o1, fs = native.walk(arch.payload, 16, 250, 12)
    w2, o2 = native.walk_indexed(arch.payload, fs[:-1], 250, 12)
    np.testing.assert_array_equal(w1, w2)
    np.testing.assert_array_equal(o1, o2)


def test_walk_archive_uses_index_and_decodes():
    rng = np.random.default_rng(3)
    frames = _frames(rng, F=11, n=300)
    arch = ops.encode(frames)
    spec = FrameSpec.for_dtype(300, np.uint16)
    assert arch.frame_index is not None
    wi, pi, wordsi = walk_archive(arch, spec)
    arch.frame_index = None
    ws, ps, wordss = walk_archive(arch, spec)
    np.testing.assert_array_equal(wi, ws)
    np.testing.assert_array_equal(pi, ps)
    np.testing.assert_array_equal(wordsi, wordss)
    np.testing.assert_array_equal(ops.decode(arch, np.uint16), frames)


def test_streaming_index(tmp_path):
    rng = np.random.default_rng(4)
    frames = _frames(rng, F=13, n=120)
    p = tmp_path / "s.trpx"
    enc = StreamingEncoder(p, nvalues=120, dtype=np.uint16)
    for lo in range(0, 13, 5):
        enc.add_frames(frames[lo : lo + 5])
    enc.finalize(index=True)
    arch = read_trpx(p)
    assert arch.frame_index is not None
    np.testing.assert_array_equal(
        arch.frame_index, pycodec.frame_offsets(arch)
    )
    np.testing.assert_array_equal(
        ops.decode(arch, np.uint16), frames
    )


def test_sidecar_v2_width_tables(tmp_path):
    """v2 sidecar: decode skips the walk, widths/words/values identical."""
    from trpx_tpu.io.trpx import read_index_full, write_trpx

    rng = np.random.default_rng(7)
    frames = _frames(rng, F=9, n=700)
    arch0 = ops.encode(frames)
    p = tmp_path / "v2.trpx"
    write_trpx(arch0, p, index=True)

    offs, wt = read_index_full(p, 9, arch0.meta.memory_size)
    assert offs is not None and wt is not None
    assert wt.shape == (9, -(-700 // arch0.meta.block))
    np.testing.assert_array_equal(offs, pycodec.frame_offsets(arch0))

    arch = read_trpx(p)
    assert getattr(arch, "width_table", None) is not None
    spec = FrameSpec.for_dtype(700, np.uint16)
    w2, _p2, words2 = walk_archive(arch, spec)
    arch.width_table = None  # force the walking path
    w1, _p1, words1 = walk_archive(arch, spec)
    np.testing.assert_array_equal(w1, w2)
    np.testing.assert_array_equal(words1, words2)
    np.testing.assert_array_equal(ops.decode(arch, np.uint16), frames)


def test_sidecar_v2_stale_rejected(tmp_path):
    from trpx_tpu.io.trpx import read_index_full, write_trpx

    rng = np.random.default_rng(8)
    frames = _frames(rng, F=4, n=300)
    arch = ops.encode(frames)
    p = tmp_path / "s2.trpx"
    write_trpx(arch, p, index=True)
    # stale: frame count / payload size mismatches return (None, None)
    assert read_index_full(p, 5, arch.meta.memory_size) == (None, None)
    assert read_index_full(p, 4, arch.meta.memory_size + 1) == (None, None)
    # truncated blob
    blob = (p.parent / (p.name + ".idx")).read_bytes()
    (p.parent / (p.name + ".idx")).write_bytes(blob[:-3])
    assert read_index_full(p, 4, arch.meta.memory_size) == (None, None)
