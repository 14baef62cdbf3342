"""Frame-range decode: api.decompress(frames=...), subset_frames, CLI.

Frames are byte-aligned and independent (the repeat-width chain resets
per frame, Terse.hpp:505), so payload slices of any frame subset
concatenate into a valid archive; these tests pin that contract across
int/slice/list selections, all backends, and the prolix CLI.
"""

import numpy as np
import pytest

from trpx_tpu import api
from trpx_tpu.format import pycodec
from trpx_tpu.io.trpx import subset_frames


@pytest.fixture(scope="module")
def stack_and_archive():
    rng = np.random.default_rng(21)
    stack = rng.poisson(3.0, size=(7, 50, 50)).astype(np.uint16)
    stack[2, 0, 0] = 65535  # distinct widths across frames
    stack[5] = 0            # all-zero frame (repeat headers)
    return stack, api.compress(stack)


def test_subset_is_valid_archive(stack_and_archive):
    stack, arch = stack_and_archive
    sub = subset_frames(arch, [2, 5, 0])
    # the subset must decode EXACTLY like a fresh archive of those frames
    out = pycodec.decode(sub, np.uint16)
    np.testing.assert_array_equal(
        out.reshape(3, 50, 50), stack[[2, 5, 0]])


def test_subset_matches_reencode(stack_and_archive):
    """A contiguous subset's bytes equal a fresh encode of those frames
    (same prolix_bits envelope not required — payload bytes only)."""
    stack, arch = stack_and_archive
    sub = subset_frames(arch, slice(1, 4))
    fresh = pycodec.encode(list(stack[1:4].reshape(3, -1)))
    assert sub.payload == fresh.payload


@pytest.mark.parametrize("sel,expect_idx", [
    (0, [0]),
    (6, [6]),
    (-1, [6]),
    (slice(2, 5), [2, 3, 4]),
    (slice(None, None, 3), [0, 3, 6]),
    ([4, 1, 1], [4, 1, 1]),
])
def test_decompress_frames_selections(stack_and_archive, sel, expect_idx):
    stack, arch = stack_and_archive
    out = api.decompress(arch, frames=sel)
    want = stack[expect_idx]
    if isinstance(sel, int):
        want = want[0]  # single frame squeezes like a 1-frame archive
    np.testing.assert_array_equal(out, want)


def test_decompress_frames_device_paths(stack_and_archive):
    stack, arch = stack_and_archive
    for device in (False, True):
        out = api.decompress(arch, device=device, frames=slice(3, 7))
        np.testing.assert_array_equal(out, stack[3:7])


def test_frames_errors(stack_and_archive):
    _, arch = stack_and_archive
    with pytest.raises(IndexError):
        api.decompress(arch, frames=7)
    with pytest.raises(IndexError):
        api.decompress(arch, frames=[-8])
    with pytest.raises(ValueError):
        api.decompress(arch, frames=[])


def test_subset_carries_width_table(stack_and_archive, tmp_path):
    """A v2-indexed archive's width table follows into the subset, so
    subset decodes stay walk-free."""
    from trpx_tpu.io.trpx import read_trpx, write_trpx

    stack, arch = stack_and_archive
    p = tmp_path / "a.trpx"
    write_trpx(arch, p, index=True)
    loaded = read_trpx(p)
    assert getattr(loaded, "width_table", None) is not None
    sub = subset_frames(loaded, [6, 2])
    assert sub.width_table.shape[0] == 2
    out = api.decompress(sub)
    np.testing.assert_array_equal(out, stack[[6, 2]])


def test_cli_frames_flag(tmp_path):
    from trpx_tpu.cli.main import prolix_main, terse_main
    from trpx_tpu.io import read_tiff, write_tiff

    rng = np.random.default_rng(3)
    stack = rng.poisson(3.0, size=(5, 32, 32)).astype(np.uint16)
    src = tmp_path / "m.tif"
    write_tiff(stack, src)
    assert terse_main([str(src), "--host"]) == 0
    out_dir = tmp_path / "out"
    assert prolix_main([str(tmp_path / "m.trpx"), "--host",
                        "--frames", "1:4", "--out-dir", str(out_dir)]) == 0
    back = read_tiff(out_dir / "m.tif")
    arrs = (np.stack([np.asarray(im) for im in back])
            if isinstance(back, list) else np.asarray(back))
    np.testing.assert_array_equal(arrs.reshape(3, 32, 32), stack[1:4])
