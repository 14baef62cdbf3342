"""Hostile-input fuzzing of the decode surfaces.

A production decoder ingests untrusted bytes. These tests mutate valid
archives — payload byte flips, truncations, header-attribute tampering,
random garbage — and drive every decode backend (host pycodec, native
walk+codec, device jnp/Pallas paths). Acceptable outcomes per mutation:
a clean Python exception (ValueError/TypeError/OverflowError) or a
successful decode (possibly to garbage pixels — corruption can still be
a well-formed stream). Never a crash, hang, or native memory fault
(ASAN-class faults would abort the interpreter and fail the test run).
"""

import numpy as np
import pytest

from trpx_tpu import api
from trpx_tpu.format import pycodec
from trpx_tpu.io.trpx import TrpxArchive

OK_ERRORS = (ValueError, TypeError, OverflowError, KeyError, IndexError)


def _base_archive(seed: int = 7, frames: int = 3, n: int = 1000) -> bytes:
    rng = np.random.default_rng(seed)
    stack = rng.poisson(3.0, size=(frames, n)).astype(np.uint16)
    stack[:, rng.integers(0, n, 20)] = 65535  # hot pixels: wide blocks
    return pycodec.encode(list(stack)).to_bytes()


def _try_decode_all(blob: bytes) -> None:
    """Every backend must either decode or raise a clean error."""
    # host path (pycodec via api)
    try:
        api.decompress(blob, device=False)
    except OK_ERRORS:
        pass
    # device path (jnp tree / Pallas interpret on CPU); forced so the
    # small-workload auto-routing doesn't hide it
    try:
        api.decompress(blob, device=True)
    except OK_ERRORS:
        pass
    # native walk (the C code parses the untrusted payload directly)
    try:
        from trpx_tpu.native import codec as native

        arch = TrpxArchive.from_bytes(blob)
        native.decode(arch, np.uint16)
    except OK_ERRORS:
        pass


def test_payload_byte_flips():
    base = bytearray(_base_archive())
    hdr_end = base.index(b"/>") + 2
    rng = np.random.default_rng(0)
    for _ in range(120):
        blob = bytearray(base)
        i = int(rng.integers(hdr_end, len(blob)))
        blob[i] ^= int(rng.integers(1, 256))
        _try_decode_all(bytes(blob))


def test_payload_truncations():
    base = _base_archive()
    hdr_end = base.index(b"/>") + 2
    rng = np.random.default_rng(1)
    cuts = set(int(rng.integers(0, len(base))) for _ in range(40))
    cuts |= {0, 1, hdr_end - 1, hdr_end, hdr_end + 1, len(base) - 1}
    for cut in sorted(cuts):
        _try_decode_all(base[:cut])


def test_header_attribute_tampering():
    base = _base_archive()
    hdr_end = base.index(b"/>") + 2
    hdr, payload = base[:hdr_end].decode("latin1"), base[hdr_end:]
    meta = pycodec.decode_header(base)[0] if hasattr(
        pycodec, "decode_header") else None
    tampered = [
        hdr.replace('number_of_values="1000"', 'number_of_values="100000"'),
        hdr.replace('number_of_values="1000"', 'number_of_values="0"'),
        hdr.replace('number_of_values="1000"', 'number_of_values="-5"'),
        hdr.replace('number_of_frames="3"', 'number_of_frames="1000000"'),
        hdr.replace('number_of_frames="3"', 'number_of_frames="0"'),
        hdr.replace('block="12"', 'block="0"'),
        hdr.replace('block="12"', 'block="-1"'),
        hdr.replace('block="12"', 'block="1000000000"'),
        hdr.replace('prolix_bits="16"', 'prolix_bits="200"'),
        hdr.replace('prolix_bits="16"', 'prolix_bits="-3"'),
        hdr.replace('signed="0"', 'signed="1"'),
        # memory_size lies (larger and smaller than the real payload)
        *(
            hdr.replace(f'memory_size="{len(payload)}"',
                        f'memory_size="{v}"')
            for v in (0, 1, len(payload) * 100, -1)
        ),
    ]
    del meta
    for h in tampered:
        _try_decode_all(h.encode("latin1") + payload)


def test_random_garbage_blobs():
    rng = np.random.default_rng(2)
    for size in (0, 1, 7, 100, 4096):
        blob = rng.integers(0, 256, size=size, dtype=np.uint8).tobytes()
        try:
            api.decompress(blob)
        except OK_ERRORS:
            pass
    # a plausible-looking header followed by random bytes
    junk = (b'<Terse prolix_bits="16" signed="0" block="12" '
            b'memory_size="512" number_of_values="1000" '
            b'number_of_frames="2"/>'
            + rng.integers(0, 256, size=512, dtype=np.uint8).tobytes())
    _try_decode_all(junk)


def test_signed_flip_into_unsigned_refused():
    """Flipping signed=1 onto an unsigned stream must hit the type gate,
    not crash in sign extension."""
    base = _base_archive()
    blob = base.replace(b'signed="0"', b'signed="1"')
    with pytest.raises(TypeError):
        api.decompress(blob, dtype=np.uint16)


def test_width_over_prolix_bits_detected():
    """An archive whose payload holds blocks wider than the header's
    prolix_bits claim is corrupt by the encoder invariant
    (Terse.hpp:516); the walk must reject it, not garbage-decode."""
    from trpx_tpu.ops.coding import FrameSpec, walk_archive

    rng = np.random.default_rng(3)
    stack = rng.poisson(3.0, size=(2, 1000)).astype(np.uint16)
    stack[0, 5] = 65535  # width-16 block
    blob = pycodec.encode(list(stack)).to_bytes()
    tampered = blob.replace(b'prolix_bits="16"', b'prolix_bits="3"')
    assert tampered != blob
    arch = TrpxArchive.from_bytes(tampered)
    spec = FrameSpec.for_dtype(1000, np.uint8)
    with pytest.raises(ValueError, match="prolix_bits"):
        walk_archive(arch, spec)


def test_native_walk_max_width_kwarg():
    from trpx_tpu import native

    if not native.available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(4)
    stack = rng.poisson(3.0, size=(2, 500)).astype(np.uint16)
    stack[1, 3] = 4095  # width 12
    arch = pycodec.encode(list(stack))
    # passes at the true bound, raises below it
    native.walk(arch.payload, 2, 500, 12, max_width=12)
    with pytest.raises(ValueError, match="exceeds"):
        native.walk(arch.payload, 2, 500, 12, max_width=11)
    fs = native.walk(arch.payload, 2, 500, 12)[2]
    native.walk_indexed(arch.payload, fs[:-1], 500, 12, max_width=12)
    with pytest.raises(ValueError, match="exceeds"):
        native.walk_indexed(arch.payload, fs[:-1], 500, 12, max_width=11)


@pytest.mark.parametrize("seed", range(4))
def test_multi_byte_corruption_bursts(seed):
    """Bursts of corruption (8-64 consecutive bytes) — the walk must
    terminate (runaway widths are caught within one refill window)."""
    base = bytearray(_base_archive(seed=seed + 100, frames=2, n=3000))
    hdr_end = base.index(b"/>") + 2
    rng = np.random.default_rng(seed)
    for _ in range(16):
        blob = bytearray(base)
        start = int(rng.integers(hdr_end, len(blob) - 64))
        ln = int(rng.integers(8, 64))
        blob[start:start + ln] = rng.integers(
            0, 256, size=ln, dtype=np.uint8).tobytes()
        _try_decode_all(bytes(blob))


def test_sidecar_fuzz(tmp_path):
    """Random mutations of the .trpx.idx sidecar: the trailing CRC32
    must reject EVERY corrupted sidecar at load (decode falls back to
    the validating walk), so decode either raises cleanly or produces
    exact pixels — on the host path AND on the device (walk-free v2)
    path, the one that feeds sidecar offsets straight into the gather."""
    from trpx_tpu import ops
    from trpx_tpu.io.trpx import read_trpx, write_trpx

    rng = np.random.default_rng(77)
    stack = rng.poisson(3.0, size=(6, 500)).astype(np.uint16)
    arch = pycodec.encode(list(stack))
    p = tmp_path / "f.trpx"
    write_trpx(arch, p, index=True)
    idx = (tmp_path / "f.trpx.idx").read_bytes()
    for trial in range(60):
        blob = bytearray(idx)
        for _ in range(int(rng.integers(1, 4))):
            i = int(rng.integers(0, len(blob)))
            blob[i] ^= int(rng.integers(1, 256))
        (tmp_path / "f.trpx.idx").write_bytes(bytes(blob))
        loaded = read_trpx(p)
        assert loaded.frame_index is None, (
            "CRC32 must reject any corrupted sidecar")
        try:
            out = api.decompress(loaded, device=False)
        except OK_ERRORS:
            continue
        np.testing.assert_array_equal(
            np.asarray(out).reshape(6, -1)[:, :500], stack)
        if trial % 10 == 0:
            # device path: walk_archive's v2 branch would consume the
            # sidecar tables with no validating walk — must see none
            dev = ops.decode(read_trpx(p), np.uint16)
            np.testing.assert_array_equal(
                np.asarray(dev).reshape(6, -1)[:, :500], stack)
