"""Hostile-input fuzzing of the TIFF ingest path.

`terse` feeds arbitrary user files into the TIFF reader; mutations of
valid files (byte flips across the header/IFD region, truncations,
tag-count lies, random garbage) must produce clean Python exceptions or
a successful (possibly wrong-pixel) parse — never a hang (IFD cycles),
crash, or unbounded allocation.
"""

import io

import numpy as np
import pytest

from trpx_tpu.io import read_tiff, write_tiff

OK_ERRORS = (ValueError, TypeError, OverflowError, KeyError, IndexError,
             OSError, MemoryError, np.exceptions.AxisError)


def _base_tiff() -> bytes:
    rng = np.random.default_rng(11)
    stack = rng.poisson(3.0, size=(3, 64, 64)).astype(np.uint16)
    return write_tiff(stack)


def _try_read(blob: bytes) -> None:
    try:
        read_tiff(io.BytesIO(blob))
    except OK_ERRORS:
        pass


def test_tiff_header_and_ifd_byte_flips():
    base = bytearray(_base_tiff())
    rng = np.random.default_rng(0)
    # dense flips over the first 512 bytes (header + first IFD) plus
    # random flips anywhere
    targets = list(range(0, min(512, len(base)))) + [
        int(rng.integers(0, len(base))) for _ in range(100)
    ]
    for i in targets:
        blob = bytearray(base)
        blob[i] ^= int(rng.integers(1, 256))
        _try_read(bytes(blob))


def test_tiff_truncations():
    base = _base_tiff()
    rng = np.random.default_rng(1)
    cuts = {0, 1, 2, 3, 4, 7, 8, 9, len(base) - 1}
    cuts |= {int(rng.integers(0, len(base))) for _ in range(40)}
    for cut in sorted(cuts):
        _try_read(base[:cut])


def test_tiff_random_garbage():
    rng = np.random.default_rng(2)
    for size in (0, 1, 8, 200, 65536):
        _try_read(rng.integers(0, 256, size=size, dtype=np.uint8).tobytes())
    # valid magic, garbage after
    for magic in (b"II*\x00", b"MM\x00*"):
        _try_read(magic + rng.integers(
            0, 256, size=300, dtype=np.uint8).tobytes())


def test_tiff_self_looping_ifd_terminates():
    """An IFD whose next-pointer loops back to itself must terminate
    (cycle set), not spin forever."""
    base = bytearray(_base_tiff())
    # first IFD offset lives at bytes 4..8 (LE); point the chain at a
    # crafted IFD that lists 0 entries and loops to itself
    loop_off = len(base)
    base += (0).to_bytes(2, "little")        # n_entries = 0
    base += loop_off.to_bytes(4, "little")   # next IFD -> itself
    blob = bytearray(base)
    blob[4:8] = loop_off.to_bytes(4, "little")
    _try_read(bytes(blob))


def test_tiff_huge_claims_bounded():
    """Entries claiming enormous dims/strip sizes must fail cleanly
    rather than allocate unboundedly (reads are bounds-checked against
    the actual file size)."""
    base = _base_tiff()
    rng = np.random.default_rng(3)
    for _ in range(30):
        blob = bytearray(base)
        # corrupt 4 random bytes inside the first IFD's value fields
        for _ in range(4):
            i = int(rng.integers(8, min(300, len(blob))))
            blob[i] = 0xFF
        _try_read(bytes(blob))
