# -*- coding: utf-8 -*-
"""Standalone single-file TRPX reader — the shippable format witness.

A from-scratch, dependency-free decoder for ``.trpx`` archives, the
counterpart of the reference's Fiji plugin (ImageJ/TRPX_Reader.java:21-150)
with its limitations lifted: any dtype the format encodes (signed and
unsigned, widths up to 64+sign), any frame count, with the multi-frame
offsets computed absolutely (the reference plugin is correct here; the
reference C++ decoder is not — SURVEY B1/B2).

Runs on CPython 2.7/3.x AND Jython 2.7 (Fiji's script interpreter): pure
stdlib, no numpy, no f-strings. Fiji users can run it from the script
editor to import TRPX stacks; the on-disk format is bit-identical to the
reference implementation, so the reference's own TRPX_Reader plugin reads
trpx_tpu archives too.

CLI: python trpx_reader.py file.trpx            -> prints header info
     python trpx_reader.py file.trpx out.raw    -> writes native-endian
                                                   little-endian raw pixels

Library: ``meta, frames = read(path)`` — frames is a list of ``array``
arrays (typecode h/H/l/L/q/Q chosen from the header).
"""

from __future__ import print_function

import array
import re
import struct
import sys

_ATTR = re.compile(r'(\w+)\s*=\s*"([^"]*)"')


def parse_header(blob):
    """Parse the leading ``<Terse .../>`` element (XML_element.hpp:216
    semantics: scanner, not a DOM; binary bytes follow immediately after
    the closing '>'). Returns (meta dict, payload offset)."""
    i = blob.find(b"<Terse")
    if i < 0:
        raise ValueError("tag <Terse> not found")
    j = blob.find(b">", i)
    if j < 0:
        raise ValueError("unterminated <Terse> element")
    text = blob[i:j].decode("ascii", "replace")
    meta = {}
    for k, v in _ATTR.findall(text):
        meta[k] = v
    out = {
        "prolix_bits": int(meta.get("prolix_bits", "0")),
        "signed": meta.get("signed", "0") not in ("0", ""),
        "block": int(meta.get("block", "12")),
        "memory_size": int(float(meta.get("memory_size", "0"))),
        "number_of_values": int(meta.get("number_of_values", "0")),
        "number_of_frames": int(meta.get("number_of_frames", "1")),
        "dimensions": [int(t) for t in meta.get("dimensions", "").split()],
    }
    return out, j + 1


def _typecode(prolix_bits, signed):
    """Output array typecode the way the prolix CLI picks dtypes
    (prolix.cpp:69-92, with the 32-bit B3 bug fixed and 64-bit added)."""
    if prolix_bits <= 16:
        return "h" if signed else "H"
    if prolix_bits <= 32:
        return "l" if signed else "L"
    return "q" if signed else "Q"


def decode_frame(payload, start_bit, nvalues, block, signed, out):
    """Decode one frame beginning at ``start_bit`` into ``out`` (a
    python array/list of length nvalues). Returns the bit position after
    the frame's last field. Header state machine per Terse.hpp:359-372;
    LSB-first field extraction per Bit_pointer.hpp:597-617."""
    pos = start_bit
    width = 0
    nblocks = (nvalues + block - 1) // block

    def bits(p, n):
        # LSB-first read of n bits at absolute bit p (n <= 64+)
        lo_byte = p >> 3
        hi_byte = (p + n + 7) >> 3
        chunk = payload[lo_byte:hi_byte]
        acc = 0
        for k in range(len(chunk) - 1, -1, -1):
            b = chunk[k]
            if not isinstance(b, int):  # py2/jython: str bytes
                b = ord(b)
            acc = (acc << 8) | b
        return (acc >> (p & 7)) & ((1 << n) - 1)

    for b in range(nblocks):
        lo = b * block
        hi = min(nvalues, lo + block)
        if bits(pos, 1):
            pos += 1  # repeat header: width unchanged
        else:
            w = bits(pos + 1, 3)
            if w < 7:
                pos += 4
            else:
                w += bits(pos + 4, 2)
                if w < 10:
                    pos += 6
                else:
                    w += bits(pos + 6, 6)
                    pos += 12
            width = w
        if width == 0:
            for i in range(lo, hi):
                out[i] = 0
            continue
        sign_at = 1 << (width - 1)
        full = 1 << width
        for i in range(lo, hi):
            u = bits(pos, width)
            pos += width
            if signed and (u & sign_at):
                u -= full  # two's complement sign extension
            out[i] = u
    return pos


def read(path_or_bytes):
    """Read a whole archive -> (meta, [frame arrays])."""
    if isinstance(path_or_bytes, (bytes, bytearray)):
        blob = bytes(path_or_bytes)
    else:
        f = open(path_or_bytes, "rb")
        try:
            blob = f.read()
        finally:
            f.close()
    meta, off = parse_header(blob)
    payload = blob[off : off + meta["memory_size"]]
    tc = _typecode(meta["prolix_bits"], meta["signed"])
    frames = []
    start_byte = 0
    for _f in range(meta["number_of_frames"]):
        out = array.array(tc, [0] * meta["number_of_values"])
        end_bit = decode_frame(payload, start_byte * 8,
                               meta["number_of_values"], meta["block"],
                               meta["signed"], out)
        frames.append(out)
        # frame boundary rule: byte after the terminal byte
        # (Terse.hpp:547; TRPX_Reader.java:130)
        start_byte += 1 + ((end_bit - start_byte * 8) >> 3)
    return meta, frames


def main(argv):
    if not argv or argv[0] in ("-h", "--help"):
        print(__doc__)
        return 2
    meta, frames = read(argv[0])
    print("frames=%d values=%d dims=%s signed=%d prolix_bits=%d block=%d" %
          (meta["number_of_frames"], meta["number_of_values"],
           "x".join(str(d) for d in meta["dimensions"]) or "-",
           int(meta["signed"]), meta["prolix_bits"], meta["block"]))
    if len(argv) > 1:
        fmt = "<" + {"h": "h", "H": "H", "l": "i", "L": "I",
                     "q": "q", "Q": "Q"}[frames[0].typecode]
        out = open(argv[1], "wb")
        try:
            for fr in frames:
                out.write(struct.pack(fmt * len(fr), *fr))
        finally:
            out.close()
        print("wrote %s (%d frames, little-endian raw)" %
              (argv[1], len(frames)))
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
