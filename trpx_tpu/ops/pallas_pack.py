"""Pallas TPU encode kernel: the whole merge tree in VMEM.

The jnp tree (ops/pack.py) is HBM-bound: every level's intermediates
round-trip to HBM (~100 MB per 512x512 frame measured). This kernel runs
plan + stage + all merge levels inside one ``pallas_call`` per frame, so
level intermediates live in VMEM and HBM sees only the input frame
(~0.5 MB) and the packed words (~0.4 MB soft-capped).

Bit semantics are identical to ops/pack.py (property-tested bit-identical
against it and the normative Python codec); the data layout is shaped by
what Mosaic lowers well — no strided slices, no gathers:

  * blocks are arranged as ``b = r + R*l``: an outer node axis ``r``
    (R = P/128 nodes) over L = 128 independent lane-local trees;
  * phase 1 (log2 R levels): pairs are adjacent in the OUTER axis, so
    A/B extraction is ``state.reshape(Rn//2, 2, C, L)[:, k]`` — pure
    outer-dim reshapes/slices. Word shifts run along the sublane (word)
    axis; per-node shift amounts broadcast over it.
  * phase 2 (log2 L levels): the 128 surviving lane-trees transpose once
    to rows ``(128, C)`` and merge with the (supported) middle-axis
    deinterleave ``reshape(Pn//2, 2, C)[:, k, :]``.
  * PHASE-ALIGNED merges (round 3): a plan-time prefix-sum gives every
    block its absolute bit offset; one funnel pass at level 0 moves each
    staged row to its final sub-word phase (pfx & 31), after which every
    merge level lifts B by (phase_a + la) >> 5 WHOLE WORDS — the
    per-level variable bit-funnel (~4 full-state VPU passes x 15 levels)
    is gone. Valid because every capacity schedule carries a +31-bit
    margin (pack.measured_schedule / row_capacity), which is exactly
    phase + length <= cap*32.

Soft capacities + overflow detection work exactly as in ops/pack.py.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .coding import FrameSpec
from .pack import row_capacity

#: dynamic-roll lift for the encode phase-2 merges with few nodes — the
#: mirror of pallas_unpack._DYN_ROLL (device-validated round 5): one
#: traced-shift cyclic UP-rotation per node instead of ~log2(C) static
#: roll-select passes. Phase 1 cannot use it (its lift k varies per
#: LANE — independent trees — and pltpu.roll shifts are scalars);
#: phase 2's k is per-node scalar. TRPX_DYN_ROLL_ENC=0 restores the
#: static chain.
_DYN_ROLL_ENC = os.environ.get("TRPX_DYN_ROLL_ENC", "0") == "1"
_DYN_ROLL_ENC_MAXM = int(os.environ.get("TRPX_DYN_ROLL_ENC_MAXM", "1"))

_U32 = jnp.uint32
_I32 = jnp.int32


def _pack_factor(spec: FrameSpec, in_dtype) -> int:
    """Values per uint32 word for PACKED natural input: 2 (u16 pairs)
    or 4 (u8 quads) when the input arrives as uint32 words for an
    unsigned narrow spec with a matching even block, else 0 (value
    planes). Must equal the staging stride (see _encode_body)."""
    if in_dtype != jnp.uint32 or spec.signed:
        return 0
    if spec.max_width <= 8 and spec.block % 4 == 0:
        return 4
    if 8 < spec.max_width <= 16 and spec.block % 2 == 0:
        return 2
    return 0


def _plan_planes(spec: FrameSpec, vplanes, R: int, L: int,
                 block_offset=None, n_total: int | None = None,
                 prev0=None, pairs: bool = False):
    """Per-block tables as (R, L) planes; block b = r + R*l.

    For tiled big-frame encodes: ``block_offset`` (traced scalar) shifts
    block indices into the global frame, ``n_total`` is the global value
    count, and ``prev0`` is the previous tile's last block width (the
    repeat-coding state crosses tile boundaries, Terse.hpp:517-535).

    ``pairs``: vplanes are B/2 PAIR planes (two u16 values per uint32
    word, values (2k, 2k+1) in plane k — the pair-packed input path;
    unsigned <=16-bit only)."""
    B = spec.block
    if pairs == 4:
        # quad planes: four u8 values per word (values 4k..4k+3)
        mags = [jax.lax.bitcast_convert_type(v, _U32) for v in vplanes]
        mags = [(u >> _U32(8 * d)) & _U32(0xFF)
                for u in mags for d in range(4)]
    elif pairs:
        mags = [jax.lax.bitcast_convert_type(v, _U32) for v in vplanes]
        mags = ([u & _U32(0xFFFF) for u in mags]
                + [u >> _U32(16) for u in mags])
    elif spec.signed:
        mags = [
            jax.lax.bitcast_convert_type(jnp.where(v < 0, -v, v), _U32)
            for v in vplanes
        ]
    else:
        mags = [jax.lax.bitcast_convert_type(v, _U32) for v in vplanes]
    setbits = mags[0]
    for m in mags[1:]:
        setbits = setbits | m
    nz = setbits != 0
    width = jnp.where(
        nz, _I32(32) - jax.lax.clz(setbits).astype(_I32), _I32(0)
    )
    if spec.signed:
        width = width + nz.astype(_I32)
    r_iota = jax.lax.broadcasted_iota(_I32, (R, L), 0)
    l_iota = jax.lax.broadcasted_iota(_I32, (R, L), 1)
    bidx = r_iota + R * l_iota
    if block_offset is not None:
        bidx = bidx + block_offset
    n_lim = spec.n if n_total is None else n_total
    nb_lim = -(-n_lim // B)
    real = bidx < nb_lim
    width = jnp.where(real, width, _I32(0))
    counts = jnp.clip(n_lim - bidx * B, 0, B)

    # previous block's width: sublane shift down, lane wrap for r == 0;
    # the very first block chains from the previous tile (or 0)
    first_prev = _I32(0) if prev0 is None else prev0.astype(_I32)
    top = jnp.roll(width[R - 1 : R], 1, axis=1)
    top = jnp.where(l_iota[:1] == 0, first_prev, top)
    if R > 1:
        prev = jnp.concatenate([top, width[:-1]], axis=0)
    else:
        prev = top
    repeat = (width == prev) & real
    hb = jnp.where(
        repeat, 1, jnp.where(width < 7, 4, jnp.where(width < 10, 6, 12))
    ).astype(_I32)
    hb = jnp.where(real, hb, _I32(0))
    hv = jnp.where(
        repeat,
        1,
        jnp.where(
            width < 7,
            width << 1,
            jnp.where(
                width < 10,
                (0b111 | ((width - 7) << 3)) << 1,
                (0b11111 | ((width - 10) << 5)) << 1,
            ),
        ),
    ).astype(_U32)
    hv = jnp.where(real, hv, _U32(0))
    return width, hb, hv, counts


def _cut_row(chk, ow: int):
    """Ablation early-exit grid: a full-tensor checksum (so nothing
    traced so far is dead-code-eliminated) splattered over the output
    word grid."""
    return jnp.broadcast_to(chk.astype(_U32)[None, None],
                            (ow // 128, 128))


def _encode_body(spec: FrameSpec, vplanes, ow_pad: int,
                 n_total: int | None = None, cut: int | None = None,
                 block_offset=None, prev0=None, want_carry: bool = False,
                 s0=None, pairs: bool = False):
    """Encode ONE frame (or tile) given its (R, L) value planes.

    Pure arrays -> arrays: returns (grid — (ow_pad/128, 128) uint32
    packed words, word w at [w >> 7, w & 127], with the three scalar
    slots in the last three positions — the frame's LAST block width for
    the tiled carry chain (0 unless ``want_carry``), and the stream's
    total bit count). Keeping the body free of refs lets _kernel run it
    both one-per-grid-step and under a fori_loop over a multi-frame
    block (grid-step amortization).

    ``s0`` (tiled): the tile's GLOBAL sub-word phase — the accumulated
    bit count of all previous tiles mod 32, carried through the SMEM
    chain. Folding it into the block phases makes the emitted tile
    stream sit at its final phase, so the host placement merge is pure
    word-offset DUS work (no funnel pass over the tile streams).

    ``cut`` (ablation only, tools/tpu_ablate_pallas.py): stop after that
    many merge levels (0 = stage only, -1 = plan only) and emit a
    checksum row — times where the kernel's ms go."""
    B = spec.block
    P = spec.tree_rows
    # sublane-align the level-0 capacity (e.g. uint8's 4 words -> 8)
    cap = _round_up(row_capacity(spec.max_block_bits), 8)
    caps = list(spec.pack_caps)
    use_soft = spec.soft
    L = min(128, P)
    R = P // L

    if cut is not None and cut < -1:  # input transpose only
        chk = vplanes[0]
        for v in vplanes[1:]:
            chk = chk + v
        return (_cut_row(jnp.sum(chk), ow_pad), _I32(0), _I32(0),
                _I32(0), _I32(0))

    width, hb, hv, counts = _plan_planes(
        spec, vplanes, R, L, block_offset=block_offset, n_total=n_total,
        prev0=prev0, pairs=pairs,
    )
    if want_carry:
        # the tile's last block width, for the next grid step (masked-max
        # extraction — plain scalar extraction from a 2-D vector trips
        # Mosaic)
        r_i = jax.lax.broadcasted_iota(_I32, (R, L), 0)
        l_i = jax.lax.broadcasted_iota(_I32, (R, L), 1)
        last = (r_i == R - 1) & (l_i == L - 1)
        lastw = jnp.max(jnp.where(last, width, _I32(0)))
    else:
        lastw = _I32(0)

    # exclusive prefix of block bit-lengths over the natural block order
    # b = r + R*l (r fastest): every block's absolute bit offset in the
    # frame. phase = pfx & 31 is the block's FINAL sub-word phase —
    # staging rows at that phase up front turns every merge level's
    # variable bit-funnel (~4 full-state VPU passes x 15 levels) into a
    # pure word-granularity roll (the phase-aligned merges below).
    # Capacities stay valid: every schedule carries a +31-bit margin
    # (pack.measured_schedule / row_capacity), exactly
    # phase + length <= cap*32.
    #
    # Hillis-Steele log-shift scans (a down-sweep over bottom-up level
    # sums is ~6x less traffic on paper but its per-level sublane
    # INTERLEAVE mis-lowers in Mosaic — measured 6.0 -> 9.6 ms FULL;
    # reverted).
    lengths = (hb + width * counts).astype(_I32)            # (R, L)
    inc = lengths
    step = 1
    while step < R:
        sh = jnp.roll(inc, step, axis=0)
        ridx = jax.lax.broadcasted_iota(_I32, (R, L), 0)
        inc = inc + jnp.where(ridx >= step, sh, _I32(0))
        step *= 2
    lane_tot = inc[R - 1 : R, :]                            # (1, L)
    lt = lane_tot
    step = 1
    while step < L:
        sh = jnp.roll(lt, step, axis=1)
        lidx = jax.lax.broadcasted_iota(_I32, (1, L), 1)
        lt = lt + jnp.where(lidx >= step, sh, _I32(0))
        step *= 2
    pfx = (inc - lengths) + (lt - lane_tot)                 # (R, L)
    if s0 is not None:  # tiled: fold the tile's global sub-word phase
        pfx = pfx + s0.astype(_I32)
    phase = pfx & 31                                        # (R, L)
    # total stream bits (masked-max: plain scalar indexing of a 2-D
    # vector trips Mosaic) — the tiled SMEM chain accumulates this
    total = jnp.max(lt)

    if cut is not None and cut < 0:  # plan only
        return (_cut_row(jnp.sum(width + hb + counts + phase)
                         + jnp.sum(hv.astype(_I32)), ow_pad), lastw, total,
                _I32(0), _I32(0))

    wmask = jnp.where(
        width >= 32,
        jnp.uint32(0xFFFFFFFF),
        (_U32(1) << jnp.clip(width, 0, 31).astype(_U32)) - _U32(1),
    )

    # ---- stage: progressive-shift build of each block's row (round 4) ---
    # Mirror of the decode kernel's progressive-shift extraction: value
    # groups are consumed from the HIGH end; each step shifts the
    # partial row up by stride*width bits and ORs the next group into
    # word 0, so group j ends at bit j*width and the live word span
    # GROWS with the groups placed — early steps touch 1-2 words.
    # Replaces the masked-select placement loop (union-over-widths
    # candidate scan: ~41 candidate words x 5 ops per block): ~30% fewer
    # stage ops. The per-lane up-shift s = stride*width is in [0, 32]
    # (value fusing keeps groups <= one 32-bit window): (x << 1) << (s-1)
    # is exact for s in [1, 32], and s == 0 only on width-0 lanes whose
    # row content is identically zero — no per-word k-select needed.
    # i32 is the one exception (fields up to 33 bits): its shift keeps a
    # word-select, and the 33rd bit (the sign) lands in word 1 directly.
    ph = phase.astype(_U32)                                 # (R, L)
    stride = 4 if spec.max_width <= 8 else (
        2 if spec.max_width <= 16 else 1)
    if pairs and stride != pairs:
        # a packed plane holds exactly `pairs` values (2 for u16 pairs,
        # 4 for u8 quads); any other stride would read neighbours from
        # the wrong word (review finding, round 5) — the staging gates
        # match dtype to packing, this guards direct callers
        raise ValueError(
            f"packed input with {pairs} values/word needs stride == "
            f"{pairs} (got {stride} for max_width {spec.max_width})")
    wu = jnp.clip(width, 0, 31).astype(_U32)
    zplane = jnp.zeros((R, L), _U32)

    def _p(lst, i):
        return lst[i] if 0 <= i < len(lst) else zplane

    s1 = (stride * width).astype(_U32)                      # [0, 32(+1)]
    s1c = jnp.clip(s1.astype(_I32) - 1, 0, 31).astype(_U32)
    if spec.max_width > 32:                                 # i32: s1 <= 33
        k1 = (s1 >= 32)
        sr = (s1 & 31).astype(_U32)                         # 32->0, 33->1
        src = jnp.clip(sr.astype(_I32) - 1, 0, 31).astype(_U32)
        sr0 = sr == 0
    rows = [zplane] * cap
    for g, j in enumerate(reversed(range(0, B, stride))):
        if g:
            # g groups in the row; post-shift top bit < (g+1)*stride*max_w
            span = min(cap,
                       ((g + 1) * stride * spec.max_width + 31) // 32)
            if spec.max_width > 32:
                a = [jnp.where(k1, _p(rows, i - 1), _p(rows, i))
                     for i in range(span)]
                rows = [
                    jnp.where(
                        sr0, a[i],
                        ((a[i] << _U32(1)) << src)
                        | (_p(a, i - 1) >> (_U32(31) - src)),
                    )
                    for i in range(span)
                ]
            else:
                rows = [
                    ((_p(rows, i) << _U32(1)) << s1c)
                    | (_p(rows, i - 1) >> (_U32(31) - s1c))
                    for i in range(span)
                ]
        valid = (j < counts) & (width > 0)
        if pairs:
            # one PACKED plane holds the whole group (2 values/word for
            # u16 pairs, 4 for u8 quads — the input transpose moved
            # 1/pairs of the words; unpacking here is the same
            # shift/mask the separate planes needed anyway)
            u = jax.lax.bitcast_convert_type(vplanes[j // pairs], _U32)
            vu = u & wmask
        else:
            vu = jax.lax.bitcast_convert_type(vplanes[j], _U32) & wmask
        vj = jnp.where(valid, vu, _U32(0))
        for d in range(1, stride):
            if j + d >= B:
                continue
            validd = (j + d < counts) & (width > 0)
            if pairs:
                vud = (u >> _U32((32 // pairs) * d)) & wmask
            else:
                vud = (jax.lax.bitcast_convert_type(vplanes[j + d], _U32)
                       & wmask)
            # zeros land beyond the block's own bits when j+d is padding
            vj = vj | (jnp.where(validd, vud, _U32(0)) << (wu * _U32(d)))
        rows[0] = _p(rows, 0) | vj
        if spec.max_width > 32:
            # width-33 fields: bit 32 (the int32 sign) is word 1 bit 0
            vhj = jnp.where(
                valid & (width > 32),
                ((vplanes[j] < 0) & (width == 33)).astype(_U32),
                _U32(0),
            )
            rows[1] = _p(rows, 1) | vhj
    # final funnel to the block's phase: payload moves from bit 0 to bit
    # phase + hb (1..43), then the header lands at [phase, phase + hb)
    t = (phase + hb).astype(_I32)
    kk = t >= 32
    tl = (t & 31).astype(_U32)
    tlc = jnp.clip(tl.astype(_I32) - 1, 0, 31).astype(_U32)
    tl0 = tl == 0
    a = [jnp.where(kk, _p(rows, i - 1), _p(rows, i)) for i in range(cap)]
    rows = [
        jnp.where(
            tl0, a[i],
            ((a[i] << _U32(1)) << tlc)
            | (_p(a, i - 1) >> (_U32(31) - tlc)),
        )
        for i in range(cap)
    ]
    rows[0] = rows[0] | (hv << ph)
    rows[1] = rows[1] | ((hv >> (_U32(31) - ph)) >> _U32(1))
    state = jnp.stack(rows, axis=1)                         # (R, cap, L)
    # (rows leave staging already at their final sub-word phase;
    # row_capacity's +31-bit margin guarantees phase + length fits cap)
    if cut == 0:  # stage only (incl. the phase shift)
        return (_cut_row(jnp.sum(jax.lax.bitcast_convert_type(state, _I32))
                         + jnp.sum(lengths), ow_pad), lastw, total,
                _I32(0), _I32(0))

    overflow = jnp.zeros((), bool)
    C = cap
    max_bits = spec.max_block_bits
    level = 0

    # ---- phase 1: merge along the outer node axis -----------------------
    # C stays 8-aligned so sublane-axis concats sit on tile boundaries.
    # Rows are PHASE-ALIGNED: block bits already sit at their final
    # sub-word phase, so B lifts by k = (phase_a + la) >> 5 WHOLE WORDS —
    # no per-level bit funnel (removed round 3). The lift is a CYCLIC
    # rotation of B within its OWN C words (round 4): the schedule margin
    # proves k <= C, so B's final position [k, k + wb) is exactly the
    # rotation split across the low/high halves — words that wrap around
    # are precisely the high-half content. jnp.roll wraps natively, so
    # each lift pass touches C words instead of the zero-padded 2C of
    # rounds 1-3 (half the lift traffic), the k == C bit needs no pass
    # (rotation by C is the identity), and one idx >= k select at
    # assembly routes each rotated word to its half.
    pa = phase                                              # (R, L)
    Rn = R
    while Rn > 1:
        M = Rn // 2
        s4 = state.reshape(M, 2, C, L)
        A = s4[:, 0]
        Bp = s4[:, 1]
        l3 = lengths.reshape(M, 2, L)
        la = l3[:, 0, :]                                    # (M, L)
        lb = l3[:, 1, :]
        pa = pa.reshape(M, 2, L)[:, 0, :]                   # (M, L)
        la_bound = min(max_bits, C * 32)
        k = ((pa + la) >> 5).astype(_U32)
        step = 1
        j = 0
        while step <= la_bound // 32 + 1 and step < C:
            bit = ((k >> j) & 1).astype(bool)[:, None, :]
            Bp = jnp.where(bit, jnp.roll(Bp, step, axis=1), Bp)
            step *= 2
            j += 1
        idx = jax.lax.broadcasted_iota(_I32, (M, C, L), 1)
        ge = idx >= k.astype(_I32)[:, None, :]
        state = jnp.concatenate(
            [A | jnp.where(ge, Bp, _U32(0)),
             jnp.where(ge, _U32(0), Bp)], axis=1)           # (M, 2C, L)
        lengths = la + lb
        Rn = M
        C = 2 * C
        max_bits *= 2
        level += 1
        if use_soft and level < len(caps) and caps[level] < C:
            c = _round_up(caps[level], 8)                   # sublane align
            if c < C:
                overflow = overflow | jnp.any(lengths > c * 32 - 31)
                state = state[:, :c, :]
                C = c
        if cut is not None and level >= cut:
            return (_cut_row(
                jnp.sum(jax.lax.bitcast_convert_type(state, _I32))
                + jnp.sum(lengths), ow_pad), lastw, total,
                _I32(0), _I32(0))

    # ---- transition: 128 lane-trees -> (L, S, 128) word grids -----------
    C128 = _round_up(C, 128)
    s2 = state.reshape(C, L)
    if C128 > C:  # sublane-aligned pad before the transpose
        s2 = jnp.concatenate(
            [s2, jnp.zeros((C128 - C, L), _U32)], axis=0
        )
    rows = s2.T                                             # (L, C128)
    C = C128
    state3 = rows.reshape(L, C // 128, 128)
    lp = jnp.broadcast_to(lengths.reshape(L, 1), (L, L))    # lengths plane
    pp = jnp.broadcast_to(pa.reshape(L, 1), (L, L))         # phase plane

    # ---- phase 2: merge along the outer node axis of (M, S, 128) grids --
    # Word w of node m lives at [m, w >> 7, w & 127]: pairs split by an
    # outer reshape, B lifts UP by k = (phase_a + la) >> 5 whole words.
    # As in phase 1 (round 4), the lift is a CYCLIC rotation within B's
    # OWN S sublanes — _roll3_up_nz's lane-carry wraps, so it already IS
    # a true word rotation mod C — at half the zero-padded 2S traffic,
    # with one word-index >= k select at assembly routing each rotated
    # word to its half (k <= C by the schedule margin; the k == C bit is
    # the identity rotation and needs no pass).
    Pn = L
    while Pn > 1:
        M = Pn // 2
        S = C // 128
        s4 = state3.reshape(M, 2, S, 128)
        A = s4[:, 0]
        Bp = s4[:, 1]
        lp3 = lp.reshape(M, 2, L)
        la_p = lp3[:, 0, :]                                 # (M, L)
        lb_p = lp3[:, 1, :]
        pa_p = pp.reshape(M, 2, L)[:, 0, :]                 # (M, L)
        la = la_p[:, :1].astype(_I32)                       # (M, 1)
        pa2 = pa_p[:, :1].astype(_I32)                      # (M, 1)
        # phase-aligned: word-granularity lift only (no bit funnel)
        if _DYN_ROLL_ENC and M <= _DYN_ROLL_ENC_MAXM and C >= 512:
            # few nodes: one dynamic rotation PER NODE instead of
            # ~log2(C) static roll-select passes over all of them
            kws = ((pa2 + la) >> 5).astype(_I32)            # (M, 1)
            parts = [
                _roll3_up_dyn1(Bp[m : m + 1], kws[m, 0])
                for m in range(M)
            ]
            Bp = parts[0] if M == 1 else jnp.concatenate(parts, axis=0)
            k3 = _bcast3(((pa2 + la) >> 5).astype(_U32), M, S)
        else:
            k3 = _bcast3(((pa2 + la) >> 5).astype(_U32), M, S)
            step = 1
            j = 0
            while step < C:
                bit = ((k3 >> j) & 1) != 0
                Bp = jnp.where(bit, _roll3_up_nz(Bp, step), Bp)
                step *= 2
                j += 1
        sub_i = jax.lax.broadcasted_iota(_I32, (M, S, 128), 1)
        lane_i = jax.lax.broadcasted_iota(_I32, (M, S, 128), 2)
        ge = (sub_i * 128 + lane_i) >= \
            jax.lax.bitcast_convert_type(k3, _I32)
        state3 = jnp.concatenate(
            [A | jnp.where(ge, Bp, _U32(0)),
             jnp.where(ge, _U32(0), Bp)], axis=1)           # (M, 2S, 128)
        lp = la_p + lb_p
        pp = pa_p
        Pn = M
        C = 2 * C
        max_bits *= 2
        level += 1
        if use_soft and level < len(caps) and caps[level] < C:
            # flag against the SCHEDULE bound (what the prepass proved and
            # what sizes the host output buffer), not the physical
            # capacity: 1024-rounding may leave capacity larger than the
            # schedule, and a silently-longer stream would be truncated
            # by the host's out_words slice
            overflow = overflow | jnp.any(lp[:, :1] > caps[level] * 32 - 31)
            # 1024-word (8x128 tile) alignment: sublane cuts stay on tile
            # boundaries; still >= the prepass's proven schedule
            c = _round_up(caps[level], 1024)
            if c < C:
                state3 = state3[:, : c // 128, :]
                C = c
        if cut is not None and level >= cut:
            return (_cut_row(
                jnp.sum(jax.lax.bitcast_convert_type(state3, _I32))
                + jnp.sum(lp), ow_pad), lastw, total,
                _I32(0), _I32(0))

    # keep the (S, 128) word-grid layout all the way to the output
    # boundary: the old reshape to a (1, C) lane row was a full
    # cross-tile relayout into a 1/8-dense VMEM buffer (the decode-side
    # twin of this measured 3.9 ms of 6.8 per 256 frames, round 3); the
    # host's view back to a flat (F, ow_pad) row is free on HBM
    g = state3[0]                                       # (C//128, 128)
    So = ow_pad // 128
    if So <= g.shape[0]:
        g = g[:So]
    else:
        g = jnp.concatenate(
            [g, jnp.zeros((So - g.shape[0], 128), _U32)], axis=0)
    return g, lastw, total, jnp.max(width), overflow.astype(_I32)


def _natural_planes(xi, R: int, B: int):
    # input planes [j, r, l] = value j of block b = r + R*l from the
    # frame's NATIVE flat layout: one in-VMEM 2-D transpose + middle-
    # axis slices (the XLA-side (F,L,R,B)->(F,B,R,L) materialization
    # this replaces cost ~40% of encode wall time, measured round 2).
    # Widen BEFORE transposing: a u16-native transpose is half the
    # VMEM traffic on paper but lowers worse (measured +0.24 ms FULL,
    # round 3); i32 transposes are Mosaic's best-supported relayout.
    xt = xi.astype(_I32).T                              # (R*B, L)
    x3 = xt.reshape(R, B, xt.shape[1])
    return [x3[:, j, :] for j in range(B)]


def _kernel(spec: FrameSpec, frame_ref, words_ref,
            cut: int | None = None, natural: bool = False):
    """One grid step: one whole frame (untiled path, grid (F,)).

    (A multi-frame-per-step variant — fori_loop over a grouped block with
    dynamic leading-dim ref indexing — was measured round 3 at +-1% of
    one-per-step on v5e under CSE-proof chained timing: per-grid-step
    overhead is <0.3 us, so it was removed.)"""
    B = spec.block
    P = spec.tree_rows
    L = min(128, P)
    R = P // L
    ow_pad = words_ref.shape[-2] * words_ref.shape[-1]  # (S, 128) grid

    if natural:
        xi = frame_ref[0]
        # uint32 input for an unsigned <=16-bit spec = PAIR-PACKED rows
        # (stage_natural): two values per word, HALF the in-VMEM
        # transpose — the single largest encode cut (round 5)
        pairs = _pack_factor(spec, xi.dtype)
        if xi.shape[0] < L:  # zero pad rows live in VMEM, not HBM
            xi = jnp.concatenate(
                [xi, jnp.zeros((L - xi.shape[0], xi.shape[1]),
                               xi.dtype)], axis=0)
        if pairs:
            vplanes = _natural_planes(
                jax.lax.bitcast_convert_type(xi, _I32), R, B // pairs)
        else:
            vplanes = _natural_planes(xi, R, B)
    else:
        pairs = 0
        vplanes = [frame_ref[0, j].astype(_I32) for j in range(B)]
    row, _, total, maxw, over = _encode_body(spec, vplanes, ow_pad,
                                             cut=cut, pairs=pairs)
    # the per-frame scalars ride the last three word slots (the host
    # never reads words beyond out_words <= ow_pad-3, so they're
    # free; SMEM scalar outputs would write back (F,1) constant-
    # index blocks every grid step — O(F^2) traffic)
    So = row.shape[0]
    sub_i = jax.lax.broadcasted_iota(_I32, (So, 128), 0)
    lane_i = jax.lax.broadcasted_iota(_I32, (So, 128), 1)
    wi = jax.lax.bitcast_convert_type(row, _I32)
    tail = sub_i == So - 1
    wi = jnp.where(tail & (lane_i == 125), total, wi)
    wi = jnp.where(tail & (lane_i == 126), maxw, wi)
    wi = jnp.where(tail & (lane_i == 127), over, wi)
    words_ref[0] = jax.lax.bitcast_convert_type(wi, _U32)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _bcast3(v, M: int, S: int):
    """Broadcast per-node scalars (M, 1) -> (M, S, 128) in two Mosaic-
    supported steps: a lane broadcast, then a sublane ``pltpu.repeat``.
    A plain two-step broadcast_to gets re-folded by the XLA simplifier
    into one (M,1,1)->(M,S,128) broadcast, which hits Mosaic's
    unimplemented 'broadcast in both sublanes and lanes'; repeat is a
    real data op the simplifier keeps."""
    t = jnp.broadcast_to(v, (M, 128))[:, None, :]
    if S == 1:
        return t
    return pltpu.repeat(t, S, axis=1)


def _roll3_up_nz(x, step: int):
    """Word shift toward higher indices on a (M, S, 128) word grid
    (word w = s*128 + l) WITHOUT wrap masks. Binary-lifting steps are
    powers of two, so a step is either a multiple of 128 (pure sublane
    roll — cheap) or < 128 (one lane roll + a sublane-carry fix) — never
    a lane shift across the full row, which starved sublanes at deep
    merge levels (the round-1 ablation's dominant cost). Both rolls
    wrap, so the composition over the bits of k is a true CYCLIC word
    rotation mod S*128 — exactly what the round-4 half-buffer merge
    lifts need (the wrapped-around words ARE the high-half content)."""
    M, S, L = x.shape
    if step >= S * L:
        return jnp.zeros_like(x)
    if step % L == 0:
        return jnp.roll(x, step // L, axis=1)
    a = jnp.roll(x, step, axis=2)
    # S == 1: the sublane carry wraps onto itself (roll by 1 mod 1 is
    # the identity) — and jnp.roll's zero-effective-shift lowering emits
    # a 0-sized slice that Mosaic rejects ("vector types must have
    # positive constant sizes"), so return a directly
    b = jnp.roll(a, 1, axis=1) if S > 1 else a
    lane = jax.lax.broadcasted_iota(_I32, x.shape, 2)
    return jnp.where(lane >= step, a, b)


def _roll3_up_dyn1(x, kscal):
    """(1, S, 128) cyclic UP-rotation by a TRACED k words (w -> w + k
    mod S*128): lane rotation + sublane-carry select + sublane rotation
    — the encode mirror of pallas_unpack's roll_down_dyn1. Replaces the
    ~log2(C) static roll-select passes at merge levels whose lift k is
    a single scalar (M == 1 top levels). The wrap needs no mask: the
    half-buffer cyclic merge routes wrapped words by the word-index
    >= k select at assembly (round 4)."""
    M1, S, Lx = x.shape
    klane = (kscal % Lx).astype(_I32)
    a1 = pltpu.roll(x, klane, 2)
    if S == 1:
        return a1  # rotation mod 128 is the whole rotation
    b1 = pltpu.roll(a1, 1, 1)
    lane = jax.lax.broadcasted_iota(_I32, x.shape, 2)
    a2 = jnp.where(lane >= klane, a1, b1)
    ksub = ((kscal // Lx) % S).astype(_I32)
    return pltpu.roll(a2, ksub, 1)


def _roll3_down_nz(x, step: int):
    """Inverse of _roll3_up_nz without wrap masks — valid when the
    caller proves the wrapped-in zone [size - total_shift, size) is
    never consumed (decode drops masks only on levels where
    C >= Cc + la_w_max + 2, so the child truncation [:Sc] excludes the
    zone)."""
    M, S, L = x.shape
    if step >= S * L:
        return jnp.zeros_like(x)
    if step % L == 0:
        return jnp.roll(x, -(step // L), axis=1)
    a = jnp.roll(x, -step, axis=2)
    b = jnp.roll(a, -1, axis=1) if S > 1 else a  # see _roll3_up_nz
    lane = jax.lax.broadcasted_iota(_I32, x.shape, 2)
    return jnp.where(lane < L - step, a, b)


def _roll3_down(x, step: int):
    """Masked down-shift toward lower word indices (non-cyclic: the
    wrap zone is zeroed per pass). Decode's split lifts use this on
    levels where the wrap zone could intrude into the child truncation;
    the round-4 end-mask alternative (always-nz + one final select)
    measured SLOWER — the per-pass masks fuse into the roll selects."""
    M, S, L = x.shape
    if step >= S * L:
        return jnp.zeros_like(x)
    if step % L == 0:
        k = step // L
        rolled = jnp.roll(x, -k, axis=1)
        sub = jax.lax.broadcasted_iota(_I32, x.shape, 1)
        return jnp.where(sub < S - k, rolled, _U32(0))
    a = jnp.roll(x, -step, axis=2)
    b = jnp.roll(a, -1, axis=1) if S > 1 else a  # see _roll3_up_nz
    sub = jax.lax.broadcasted_iota(_I32, x.shape, 1)
    lane = jax.lax.broadcasted_iota(_I32, x.shape, 2)
    bm = jnp.where(sub < S - 1, b, _U32(0))
    return jnp.where(lane < L - step, a, bm)


@functools.partial(jax.jit, static_argnums=(0, 2, 3, 4))
def encode_batch_pallas(spec: FrameSpec, frames: jax.Array,
                        interpret: bool = False, cut: int | None = None,
                        pre_arranged: bool = False):
    """Pallas encode of a (F, n_padded) batch.

    Returns (words (F, out_words), bits (F,), maxw (F,), over (F,)) —
    the same contract as ops.coding.encode_batch_device. ``cut`` is the
    ablation early-exit (see _encode_body); production callers leave it
    None. ``pre_arranged``: the input is already in kernel layout
    (F, B, R, L) (value v = B*(r + R*l) + j at [f, j, r, l]) — skips the
    device-side transpose for hosts that arrange during ingest.
    """
    B = spec.block
    P = spec.tree_rows
    L = min(128, P)
    R = P // L
    F = frames.shape[0]
    if pre_arranged:
        x = frames
        in_spec = pl.BlockSpec((1, B, R, L), lambda f: (f, 0, 0, 0),
                               memory_space=pltpu.VMEM)
        natural = False
    elif frames.ndim == 3:
        # NATURAL KERNEL layout staged by the host (stage_natural — a
        # free numpy view): (F, Lr, R*B) values, or (F, Lr, R*B/2)
        # uint32 PAIR rows for unsigned <=16-bit dtypes (two values per
        # word — half the in-VMEM transpose). The in-jit 2-D->3-D
        # reshape below is NOT free on TPU (the lane dimension changes,
        # forcing a relayout copy of the whole batch — round 5)
        x = frames
        in_spec = pl.BlockSpec((1, frames.shape[1], frames.shape[2]),
                               lambda f: (f, 0, 0),
                               memory_space=pltpu.VMEM)
        natural = True
    else:
        # NATURAL layout: a free metadata reshape — the kernel transposes
        # in VMEM (one 2-D transpose; the old XLA-side materialized
        # transpose cost ~40% of encode wall time).
        # Only the rows that hold real values cross HBM: the pow2 tree
        # pads blocks up to 1.5x (512² u16: 21,846 -> 32,768), and the
        # padding rows are identically zero — the kernel concats them in
        # VMEM instead of DMA-ing them (input DMA is the plan-cut floor,
        # 0.94 of 1.12 ms per 256 frames; this trims it ~31%). Lr is
        # 8-row aligned so the in-kernel sublane concat sits on tile
        # boundaries.
        Lr = min(L, _round_up(-(-spec.n // (R * B)), 8))
        if frames.shape[1] < Lr * R * B:
            pad = jnp.zeros((F, Lr * R * B - frames.shape[1]),
                            frames.dtype)
            frames = jnp.concatenate([frames, pad], axis=1)
        elif frames.shape[1] > Lr * R * B:  # caller padded to P*B; the
            frames = frames[:, : Lr * R * B]  # tail rows are zeros
        x = frames.reshape(F, Lr, R * B)
        in_spec = pl.BlockSpec((1, Lr, R * B), lambda f: (f, 0, 0),
                               memory_space=pltpu.VMEM)
        natural = True
    out_words = spec.out_words
    # +3 scalar tail slots; 1024-aligned so the (S, 128) output grid
    # stays on whole (8, 128) tiles
    ow_pad = _round_up(out_words + 3, 1024)

    kernel = functools.partial(_kernel, spec, cut=cut, natural=natural)
    words = pl.pallas_call(
        kernel,
        grid=(F,),
        in_specs=[in_spec],
        out_specs=pl.BlockSpec((1, ow_pad // 128, 128),
                               lambda f: (f, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((F, ow_pad // 128, 128),
                                       jnp.uint32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,  # default 16M caps ~700k
            #                                      values/frame (u32)
            dimension_semantics=("parallel",),   # frames independent
        ),
        interpret=interpret,
    )(x)
    # return the kernel's OWN (F, S, 128) word grid: flattening to
    # (F, out_words) on-device costs a relayout+copy (lane dimension
    # changes + unaligned slice — the decode-side twin measured 8%,
    # round 5). Row-major bytes ARE the stream; hosts flatten for free
    # (assemble_archive and the stream writers already reshape by
    # shape[0]). The three per-frame scalars ride the final row's last
    # lanes (see _kernel) and slice out without touching the grid.
    wi = jax.lax.bitcast_convert_type(words, jnp.int32)
    return (words, wi[:, -1, 125], wi[:, -1, 126], wi[:, -1, 127])


def stage_natural(spec: FrameSpec, frames: np.ndarray) -> np.ndarray:
    """Free host-side view of a padded (F, n_staged) batch in the encode
    kernel's natural layout (see encode_batch_pallas's 3-D input path).
    No copy: a numpy view of the C-contiguous array. For unsigned
    <=16-bit dtypes with an even block, rows are PAIR-PACKED uint32
    ((F, Lr, R*B/2), values (2k, 2k+1) little-endian in word k): the
    kernel transposes HALF the words and unpacks during staging, where
    the shift/mask already exists."""
    P = spec.tree_rows
    L = min(128, P)
    R = P // L
    B = spec.block
    pairs = 0
    if not spec.signed:
        if (8 < spec.max_width <= 16 and B % 2 == 0
                and frames.dtype == np.uint16):
            pairs = 2
        elif (spec.max_width <= 8 and B % 4 == 0
              and frames.dtype == np.uint8):
            pairs = 4
    if P >= 128 and not spec.pallas_ok:
        # TILED kernel layout (F, T, L, R*B[/2]); callers pad to
        # spec.n_staged_tiled (bench.staged_values does)
        Tb = TILE_BLOCKS
        T = -(-spec.nb // Tb)
        Lt = min(128, Tb)
        Rt = Tb // Lt
        if frames.shape[1] != T * Tb * B:
            raise ValueError(
                f"tiled staging needs width n_staged_tiled="
                f"{T * Tb * B}, got {frames.shape[1]}")
        if pairs:
            return frames.view(np.uint32).reshape(
                frames.shape[0], T, Lt, (Rt * B) // pairs)
        return frames.reshape(frames.shape[0], T, Lt, Rt * B)
    Lr = min(L, _round_up(-(-spec.n // (R * B)), 8))
    if pairs:
        return frames.view(np.uint32).reshape(
            frames.shape[0], Lr, (R * B) // pairs)
    return frames.reshape(frames.shape[0], Lr, R * B)


def stage_natural_device(spec: FrameSpec, frames, F: int):
    """Device-side twin of stage_natural for an ALREADY-RESIDENT padded
    2-D batch (bench/tool staging outside timed chains; production hosts
    use the free numpy-view stage_natural instead). Returns the 3-D
    kernel layout — pair-packed u32 under the same conditions."""
    P = spec.tree_rows
    L = min(128, P)
    rb = (P // L) * spec.block
    if not spec.signed and 8 < spec.max_width <= 16 \
            and spec.block % 2 == 0:
        v = frames.astype(jnp.uint32).reshape(F, -1, 2)
        return (v[..., 0] | (v[..., 1] << 16)).reshape(F, -1, rb // 2)
    if not spec.signed and spec.max_width <= 8 and spec.block % 4 == 0:
        v = frames.astype(jnp.uint32).reshape(F, -1, 4)
        return (v[..., 0] | (v[..., 1] << 8) | (v[..., 2] << 16)
                | (v[..., 3] << 24)).reshape(F, -1, rb // 4)
    return frames.reshape(F, -1, rb)


def encode(
    frames: np.ndarray,
    block: int = 12,
    dimensions: tuple[int, ...] = (),
    cap_ratio: float = 0.5,
    interpret: bool = False,
):
    """Host wrapper mirroring ops.coding.encode but on the Pallas kernel."""
    from .coding import assemble_archive

    frames = np.asarray(frames)
    if frames.ndim == 1:
        frames = frames[None]
    elif frames.ndim == 3:
        if not dimensions:
            dimensions = (frames.shape[2], frames.shape[1])
        frames = frames.reshape(frames.shape[0], -1)
    F, n = frames.shape
    spec = FrameSpec.for_dtype(n, frames.dtype, block, cap_ratio=cap_ratio)
    padded = np.zeros((F, spec.tree_rows * spec.block), dtype=frames.dtype)
    padded[:, :n] = frames
    words, bits, maxw, over = jax.device_get(
        encode_batch_pallas(spec, padded, interpret)
    )
    if spec.soft and bool(np.any(over)):
        spec = spec.with_ratio(1.0)
        words, bits, maxw, over = jax.device_get(
            encode_batch_pallas(spec, padded, interpret)
        )
    return assemble_archive(spec, words, bits, maxw, dimensions)


#: blocks per tile for big-frame encodes (a pow2 whose VMEM tree fits).
#: Swept round 4 with the in-kernel DMA placement: at F=8, 16384 reads
#: ~5-10% faster than 32768 (2048² 3.60 vs 3.79 ms; 4096² 13.82 vs
#: 15.34) but at the production F=32 batch they are identical (2,980 vs
#: 2,978 fps, same max-schedule) — grid pipelining amortizes the
#: per-tile fixed costs. 8192 and 65536 lose at every F (per-tile
#: overhead / deeper trees + pow2 padding).
TILE_BLOCKS = 32768


def _roll2_up(x, step: int):
    """Cyclic word rotation toward higher indices on an (S, 128) grid
    (word w = s*128 + l); the 2-D twin of _roll3_up_nz."""
    S, L = x.shape
    if step % L == 0:
        return jnp.roll(x, step // L, axis=0)
    a = jnp.roll(x, step, axis=1)
    b = jnp.roll(a, 1, axis=0) if S > 1 else a  # see _roll3_up_nz
    lane = jax.lax.broadcasted_iota(_I32, x.shape, 1)
    return jnp.where(lane >= step, a, b)


def _tiled_kernel(tspec: FrameSpec, n_total: int,
                  frame_ref, stream_ref, scal_ref,
                  carry_ref, vrow_ref, brow_ref, sem):
    """One grid step of the tiled big-frame encode: pack ONE tile and
    DMA it straight into the frame's output stream at its global word
    offset — no host/jnp merge pass exists (the round-2 ragged merge
    cost 6.6 of 17 ms at 2048²; the round-3/4 placement merge still
    cost +2.4 ms of 6.35 at F=8 because a batched dynamic-offset
    update lowers to scatter→serial while loops on TPU).

    Placement: ``carry_ref`` (SMEM (2,)) chains the previous tile's last
    block width (repeat coding crosses tiles, Terse.hpp:517-535) and the
    accumulated bit count ``acc`` through the sequential T grid steps.
    The tile packs at sub-word phase ``acc & 31``, is then rotated up by
    ``w0 = (acc >> 5) & 127`` words (7 conditional cyclic passes), so
    its buffer is exactly the global stream's content for the 128-word-
    aligned window starting at row ``acc >> 12`` — which a single DMA
    writes into ``stream_ref`` (whole-array HBM ref, dynamic sublane
    offset). Tile boundaries fall mid-window: the next tile's window
    overlaps this tile's last written row, so each step saves the row at
    the NEXT tile's start (``brow_ref``, persistent VMEM (1, 128)) and
    ORs the carried row into its own row 0 — by induction every window
    holds the true stream up to its tile's end, and later windows
    overwrite earlier ones only with identical-or-fuller content.
    At t == 0 the chain resets, so nothing leaks between frames even
    when a Megacore splits the (parallel) F axis.

    Per-tile scalars (bit count, max width, overflow flag) leave through
    ``scal_ref`` lanes 0-2 instead of riding the stream tail."""
    B = tspec.block
    P = tspec.tree_rows
    L = min(128, P)
    R = P // L
    S = vrow_ref.shape[0]
    t = pl.program_id(1)
    f = pl.program_id(0)
    prev0 = jnp.where(t == 0, _I32(0), carry_ref[0])
    acc = jnp.where(t == 0, _I32(0), carry_ref[1])

    xi = frame_ref[0, 0]
    pairs = _pack_factor(tspec, xi.dtype)
    if pairs:
        vplanes = _natural_planes(
            jax.lax.bitcast_convert_type(xi, _I32), R, B // pairs)
    else:
        vplanes = _natural_planes(xi, R, B)
    row, lastw, total, maxw, over = _encode_body(
        tspec, vplanes, S * 128, n_total=n_total,
        block_offset=t * P, prev0=prev0, want_carry=True,
        s0=acc & 31, pairs=pairs)

    # rotate up to the window phase: content moves to words [w0, w0+occ)
    # (occ + 127 <= S*128 by the +1024-word headroom, so the wrap zone
    # only ever carries zeros — beyond-occupancy state is zero by the
    # encode invariant)
    w0 = (acc >> 5) & 127
    step = 1
    j = 0
    while step < 128:
        bit = ((w0 >> j) & 1) != 0
        row = jnp.where(bit, _roll2_up(row, step), row)
        step *= 2
        j += 1
    # OR the carried boundary row (the previous tile's content for this
    # window's first 128 words) into row 0
    sub_i = jax.lax.broadcasted_iota(_I32, (S, 128), 0)
    bv = jnp.broadcast_to(brow_ref[0:1, :], (S, 128))
    row = jnp.where((t > 0) & (sub_i == 0), row | bv, row)
    # save the row at the NEXT tile's window start for its boundary OR
    # (rb < S: a tile stream spans > 128 words, and occ + w0 fits S*128)
    accn = acc + total
    rb = (accn >> 12) - (acc >> 12)
    # masked single-row extraction via i32 sum (Mosaic has no unsigned
    # reductions, and an i32 max would mis-order values >= 2^31; the sum
    # is exact — exactly one row survives the mask)
    ri = jax.lax.bitcast_convert_type(row, _I32)
    brow_ref[0:1, :] = jax.lax.bitcast_convert_type(
        jnp.sum(jnp.where(sub_i == rb, ri, _I32(0)), axis=0,
                keepdims=True), _U32)

    vrow_ref[...] = row
    carry_ref[0] = lastw
    carry_ref[1] = accn
    cp = pltpu.make_async_copy(
        vrow_ref, stream_ref.at[f, pl.ds(acc >> 12, S), :], sem)
    cp.start()
    cp.wait()

    lane_i = jax.lax.broadcasted_iota(_I32, (8, 128), 1)
    sub8 = jax.lax.broadcasted_iota(_I32, (8, 128), 0)
    s = jnp.where((sub8 == 0) & (lane_i == 0), total, _I32(0))
    s = jnp.where((sub8 == 0) & (lane_i == 1), maxw, s)
    s = jnp.where((sub8 == 0) & (lane_i == 2), over, s)
    scal_ref[0, 0] = s


@functools.partial(jax.jit, static_argnums=(0, 2, 3))
def encode_batch_pallas_tiled(spec: FrameSpec, frames: jax.Array,
                              interpret: bool = False,
                              merge: bool = True):
    """Big-frame encode: per-tile Pallas VMEM packs, placed into the
    final stream by in-kernel DMA (see _tiled_kernel) — one write pass
    over the output, no merge stage anywhere.

    Frames whose whole merge tree exceeds VMEM (2K/4K detectors) split
    into tiles of TILE_BLOCKS blocks; each tile packs in VMEM on its own
    grid step and lands at its global word offset directly.

    Same contract as encode_batch_pallas: (words, bits, maxw, over) —
    ``words`` is (F, Wout) with each frame's stream at word 0; words
    beyond a frame's ``1 + bits // 8`` bytes are UNSPECIFIED (the DMA
    windows cover exactly the occupied region plus in-window zero
    padding). ``merge`` is accepted for compatibility and ignored.
    """
    del merge
    F = frames.shape[0]
    B = spec.block
    Tb = TILE_BLOCKS
    T = -(-spec.nb // Tb)
    total_blocks = T * Tb
    # a tile's subtree nodes are a subset of the frame's tree nodes
    # (contiguous aligned block groups), so a measured frame schedule
    # truncated to the tile depth stays proven for every tile
    tsched = (spec.cap_sched[: Tb.bit_length()]
              if spec.cap_sched is not None else None)
    tspec = FrameSpec(n=Tb * B, block=B, signed=spec.signed,
                      max_width=spec.max_width, cap_ratio=spec.cap_ratio,
                      cap_sched=tsched)
    L = min(128, Tb)
    R = Tb // L
    if frames.ndim == 4:
        # host-staged tiled kernel layout (stage_natural: free numpy
        # view; (F, T, L, R*B) values or (F, T, L, R*B/2) uint32 pairs)
        x = frames
    else:
        if frames.shape[1] < total_blocks * B:
            pad = jnp.zeros((F, total_blocks * B - frames.shape[1]),
                            frames.dtype)
            frames = jnp.concatenate([frames, pad], axis=1)
        elif frames.shape[1] > total_blocks * B:
            frames = frames[:, : total_blocks * B]
        # NOT free in-jit (lane-dim change): host callers stage instead
        x = frames.reshape(F, T, L, R * B)

    # tile window: worst-case tile stream + 127 words of rotation phase,
    # rounded so the (S, 128) grid sits on whole (8, 128) tiles
    ow = _round_up(tspec.out_words, 1024) + 1024
    S = ow // 128
    # output rows: the last tile's window must fit behind the worst-case
    # total stream
    Sout = _round_up(spec.out_words, 128) // 128 + S + 8
    kernel = functools.partial(_tiled_kernel, tspec, spec.n)
    stream, scal = pl.pallas_call(
        kernel,
        grid=(F, T),
        in_specs=[
            pl.BlockSpec((1, 1, L, x.shape[3]), lambda f, t: (f, t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 1, 8, 128), lambda f, t: (f, t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((F, Sout, 128), jnp.uint32),
            jax.ShapeDtypeStruct((F, T, 8, 128), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.SMEM((2,), jnp.int32),
            pltpu.VMEM((S, 128), jnp.uint32),
            pltpu.VMEM((1, 128), jnp.uint32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            # T must stay sequential (the carry chains through it); F may
            # split across Megacore cores — each frame restarts at t == 0
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(x)
    words = stream.reshape(F, Sout * 128)
    bits = scal[:, :, 0, 0]                                 # (F, T)
    maxw = scal[:, :, 0, 1]
    over = scal[:, :, 0, 2]
    return (words, jnp.sum(bits, axis=1), jnp.max(maxw, axis=1),
            jnp.max(over, axis=1))
