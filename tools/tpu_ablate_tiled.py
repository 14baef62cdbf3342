"""Ablation of the tiled big-frame encode path: where do the ms go?

Stages: prepass (the retired jnp prev-width chain, kept for comparison —
the kernel now carries prev width across grid steps in SMEM), kernel
(per-tile Pallas packs, checksum-consumed, no merge), FULL (packs +
single-pass placement merge). RTT-corrected per the CLAUDE.md
measurement rules. Round-2 finding recorded in BASELINE.md: the old
ragged merge was 6.6 of 17 ms at 2048; the placement merge cut FULL to
~5 ms for 8 frames.

Run: python tools/tpu_ablate_tiled.py [F] [side] [cap_ratio].
"""

import os
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

cache = os.path.expanduser("~/.cache/trpx_tpu/jax")
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from trpx_tpu.ops.coding import FrameSpec  # noqa: E402
from trpx_tpu.ops import pallas_pack as pp  # noqa: E402


def main():
    F = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    side = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 0.25
    n = side * side
    spec = FrameSpec.for_dtype(n, np.uint32, cap_ratio=ratio)
    Tb = pp.TILE_BLOCKS
    T = -(-spec.nb // Tb)
    print(f"F={F} side={side} T={T} tiles of {Tb} blocks", file=sys.stderr)

    key = jax.random.PRNGKey(0)
    x = jax.random.poisson(key, 3.0, (F, n)).astype(jnp.uint32)
    hot = (jax.random.uniform(jax.random.fold_in(key, 1), (F, n))
           < 0.02)  # overflow-heavy: 2% wide pixels
    x = jnp.where(hot, jnp.uint32(1 << 19), x)
    jax.block_until_ready(x)

    @jax.jit
    def null(fr):
        return jnp.uint32(fr[0, 0])

    int(null(x))
    rtt = statistics.median(
        (lambda t0: (int(null(x)), time.perf_counter() - t0)[1])(
            time.perf_counter())
        for _ in range(7)
    )
    print(f"RTT {rtt * 1e3:.1f}ms", file=sys.stderr)

    variants = {}

    @jax.jit
    def prepass(fr):
        frames = fr
        total_blocks = T * Tb
        if frames.shape[1] < total_blocks * spec.block:
            pad = jnp.zeros(
                (F, total_blocks * spec.block - frames.shape[1]),
                frames.dtype)
            frames = jnp.concatenate([frames, pad], axis=1)
        lastv = frames.reshape(F, T, Tb, spec.block)[:, :, -1, :].astype(
            jnp.int32)
        mag = jax.lax.bitcast_convert_type(lastv, jnp.uint32)
        setb = jnp.bitwise_or.reduce(mag, axis=2)
        nz = setb != 0
        wlast = jnp.where(nz, 32 - jax.lax.clz(setb).astype(jnp.int32), 0)
        prev0 = jnp.concatenate(
            [jnp.zeros((F, 1), jnp.int32), wlast[:, :-1]], axis=1)
        return jnp.sum(prev0)

    variants["prepass"] = prepass

    @jax.jit
    def kernel_only(fr):
        words, bits, maxw, over = pp.encode_batch_pallas_tiled(
            spec, fr, merge=False)
        return (jnp.sum(jax.lax.bitcast_convert_type(words, jnp.int32))
                + jnp.sum(bits))

    variants["kernel"] = kernel_only

    @jax.jit
    def full(fr):
        words, bits, maxw, over = pp.encode_batch_pallas_tiled(spec, fr)
        return (jnp.sum(jax.lax.bitcast_convert_type(words, jnp.int32))
                + jnp.sum(bits))

    variants["FULL"] = full

    rows = []
    prev = 0.0
    for name, fn in variants.items():
        int(fn(x))  # compile + warm
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            int(fn(x))
            ts.append(time.perf_counter() - t0)
        ms = (statistics.median(ts) - rtt) * 1e3
        fps = F / (ms / 1e3) if ms > 0 else float("inf")
        rows.append((name, ms, ms - prev, fps))
        print(f"{name:<12} {ms:7.2f} ms  (+{ms - prev:.2f})  {fps:,.1f} fps")
        prev = ms

    print("| stage | cumulative ms | delta ms | fps |")
    print("|---|---|---|---|")
    for name, ms, d, fps in rows:
        print(f"| {name} | {ms:.2f} | {d:+.2f} | {fps:,.1f} |")


if __name__ == "__main__":
    main()
