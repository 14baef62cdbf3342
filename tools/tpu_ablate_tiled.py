"""Ablation of the tiled big-frame encode path: where do the ms go?

Stages: kernel (per-tile Pallas packs, no merge) and FULL (packs +
single-pass placement merge; tiles leave the kernel at their global
sub-word phase since round 4, so the merge is boundary patch + DUS
only). SLOPE-timed (round-3 methodology, see tools/tpu_ablate_pallas.py)
with a corner-scalar consume — full-array checksum reductions and
strided slices are latency artifacts (see BASELINE.md round 4).

Round-2 finding recorded in BASELINE.md: the old ragged merge was 6.6 of
17 ms at 2048²; the placement merge cut FULL to ~5 ms for 8 frames.

Run: python tools/tpu_ablate_tiled.py [F] [side] [cap_ratio|measured].
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

cache = os.path.expanduser("~/.cache/trpx_tpu/jax")
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from trpx_tpu.ops.coding import FrameSpec, measured_spec  # noqa: E402
from trpx_tpu.ops import pallas_pack as pp  # noqa: E402

N1, N2 = 1, 5


def main():
    F = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    side = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    mode = sys.argv[3] if len(sys.argv) > 3 else "measured"
    n = side * side
    spec = FrameSpec.for_dtype(
        n, np.uint32,
        cap_ratio=0.25 if mode == "measured" else float(mode))
    Tb = pp.TILE_BLOCKS
    T = -(-spec.nb // Tb)
    print(f"F={F} side={side} T={T} tiles of {Tb} blocks", file=sys.stderr)

    nt = T * Tb * spec.block  # presized to the tile grid (no in-jit pad)

    def synth(seed):
        key = jax.random.PRNGKey(seed)
        x = jax.random.poisson(key, 3.0, (F, nt)).astype(jnp.uint32)
        lane = jnp.arange(nt)[None, :]
        x = jnp.where(lane < n, x, 0)
        hot = (jax.random.uniform(jax.random.fold_in(key, 1), (F, nt))
               < 0.02)  # overflow-heavy: 2% wide pixels
        return jnp.where(hot & (lane < n), jnp.uint32(2_000_000_000), x)

    xs = [jax.block_until_ready(synth(s)) for s in range(N2)]
    if mode == "measured":
        spec = measured_spec(spec, xs[0])
        print(f"sched {spec.pack_caps}", file=sys.stderr)

    def tmin(fn, a, reps=7):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            int(fn(*a))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    def slope(mk):
        f1, f2 = mk(N1), mk(N2)
        int(f1(*xs[:N1]))
        int(f2(*xs))
        return max((tmin(f2, xs) - tmin(f1, xs[:N1])) / (N2 - N1), 1e-9)

    rows = []
    prev = 0.0
    # Since the round-4 in-kernel DMA placement there is no merge stage:
    # FULL is the whole tiled encode (the old "kernel" cut equals it).
    for name in ("FULL",):

        def mk(chain):
            @jax.jit
            def step(*a):
                chk = jnp.uint32(0)
                for i in range(chain):
                    w, b, m, o = pp.encode_batch_pallas_tiled(spec, a[i])
                    chk = (chk + jnp.uint32(b.sum())
                           + w.reshape(-1)[0] + jnp.uint32(o.sum()))
                return chk
            return step

        t = slope(mk)
        ms = t * 1e3
        gbs = F * n * 4 / t / 1e9
        rows.append((name, ms, ms - prev, F / t, gbs))
        print(f"{name:<8} {ms:8.2f} ms  (+{ms - prev:.2f})  "
              f"{F / t:8,.1f} fps  {gbs:5.1f} GB/s", flush=True)
        prev = ms

    print("| stage | cumulative ms | delta ms | fps | GB/s |")
    print("|---|---|---|---|---|")
    for name, ms, d, fps, gbs in rows:
        print(f"| {name} | {ms:.2f} | {d:+.2f} | {fps:,.1f} | {gbs:.1f} |")


if __name__ == "__main__":
    main()
