"""Ablation of the Pallas split-tree decode kernel: where do the ms go?

Cuts: -1 = length tables only; k = after k split levels (phase 2 then
phase 1); 90 = after the fold+transpose transition; 99 = all splits, no
extraction; FULL. RTT-corrected (CLAUDE.md measurement rules).

Run: python tools/tpu_ablate_decode.py [F] [cap_ratio].
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

from trpx_tpu.ops.coding import (  # noqa: E402
    FrameSpec,
    assemble_archive,
    walk_archive,
)
from trpx_tpu.ops.pallas_pack import encode_batch_pallas  # noqa: E402
from trpx_tpu.ops.pallas_unpack import (  # noqa: E402
    choose_schedule,
    decode_batch_pallas,
)


def main():
    F = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    cr = float(sys.argv[2]) if len(sys.argv) > 2 else 0.25
    n = 512 * 512
    spec = FrameSpec.for_dtype(n, np.uint16, cap_ratio=cr)
    P = spec.tree_rows
    L = min(128, P)
    p2 = (L - 1).bit_length()
    p1 = (P // L - 1).bit_length()
    print(f"P={P} phase2={p2} phase1={p1}", file=sys.stderr)

    key = jax.random.PRNGKey(0)
    n_full = P * spec.block
    x = jax.random.poisson(key, 3.0, (F, n_full)).astype(jnp.uint16)
    lane = jnp.arange(n_full)[None, :]
    x = jnp.where(lane < n, x, 0)
    hot = (jax.random.uniform(jax.random.fold_in(key, 1), (F, n_full))
           < 200.0 / n)
    x = jnp.where(hot & (lane < n), jnp.uint16(60000), x)
    w, b, m, _ = jax.device_get(encode_batch_pallas(spec, x))
    arch = assemble_archive(spec, w, b, m)
    widths, _p, wbuf = walk_archive(arch, spec)
    ratio = choose_schedule(spec, widths)
    print(f"ratio {ratio}", file=sys.stderr)
    wb, wd = jnp.asarray(wbuf), jnp.asarray(widths)

    @jax.jit
    def null(wb):
        return wb[0, 0]

    int(null(wb))
    rtt = statistics.median(
        (lambda t0: (int(null(wb)), time.perf_counter() - t0)[1])(
            time.perf_counter())
        for _ in range(7)
    )
    print(f"RTT {rtt * 1e3:.1f}ms", file=sys.stderr)

    cuts = [-2, -1, 2, 4, p2, 90, p2 + 2, p2 + 4, p2 + p1, 99, None]
    rows = []
    prev = 0.0
    for cut in cuts:

        @jax.jit
        def step(wb, wd, cut=cut):
            o = decode_batch_pallas(spec, wb, wd, False, ratio, cut)
            return jnp.uint32(jnp.sum(o[:, :: 4096])) + jnp.uint32(o[-1, -1])

        int(step(wb, wd))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            int(step(wb, wd))
            ts.append(time.perf_counter() - t0)
        t = max(statistics.median(ts) - rtt, 1e-9)
        ms = t * 1e3
        label = ("input-only" if cut == -2 else
                 "lengths" if cut == -1 else
                 "transition" if cut == 90 else
                 "pre-extract" if cut == 99 else
                 "FULL" if cut is None else f"splits<={cut}")
        rows.append((label, ms, ms - prev, F / t))
        prev = ms
        print(f"{label:14s} {ms:8.2f} ms  (+{rows[-1][2]:.2f})  "
              f"{F / t:10,.0f} fps", file=sys.stderr)

    print("| cut | cumulative ms | delta ms | fps |")
    print("|---|---|---|---|")
    for label, ms, d, fps in rows:
        print(f"| {label} | {ms:.2f} | {d:+.2f} | {fps:,.0f} |")


if __name__ == "__main__":
    main()
