"""Ablation of the Pallas VMEM encode kernel: where do the ms go?

Times encode_batch_pallas cut at successive stages (plan only, stage
rows only, then after k merge levels) on the real chip, RTT-corrected
(CLAUDE.md measurement rules). Run: python tools/tpu_ablate_pallas.py
[F] [cap_ratio].

Results land in BASELINE.md's ablation table.
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
from trpx_tpu.ops.pallas_pack import encode_batch_pallas  # noqa: E402


def main():
    F = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    ratio = float(sys.argv[2]) if len(sys.argv) > 2 else 0.25
    n = 512 * 512
    spec = FrameSpec.for_dtype(n, np.uint16, cap_ratio=ratio)
    P = spec.tree_rows
    L = min(128, P)
    levels = (P // L - 1).bit_length() + (L - 1).bit_length()
    print(f"P={P} levels={levels} caps={spec.pack_caps}", file=sys.stderr)

    key = jax.random.PRNGKey(0)
    n_full = P * spec.block
    x = jax.random.poisson(key, 3.0, (F, n_full)).astype(jnp.uint16)
    lane = jnp.arange(n_full)[None, :]
    x = jnp.where(lane < n, x, 0)
    hot = (jax.random.uniform(jax.random.fold_in(key, 1), (F, n_full))
           < 200.0 / n)
    x = jnp.where(hot & (lane < n), jnp.uint16(60000), x)
    jax.block_until_ready(x)

    @jax.jit
    def null(fr):
        return jnp.uint32(fr[0, 0])

    int(null(x))
    rtt = min(
        (lambda t0: (int(null(x)), time.perf_counter() - t0)[1])(
            time.perf_counter())
        for _ in range(9)
    )  # min, to pair with the min-of-N step timer below
    print(f"RTT {rtt * 1e3:.1f}ms", file=sys.stderr)

    cuts = [-1, 0] + sorted(set(
        list(range(2, levels + 1, 2)) + [levels, (P // L - 1).bit_length()]
    ))
    prev_ms = 0.0
    rows = []
    for cut in cuts:
        c = None if cut >= levels else cut

        @jax.jit
        def step(fr, c=c):
            w, b, m, o = encode_batch_pallas(spec, fr, False, c)
            return (jnp.uint32(b.sum()) + w[0, 0] + w[-1, -1]
                    + jnp.uint32(o.sum()))

        int(step(x))
        # the tunnel's RTT jitter is several ms — comparable to the
        # quantity measured — so 5-sample medians produced garbage
        # deltas (even negative); take the MINIMUM of more samples
        # (min-of-N is the standard noise-floor estimator when noise is
        # strictly additive, as queueing delay is)
        ts = []
        for _ in range(15):
            t0 = time.perf_counter()
            int(step(x))
            ts.append(time.perf_counter() - t0)
        t = max(min(ts) - rtt, 1e-9)
        ms = t * 1e3
        label = ("plan" if cut == -1 else
                 "stage" if cut == 0 else
                 f"levels<={cut}" + (" (FULL)" if c is None else ""))
        rows.append((label, ms, ms - prev_ms, F / t))
        prev_ms = ms
        print(f"{label:18s} {ms:8.2f} ms  (+{rows[-1][2]:.2f})  "
              f"{F / t:10,.0f} fps", file=sys.stderr)

    print("| cut | cumulative ms | delta ms | fps |")
    print("|---|---|---|---|")
    for label, ms, d, fps in rows:
        print(f"| {label} | {ms:.2f} | {d:+.2f} | {fps:,.0f} |")


if __name__ == "__main__":
    main()
