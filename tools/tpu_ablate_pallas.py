"""Ablation of the Pallas VMEM encode kernel: where do the ms go?

Times encode_batch_pallas cut at successive stages (plan only, stage
rows only, then after k merge levels) on the real chip with the
SLOPE methodology (round 3): each cut is timed as a chain of N kernel
invocations over N DISTINCT input batches inside one jit — distinct
inputs defeat XLA's CSE (identical pure calls get deduplicated; this
bit the first slope attempt), and the chain-length slope
(t[N2] - t[N1]) / (N2 - N1) cancels every constant offset (tunnel RTT,
dispatch, fetch) exactly. Single-launch minus-RTT timing on this box
cannot resolve <25% differences — two interleaved min-of-15 windows
flatly contradicted each other.

Run: python tools/tpu_ablate_pallas.py [F] [cap_ratio].
Results land in BASELINE.md's ablation table.
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

from trpx_tpu.ops.coding import FrameSpec  # noqa: E402
from trpx_tpu.ops.pallas_pack import encode_batch_pallas  # noqa: E402

N1, N2 = 1, 9  # chain lengths; slope over the 8-call difference


def main():
    F = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    ratio = float(sys.argv[2]) if len(sys.argv) > 2 else 0.25
    n = 512 * 512
    spec = FrameSpec.for_dtype(n, np.uint16, cap_ratio=ratio)
    P = spec.tree_rows
    L = min(128, P)
    levels = (P // L - 1).bit_length() + (L - 1).bit_length()
    print(f"P={P} levels={levels} caps={spec.pack_caps}", file=sys.stderr)

    n_full = spec.n_staged

    def synth(seed):
        key = jax.random.PRNGKey(seed)
        x = jax.random.poisson(key, 3.0, (F, n_full)).astype(jnp.uint16)
        lane = jnp.arange(n_full)[None, :]
        x = jnp.where(lane < n, x, 0)
        hot = (jax.random.uniform(jax.random.fold_in(key, 1),
                                  (F, n_full)) < 200.0 / n)
        return jnp.where(hot & (lane < n), jnp.uint16(60000), x)

    from trpx_tpu.ops.pallas_pack import stage_natural_device

    # production staging (pair-packed kernel layout), outside timing
    xs = [jax.block_until_ready(stage_natural_device(spec, synth(s), F))
          for s in range(N2)]

    def tmin(fn, args, reps=7):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            int(fn(*args))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    cuts = [-2, -1, 0] + sorted(set(
        list(range(2, levels + 1, 2)) + [levels, (P // L - 1).bit_length()]
    ))
    prev_ms = 0.0
    rows = []
    for cut in cuts:
        c = None if cut >= levels else cut

        def mk(chain, c=c):
            @jax.jit
            def step(*arrs):
                chk = jnp.uint32(0)
                for i in range(chain):
                    w, b, m, o = encode_batch_pallas(spec, arrs[i],
                                                     False, c)
                    chk = (chk + jnp.uint32(b.sum()) + w[(0,) * w.ndim]
                           + jnp.uint32(o.sum()))
                return chk
            return step

        f1, f2 = mk(N1), mk(N2)
        int(f1(*xs[:N1]))
        int(f2(*xs[:N2]))
        t = max((tmin(f2, xs[:N2]) - tmin(f1, xs[:N1])) / (N2 - N1), 1e-9)
        ms = t * 1e3
        label = ("transpose" if cut == -2 else
                 "plan" if cut == -1 else
                 "stage" if cut == 0 else
                 f"levels<={cut}" + (" (FULL)" if c is None else ""))
        rows.append((label, ms, ms - prev_ms, F / t))
        prev_ms = ms
        print(f"{label:18s} {ms:8.2f} ms  (+{rows[-1][2]:.2f})  "
              f"{F / t:10,.0f} fps", file=sys.stderr, flush=True)

    print("| cut | cumulative ms | delta ms | fps |")
    print("|---|---|---|---|")
    for label, ms, d, fps in rows:
        print(f"| {label} | {ms:.2f} | {d:+.2f} | {fps:,.0f} |")


if __name__ == "__main__":
    main()
