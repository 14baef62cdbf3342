"""Ablation of the Pallas split-tree decode kernel: where do the ms go?

Cuts: -2 = input DMA only; -1 = length tables; k = after k split levels
(phase 2 then phase 1); 90 = after the fold+transpose transition; 99 =
all splits, no extraction; FULL. Timed with the round-3 SLOPE
methodology (see tools/tpu_ablate_pallas.py): chains of N kernel calls
over N DISTINCT word/width batches inside one jit — distinct inputs
defeat XLA CSE, and the chain-length slope cancels the tunnel's
RTT/dispatch offsets exactly.

Run: python tools/tpu_ablate_decode.py [F] [cap_ratio].
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

N1, N2 = 1, 9


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

    n_full = P * spec.block

    def synth(seed):
        key = jax.random.PRNGKey(seed)
        x = jax.random.poisson(key, 3.0, (F, n_full)).astype(jnp.uint16)
        lane = jnp.arange(n_full)[None, :]
        x = jnp.where(lane < n, x, 0)
        hot = (jax.random.uniform(jax.random.fold_in(key, 1),
                                  (F, n_full)) < 200.0 / n)
        return jnp.where(hot & (lane < n), jnp.uint16(60000), x)

    from trpx_tpu.ops.pallas_unpack import stage_decode_inputs

    wbs, wds = [], []
    ratio = None
    for s in range(N2):
        w, b, m, _ = jax.device_get(encode_batch_pallas(spec, synth(s)))
        arch = assemble_archive(spec, w, b, m)
        widths, _p, wbuf = walk_archive(arch, spec)
        if ratio is None:
            ratio = choose_schedule(spec, widths)
            print(f"ratio {ratio}", file=sys.stderr)
        wbs.append(wbuf)
        wds.append(widths.astype(np.uint8))
    # the walk buckets W per batch: pad to the common max so one compiled
    # step serves every input; stage in the kernel layouts (production)
    Wmax = max(w.shape[1] for w in wbs)
    args = []
    for w, d in zip(wbs, wds):
        w3, d3 = stage_decode_inputs(
            spec, np.pad(w, ((0, 0), (0, Wmax - w.shape[1]))), d)
        args.append(jax.block_until_ready(jnp.asarray(w3)))
        args.append(jax.block_until_ready(jnp.asarray(d3)))

    def tmin(fn, a, reps=7):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            int(fn(*a))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    cuts = [-2, -1, 2, 4, p2, 90, p2 + 2, p2 + 4, p2 + p1, 99, None]
    rows = []
    prev = 0.0
    for cut in cuts:

        def mk(chain, cut=cut):
            @jax.jit
            def step(*a):
                chk = jnp.uint32(0)
                for i in range(chain):
                    o = decode_batch_pallas(spec, a[2 * i], a[2 * i + 1],
                                            False, ratio, cut)
                    # two-corner consume: the pallas output is fully
                    # materialized regardless; the old strided checksum
                    # (o[:, ::4096]) cost ~1.4 ms of DMA gather per call
                    chk = (chk + jnp.uint32(o[(0,) * o.ndim])
                           + jnp.uint32(o[(-1,) * o.ndim]))
                return chk
            return step

        f1, f2 = mk(N1), mk(N2)
        int(f1(*args[: 2 * N1]))
        int(f2(*args[: 2 * N2]))
        t = max((tmin(f2, args[: 2 * N2]) - tmin(f1, args[: 2 * N1]))
                / (N2 - N1), 1e-9)
        ms = t * 1e3
        label = ("input-only" if cut == -2 else
                 "lengths" if cut == -1 else
                 "transition" if cut == 90 else
                 "pre-extract" if cut == 99 else
                 "FULL" if cut is None else f"splits<={cut}")
        rows.append((label, ms, ms - prev, F / t))
        prev = ms
        print(f"{label:14s} {ms:8.2f} ms  (+{rows[-1][2]:.2f})  "
              f"{F / t:10,.0f} fps", file=sys.stderr, flush=True)

    print("| cut | cumulative ms | delta ms | fps |")
    print("|---|---|---|---|")
    for label, ms, d, fps in rows:
        print(f"| {label} | {ms:.2f} | {d:+.2f} | {fps:,.0f} |")


if __name__ == "__main__":
    main()
