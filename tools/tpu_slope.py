"""Minimal slope timing of the production encode/decode kernels.

Round-3 slope methodology (see tools/tpu_ablate_pallas.py): chains of
N1/N2 kernel calls over DISTINCT device-resident batches inside one jit;
the chain-length slope cancels the tunnel's RTT/dispatch constants.
Runs the MEASURED-schedule kernels (the production configuration) and a
two-corner consume (no strided checksum artifact).

Run: python tools/tpu_slope.py [F] [enc|dec|both]
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
    measured_spec,
    walk_archive,
)
from trpx_tpu.ops.pallas_pack import encode_batch_pallas  # noqa: E402
from trpx_tpu.ops.pallas_unpack import (  # noqa: E402
    choose_schedule,
    decode_batch_pallas,
)

N1 = int(os.environ.get("TRPX_SLOPE_N1", "1"))
N2 = int(os.environ.get("TRPX_SLOPE_N2", "9"))


def synth(spec, F, seed, n):
    n_full = spec.n_staged
    key = jax.random.PRNGKey(seed)
    x = jax.random.poisson(key, 3.0, (F, n_full)).astype(jnp.uint16)
    lane = jnp.arange(n_full)[None, :]
    x = jnp.where(lane < n, x, 0)
    hot = (jax.random.uniform(jax.random.fold_in(key, 1),
                              (F, n_full)) < 200.0 / n)
    return jnp.where(hot & (lane < n), jnp.uint16(60000), x)


def tmin(fn, a, reps=7):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        int(fn(*a))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def slope(mk, args1, args2):
    f1, f2 = mk(N1), mk(N2)
    int(f1(*args1))
    int(f2(*args2))
    return max((tmin(f2, args2) - tmin(f1, args1)) / (N2 - N1), 1e-9)


def main():
    F = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    what = sys.argv[2] if len(sys.argv) > 2 else "both"
    n = 512 * 512
    spec0 = FrameSpec.for_dtype(n, np.uint16)
    xs = [jax.block_until_ready(synth(spec0, F, s, n)) for s in range(N2)]
    # schedule proven over EVERY chained batch (a single-batch schedule
    # can overflow on sibling batches — see bench._measured_over)
    scheds = [measured_spec(spec0, x).pack_caps for x in xs]
    spec = spec0.with_sched(tuple(max(c) for c in zip(*scheds)))
    print(f"sched {spec.pack_caps}", file=sys.stderr)
    # stage inputs in the kernel's natural layout once, outside the
    # timed chains (stage_natural_device: shared with bench.py)
    from trpx_tpu.ops.pallas_pack import stage_natural_device

    xs = [jax.block_until_ready(stage_natural_device(spec, x, F))
          for x in xs]

    if what in ("enc", "both"):
        def mk_enc(chain):
            @jax.jit
            def step(*a):
                chk = jnp.uint32(0)
                for i in range(chain):
                    w, b, m, o = encode_batch_pallas(spec, a[i])
                    chk = (chk + jnp.uint32(b.sum()) + w[(0,) * w.ndim]
                           + jnp.uint32(o.sum()))
                return chk
            return step

        t = slope(mk_enc, xs[:N1], xs[:N2])
        print(f"encode: {t*1e3:.2f} ms/{F}fr = {F/t:,.0f} fps "
              f"({F*n*2/t/1e9:.1f} GB/s)")

    if what in ("dec", "both"):
        wbs, wds = [], []
        ratio = None
        for s in range(N2):
            w, b, m, _ = jax.device_get(encode_batch_pallas(spec, xs[s]))
            arch = assemble_archive(spec, w, b, m)
            widths, _p, wbuf = walk_archive(arch, spec)
            if ratio is None:
                ratio = choose_schedule(spec, widths)
            wbs.append(wbuf)
            wds.append(widths.astype(np.uint8))
        from trpx_tpu.ops.pallas_unpack import stage_decode_inputs

        Wmax = max(w.shape[1] for w in wbs)
        args = []
        for w, d in zip(wbs, wds):
            w3, d3 = stage_decode_inputs(
                spec, np.pad(w, ((0, 0), (0, Wmax - w.shape[1]))), d)
            args.append(jax.block_until_ready(jnp.asarray(w3)))
            args.append(jax.block_until_ready(jnp.asarray(d3)))

        def mk_dec(chain):
            @jax.jit
            def step(*a):
                chk = jnp.uint32(0)
                for i in range(chain):
                    o = decode_batch_pallas(spec, a[2 * i], a[2 * i + 1],
                                            False, ratio)
                    chk = (chk + jnp.uint32(o[(0,) * o.ndim])
                           + jnp.uint32(o[(-1,) * o.ndim]))
                return chk
            return step

        t = slope(mk_dec, args[: 2 * N1], args[: 2 * N2])
        print(f"decode: {t*1e3:.2f} ms/{F}fr = {F/t:,.0f} fps "
              f"({F*n*2/t/1e9:.1f} GB/s)")


if __name__ == "__main__":
    main()
