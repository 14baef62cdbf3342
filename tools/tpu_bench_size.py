"""Encode+decode throughput at an arbitrary frame size on the real chip.

Drives the ROUTED kernel paths (whole-frame VMEM or tiled, chosen by
FrameSpec.pallas_ok*) exactly as api.compress/decompress would, with the
RTT-corrected scalar-materialization timing from CLAUDE.md.

Run: python tools/tpu_bench_size.py [F] [side] [dtype] [cap_ratio] [n_hot]
     e.g. python tools/tpu_bench_size.py 4 4096 u32 0.25
``n_hot`` (default 200, the BASELINE overflow-heavy config, bench.py) is
the hot-pixel count per frame; dense hot maps need a larger cap_ratio.
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

DTYPES = {"u8": np.uint8, "u16": np.uint16, "u32": np.uint32,
          "i16": np.int16, "i32": np.int32}


def main():
    F = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    side = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    dt = DTYPES[sys.argv[3]] if len(sys.argv) > 3 else np.uint32
    ratio = float(sys.argv[4]) if len(sys.argv) > 4 else 0.25
    n_hot = int(sys.argv[5]) if len(sys.argv) > 5 else 200
    n = side * side
    spec = FrameSpec.for_dtype(n, dt, cap_ratio=ratio)
    raw = n * np.dtype(dt).itemsize
    print(f"F={F} {side}x{side} {np.dtype(dt).name} ratio={ratio} "
          f"enc_tiled={not spec.pallas_ok} dec_tiled={not spec.pallas_ok_decode}",
          file=sys.stderr)

    key = jax.random.PRNGKey(0)
    jdt = jnp.dtype(dt)
    x = jax.random.poisson(key, 3.0, (F, n)).astype(jdt)
    hot = (jax.random.uniform(jax.random.fold_in(key, 1), (F, n))
           < n_hot / n)
    hotv = min(1 << 19, np.iinfo(dt).max)
    x = jnp.where(hot, jdt.type(hotv), x)
    jax.block_until_ready(x)
    try:
        from trpx_tpu.ops.coding import measured_spec

        spec = measured_spec(spec, x)
    except Exception as e:
        print(f"measured schedule unavailable: {e}", file=sys.stderr)

    @jax.jit
    def null(fr):
        return jnp.uint32(fr[0, 0])

    int(null(x))
    rtt = statistics.median(
        (lambda t0: (int(null(x)), time.perf_counter() - t0)[1])(
            time.perf_counter())
        for _ in range(7)
    )

    def measure(fn, *a):
        int(fn(*a))  # warm
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            int(fn(*a))
            ts.append(time.perf_counter() - t0)
        return max(statistics.median(ts) - rtt, 1e-9)

    # ---- encode (routed) -------------------------------------------------
    if spec.pallas_ok:
        from trpx_tpu.ops.pallas_pack import encode_batch_pallas as enc
    else:
        from trpx_tpu.ops.pallas_pack import encode_batch_pallas_tiled as enc

    @jax.jit
    def enc_sum(fr):
        words, bits, maxw, over = enc(spec, fr)
        return (jnp.uint32(bits.sum()) + words[0, 0] + words[-1, -1]
                + jnp.uint32(over.sum()))

    t_enc = measure(enc_sum, x)
    print(f"encode: {F / t_enc:,.1f} fps  {F * raw / t_enc / 1e9:.1f} GB/s")

    # ---- decode (routed) -------------------------------------------------
    words, bits, maxw, over = jax.device_get(
        jax.jit(lambda fr: enc(spec, fr))(x))
    assert not bool(np.any(over)), "soft capacity overflowed"
    arch = assemble_archive(spec, words, bits, maxw)
    t0 = time.perf_counter()
    widths, poffs, wbuf = walk_archive(arch, spec)
    walk_s = time.perf_counter() - t0

    if spec.pallas_ok_decode:
        from trpx_tpu.ops.pallas_unpack import (
            choose_schedule,
            decode_batch_pallas,
        )

        r = choose_schedule(spec, widths)
        wb, wd = jnp.asarray(wbuf), jnp.asarray(widths)

        @jax.jit
        def dec_sum(wb, wd):
            o = decode_batch_pallas(spec, wb, wd, False, r)
            return (jnp.uint32(o[(0,) * o.ndim])
                    + jnp.uint32(o[(-1,) * o.ndim]))

        t_dec = measure(dec_sum, wb, wd)
    else:
        from trpx_tpu.ops.pallas_unpack import (
            decode_batch_pallas_tiled,
            tile_prepass,
        )

        words_t, shift, prev0, r = tile_prepass(spec, widths, wbuf)
        wt, wd = jnp.asarray(words_t), jnp.asarray(widths)
        sh, pv = jnp.asarray(shift), jnp.asarray(prev0)

        @jax.jit
        def dec_sum(wt, wd, sh, pv):
            o = decode_batch_pallas_tiled(spec, wt, wd, sh, pv, False, r)
            return (jnp.uint32(o[(0,) * o.ndim])
                    + jnp.uint32(o[(-1,) * o.ndim]))

        t_dec = measure(dec_sum, wt, wd, sh, pv)
    print(f"decode: {F / t_dec:,.1f} fps  {F * raw / t_dec / 1e9:.1f} GB/s "
          f"(bucket {r}); walk {F / walk_s:,.1f} fps")


if __name__ == "__main__":
    main()
