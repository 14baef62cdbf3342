"""Benchmark: 512×512 uint16 diffraction-frame encode throughput on TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is relative to the measured reference encoder throughput
(1712 frames/s, single Xeon core — BASELINE.md).

Methodology: frames are synthesized ON DEVICE (Poisson background + hot
pixels, the BASELINE.md workload, ~0.21 compression ratio) so the
measurement isolates the encode kernel from host↔device transfer (the
dev box reaches the TPU through a network tunnel; a production host
feeds local HBM). Because the tunnel's ``block_until_ready`` is not a
reliable barrier, each rep materializes a scalar checksum of the
outputs (forcing a device round trip) and the measured round-trip
latency of a null op is subtracted; the median of several reps is
reported.

The encode runs the Pallas VMEM kernel (ops/pallas_pack.py), falling
back to the jnp merge tree if the kernel is unavailable on the backend.

Run on real hardware: ``python bench.py [n_frames] [reps]``.
"""

from __future__ import annotations

import json
import statistics
import sys
import time

import numpy as np

REFERENCE_FPS = 1712.0  # reference encoder, 1 CPU core (BASELINE.md)

# HBM speed-of-light per chip, GB/s (public figures)
HBM_GBS = {
    "TPU v5 lite": 819.0,   # v5e
    "TPU v5p": 2765.0,
    "TPU v4": 1228.0,
    "TPU v6 lite": 1640.0,  # v6e / Trillium
}


def main() -> None:
    import os

    import jax
    import jax.numpy as jnp

    # persistent XLA cache: repeated bench runs skip the multi-minute
    # TPU compile of the kernels
    cache = os.path.expanduser("~/.cache/trpx_tpu/jax")
    try:
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from trpx_tpu.ops.coding import FrameSpec, encode_batch_device

    dev = jax.devices()[0]
    kind = getattr(dev, "device_kind", "?")
    print(f"device: {dev.platform} {kind}", file=sys.stderr)

    F = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 7
    h = w = 512
    n = h * w
    # 0.25 soft capacity: diffraction data compresses to ~0.21, and the
    # validity check below asserts no overflow (overflow would fall back
    # to the worst-case kernel in production)
    spec = FrameSpec.for_dtype(n, np.uint16, cap_ratio=0.25)

    key = jax.random.PRNGKey(0)
    n_full = spec.tree_rows * spec.block
    x = jax.random.poisson(key, 3.0, (F, n_full)).astype(jnp.uint16)
    lane = jnp.arange(n_full)[None, :]
    x = jnp.where(lane < n, x, 0)
    # ~200 hot pixels per frame, scattered via a cheap deterministic mask
    hot = (jax.random.uniform(jax.random.fold_in(key, 1), (F, n_full))
           < 200.0 / n)
    x = jnp.where(hot & (lane < n), jnp.uint16(60000), x)
    jax.block_until_ready(x)

    kernel_name = "pallas-vmem"
    try:
        from trpx_tpu.ops.pallas_pack import encode_batch_pallas

        @jax.jit
        def step_sum(fr):
            words, bits, maxw, over = encode_batch_pallas(spec, fr)
            return (jnp.uint32(bits.sum()) + words[0, 0] + words[-1, -1]
                    + jnp.uint32(over.sum()))

        # compile + validity: the soft capacities must not overflow on
        # the benchmark workload, else the timed result would be invalid
        _, _, _, over0 = jax.device_get(encode_batch_pallas(spec, x))
        assert not bool(np.any(over0)), "soft capacity overflowed"
        int(step_sum(x))  # smoke
    except Exception as e:  # pragma: no cover - backend-dependent
        print(f"pallas kernel unavailable ({type(e).__name__}: {e}); "
              "falling back to jnp tree", file=sys.stderr)
        kernel_name = "jnp-tree"
        x = x[:, : spec.n_padded]  # jnp tree takes the block grid exactly

        @jax.jit
        def step_sum(fr):
            words, bits, maxw, over = encode_batch_device(spec, fr)
            return (jnp.uint32(bits.sum()) + words[0, 0] + words[-1, -1]
                    + jnp.uint32(over.sum()))

        int(step_sum(x))

    @jax.jit
    def null(fr):
        return jnp.uint32(fr[0, 0])

    int(null(x))
    rtt = statistics.median(
        (lambda t0: (int(null(x)), time.perf_counter() - t0)[1])(
            time.perf_counter()
        )
        for _ in range(reps)
    )
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        int(step_sum(x))
        ts.append(time.perf_counter() - t0)
    t = max(statistics.median(ts) - rtt, 1e-9)
    fps = F / t
    raw_gbs = F * n * 2 / t / 1e9
    sol = HBM_GBS.get(kind)
    sol_txt = f", {100 * raw_gbs / sol:.1f}% of HBM SoL ingest" if sol else ""
    print(
        f"[{kernel_name}] encode: {fps:,.0f} frames/s "
        f"({raw_gbs:.1f} GB/s raw in{sol_txt}); rtt {rtt * 1e3:.1f}ms; "
        f"rep ms {[round(v * 1e3, 1) for v in ts]}",
        file=sys.stderr,
    )

    print(json.dumps({
        "metric": "encode_512x512_u16_frames_per_s",
        "value": round(fps, 1),
        "unit": "frames/s",
        "vs_baseline": round(fps / REFERENCE_FPS, 2),
    }))


if __name__ == "__main__":
    main()
