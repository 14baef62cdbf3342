"""Benchmark: 512×512 uint16 diffraction-frame encode throughput on TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is relative to the measured reference encoder throughput
(1712 frames/s, single Xeon core — BASELINE.md).

Methodology: frames are synthesized ON DEVICE (Poisson background + hot
pixels, the BASELINE.md workload, ~0.21 compression ratio) so the
measurement isolates the encode kernel from host↔device transfer (the
dev box reaches the TPU through a network tunnel; a production v5p host
feeds local HBM). Each rep gets distinct data (fresh PRNG fold) and is
synchronized individually; the median rep time is reported. GB/s of raw
input and % of HBM speed-of-light go to stderr.

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
    import jax
    import jax.numpy as jnp

    from trpx_tpu.ops.coding import FrameSpec, encode_frame_device

    dev = jax.devices()[0]
    kind = getattr(dev, "device_kind", "?")
    print(f"device: {dev.platform} {kind}", file=sys.stderr)

    F = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    h = w = 512
    n = h * w
    spec = FrameSpec.for_dtype(n, np.uint16, cap_ratio=0.5)

    @jax.jit
    def synth(key):
        """On-device synthetic diffraction batch (Poisson λ=3 + hot pixels)."""
        k1, k2, k3 = jax.random.split(key, 3)
        frames = jax.random.poisson(k1, 3.0, (F, spec.n_padded)).astype(
            jnp.uint16
        )
        # zero the padding lanes, then scatter ~200 hot pixels per frame
        lane = jnp.arange(spec.n_padded) < n
        frames = jnp.where(lane[None, :], frames, 0)
        idx = jax.random.randint(k2, (F, 200), 0, n)
        hot = jax.random.randint(k3, (F, 200), 30000, 61000).astype(jnp.uint16)
        frames = jax.vmap(lambda fr, ix, hv: fr.at[ix].set(hv))(
            frames, idx, hot
        )
        return frames

    @jax.jit
    def step(frames):
        return jax.vmap(lambda f: encode_frame_device(spec, f))(frames)[:3]

    key = jax.random.PRNGKey(0)
    batches = [synth(jax.random.fold_in(key, i)) for i in range(3)]
    jax.block_until_ready(batches)

    # warm-up / compile
    jax.block_until_ready(step(batches[0]))

    times = []
    for i in range(reps):
        x = batches[i % len(batches)]
        t0 = time.perf_counter()
        out = step(x)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    t_med = statistics.median(times)
    fps = F / t_med
    raw_gbs = F * n * 2 / t_med / 1e9
    sol = HBM_GBS.get(kind)
    sol_txt = f", {100 * raw_gbs / sol:.1f}% of HBM SoL ingest" if sol else ""
    print(
        f"device encode: {fps:,.0f} frames/s "
        f"({raw_gbs:.1f} GB/s raw in{sol_txt}); "
        f"rep times ms: {[round(t * 1e3, 2) for t in times]}",
        file=sys.stderr,
    )

    # end-to-end archive build (incl. device->host transfer + assembly);
    # informational: the tunnel makes transfer non-representative
    from trpx_tpu import ops

    words, bits, maxw = jax.device_get(out)
    t0 = time.perf_counter()
    archive = ops.assemble_archive(spec, np.ascontiguousarray(words),
                                   bits, maxw)
    t_asm = time.perf_counter() - t0
    ratio = archive.meta.memory_size / (F * n * 2)
    print(
        f"host assembly: {F / t_asm:,.0f} frames/s "
        f"(compression {ratio:.3f})",
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
