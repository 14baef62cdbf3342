"""Benchmark: 512×512 uint16 diffraction-frame encode throughput on TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is relative to the measured reference encoder throughput
(1712 frames/s, single Xeon core — BASELINE.md).

Run on real hardware: ``python bench.py`` (no conftest: uses the default
JAX backend, i.e. the TPU when present). Extra detail on stderr.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

REFERENCE_FPS = 1712.0  # reference encoder, 1 CPU core (BASELINE.md)


def synth_frames(n_frames: int, h: int = 512, w: int = 512, seed: int = 0):
    """Synthetic diffraction frames: Poisson background + hot pixels
    (the BASELINE.md measurement workload; compression ratio ~0.21)."""
    rng = np.random.default_rng(seed)
    frames = rng.poisson(3.0, size=(n_frames, h, w)).astype(np.uint16)
    ys = rng.integers(0, h, (n_frames, 200))
    xs = rng.integers(0, w, (n_frames, 200))
    for f in range(n_frames):
        frames[f, ys[f], xs[f]] = 60000
    return frames


def main() -> None:
    import jax

    from trpx_tpu import ops
    from trpx_tpu.ops.coding import FrameSpec, encode_batch_device

    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}",
          file=sys.stderr)

    F = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    frames = synth_frames(F)
    flat = frames.reshape(F, -1)
    spec = FrameSpec.for_dtype(flat.shape[1], flat.dtype)
    padded = np.zeros((F, spec.n_padded), dtype=flat.dtype)
    padded[:, : spec.n] = flat
    x = jax.device_put(padded)

    # warm-up / compile
    words, bits, maxw = encode_batch_device(spec, x)
    jax.block_until_ready(words)

    # device-only steady state
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        words, bits, maxw = encode_batch_device(spec, x)
    jax.block_until_ready(words)
    t_dev = (time.perf_counter() - t0) / reps
    dev_fps = F / t_dev
    raw_gbs = flat.nbytes / t_dev / 1e9  # GB/s of raw input
    print(f"device-only encode: {dev_fps:,.0f} frames/s "
          f"({raw_gbs:.2f} GB/s raw in)", file=sys.stderr)

    # end-to-end (device + host transfer + archive assembly)
    t0 = time.perf_counter()
    archive = ops.encode(flat)
    t_e2e = time.perf_counter() - t0
    e2e_fps = F / t_e2e
    ratio = archive.meta.memory_size / flat.nbytes
    print(f"end-to-end encode:  {e2e_fps:,.0f} frames/s "
          f"(compression {ratio:.3f})", file=sys.stderr)

    print(json.dumps({
        "metric": "encode_512x512_u16_frames_per_s",
        "value": round(dev_fps, 1),
        "unit": "frames/s",
        "vs_baseline": round(dev_fps / REFERENCE_FPS, 2),
    }))


if __name__ == "__main__":
    main()
