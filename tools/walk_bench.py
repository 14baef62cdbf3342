"""Micro-benchmark of the native header walk (the foreign-archive decode
bottleneck): serial trpx_walk on the two flagship workloads.

Run: python tools/walk_bench.py [F512] [F2k]
Host-only (no JAX); uses the native encoder to build the archives.
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")
from trpx_tpu import native  # noqa: E402


def synth(F, n, dtype, hot_val, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.poisson(3.0, size=(F, n)).astype(dtype)
    hot = rng.random((F, n)) < 200.0 / n
    x[hot] = hot_val
    return x


def bench(name, frames, block=12, reps=5):
    F, n = frames.shape
    payload, fstarts, prolix = native.encode_frames(frames, block, False)
    buf = native.padded_buffer(payload)
    nb = -(-n // block)
    # warm
    native.walk(buf, F, n, block)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        native.walk(buf, F, n, block)
        ts.append(time.perf_counter() - t0)
    t = min(ts)
    ts_np = []
    for _ in range(reps):
        t0 = time.perf_counter()
        native.walk(buf, F, n, block, want_poffs=False)
        ts_np.append(time.perf_counter() - t0)
    tn = min(ts_np)
    # production path: max_width = prolix_bits selects the branchless
    # wide-stream loop for overflow-heavy streams (prolix > 16)
    native.walk(buf, F, n, block, want_poffs=False, max_width=prolix)
    ts_w = []
    for _ in range(reps):
        t0 = time.perf_counter()
        native.walk(buf, F, n, block, want_poffs=False, max_width=prolix)
        ts_w.append(time.perf_counter() - t0)
    tw = min(ts_w)
    blocks = F * nb
    print(
        f"{name}: {F / t:,.0f} fps walk ({blocks / t / 1e6:.1f} Mblk/s, "
        f"{len(payload) / t / 1e9:.2f} GB/s through) | no-poffs {F / tn:,.0f} fps"
        f" | prod (wide={int(prolix > 16)}) {F / tw:,.0f} fps "
        f"({blocks / tw / 1e6:.1f} Mblk/s)"
        f" | payload {len(payload) / 1e6:.1f} MB, prolix {prolix}"
    )
    return F / tw


if __name__ == "__main__":
    F512 = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    F2k = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    bench("512^2 u16 lam3", synth(F512, 512 * 512, np.uint16, 60000))
    bench("2048^2 u32 overflow", synth(F2k, 2048 * 2048, np.uint32,
                                       2_000_000_000, seed=2))
