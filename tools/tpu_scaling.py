"""Scaling-efficiency measurement over a real multi-chip mesh.

Runs the sharded encode at 1, 2, ..., N devices and reports
fps(N) / (N * fps(1)) — the BASELINE >= 0.9 metric. On this dev box only
one chip is attached; run on a pod host (optionally multi-process via
``trpx_tpu.parallel.distributed.init_from_env``) for real numbers. The
virtual CPU mesh exercises the code path but its numbers are not
hardware-meaningful.
"""

import os
import statistics
import sys
import time

import jax

# honor JAX_PLATFORMS even when the TPU plugin would win the backend race
# (the env var alone loses to the plugin on this box — CLAUDE.md)
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

sys.path.insert(0, ".")
from trpx_tpu.ops.coding import FrameSpec  # noqa: E402
from trpx_tpu.parallel.codec import AXIS, _encode_sharded_jit  # noqa: E402


def measure(mesh: Mesh, spec: FrameSpec, frames_per_dev: int, reps: int = 5):
    F = frames_per_dev * mesh.size
    key = jax.random.PRNGKey(0)
    x = jax.random.poisson(
        key, 3.0, (F, spec.n_padded)
    ).astype(jnp.uint16)
    x = jax.device_put(x, NamedSharding(mesh, P(AXIS, None)))
    jax.block_until_ready(x)

    @jax.jit
    def step_sum(v):
        words, nbytes, prolix, over = _encode_sharded_jit(spec, mesh, v)
        return jnp.sum(nbytes) + prolix

    @jax.jit
    def null(v):
        return jnp.int32(v[0, 0])

    int(step_sum(x))
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
    return F / t


def main():
    frames_per_dev = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    n = 512 * 512
    spec = FrameSpec.for_dtype(n, np.uint16, cap_ratio=0.5)
    devs = jax.devices()
    base = None
    nd = 1
    while nd <= len(devs):
        mesh = Mesh(np.asarray(devs[:nd]), (AXIS,))
        fps = measure(mesh, spec, frames_per_dev)
        if base is None:
            base = fps
        eff = fps / (nd * base)
        print(f"{nd:3d} devices: {fps:12,.0f} frames/s   "
              f"scaling efficiency {eff:.3f}")
        nd *= 2


if __name__ == "__main__":
    main()
