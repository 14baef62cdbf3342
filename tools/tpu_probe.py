"""Honest TPU timing probe for the encode path.

The dev tunnel's ``block_until_ready`` does not reliably block, so timing
individual dispatches is meaningless and a device->host materialization
carries ~30ms RTT. This probe runs K chained encode iterations INSIDE one
jit (each iteration's input depends on the previous checksum, forcing
sequential execution), materializes once, and amortizes: t_step =
(t_total - RTT) / K. RTT is measured with a K=0-equivalent null chain.

Usage: python tools/tpu_probe.py [F] [K]
"""

import statistics
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from trpx_tpu.ops.coding import FrameSpec, encode_frame_device  # noqa: E402


def main():
    F = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    n = 512 * 512
    ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 0.5
    spec = FrameSpec.for_dtype(n, np.uint16, cap_ratio=ratio)
    key = jax.random.PRNGKey(0)
    x = jax.random.poisson(key, 3.0, (F, spec.n_padded)).astype(jnp.uint16)
    x = jnp.where(jnp.arange(spec.n_padded)[None, :] < n, x, 0)
    jax.block_until_ready(x)

    def one(fr):
        w, b, m, _ = jax.vmap(lambda f: encode_frame_device(spec, f))(fr)
        return w, b

    @jax.jit
    def chain(fr, k_unused):
        def body(i, carry):
            acc, f2 = carry
            w, b = one(f2)
            acc = acc + jnp.uint32(b.sum()) + w[0, 0]
            # serialize: next input depends on this output
            f2 = f2 ^ (acc & 1).astype(jnp.uint16)
            return acc, f2

        acc0 = jnp.uint32(0)
        acc, _ = jax.lax.fori_loop(0, K, body, (acc0, fr))
        return acc

    @jax.jit
    def null(fr):
        return jnp.uint32(fr[0, 0])

    int(null(x))
    int(chain(x, 0))  # compile + run once

    rtts = [
        (lambda t0: (int(null(x)), time.perf_counter() - t0)[1])(
            time.perf_counter()
        )
        for _ in range(5)
    ]
    rtt = statistics.median(rtts)

    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        int(chain(x, 0))
        ts.append(time.perf_counter() - t0)
    t = statistics.median(ts) - rtt
    t_step = t / K
    fps = F / t_step
    print(f"RTT {rtt * 1e3:.1f}ms; chain {t * 1e3:.1f}ms for K={K} steps of "
          f"F={F} frames")
    print(f"-> {t_step * 1e3:.2f}ms/step = {fps:,.0f} frames/s "
          f"({fps * n * 2 / 1e9:.1f} GB/s raw)")


if __name__ == "__main__":
    main()
