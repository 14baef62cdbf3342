"""Microbenchmarks of the primitive ops the codec design chooses between.

Chained-in-jit methodology (see tpu_probe.py): K sequential iterations
inside one jit, one materialization, amortized.
"""

import statistics
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

K = 8


def timed(name, build):
    """build() -> (init_carry, body(carry)->carry, cost_desc).

    Only a scalar checksum crosses the tunnel (device->host there runs at
    ~100 MB/s, so materializing carries would swamp any kernel time).
    """
    carry0, body, desc = build()

    @jax.jit
    def chain(c):
        c = jax.lax.fori_loop(0, K, lambda i, c: body(c), c)
        leaves = jax.tree.leaves(c)
        return sum(jnp.sum(l).astype(jnp.float32) for l in leaves)

    float(chain(carry0))  # compile+run
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(chain(carry0))
        ts.append(time.perf_counter() - t0)
    t = statistics.median(ts) / K
    print(f"{name:34s} {t * 1e3:8.3f} ms/iter   ({desc(t)})")


def main():
    key = jax.random.PRNGKey(0)
    F = 64
    NW = 139264          # output words per frame
    NB = 21846           # blocks per frame
    NV = 262144          # values per frame

    # 1. elementwise pass over a (F, NV) u32 array (calibration)
    def ew():
        x = jax.random.bits(key, (F, NV), jnp.uint32)
        def body(c):
            return (c ^ (c << jnp.uint32(1))) + jnp.uint32(1)
        return x, body, lambda t: f"{F * NV * 4 * 2 / t / 1e9:.0f} GB/s rw"
    timed("elementwise (64MB)", ew)

    # 2. gather from a small per-frame table: (F, NB) table, (F, NW) idx
    def gsmall():
        tab = jax.random.bits(key, (F, NB), jnp.uint32)
        idx = jax.random.randint(key, (F, NW), 0, NB)
        def body(c):
            tab, idx = c
            g = jnp.take_along_axis(tab, idx, axis=1)
            return tab ^ g[:, :NB], (idx + 1) % NB
        return (tab, idx), lambda c: body(c), \
            lambda t: f"{F * NW / t / 1e6:.0f} M gathered/s"
    timed("gather (F,NW) from (F,NB) table", gsmall)

    # 3. monotone gather (sorted indices)
    def gmono():
        tab = jax.random.bits(key, (F, NB), jnp.uint32)
        idx = jnp.sort(jax.random.randint(key, (F, NW), 0, NB), axis=1)
        def body(c):
            tab, idx = c
            g = jnp.take_along_axis(tab, idx, axis=1)
            return tab ^ g[:, :NB], idx
        return (tab, idx), lambda c: body(c), \
            lambda t: f"{F * NW / t / 1e6:.0f} M gathered/s"
    timed("monotone gather", gmono)

    # 4. searchsorted per frame: NW queries into NB-sorted table
    def ss():
        tab = jnp.sort(jax.random.randint(key, (F, NB), 0, 1 << 22), axis=1)
        q = jax.random.randint(key, (F, NW), 0, 1 << 22)
        def body(c):
            tab, q = c
            r = jax.vmap(jnp.searchsorted)(tab, q)
            return tab, (q + r) % (1 << 22)
        return (tab, q), lambda c: body(c), \
            lambda t: f"{F * NW / t / 1e6:.0f} M queries/s"
    timed("searchsorted", ss)

    # 5. cumsum over (F, NB)
    def cs():
        x = jax.random.randint(key, (F, NB), 0, 100)
        def body(c):
            return jnp.cumsum(c, axis=1) % 1000
        return x, body, lambda t: f"{F * NB / t / 1e6:.0f} M elems/s"
    timed("cumsum (F,NB)", cs)

    # 6. cumsum over (F, NV) (values granularity)
    def cs2():
        x = jax.random.randint(key, (F, NV), 0, 100)
        def body(c):
            return jnp.cumsum(c, axis=1) % 1000
        return x, body, lambda t: f"{F * NV / t / 1e6:.0f} M elems/s"
    timed("cumsum (F,NV)", cs2)

    # 7. sort (F, NB)
    def srt():
        x = jax.random.bits(key, (F, NB), jnp.uint32)
        def body(c):
            return jnp.sort(c, axis=1) ^ jnp.uint32(1)
        return x, body, lambda t: f"{F * NB / t / 1e6:.0f} M elems/s"
    timed("sort (F,NB)", srt)


if __name__ == "__main__":
    main()
