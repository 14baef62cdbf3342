"""Ablation timing of the encode pipeline: where do the ms go?

Times the encode cut at successive stages: plan only, stage rows, then
the merge tree stopped after k levels. Chained-in-jit methodology.
"""

import statistics
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from trpx_tpu.ops.coding import FrameSpec, plan_frame, _mask_for  # noqa
from trpx_tpu.ops import pack as pk  # noqa


def build_pipeline(spec, levels_cap):
    """Return f(frame) -> checksum running plan+stage+levels_cap merges."""

    def f(frame):
        plan = plan_frame(spec, frame)
        width, hb, hv = plan["width"], plan["hb"], plan["hv"]
        v = frame.astype(jnp.int32).reshape(spec.nb, spec.block)
        u = jax.lax.bitcast_convert_type(v, jnp.uint32)
        lo = u & _mask_for(width[:, None])
        if levels_cap < 0:  # plan only
            return jnp.uint32(width.sum()) + lo[0, 0]
        cap = pk.row_capacity(spec.max_block_bits)
        rows_t, lengths = pk.stage_blocks(
            lo, width, hb, hv.astype(jnp.uint32), plan["counts"], cap
        )
        P = spec.tree_rows
        if P != spec.nb:
            rows_t = jnp.concatenate(
                [rows_t, jnp.zeros((cap, P - spec.nb), jnp.uint32)], axis=1
            )
            lengths = jnp.concatenate(
                [lengths, jnp.zeros((P - spec.nb,), jnp.int32)]
            )
        if levels_cap == 0:
            return rows_t[0, 0] + jnp.uint32(lengths.sum())
        # replicate ragged_concat's loop, stopping after levels_cap merges
        caps = list(spec.pack_caps)
        rows = rows_t
        transposed = True
        C = cap
        max_bits = spec.max_block_bits
        level = 0
        while P > 1 and level < levels_cap:
            la = lengths[0::2]
            lb = lengths[1::2]
            la_bound = min(max_bits, C * 32)
            if transposed and (2 * C >= pk._LANES
                               or P <= 2 * pk._UNROLL_ROWS):
                rows = rows.T
                transposed = False
            if transposed:
                pad = jnp.zeros((C, P // 2), jnp.uint32)
                A2 = jnp.concatenate([rows[:, 0::2], pad], axis=0)
                B2 = jnp.concatenate([rows[:, 1::2], pad], axis=0)
                B2 = pk._word_shift_up_t(
                    B2, (la >> 5).astype(jnp.uint32),
                    max_shift=la_bound // 32 + 1)
                B2 = pk._funnel_up_t(B2, (la & 31).astype(jnp.uint32))
                rows = A2 | B2
            elif P <= pk._UNROLL_ROWS:
                rows = pk._merge_level_unrolled(
                    rows[0::2], rows[1::2], la, la_bound)
            else:
                pad = jnp.zeros((P // 2, C), jnp.uint32)
                A2 = jnp.concatenate([rows[0::2], pad], axis=1)
                B2 = jnp.concatenate([rows[1::2], pad], axis=1)
                B2 = pk._word_shift_up(
                    B2, (la >> 5).astype(jnp.uint32),
                    max_shift=la_bound // 32 + 1)
                B2 = pk._funnel_up(B2, (la & 31).astype(jnp.uint32))
                rows = A2 | B2
            lengths = la + lb
            P //= 2
            C *= 2
            max_bits *= 2
            level += 1
            if level < len(caps) and caps[level] < C:
                rows = rows[:caps[level]] if transposed \
                    else rows[:, :caps[level]]
                C = caps[level]
        return rows.reshape(-1)[0] + jnp.uint32(lengths.sum())

    return f


def main():
    F = 64
    K = 8
    n = 512 * 512
    ratio = float(sys.argv[1]) if len(sys.argv) > 1 else 0.5
    spec = FrameSpec.for_dtype(n, np.uint16, cap_ratio=ratio)
    key = jax.random.PRNGKey(0)
    x = jax.random.poisson(key, 3.0, (F, spec.n_padded)).astype(jnp.uint16)
    x = jnp.where(jnp.arange(spec.n_padded)[None, :] < n, x, 0)
    jax.block_until_ready(x)

    @jax.jit
    def null(fr):
        return jnp.uint32(fr[0, 0])

    int(null(x))
    rtts = []
    for _ in range(5):
        t0 = time.perf_counter()
        int(null(x))
        rtts.append(time.perf_counter() - t0)
    rtt = statistics.median(rtts)
    print(f"RTT {rtt * 1e3:.1f}ms")

    for cut in (-1, 0, 2, 5, 8, 11, 15):
        f = build_pipeline(spec, cut)

        @jax.jit
        def chain(fr):
            def body(i, carry):
                acc, f2 = carry
                acc = acc + jax.vmap(f)(f2).sum()
                f2 = f2 ^ (acc & 1).astype(jnp.uint16)
                return acc, f2
            acc, _ = jax.lax.fori_loop(
                0, K, body, (jnp.uint32(0), fr))
            return acc

        int(chain(x))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            int(chain(x))
            ts.append(time.perf_counter() - t0)
        t = (statistics.median(ts) - rtt) / K
        label = "plan" if cut == -1 else ("stage" if cut == 0
                                          else f"levels<={cut}")
        print(f"{label:12s} {t * 1e3:8.2f} ms/step  "
              f"({F / t:,.0f} fps)")


if __name__ == "__main__":
    main()
