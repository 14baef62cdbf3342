"""ShardedCodec encode+decode at the flagship 512×512 shape on the REAL
chip (1-device mesh): validates the Pallas-kernels-inside-shard_map
composition on hardware, asserts byte/pixel identity against the native
host codec (bit-identical to the reference encoder), and measures the
SHARDED-PROGRAM per-chip throughput — the rate one chip of a multi-chip
host actually sees, including shard_map + the all_gather size-table
collective + host assembly (VERDICT r3 ask #6).

Run: python tools/tpu_sharded_check.py [F]. Prints one PASS/FAIL JSON line.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

cache = os.path.expanduser("~/.cache/trpx_tpu/jax")
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from trpx_tpu.native import codec as ncodec  # noqa: E402
from trpx_tpu.ops.coding import FrameSpec  # noqa: E402
from trpx_tpu.parallel import ShardedCodec, default_mesh  # noqa: E402


def main() -> int:
    F = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    n = 512 * 512
    rng = np.random.default_rng(0)
    frames = rng.poisson(3.0, size=(F, n)).astype(np.uint16)
    frames[rng.random((F, n)) < 200.0 / n] = 60000

    mesh = default_mesh()
    spec = FrameSpec.for_dtype(n, np.uint16, cap_ratio=0.5)
    codec = ShardedCodec(spec, mesh)
    arch = codec.encode(frames, dimensions=(512, 512))
    ref = ncodec.encode(frames, dimensions=(512, 512))
    enc_ok = arch.to_bytes() == ref.to_bytes()
    out = codec.decode(arch, np.uint16)
    dec_ok = np.array_equal(out, frames)

    # DEVICE-STEP throughput of the sharded program vs the plain kernel
    # (VERDICT r3 ask #6): slope timing over device-resident inputs —
    # chains of 1/5 calls on DISTINCT batches inside one jit, slope
    # cancels the tunnel RTT. Isolates the shard_map + all_gather +
    # replication overhead from host transfer (which on this box is the
    # ~100 MB/s tunnel, not a production PCIe link).
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from trpx_tpu.ops.coding import measured_spec
    from trpx_tpu.ops.pallas_pack import encode_batch_pallas
    from trpx_tpu.parallel.codec import AXIS, _encode_sharded_jit

    # 256-frame batches: the chain-length differential must carry ~20 ms
    # of device work — at 64 frames (5 ms) the tunnel's +-2 ms jitter
    # produced 40% swings between runs
    Fm = max(256, F)
    padded = np.zeros((Fm, spec.n_staged), np.uint16)
    reps = rng.poisson(3.0, size=(Fm, n)).astype(np.uint16)
    reps[rng.random((Fm, n)) < 200.0 / n] = 60000
    padded[:, :n] = reps
    sh = NamedSharding(mesh, P(AXIS, None))
    xs = [jax.device_put(padded ^ np.uint16(i), sh) for i in range(5)]
    mspec = measured_spec(spec, xs[0])

    def slope(mk):
        # INTERLEAVED chain-1/chain-5 sampling: the tunnel RTT drifts by
        # multiple ms between windows, and two separate min-of-N windows
        # once produced a 3.4x-faster-than-the-plain-kernel artifact;
        # alternating samples keeps both mins in the same drift regime
        f1, f5 = mk(1), mk(5)
        int(f1(*xs[:1]))
        int(f5(*xs))
        t1s, t5s = [], []
        for _ in range(9):
            t0 = time.perf_counter()
            int(f1(*xs[:1]))
            t1s.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            int(f5(*xs))
            t5s.append(time.perf_counter() - t0)
        return max((min(t5s) - min(t1s)) / 4, 1e-9)

    def mk_sharded(chain):
        @jax.jit
        def step(*a):
            chk = jnp.uint32(0)
            for i in range(chain):
                w, nb, pb, ov = _encode_sharded_jit(mspec, mesh, a[i])
                chk = chk + jnp.uint32(nb.sum()) + jnp.uint32(pb)
            return chk
        return step

    def mk_plain(chain):
        @jax.jit
        def step(*a):
            chk = jnp.uint32(0)
            for i in range(chain):
                w, b, m, o = encode_batch_pallas(mspec, a[i])
                chk = chk + jnp.uint32(b.sum()) + w[(0,) * w.ndim]
            return chk
        return step

    t_sh = slope(mk_sharded)
    t_pl = slope(mk_plain)
    print(json.dumps({
        "check": "sharded_512x512_real_chip",
        "devices": mesh.size,
        "platform": jax.devices()[0].platform,
        "frames": F,
        "encode_byte_identical": enc_ok,
        "decode_pixel_exact": dec_ok,
        "sharded_step_fps": round(Fm / t_sh, 1),
        "plain_step_fps": round(Fm / t_pl, 1),
        "sharded_overhead_pct": round(100 * (t_sh - t_pl) / t_pl, 1),
        "pass": enc_ok and dec_ok,
    }))
    return 0 if (enc_ok and dec_ok) else 1


if __name__ == "__main__":
    sys.exit(main())
