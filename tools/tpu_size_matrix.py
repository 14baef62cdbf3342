"""Size-matrix validation on the real chip: every (frame size, dtype)
routing combination encodes+decodes bit-exact through the ROUTED paths
(jnp tree for sub-lane-row frames, whole-frame VMEM, tiled kernels).
For cases up to 1M values the archive bytes are also compared against
format/pycodec.py (spec-as-code); larger cases check pixel round-trip
(byte-exactness at 2K/4K lives in tools/tpu_tiled_exact.py). Run after
touching pallas_ok*/kernel layouts.

Run: python tools/tpu_size_matrix.py [--quick]
(--quick runs only the mid-size cases added for the lane-row bound.)
"""

import sys
sys.path.insert(0, __file__.rsplit("/", 2)[0])

import os, time
import numpy as np, jax, jax.numpy as jnp
cache = os.path.expanduser("~/.cache/trpx_tpu/jax")
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from trpx_tpu.format import pycodec
from trpx_tpu.ops.coding import (FrameSpec, assemble_archive, walk_archive,
                                 narrow_values, _best_encoder, _best_decoder)

MID_CASES = [  # (n, dtype, hot, cap_ratio) — frames around routing bounds
    (4, np.int16, -3, 0.5),            # single block -> jnp tree
    (1535, np.uint16, 60000, 0.25),    # 128 blocks exactly (1535/12 -> nb=128)
    (1536, np.uint16, 60000, 0.25),    # 128 full blocks -> Pallas
    (128 * 128, np.uint16, 60000, 0.25),   # small detector
    (50_000, np.uint16, 60000, 0.25),  # partial last block (50000 % 12 = 8)
    (50_000, np.int16, -30000, 0.25),  # signed, partial block
    (256 * 256, np.uint8, 255, 0.6),   # u8: lambda=3 needs ~width 4 of 8
    (256 * 256, np.uint32, 2_000_000_000, 0.25),
]
BIG_CASES = [
    (512 * 512, np.uint32, 2_000_000_000, 0.25),  # whole dec at the 8MB line
    (1024 * 1024, np.uint16, 60000, 0.25),        # enc whole, dec tiled
    (1024 * 1024, np.uint32, 2_000_000_000, 0.25),
]
CASES = MID_CASES if "--quick" in sys.argv else MID_CASES + BIG_CASES
enc = _best_encoder()
dec = _best_decoder()
for n, dt, hot, ratio in CASES:
    F = 8
    spec = FrameSpec.for_dtype(n, dt, cap_ratio=ratio)
    rng = np.random.default_rng(0)
    frames = rng.poisson(3.0, size=(F, n)).astype(dt)
    # hot-pixel density of the BASELINE config (200 per 512^2 frame)
    frames[rng.random((F, n)) < 200.0 / 512**2] = hot
    padded = np.zeros((F, spec.tree_rows * spec.block), dt)
    padded[:, :n] = frames
    t0 = time.time()
    w, b, m, o = jax.device_get(enc(spec, jnp.asarray(padded)))
    assert not np.any(o)
    arch = assemble_archive(spec, w, b, m)
    if n <= 1 << 20:
        ref = pycodec.encode([frames[i] for i in range(F)])
        assert arch.payload == ref.payload, f"BYTES MISMATCH n={n} {dt}"
    widths, _p, wbuf = walk_archive(arch, spec)
    from trpx_tpu.ops.pallas_unpack import flatten_decoded
    out = flatten_decoded(jax.device_get(dec(spec, wbuf, widths, None)), n)
    got = narrow_values(out, np.dtype(dt))
    assert np.array_equal(got, frames), f"MISMATCH n={n} {dt}"
    print(f"n={n} {np.dtype(dt).name}: routed "
          f"enc(pallas={spec.pallas_ok}) dec(whole={spec.pallas_ok_decode}) "
          f"{'byte' if n <= 1 << 20 else 'pixel'}-exact "
          f"({time.time()-t0:.0f}s, ratio {arch.meta.memory_size/frames.nbytes:.3f})",
          flush=True)
print("ALL EXACT")
