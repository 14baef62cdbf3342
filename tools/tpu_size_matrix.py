"""Size-matrix validation on the real chip: every (frame size, dtype)
routing combination encodes+decodes bit-exact through the ROUTED paths
(whole-frame VMEM vs tiled kernels). Run after touching pallas_ok*/
kernel layouts. Run: python tools/tpu_size_matrix.py
"""

import sys
sys.path.insert(0, __file__.rsplit("/", 2)[0])

import os, time
import numpy as np, jax, jax.numpy as jnp
cache = os.path.expanduser("~/.cache/trpx_tpu/jax")
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from trpx_tpu.ops.coding import (FrameSpec, assemble_archive, walk_archive,
                                 narrow_values, _best_encoder, _best_decoder)

CASES = [  # (side, dtype, hot)
    (512, np.uint32, 2_000_000_000),   # whole-frame decode at the 8MB line
    (1024, np.uint16, 60000),          # enc whole-frame, dec tiled
    (1024, np.uint32, 2_000_000_000),  # enc whole-frame, dec tiled
]
enc = _best_encoder()
dec = _best_decoder()
for side, dt, hot in CASES:
    F, n = 8, side * side
    spec = FrameSpec.for_dtype(n, dt, cap_ratio=0.25)
    rng = np.random.default_rng(0)
    frames = rng.poisson(3.0, size=(F, n)).astype(dt)
    frames[rng.random((F, n)) < 200.0/n] = hot
    padded = np.zeros((F, spec.tree_rows * spec.block), dt)
    padded[:, :n] = frames
    t0 = time.time()
    w, b, m, o = jax.device_get(enc(spec, jnp.asarray(padded)))
    assert not np.any(o)
    arch = assemble_archive(spec, w, b, m)
    widths, _p, wbuf = walk_archive(arch, spec)
    out = jax.device_get(dec(spec, wbuf, widths, None))
    got = narrow_values(np.asarray(out)[:, :n], np.dtype(dt))
    assert np.array_equal(got, frames), f"MISMATCH {side} {dt}"
    print(f"{side}^2 {np.dtype(dt).name}: routed enc(pallas_ok={spec.pallas_ok}) "
          f"+ dec(whole={spec.pallas_ok_decode}) bit-exact "
          f"({time.time()-t0:.0f}s, ratio {arch.meta.memory_size/frames.nbytes:.3f})", flush=True)
