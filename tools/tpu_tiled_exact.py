"""Real-chip bit-exactness check of the TILED encode/decode kernels.

Encodes 2048x2048 and 4096x4096 u32 overflow-heavy frames through
encode_batch_pallas_tiled on the real TPU, compares the assembled
archive byte-for-byte against format/pycodec.py (spec-as-code), then
round-trips through the tiled decode kernel. Run after touching the
tiled kernel or the placement merge.

Run: python tools/tpu_tiled_exact.py [sides...]   (default: 2048 4096)
"""

import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np
import jax
import jax.numpy as jnp

cache = os.path.expanduser("~/.cache/trpx_tpu/jax")
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from trpx_tpu.format import pycodec  # noqa: E402
from trpx_tpu.ops.coding import (  # noqa: E402
    FrameSpec,
    assemble_archive,
    narrow_values,
    walk_archive,
)
from trpx_tpu.ops.pallas_pack import encode_batch_pallas_tiled  # noqa: E402
from trpx_tpu.ops.pallas_unpack import (  # noqa: E402
    decode_batch_pallas_tiled,
    tile_prepass,
)

sides = [int(a) for a in sys.argv[1:]] or [2048, 4096]
for side in sides:
    F, n = 4, side * side
    dt = np.uint32
    spec = FrameSpec.for_dtype(n, dt, cap_ratio=0.25)
    assert not spec.pallas_ok, f"{side} routed to whole-frame kernel"
    rng = np.random.default_rng(7)
    frames = rng.poisson(3.0, size=(F, n)).astype(dt)
    frames[rng.random((F, n)) < 0.02] = 1 << 19  # overflow pixels
    padded = np.zeros((F, spec.tree_rows * spec.block), dt)
    padded[:, :n] = frames

    t0 = time.time()
    w, b, m, o = jax.device_get(
        jax.jit(lambda fr: encode_batch_pallas_tiled(spec, fr))(
            jnp.asarray(padded)))
    assert not np.any(o), "capacity overflow"
    arch = assemble_archive(spec, w, b, m)
    t1 = time.time()

    ref = pycodec.encode([frames[i] for i in range(F)])
    assert arch.payload == ref.payload, f"ENCODE PAYLOAD MISMATCH {side}"
    assert arch.meta.prolix_bits == ref.meta.prolix_bits
    assert arch.meta.memory_size == ref.meta.memory_size
    t2 = time.time()

    widths, _p, wbuf = walk_archive(arch, spec)
    words_t, shift, prev0, r = tile_prepass(spec, widths, wbuf)
    out = jax.device_get(
        jax.jit(lambda *a: decode_batch_pallas_tiled(spec, *a, False, r))(
            jnp.asarray(words_t), jnp.asarray(widths),
            jnp.asarray(shift), jnp.asarray(prev0)))
    from trpx_tpu.ops.pallas_unpack import flatten_decoded
    got = narrow_values(flatten_decoded(out, n), np.dtype(dt))
    assert np.array_equal(got, frames), f"DECODE MISMATCH {side}"
    print(f"{side}x{side} u32 F={F}: encode bytes EXACT, decode EXACT "
          f"(enc {t1-t0:.1f}s incl compile, pycodec {t2-t1:.1f}s)")
print("ALL EXACT")
