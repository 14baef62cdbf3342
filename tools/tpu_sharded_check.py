"""ShardedCodec encode+decode at the flagship 512×512 shape on the REAL
chip (1-device mesh): validates the Pallas-kernels-inside-shard_map
composition on hardware and asserts byte/pixel identity against the
native host codec (bit-identical to the reference encoder).

Run: python tools/tpu_sharded_check.py [F]. Prints one PASS/FAIL JSON line.
"""

import json
import os
import sys

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
    print(json.dumps({
        "check": "sharded_512x512_real_chip",
        "devices": mesh.size,
        "platform": jax.devices()[0].platform,
        "frames": F,
        "encode_byte_identical": enc_ok,
        "decode_pixel_exact": dec_ok,
        "pass": enc_ok and dec_ok,
    }))
    return 0 if (enc_ok and dec_ok) else 1


if __name__ == "__main__":
    sys.exit(main())
