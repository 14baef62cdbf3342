"""Device compute path: Pallas VMEM kernels + the jnp merge/split trees.

``encode``/``decode`` pick the Pallas kernels on TPU and the jnp trees on
other backends automatically; ``pallas_pack``/``pallas_unpack`` expose the
kernels directly (with ``interpret=True`` for CPU testing).
"""

from . import pallas_pack, pallas_unpack
from .coding import (
    FrameSpec,
    assemble_archive,
    decode,
    decode_batch_device,
    encode,
    encode_batch_device,
    measured_spec,
    plan_frame,
)

__all__ = [
    "FrameSpec",
    "assemble_archive",
    "decode",
    "decode_batch_device",
    "encode",
    "encode_batch_device",
    "measured_spec",
    "plan_frame",
    "pallas_pack",
    "pallas_unpack",
]
