"""Device compute path: vectorized JAX encode/decode (+ Pallas kernels)."""

from .coding import (
    FrameSpec,
    assemble_archive,
    decode,
    decode_batch_device,
    encode,
    encode_batch_device,
    plan_frame,
)

__all__ = [
    "FrameSpec",
    "assemble_archive",
    "decode",
    "decode_batch_device",
    "encode",
    "encode_batch_device",
    "plan_frame",
]
