"""Mesh sharding: frame-parallel encode/decode across chips and hosts."""

from .codec import (
    ShardedCodec,
    default_mesh,
    encode_sharded,
    decode_sharded,
)

__all__ = [
    "ShardedCodec",
    "default_mesh",
    "encode_sharded",
    "decode_sharded",
]
