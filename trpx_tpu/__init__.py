"""trpx_tpu — a TPU-native TRPX (TERSE/PROLIX) lossless codec framework.

A from-scratch JAX/XLA/Pallas reimplementation of the TRPX diffraction-frame
compression format (reference: senikm/trpx, C++ header-only), built TPU-first:

* ``format/``   — normative format layer (header, bit semantics, slow codec)
* ``ops/``      — device compute path (vectorized jnp + Pallas kernels)
* ``parallel/`` — mesh sharding: frame-parallel encode across chips/hosts
* ``io/``       — greyscale TIFF ingest/emit + .trpx file assembly
* ``native/``   — C++ host runtime (serial header walk, host codec)
* ``cli/``      — ``trpx`` / ``terse`` / ``prolix`` command-line tools
"""

__version__ = "0.1.0"

from .api import compress, decompress, output_dtype  # noqa: F401
from .format import TrpxArchive, TrpxMeta  # noqa: F401
from .terse import Terse  # noqa: F401  — jpa::Terse-shaped adapter

__all__ = [
    "Terse", "TrpxArchive", "TrpxMeta",
    "compress", "decompress", "output_dtype",
]
