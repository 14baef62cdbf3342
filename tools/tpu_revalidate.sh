#!/bin/bash
# On-chip revalidation after kernel changes: exactness matrices, sharded
# check, then the driver benchmark. Run when the TPU tunnel is up.
# Usage: bash tools/tpu_revalidate.sh [quick]
set -e
cd "$(dirname "$0")/.."
echo "=== seeded device smoke (mandatory kernel-change gate) ==="
timeout 1800 python tools/differential_campaign.py --smoke
echo "=== size matrix (byte-exactness across routing paths) ==="
timeout 1800 python tools/tpu_size_matrix.py
if [ "$1" != "quick" ]; then
  echo "=== tiled 2K/4K exactness ==="
  timeout 1800 python tools/tpu_tiled_exact.py
  echo "=== sharded encode+decode on the chip mesh ==="
  timeout 900 python tools/tpu_sharded_check.py
fi
echo "=== driver benchmark ==="
timeout 3600 python bench.py
