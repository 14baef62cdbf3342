"""Real multi-process distributed encode (SURVEY §4(3)).

Spawns 2 actual Python processes, each a jax.distributed participant
with 4 virtual CPU devices (8 global), encoding disjoint frame shards
into ONE shared .trpx file via the replicated size-table/offset path
(parallel/codec.encode_shards + parallel/distributed.write_shard_file).
The gathered archive must be byte-identical to the single-process
(normative pycodec) archive.
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from trpx_tpu.format import pycodec

WORKER = Path(__file__).with_name("multiproc_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_shard_encode(tmp_path):
    # guarded by the workers' communicate(timeout=540) below
    nproc = 2
    port = _free_port()
    out = tmp_path / "multi.trpx"
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), str(port), str(nproc), str(pid),
             str(out)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True,
        )
        for pid in range(nproc)
    ]
    outs = [p.communicate(timeout=540) for p in procs]
    for p, (o, e) in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{o}\n{e}"

    # byte-identity against the normative single-process archive
    F_global, n = 24, 600
    rng = np.random.default_rng(123)
    frames = rng.poisson(3.0, size=(F_global, n)).astype(np.uint16)
    frames[rng.random((F_global, n)) < 0.002] = 60000
    ref = pycodec.encode(list(frames)).to_bytes()
    assert out.read_bytes() == ref
