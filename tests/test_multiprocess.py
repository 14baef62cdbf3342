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
    # the worker script lives in tests/, so sys.path[0] is tests/ — make
    # the repo root importable regardless of how pytest was launched
    env["PYTHONPATH"] = os.pathsep.join(
        [str(WORKER.parent.parent)]
        + ([env["PYTHONPATH"]] if env.get("PYTHONPATH") else [])
    )
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
    assert out.read_bytes() == _reference_bytes()


def _worker_frames():
    F_global, n = 24, 600
    rng = np.random.default_rng(123)
    frames = rng.poisson(3.0, size=(F_global, n)).astype(np.uint16)
    frames[rng.random((F_global, n)) < 0.002] = 60000
    return frames


def _reference_bytes() -> bytes:
    return pycodec.encode(list(_worker_frames())).to_bytes()


def test_shard_crash_recovery(tmp_path):
    """Elastic recovery (SURVEY §5): one host dies before writing its
    shard; recover_shard re-encodes that frame range from the run
    manifest alone — no live collective — and completes the file."""
    from trpx_tpu.parallel.distributed import recover_shard

    nproc = 2
    port = _free_port()
    out = tmp_path / "crash.trpx"
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    # the worker script lives in tests/, so sys.path[0] is tests/ — make
    # the repo root importable regardless of how pytest was launched
    env["PYTHONPATH"] = os.pathsep.join(
        [str(WORKER.parent.parent)]
        + ([env["PYTHONPATH"]] if env.get("PYTHONPATH") else [])
    )
    env["TRPX_TEST_CRASH_PID"] = "1"
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
    ref = _reference_bytes()
    assert out.read_bytes() != ref  # shard 1's bytes are missing

    frames = _worker_frames()
    recover_shard(out, frames[12:24], frame_lo=12)
    assert out.read_bytes() == ref

    # determinism guard: wrong input frames must be rejected
    bad = frames[12:24].copy()
    bad[0, 0] ^= 1023
    with pytest.raises(ValueError):
        recover_shard(out, bad, frame_lo=12)
