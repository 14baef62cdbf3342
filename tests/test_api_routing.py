"""Auto device-routing policy: device=None must mean 'real accelerator',
never jax-on-the-host-cores, and must never hang on a dead backend."""

import json
import os

import numpy as np
import pytest

import trpx_tpu.api as api_mod
from trpx_tpu import api


@pytest.fixture(autouse=True)
def _reset_probe_cache():
    old = api_mod._ACCEL_BACKEND
    api_mod._ACCEL_BACKEND = None
    yield
    api_mod._ACCEL_BACKEND = old


def test_cpu_platform_answers_instantly(monkeypatch):
    """conftest pins JAX_PLATFORMS=cpu: no subprocess probe may run."""
    def boom(*a, **k):
        raise AssertionError("probe must not run for cpu platform")

    monkeypatch.setattr(api_mod, "_probe_accel", boom)
    assert api_mod._accel_backend() is False


def test_probe_result_cached_on_disk(tmp_path, monkeypatch):
    monkeypatch.setenv("TRPX_CACHE_DIR", str(tmp_path))
    calls = []

    class _R:
        returncode = 0
        stdout = "tpu\n"
        stderr = ""

    import subprocess as sp

    def fake_run(*a, **k):
        calls.append(1)
        return _R()

    monkeypatch.setattr(sp, "run", fake_run)
    assert api_mod._probe_accel("tpu") is True
    assert api_mod._probe_accel("tpu") is True  # second hits the cache
    assert len(calls) == 1
    st = json.loads((tmp_path / "accel_probe.json").read_text())
    assert st["platforms"] == "tpu" and st["accel"] is True


def test_probe_timeout_means_host(tmp_path, monkeypatch):
    monkeypatch.setenv("TRPX_CACHE_DIR", str(tmp_path))
    import subprocess as sp

    def hang(*a, **k):
        raise sp.TimeoutExpired(cmd="x", timeout=45)

    monkeypatch.setattr(sp, "run", hang)
    assert api_mod._probe_accel("axon") is False


def test_auto_routes_host_on_cpu_backend():
    """Big (>4 MiB) auto workloads use the native host codec on CPU-only
    jax — the XLA-CPU tree is ~500x slower there."""
    frames = np.random.default_rng(0).poisson(
        3.0, (24, 512, 512)).astype(np.uint16)
    arch = api.compress(frames)  # device=None
    out = api.decompress(arch)
    np.testing.assert_array_equal(np.asarray(out).reshape(frames.shape),
                                  frames)
    assert api_mod._ACCEL_BACKEND is False


def test_big_device_decode_streams_in_chunks(monkeypatch):
    """decompress(device=True) on a >_DEVICE_CHUNK_FRAMES archive routes
    through the chunked walk||unpack pipeline (O(chunk) host buffers)
    and stays pixel-exact across the chunk boundaries."""
    import trpx_tpu.runtime.stream as stream_mod

    rng = np.random.default_rng(1)
    F, h, w = 2 * api_mod._DEVICE_CHUNK_FRAMES + 37, 64, 64
    frames = rng.poisson(3.0, (F, h, w)).astype(np.uint16)
    frames[rng.random((F, h, w)) < 0.01] = 60000
    arch = api.compress(frames, device=False)

    calls = []
    real = stream_mod.iter_decode

    def spy(archive, dtype, chunk_frames=256, device=None):
        calls.append((chunk_frames, device))
        return real(archive, dtype, chunk_frames, device)

    monkeypatch.setattr(stream_mod, "iter_decode", spy)
    out = api.decompress(arch, device=True)
    np.testing.assert_array_equal(np.asarray(out), frames)
    assert calls == [(api_mod._DEVICE_CHUNK_FRAMES, True)]
