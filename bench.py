"""Benchmark: TRPX encode+decode throughput on TPU, all flagship configs.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
``value`` is the 512×512 uint16 ENCODE rate (the headline metric,
vs_baseline relative to the reference's measured 1712 frames/s on one
Xeon core — BASELINE.md); the same object carries the decode rate and
the 2048²/4096² uint32 overflow-heavy configs (BASELINE config 3) so the
driver's BENCH_r*.json records the full judged metric set.

Methodology (round 4): SLOPE timing, the same estimator as the ablation
tools. Chains of N1/N2 kernel calls over DISTINCT device-resident
batches inside one jit (distinct inputs defeat XLA CSE); the chain-length
slope (t[N2] - t[N1]) / (N2 - N1) cancels every constant offset — tunnel
RTT, dispatch, scalar fetch — exactly. The previous subtract-null-op-RTT
method was retired this round after it over-read the same binary by +30%
and +60% in two back-to-back runs (min(step) - min(null) assumes the
null op and the step share a fixed cost; under the tunnel's 2026-08-20
regime the null op measured ~4.5 ms MORE fixed cost than the step, so
the subtraction manufactured throughput). Slope agrees with the
per-stage ablation sums and is stable ±3-5% run to run (BASELINE.md).

Frames are synthesized ON DEVICE (Poisson background + hot pixels, the
BASELINE.md workload, ~0.21 compression ratio) so the measurement
isolates the codec kernels from host↔device transfer (the dev box
reaches the TPU through a ~100 MB/s network tunnel; a production host
feeds local HBM). Decode timing covers the device unpack kernels with
tables staged; the serial host header walk is timed separately
(``host_walk_frames_per_s``), and ``foreign_decode_*`` keys report the
honest first-contact rate (serial walk + prepass + device unpack, no
overlap assumed — runtime/stream.iter_decode pipelines them, and the
CLI's sidecar-by-default makes every later decode walk-free).

Run on real hardware: ``python bench.py [n_frames] [reps]``.
"""

from __future__ import annotations

import json
import statistics
import sys
import time

import numpy as np

REFERENCE_FPS = 1712.0       # reference encoder, 1 CPU core (BASELINE.md)
REFERENCE_DECODE_FPS = 2061.0
REFERENCE_2K_FPS = 54.0      # 0.9 GB/s on 16.8 MB 2048² u32 frames
REFERENCE_4K_FPS = 13.5      # 0.9 GB/s on 67 MB 4096² u32 frames

# HBM speed-of-light per chip, GB/s (public figures)
HBM_GBS = {
    "TPU v5 lite": 819.0,   # v5e
    "TPU v5p": 2765.0,
    "TPU v4": 1228.0,
    "TPU v6 lite": 1640.0,  # v6e / Trillium
}


def _slope(mk, args1, args2, n1, n2, reps):
    """Per-call seconds from the chain-length slope (min-of-reps)."""
    f1, f2 = mk(n1), mk(n2)
    int(f1(*args1))  # compile + warm
    int(f2(*args2))

    def tmin(fn, a):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            int(fn(*a))
            ts.append(time.perf_counter() - t0)
        return min(ts), ts

    t1, _ = tmin(f1, args1)
    t2, ts2 = tmin(f2, args2)
    return max((t2 - t1) / (n2 - n1), 1e-9), ts2


def _measured_over(spec, xs):
    """Measured capacity schedule proven over EVERY batch in ``xs``
    (elementwise per-level max of the per-batch measured schedules)."""
    from trpx_tpu.ops.coding import measured_spec

    scheds = [measured_spec(spec, x).pack_caps for x in xs]
    return spec.with_sched(tuple(max(c) for c in zip(*scheds)))


def staged_values(spec):
    """Values per frame the target kernel actually DMAs: the 8-row-
    aligned natural-layout size for whole-frame kernels, the exact tile
    grid for big (tiled) frames — presizing the synth avoids an in-jit
    pad/slice copy of the whole batch before every chained call."""
    from trpx_tpu.ops.pallas_pack import TILE_BLOCKS

    if spec.pallas_ok:
        return spec.n_staged
    T = -(-spec.nb // TILE_BLOCKS)
    return T * TILE_BLOCKS * spec.block


def _synth(jax, jnp, spec, F, hot_val, seed=0):
    """Device-side diffraction frames padded to the kernel grid.

    Synthesized in <=256-frame chunks: the Poisson rejection sampler's
    f32 temps for a 1024-frame batch alone exceed HBM (observed 15.75G
    OOM); chunking bounds the live temp set while the final batch still
    lands in one contiguous array."""
    n_full = staged_values(spec)
    dt = jnp.uint16 if spec.max_width <= 16 else jnp.uint32

    import functools

    @functools.partial(jax.jit, static_argnums=1)
    def chunk(key, Fc):
        x = jax.random.poisson(key, 3.0, (Fc, n_full)).astype(dt)
        lane = jnp.arange(n_full)[None, :]
        x = jnp.where(lane < spec.n, x, 0)
        hot = (jax.random.uniform(jax.random.fold_in(key, 1),
                                  (Fc, n_full)) < 200.0 / spec.n)
        return jnp.where(hot & (lane < spec.n), dt(hot_val), x)

    step = min(F, 256)
    parts = []
    for i in range(0, F, step):
        key = jax.random.fold_in(jax.random.PRNGKey(seed + 977 * F), i)
        parts.append(chunk(key, min(step, F - i)))
    x = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)
    return jax.block_until_ready(x)


def _pipelined_foreign(jax, jnp, arch, dtype, F, C, reps):
    """Wall-clock of the REAL runtime/stream.iter_decode pipeline on a
    cold (sidecar-free) archive: per-chunk walk + prepass + H2D + device
    unpack, with the walk of chunk k+1 overlapping the unpack of chunk k.
    fetch=False keeps the pixels device-resident (the on-device-consumer
    path), so the tunnel's slow device->host pixel copy — which a
    production host doesn't have — stays out of the number. Returns
    min-of-reps seconds."""
    from trpx_tpu.runtime.stream import iter_decode

    def once():
        # fresh archive view: iter_decode caches its walk tables on the
        # archive (sidecar support), and this times FIRST contact
        cold = type(arch)(meta=arch.meta, payload=arch.payload)
        cold._padded_buf = getattr(arch, "_padded_buf", None)
        t0 = time.perf_counter()
        chks = []
        for dev, nf in iter_decode(cold, dtype, chunk_frames=C,
                                   device=True, fetch=False):
            chks.append(dev[(0,) * dev.ndim].astype(jnp.int32))
        int(jnp.stack(chks).sum())  # materialize: drains the pipeline
        return time.perf_counter() - t0

    once()  # warm: compiles every chunk-shape/schedule key
    return min(once() for _ in range(reps))


def bench_512(jax, jnp, F, reps, n1=1, n2=9):
    """512×512 u16: Pallas VMEM encode + split-tree decode."""
    from trpx_tpu.ops.coding import (
        FrameSpec,
        assemble_archive,
        walk_archive,
    )

    n = 512 * 512
    spec = FrameSpec.for_dtype(n, np.uint16, cap_ratio=0.25)
    xs = [_synth(jax, jnp, spec, F, 60000, seed=s) for s in range(n2)]
    try:
        # measured per-level capacity schedule (production default):
        # the merge tree carries no slack this batch doesn't need.
        # Schedule over ALL chained batches (elementwise max): a single-
        # batch schedule can overflow on a sibling batch's data (over
        # flag fires, the stream is garbage, and the decode section's
        # walk then rejects it — observed at 2048²/TILE_BLOCKS=16384).
        spec = _measured_over(spec, xs)
    except Exception as e:  # pragma: no cover - backend-dependent
        print(f"measured schedule unavailable ({e})", file=sys.stderr)

    kernel_name = "pallas-vmem"
    try:
        from trpx_tpu.ops.pallas_pack import encode_batch_pallas

        # stage the chain inputs in the kernel's natural layout ONCE
        # (outside timing; stage_natural_device is the shared device-side
        # twin of the production host stager)
        from trpx_tpu.ops.pallas_pack import stage_natural_device

        xs = [jax.block_until_ready(stage_natural_device(spec, x, F))
              for x in xs]
        enc = lambda fr: encode_batch_pallas(spec, fr)
        _, _, _, over0 = jax.device_get(enc(xs[0]))
        assert not bool(np.any(over0)), "soft capacity overflowed"
    except Exception as e:  # pragma: no cover - backend-dependent
        print(f"pallas kernel unavailable ({type(e).__name__}: {e}); "
              "falling back to jnp tree", file=sys.stderr)
        kernel_name = "jnp-tree"
        from trpx_tpu.ops.coding import encode_batch_device

        xs = [x.reshape(F, -1)[:, : spec.n_padded] for x in xs]
        enc = lambda fr: encode_batch_device(spec, fr)

    def mk_enc(chain):
        @jax.jit
        def step(*a):
            chk = jnp.uint32(0)
            for i in range(chain):
                words, bits, maxw, over = enc(a[i])
                chk = (chk + jnp.uint32(bits.sum())
                       + words[(0,) * words.ndim]
                       + words[(-1,) * words.ndim]
                       + jnp.uint32(over.sum()))
            return chk
        return step

    t_enc, ts_enc = _slope(mk_enc, xs[:n1], xs, n1, n2, reps)

    # ---- decode: archive -> walk (host, timed separately) -> device ----
    words, bits, maxw, _ = jax.device_get(enc(xs[0]))
    arch = assemble_archive(spec, words, bits, maxw)
    walk_archive(arch, spec)  # cold call: native lib load + payload copy
    # median of reps: the walk shares the 4 host cores with the JAX
    # runtime's service threads, and a single sample can catch a burst
    # of contention (observed 10x outliers on driver runs).
    # Each rep walks a FRESH index-free archive view: this times true
    # first contact (the serial foreign-archive walk) — the encoder
    # archive carries frame_index (parallel walk), and walk_archive
    # caches its tables on the archive (walk-free repeats).
    walk_ts = []
    for _ in range(max(3, min(reps, 5))):
        cold = type(arch)(meta=arch.meta, payload=arch.payload)
        cold._padded_buf = getattr(arch, "_padded_buf", None)
        t0 = time.perf_counter()
        widths, poffs, wbuf = walk_archive(cold, spec)
        walk_ts.append(time.perf_counter() - t0)
    walk_s = statistics.median(walk_ts)  # serial walk + gather, no sidecar

    dec_name = "jnp-tree"
    use_pallas_dec = True
    try:
        from trpx_tpu.ops.pallas_unpack import (
            choose_schedule,
            decode_batch_pallas,
        )

        ratio = choose_schedule(spec, widths)
        dec_name = f"pallas-split r{ratio}"
    except Exception:
        use_pallas_dec = False
        from trpx_tpu.ops.coding import decode_batch_device

    # decode args for every chained batch (distinct inputs defeat CSE);
    # uint8 width tables (widths <= 73): 1/4 the H2D traffic
    from trpx_tpu.ops.pallas_unpack import stage_decode_inputs

    wbs, wds = [], []
    for s in range(n2):
        if s == 0:
            w, b, m = words, bits, maxw
        else:
            w, b, m, _ = jax.device_get(enc(xs[s]))
        a = assemble_archive(spec, w, b, m)
        wd, _p, wb = walk_archive(a, spec)
        wbs.append(wb)
        wds.append(wd.astype(np.uint8))
    Wmax = max(w.shape[1] for w in wbs)
    dargs = []
    for w, d in zip(wbs, wds):
        # staged in the kernel layouts (host-side, free): one compiled
        # shape across batches, no in-jit pad/reshape relayouts
        w3, d3 = stage_decode_inputs(
            spec, np.pad(w, ((0, 0), (0, Wmax - w.shape[1]))), d)
        dargs.append(jax.block_until_ready(jnp.asarray(w3)))
        dargs.append(jax.block_until_ready(jnp.asarray(d3)))

    # consume TWO corners only: the pallas_call materializes its full
    # output regardless, and a strided checksum slice (o[:, ::4096])
    # measured ~0.7-1.4 ms of pure latency-bound DMA gather per rep —
    # an instrumentation artifact that deflated every round-3 decode
    # number by ~20%
    def mk_dec(chain):
        @jax.jit
        def step(*a):
            chk = jnp.uint32(0)
            for i in range(chain):
                if use_pallas_dec:
                    # block-layout (F, Lr, R*B) return (no on-device
                    # flatten relayout; hosts flatten after the fetch)
                    o = decode_batch_pallas(spec, a[2 * i], a[2 * i + 1],
                                            False, ratio)
                    chk = (chk + jnp.uint32(o[0, 0, 0])
                           + jnp.uint32(o[-1, -1, -1]))
                else:
                    o = decode_batch_device(spec, a[2 * i],
                                            a[2 * i + 1].astype(jnp.int32),
                                            None)
                    chk = chk + jnp.uint32(o[0, 0]) + jnp.uint32(o[-1, -1])
            return chk
        return step

    t_dec, ts_dec = _slope(mk_dec, dargs[: 2 * n1], dargs, n1, n2, reps)
    try:
        t_pipe = _pipelined_foreign(jax, jnp, arch, np.uint16, F,
                                    max(32, F // 4), max(3, min(reps, 5)))
    except Exception as e:  # pragma: no cover - backend-dependent
        print(f"pipelined foreign bench unavailable: {e}", file=sys.stderr)
        t_pipe = None
    return dict(
        kernel=kernel_name, dec_kernel=dec_name,
        pipelined_fps=(F / t_pipe if t_pipe else None),
        enc_fps=F / t_enc, dec_fps=F / t_dec,
        enc_gbs=F * arch.meta.number_of_values * 2 / t_enc / 1e9,
        dec_gbs=F * arch.meta.number_of_values * 2 / t_dec / 1e9,
        walk_fps=F / walk_s,
        # honest FIRST-CONTACT number: a foreign archive (no sidecar)
        # pays the serial walk + the device unpack; no overlap assumed
        # (iter_decode pipelines them, so production sits between this
        # and dec_fps — after the first decode the sidecar-by-default
        # makes every later decode walk-free)
        foreign_fps=F / (walk_s + t_dec),
        ts_enc=ts_enc, ts_dec=ts_dec,
    )


def bench_big(jax, jnp, reps, edge=2048, F=32, n1=1, n2=5):
    """edge×edge u32 overflow-heavy (BASELINE config 3 covers 2K and 4K):
    tiled kernels, slope-timed like bench_512."""
    from trpx_tpu.ops.coding import FrameSpec, assemble_archive, walk_archive
    from trpx_tpu.ops.pallas_pack import encode_batch_pallas_tiled
    from trpx_tpu.ops.pallas_unpack import (
        decode_batch_pallas_tiled,
        tile_prepass,
    )

    n = edge * edge
    spec = FrameSpec.for_dtype(n, np.uint32, cap_ratio=0.25)
    xs = [_synth(jax, jnp, spec, F, 2_000_000_000, seed=2 + s)
          for s in range(n2)]
    try:
        spec = _measured_over(spec, xs)  # see bench_512
    except Exception as e:  # pragma: no cover - backend-dependent
        print(f"measured schedule unavailable ({e})", file=sys.stderr)

    # stage the chain inputs in the tiled kernel's (F, T, L, R*B)
    # layout once (outside timing): the in-jit reshape is a relayout
    # copy per chained call (round 5; staged_values presized to the
    # tile grid)
    from trpx_tpu.ops.pallas_pack import TILE_BLOCKS as _TB

    Tt = -(-spec.nb // _TB)
    Lt = min(128, _TB)
    xs = [jax.block_until_ready(x.reshape(F, Tt, Lt, -1)) for x in xs]
    words, bits, maxw, over = jax.device_get(
        jax.jit(lambda fr: encode_batch_pallas_tiled(spec, fr))(xs[0])
    )
    assert not bool(np.any(over)), f"{edge} soft capacity overflowed"

    def mk_enc(chain):
        @jax.jit
        def step(*a):
            chk = jnp.uint32(0)
            for i in range(chain):
                w, b, m, o = encode_batch_pallas_tiled(spec, a[i])
                # consume only defined words: under the tiled encoder's
                # contract, words past a frame's 1 + bits//8 bytes are
                # UNSPECIFIED (rows past the last DMA window are never
                # written), so w[-1, -1] would read uninitialized HBM
                chk = (chk + jnp.uint32(b.sum()) + w[(0,) * w.ndim]
                       + jnp.uint32(m.max()) + jnp.uint32(o.sum()))
            return chk
        return step

    t_enc, ts_enc = _slope(mk_enc, xs[:n1], xs, n1, n2, reps)

    arch = assemble_archive(spec, words, bits, maxw)
    walk_archive(arch, spec)  # cold call: native lib load + payload copy
    walk_ts = []
    for _ in range(3):
        # a fresh archive view per rep: walk_archive caches its tables
        # on the archive (sidecar-by-default support), and the walk
        # being timed here is the UNCACHED foreign-archive case
        cold = type(arch)(meta=arch.meta, payload=arch.payload)
        cold._padded_buf = getattr(arch, "_padded_buf", None)
        t0 = time.perf_counter()
        widths, _poffs, wbuf = walk_archive(cold, spec)
        walk_ts.append(time.perf_counter() - t0)
    walk_s = statistics.median(walk_ts)
    t0 = time.perf_counter()
    words_t, shift, prev0, ratio = tile_prepass(spec, widths, wbuf)
    prep_s = time.perf_counter() - t0

    from trpx_tpu.ops.pallas_unpack import stage_tiled_widths

    dargs = []
    for s in range(n2):
        if s == 0:
            wt, sh, pv, wd = words_t, shift, prev0, widths
        else:
            w, b, m, _ = jax.device_get(
                jax.jit(lambda fr: encode_batch_pallas_tiled(spec, fr))(
                    xs[s]))
            a = assemble_archive(spec, w, b, m)
            wd, _p, wb = walk_archive(a, spec)
            wt, sh, pv, _r = tile_prepass(spec, wd, wb)
        for v in (wt, stage_tiled_widths(spec, wd), sh, pv):
            dargs.append(jax.block_until_ready(jnp.asarray(v)))

    # two-corner consume (see bench_512's dec path): the strided checksum
    # was a latency-bound DMA artifact in the measurement
    def mk_dec(chain):
        @jax.jit
        def step(*a):
            chk = jnp.uint32(0)
            for i in range(chain):
                wt, wd, sh, pv = a[4 * i: 4 * i + 4]
                o = decode_batch_pallas_tiled(spec, wt, wd, sh, pv,
                                              False, ratio)
                chk = (chk + jnp.uint32(o[0, 0, 0, 0])
                       + jnp.uint32(o[-1, -1, -1, -1]))
            return chk
        return step

    t_dec, ts_dec = _slope(mk_dec, dargs[: 4 * n1], dargs, n1, n2, reps)
    try:
        t_pipe = _pipelined_foreign(jax, jnp, arch, np.uint32, F,
                                    max(2, F // 4), 3)
    except Exception as e:  # pragma: no cover - backend-dependent
        print(f"pipelined foreign bench unavailable: {e}", file=sys.stderr)
        t_pipe = None
    return dict(
        pipelined_fps=(F / t_pipe if t_pipe else None),
        enc_fps=F / t_enc, dec_fps=F / t_dec,
        enc_gbs=F * n * 4 / t_enc / 1e9, dec_gbs=F * n * 4 / t_dec / 1e9,
        walk_fps=F / walk_s, dec_ratio=ratio,
        # first contact on a foreign archive: serial walk + tile prepass
        # + device unpack (no overlap assumed; sidecar-by-default makes
        # later decodes walk-free)
        foreign_fps=F / (walk_s + prep_s + t_dec),
        ts_enc=ts_enc, ts_dec=ts_dec,
    )


def main() -> None:
    import os

    import jax
    import jax.numpy as jnp

    # persistent XLA cache: repeated bench runs skip the multi-minute
    # TPU compile of the kernels
    cache = os.path.expanduser("~/.cache/trpx_tpu/jax")
    try:
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    # Device discovery hangs indefinitely when the tunneled TPU is
    # unreachable (observed: jax.devices() never returns). Fail fast
    # with a diagnosable exit instead of letting the driver's bench run
    # sit until its own timeout. 300 s is generous for first contact;
    # compiles happen after discovery and are not under the watchdog.
    import threading

    def _discovery_timeout():
        print(
            "bench.py: TPU device discovery timed out after 300 s — "
            "backend/tunnel unreachable; no measurement taken",
            file=sys.stderr, flush=True,
        )
        os._exit(3)

    watchdog = threading.Timer(300.0, _discovery_timeout)
    watchdog.daemon = True
    watchdog.start()
    dev = jax.devices()[0]
    watchdog.cancel()
    kind = getattr(dev, "device_kind", "?")
    print(f"device: {dev.platform} {kind}", file=sys.stderr)
    sol = HBM_GBS.get(kind)

    # slope chains need N2 distinct resident batches: 512 frames x 9
    # batches (~3.6 GB of inputs) fits the 16 GB HBM with the chained
    # program's intermediates; 1024 x 9 does not (measured OOM)
    F = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 7

    r5 = bench_512(jax, jnp, F, reps)
    sol_txt = (f", {100 * r5['enc_gbs'] / sol:.1f}% of HBM SoL ingest"
               if sol else "")
    print(
        f"[{r5['kernel']}] encode 512u16: {r5['enc_fps']:,.0f} frames/s "
        f"({r5['enc_gbs']:.1f} GB/s raw in{sol_txt}); "
        f"chain rep ms {[round(v * 1e3, 1) for v in r5['ts_enc']]}",
        file=sys.stderr,
    )
    print(
        f"[{r5['dec_kernel']}] decode 512u16: {r5['dec_fps']:,.0f} frames/s "
        f"({r5['dec_gbs']:.1f} GB/s raw out); host walk {r5['walk_fps']:,.0f} "
        f"frames/s; chain rep ms {[round(v * 1e3, 1) for v in r5['ts_dec']]}",
        file=sys.stderr,
    )
    if r5.get("pipelined_fps"):
        print(f"pipelined foreign 512: {r5['pipelined_fps']:,.0f} frames/s "
              f"(iter_decode, device-resident)", file=sys.stderr)

    extra_2k = {}
    for edge, F_big, ref_fps in ((2048, 32, REFERENCE_2K_FPS),
                                 (4096, 8, REFERENCE_4K_FPS)):
        try:
            rb = bench_big(jax, jnp, max(3, min(reps, 5)), edge, F_big)
            print(
                f"[tiled] encode {edge}u32: {rb['enc_fps']:,.1f} frames/s "
                f"({rb['enc_gbs']:.1f} GB/s); decode: {rb['dec_fps']:,.1f} "
                f"frames/s ({rb['dec_gbs']:.1f} GB/s, bucket {rb['dec_ratio']}); "
                f"walk {rb['walk_fps']:,.1f} frames/s; "
                f"enc chain ms {[round(v*1e3) for v in rb['ts_enc']]} "
                f"dec chain ms {[round(v*1e3) for v in rb['ts_dec']]}",
                file=sys.stderr,
            )
            extra_2k.update({
                f"encode_{edge}x{edge}_u32_frames_per_s": round(rb["enc_fps"], 1),
                f"decode_{edge}x{edge}_u32_frames_per_s": round(rb["dec_fps"], 1),
                f"foreign_decode_{edge}x{edge}_u32_frames_per_s":
                    round(rb["foreign_fps"], 1),
                f"encode_{edge}_vs_reference": round(rb["enc_fps"] / ref_fps, 2),
            })
            if rb.get("pipelined_fps"):
                extra_2k[f"foreign_pipelined_{edge}x{edge}_u32_frames_per_s"] = \
                    round(rb["pipelined_fps"], 1)
                print(f"[tiled] pipelined foreign {edge}: "
                      f"{rb['pipelined_fps']:,.1f} frames/s (iter_decode, "
                      f"device-resident)", file=sys.stderr)
        except Exception as e:  # pragma: no cover - backend-dependent
            print(f"{edge} bench unavailable: {type(e).__name__}: {e}",
                  file=sys.stderr)

    print(json.dumps({
        "metric": "encode_512x512_u16_frames_per_s",
        "value": round(r5["enc_fps"], 1),
        "unit": "frames/s",
        "vs_baseline": round(r5["enc_fps"] / REFERENCE_FPS, 2),
        "decode_512x512_u16_frames_per_s": round(r5["dec_fps"], 1),
        "decode_vs_reference": round(r5["dec_fps"] / REFERENCE_DECODE_FPS, 2),
        "host_walk_frames_per_s": round(r5["walk_fps"], 1),
        "foreign_decode_512x512_u16_frames_per_s": round(r5["foreign_fps"], 1),
        **({"foreign_pipelined_512x512_u16_frames_per_s":
            round(r5["pipelined_fps"], 1)} if r5.get("pipelined_fps") else {}),
        **extra_2k,
    }))


if __name__ == "__main__":
    main()
