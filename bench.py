"""Benchmark: concurrent realtime 48 kHz Opus streams per chip.

Measures REAL StreamPool pipelines end to end (batched C++ symbol
phase -> one packed upload -> fused jitted device synthesis) for the
BASELINE configs, in BOTH output modes:

  * device-resident (headline): decoded PCM lands in HBM for on-chip
    consumers (feature/vocoder/ASR stages on the same chip); the host
    link carries only the compact symbol tensors. This matches the
    north-star metric (streams DECODED faster than realtime per chip).
  * pcm-to-host: every frame's PCM is streamed back to host memory
    (the reference player's I2S-egress analog) — on this dev rig that
    path crosses a tunneled link, so it is link-bound, not chip-bound.

Honesty note: the axon client journals device work lazily and replays
it on first host read — timings taken before any read measure nothing.
This bench therefore forces synchronized execution with a priming
read BEFORE every timed window, so every number is a real wall-clock
rate of executed work.

Baseline: the reference ESP32 player sustains 1 stream per 2x240 MHz
chip. Prints ONE JSON line {"metric", "value", "unit", "vs_baseline",
"configs", "components"}.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

FIX = "tests/fixtures"


def _force_sync_mode():
    """One tiny device read: flushes the lazy-execution journal and
    keeps every later execute synchronous (honest timing)."""
    import jax
    import jax.numpy as jnp
    np.asarray(jnp.zeros((4,), jnp.int32) + 1)


def bench_pool(src, B, channels, iters, output, warm=4, consume=False,
               **pool_kw):
    """Measured steady-state e2e streams/chip of a real StreamPool.
    Also returns the per-step host phase split (ms) over the timed
    window: host_symbol / dispatch / materialize — the materialize
    share is the pipeline-overlap evidence (deferred retirement +
    copy_to_host_async hide the D2H behind later host phases; compare
    against the raw PCM size over the measured link rate).
    consume=True attaches an on-chip log-mel consumer (the decoded PCM
    feeds a downstream jitted stage in HBM, never crossing the link).
    superstep pools dispatch once per K staged frames, so warm/iters
    are aligned to whole K-frame windows — otherwise the trailing
    sync() flushes a PADDED partial window (full K-frame program for
    <K real frames) inside the timed region and overstates the cost."""
    from esp32_opus_player_tpu.models.stream_pool import StreamPool
    K = int(pool_kw.get("superstep_k", 1) or 1)
    if K > 1:
        warm = max(warm, K)
        warm -= warm % K
        iters = max(iters, 2 * K)
        iters -= iters % K
    kw = dict(device_keep=2) if output == "device" else {}
    pool = StreamPool([src] * B, channels=channels, native=True,
                      fixed_buckets=True, output=output, **kw, **pool_kw)
    if consume:
        from esp32_opus_player_tpu.models.consumer import (
            LogMelFrontend, OnChipConsumer)
        pool.attach_consumer(OnChipConsumer(LogMelFrontend()))
    pool.warmup()
    for _ in range(warm):
        pool.step()
    pool.sync()
    for k in pool._phase_s:
        pool._phase_s[k] = 0.0
    t0 = time.time()
    n = 0
    for _ in range(iters):
        if not pool.step():
            break
        n += 1
    pool.sync()
    if consume and pool._consumer._chunks:
        import jax
        jax.block_until_ready([c[0] for c in pool._consumer._chunks])
    dt = time.time() - t0
    if n == 0:
        return 0.0, 0.0, {}
    phases = {k: round(v / n * 1000, 1) for k, v in pool._phase_s.items()}
    return B * 0.02 / (dt / n), dt / n * 1000, phases


def bench_pool_loss(src, B, channels, iters, fec=False, **pool_kw):
    """Config 5: 10% periodic loss with real batched PLC (rfc mode).
    pool_kw superstep_k=K keeps lossy steps INSIDE the K-frame window
    (masked decode|conceal dual-path program, _silk_pool_superstep_lossy)
    instead of flushing it per loss step. fec=True recovers each lost
    frame from the next packet's in-band LBRR instead of concealing
    (the FEC rows' device program is the normal decode program, so FEC
    steps ride the superstep window too). Like bench_pool, warm/iters
    align to whole K-frame windows."""
    from esp32_opus_player_tpu.models.stream_pool import StreamPool
    K = int(pool_kw.get("superstep_k", 1) or 1)
    warm = 4
    if K > 1:
        warm = max(warm, K)
        warm -= warm % K
        iters = max(iters, 2 * K)
        iters -= iters % K
    pool = StreamPool([src] * B, channels=channels, native=True,
                      fixed_buckets=True, compat_ref=False, rfc_plc=True,
                      output="device", device_keep=2, **pool_kw)
    pool.warmup()
    for k in range(warm):
        lost = {i for i in range(B) if i % 10 == k % 10}
        pool.step(lost, fec=lost if fec else None)
    pool.sync()
    for k in pool._phase_s:
        pool._phase_s[k] = 0.0
    t0 = time.time()
    n = 0
    for k in range(iters):
        lost = {i for i in range(B) if i % 10 == k % 10}
        if not pool.step(lost, fec=lost if fec else None):
            break
        n += 1
    pool.sync()
    dt = time.time() - t0
    if n == 0:
        return 0.0, 0.0, {}
    phases = {k: round(v / n * 1000, 1) for k, v in pool._phase_s.items()}
    return B * 0.02 / (dt / n), dt / n * 1000, phases


def bench_farm_loss(src, B, channels, iters, **pool_kw):
    """PoolFarm capacity row: the lossy superstep workload of
    bench_pool_loss driven through the pod-scale vehicle (one shard
    per available chip; on this rig that is one shard, so the row
    measures the farm layer's routing/aggregation overhead over the
    raw pool)."""
    from esp32_opus_player_tpu.parallel.farm import PoolFarm
    K = int(pool_kw.get("superstep_k", 1) or 1)
    warm = max(4, K)
    warm -= warm % K
    iters = max(iters, 2 * K)
    iters -= iters % K
    farm = PoolFarm([src] * B, channels=channels, native=True,
                    fixed_buckets=True, compat_ref=False, rfc_plc=True,
                    output="device", device_keep=2, **pool_kw)
    for pool in farm.pools:
        pool.warmup()
    for k in range(warm):
        lost = {i for i in range(B) if i % 10 == k % 10}
        farm.step(lost)
    for pool in farm.pools:
        pool.sync()
        for ph in pool._phase_s:
            pool._phase_s[ph] = 0.0
    t0 = time.time()
    n = 0
    for k in range(iters):
        lost = {i for i in range(B) if i % 10 == k % 10}
        if not farm.step(lost):
            break
        n += 1
    for pool in farm.pools:
        pool.sync()
    dt = time.time() - t0
    if n == 0:
        return 0.0, 0.0, {}
    phases = {ph: round(sum(p._phase_s[ph] for p in farm.pools)
                        / n * 1000, 1)
              for ph in farm.pools[0]._phase_s}
    return B * 0.02 / (dt / n), dt / n * 1000, phases


def bench_host(B=256, reps=5):
    """Batched C++ symbol phase cost per frame, measured at every
    thread count up to the core count (the VERDICT r02 ask: a measured
    streams-vs-cores curve, not an extrapolation — on a 1-core rig the
    curve has one point; the loop records whatever the host offers).

    Noise control: the per-frame time is the MIN over `reps` separately
    timed passes, not their mean — this rig is a shared 1-core VM whose
    run-to-run times swing 17-25 us/frame from external contention
    (measured: alternating the r02 and r03 trees gives overlapping
    ranges, so the BENCH_r02 17.0 -> BENCH_r03 22.9 'regression' was
    rig noise, not code). The min is the contention-free estimate."""
    import os
    from esp32_opus_player_tpu.host import opusfile
    from esp32_opus_player_tpu.models.host_groups import CeltGroup
    s = opusfile.parse_stream(open(f"{FIX}/celt_fb_mono_20ms.opus",
                                   "rb").read())
    npk = len(s.jobs)
    active = np.ones(B, dtype=bool)
    cores = len(os.sched_getaffinity(0))
    curve = {}
    threads = [1]
    while threads[-1] * 2 <= cores:
        threads.append(threads[-1] * 2)
    if cores not in threads:
        threads.append(cores)
    for nt in threads:
        g = CeltGroup(list(range(B)), [s.jobs] * B, 960, 1, 0,
                      [21] * B, n_threads=nt)
        for k in range(3):
            g.decode(np.full(B, k, dtype=np.int64), active)
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            for k in range(npk):
                g.decode(np.full(B, k, dtype=np.int64), active)
            best = min(best, (time.time() - t0) / (npk * B))
        curve[nt] = best
    per_frame = min(curve.values())
    return per_frame, cores, {str(k): round(v * 1e6, 1)
                              for k, v in curve.items()}


def bench_device(B=2048, iters=12, K=64):
    """Fused device synthesis capacity, transposed pipeline: the packed
    identity T-step chained on-device (synchronized execution, no
    per-step transfers), with VARIED per-stream pitch lags (uniform
    lags understate nothing here, but varied is the honest workload).
    Also measures the K-frame superstep (K frames per device program).
    Returns (streams, ms/frame, compile_s, superstep_streams)."""
    import jax
    import jax.numpy as jnp
    from esp32_opus_player_tpu.models.stream_pool import (
        _CELT_HDR, _celt_pool_step_packed_T, _celt_pool_superstep_T,
        NB_EBANDS)
    W = _CELT_HDR + 2 * NB_EBANDS + 960
    rng = np.random.default_rng(0)
    stg = np.zeros((B, W), dtype=np.int16)
    stg[:, 2] = rng.integers(0, 2, B)                   # transient
    stg[:, 4] = 21
    stg[:, 5:7] = rng.integers(15, 1024, (B, 2))        # comb1 T
    stg[:, 11:13] = rng.integers(15, 1024, (B, 2))      # comb2 T
    stg[:, 7:9] = 12288
    stg[:, 13:15] = 12288
    stg[:, 17] = 1
    stg[:, _CELT_HDR:] = rng.integers(-8192, 8192, (B, W - _CELT_HDR),
                                      dtype=np.int16)
    sdev = jnp.asarray(stg)
    dm = jnp.zeros((1, 2168, B), jnp.int32)
    pre = jnp.zeros((B, 1), jnp.int32)
    t0 = time.time()
    outs = _celt_pool_step_packed_T(dm, pre, sdev, LM=3, C=1, CC=1,
                                    chunk=13, masked=False)
    dm, pre = outs[-2], outs[-1]
    jax.block_until_ready(dm)
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(iters):
        outs = _celt_pool_step_packed_T(dm, pre, sdev, LM=3, C=1, CC=1,
                                        chunk=13, masked=False)
        dm, pre = outs[-2], outs[-1]
    jax.block_until_ready(dm)
    step = (time.time() - t0) / iters
    # K-frame superstep: one program per K frames (launch overhead and
    # the XLA prologue amortize K x); probe batch sizes for the chip's
    # peak — the north-star quantity is decode capacity per chip with
    # PCM delivered to HBM. Symbol ingest at this rate: the CELT staging
    # row is 18+42+960 int16 = 2,040 B/frame, so 10k streams x 50 fps
    # ~= 1.0 GB/s H2D (the 46.5k headline implies ~4.7 GB/s) — well
    # under PCIe gen3 x16 (~12 GB/s effective) but NOT negligible;
    # measured WITH the upload in the `_upload` superstep probe below,
    # and shown separately against this rig's tunneled link.
    best = 0.0
    per_B = {}
    upload = {}
    for Bs in (B, 2 * B, 4 * B):
        stgB = stg if Bs == B else np.repeat(stg, Bs // B, axis=0)
        stgK = np.broadcast_to(stgB, (K,) + stgB.shape).copy()
        sK = jnp.asarray(stgK)
        dmS = jnp.zeros((1, 2168, Bs), jnp.int32)
        preS = jnp.zeros((Bs, 1), jnp.int32)
        # masked=True: the configuration _ss_dispatch actually serves
        # (inactive-row state carry); ~1% vs masked=False. Two warm
        # windows — the first executed window after a compile runs slow
        # on this tunneled rig (r05 sharded-gap postmortem).
        for _ in range(2):
            pcmK, dmS, preS = _celt_pool_superstep_T(
                dmS, preS, sK, LM=3, C=1, CC=1, chunk=13, masked=True)
            jax.block_until_ready(dmS)
        reps = max(iters // 2, 2)
        t0 = time.time()
        for _ in range(reps):
            pcmK, dmS, preS = _celt_pool_superstep_T(
                dmS, preS, sK, LM=3, C=1, CC=1, chunk=13, masked=True)
        jax.block_until_ready(dmS)
        sstep = (time.time() - t0) / reps / K
        per_B[Bs] = round(Bs * 0.02 / sstep, 1)
        best = max(best, Bs * 0.02 / sstep)
        # the same window timed WITH its staging upload in the loop —
        # the empirical ingest cost (2,040 B/frame/stream H2D) instead
        # of the arithmetic claim. On this rig the tunnel (~40 MB/s)
        # dominates; on PCIe the upload is a few % of the window.
        t0 = time.time()
        for _ in range(reps):
            sK = jax.device_put(stgK)
            pcmK, dmS, preS = _celt_pool_superstep_T(
                dmS, preS, sK, LM=3, C=1, CC=1, chunk=13, masked=True)
        jax.block_until_ready(dmS)
        up = (time.time() - t0) / reps / K
        upload[Bs] = round(Bs * 0.02 / up, 1)
    return (B * 0.02 / step, step * 1000, compile_s, best, per_B, upload)


def bench_device_silk(B=2048, iters=10, K=64):
    """Isolated SILK device step capacity: the fused Pallas core
    (rewhitening FIR + bit-shift LTP recurrence + LPC ring in one VMEM
    program) + 48 kHz resampler over a WB bucket, synchronized. Also
    measures the K-frame superstep (lax.scan over the same step body:
    one device program per K frames)."""
    import jax
    import jax.numpy as jnp
    from esp32_opus_player_tpu.models.stream_pool import (
        _silk_pool_step, _silk_pool_superstep)
    from esp32_opus_player_tpu.ops.silk import jax_core as sjc
    fs = 16
    frame = 20 * fs
    rng = np.random.default_rng(0)

    def bucket(n):
        I = jnp.int32
        return dict(outBuf=jnp.zeros((n, 20 * fs + frame), I),
                    sLPC=jnp.zeros((n, 16), I),
                    cng=jnp.zeros((n, 16), I),
                    conc_e=jnp.zeros(n, I), conc_s=jnp.zeros(n, I),
                    sIIR=jnp.zeros((n, 6), I),
                    sFIR=jnp.zeros((n, sjc.sfir_width(fs, 48)), I),
                    delay=jnp.zeros((n, fs), I),
                    sMid=jnp.zeros((n, 2), I))

    st = bucket(B)
    jidx = jnp.arange(B, dtype=jnp.int32)
    exc = jnp.asarray(rng.integers(-(1 << 16), 1 << 16, (B, frame),
                                   dtype=np.int32))
    A = jnp.asarray(rng.integers(-(1 << 12), 1 << 12, (B, 2, 16),
                                 dtype=np.int32))
    Bc = jnp.asarray(rng.integers(-(1 << 12), 1 << 12, (B, 4, 5),
                                  dtype=np.int32))
    iv = np.zeros((B, 4, 4), np.int32)
    iv[:, 0] = 1 << 16
    iv[:, 1] = 1 << 30
    iv[:, 2] = rng.integers(2 * fs, 18 * fs, (B, 4))
    iv[:, 3] = 1 << 14
    bools = np.zeros((B, 3, 4), bool)
    bools[:, 0] = True
    bools[:, 1, 0] = True
    glue = jnp.zeros(B, bool)
    args = (jnp.asarray(iv), jnp.asarray(bools), glue)
    kw = dict(fs=fs, nb=4, order=16, frame=frame, has_glue=False)
    out, st = _silk_pool_step(st, jidx, exc, A, Bc, *args, **kw)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out, st = _silk_pool_step(st, jidx, exc, A, Bc, *args, **kw)
    jax.block_until_ready(out)
    ms = (time.time() - t0) / iters * 1000

    # K-frame superstep (broadcast K x), probing batch sizes for the
    # chip's peak like the CELT probe
    bK = lambda a: jnp.asarray(np.broadcast_to(
        np.asarray(a), (K,) + np.asarray(a).shape).copy())
    best = 0.0
    best_ms = 0.0
    per_B = {}
    for Bs in (B, 2 * B, 4 * B):
        r = Bs // B
        rep2 = lambda a: np.repeat(np.asarray(a), r, axis=0)
        stK = bucket(Bs)
        argsK = (bK(np.arange(Bs, dtype=np.int32)), bK(rep2(exc)),
                 bK(rep2(A)), bK(rep2(Bc)), bK(rep2(iv)),
                 bK(rep2(bools)), bK(np.zeros(Bs, bool)),
                 jnp.ones(K, dtype=bool))
        outK, stK = _silk_pool_superstep(stK, *argsK, **kw)
        jax.block_until_ready(outK)
        reps = max(iters // 4, 2)
        t0 = time.time()
        for _ in range(reps):
            outK, stK = _silk_pool_superstep(stK, *argsK, **kw)
        jax.block_until_ready(outK)
        ss_ms = (time.time() - t0) / reps / K * 1000
        per_B[Bs] = round(Bs * 0.02 / (ss_ms / 1000), 1)
        if per_B[Bs] > best:
            best, best_ms = per_B[Bs], ss_ms
    return (B * 0.02 / (ms / 1000), ms, best, best_ms, per_B)


def bench_link():
    """Host<->device transfer rates of the PCM-sized path (the tunnel
    on this rig; PCIe on a production host)."""
    import jax
    import jax.numpy as jnp
    f = jax.jit(lambda x: (x + 1).astype(jnp.int16))
    x = jnp.zeros((1024, 960), jnp.int32)
    np.asarray(f(x))
    t0 = time.time()
    for _ in range(3):
        _ = np.asarray(f(x))
    d2h = (1024 * 960 * 2) / ((time.time() - t0) / 3) / 1e6
    xn = np.zeros((1024, 1020), np.int16)
    jax.block_until_ready(jax.device_put(xn))
    t0 = time.time()
    for _ in range(3):
        jax.block_until_ready(jax.device_put(xn))
    h2d = xn.nbytes / ((time.time() - t0) / 3) / 1e6
    return h2d, d2h


def bench_sharded_device(B=2048, iters=6, K=64, reps=3, warm=3):
    """Device capacity of the SPMD scale-out path (VERDICT r03 #1):
    the parallel.sharded_pool fused shard_map K-frame CELT superstep,
    same synthetic workload as bench_device (masked=True, the served
    configuration), over a mesh of the real chips available here (1).
    The shard body IS StreamPool's single-chip transposed K-frame
    body; r05 A/B decomposition (docs/CEILING.md addendum) showed the
    r04-reported 18% gap was a WARMUP artifact of this tunneled rig —
    the first timed window after compile runs slow, steady-state
    matches within noise. Hence `warm` extra executed windows before
    timing and best-of-`reps` timed windows (the same first-window
    effect would otherwise understate any config measured exactly
    once after its compile)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from esp32_opus_player_tpu.models.stream_pool import (_CELT_HDR,
                                                          NB_EBANDS)
    from esp32_opus_player_tpu.parallel.mesh import make_stream_mesh
    from esp32_opus_player_tpu.parallel.sharded_pool import (
        _fused_celt_superstep)
    W = _CELT_HDR + 2 * NB_EBANDS + 960
    rng = np.random.default_rng(0)
    stg = np.zeros((B, W), dtype=np.int16)
    stg[:, 2] = rng.integers(0, 2, B)
    stg[:, 4] = 21
    stg[:, 5:7] = rng.integers(15, 1024, (B, 2))
    stg[:, 11:13] = rng.integers(15, 1024, (B, 2))
    stg[:, 7:9] = 12288
    stg[:, 13:15] = 12288
    stg[:, 17] = 1
    stg[:, _CELT_HDR:] = rng.integers(-8192, 8192, (B, W - _CELT_HDR),
                                      dtype=np.int16)
    stgK = np.broadcast_to(stg, (K,) + stg.shape).copy()
    mesh = make_stream_mesh()
    sh = lambda spec: NamedSharding(mesh, spec)
    dm = jax.device_put(np.zeros((1, 2168, B), np.int32),
                        sh(P(None, None, "streams")))
    pre = jax.device_put(np.zeros((B, 1), np.int32), sh(P("streams")))
    sK = jax.device_put(stgK, sh(P(None, "streams")))
    interp = jax.default_backend() != "tpu"
    fn = _fused_celt_superstep(mesh, 3, 1, 1, interp)
    for _ in range(warm):
        pcmK, dm, pre = fn(dm, pre, sK)
        jax.block_until_ready(dm)
    best = 0.0
    for _ in range(reps):
        t0 = time.time()
        for _ in range(iters):
            pcmK, dm, pre = fn(dm, pre, sK)
        jax.block_until_ready(dm)
        sstep = (time.time() - t0) / iters / K
        best = max(best, B * 0.02 / sstep)
    return best, len(mesh.devices.flat)


def main():
    import jax
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    dev = jax.devices()[0]
    print(f"# device: {dev}, B={B}", file=sys.stderr)
    _force_sync_mode()

    (dev_streams, dev_ms, compile_s, sstep_streams, sstep_by_B,
     sstep_upload_by_B) = bench_device()
    sharded_streams, n_mesh_dev = bench_sharded_device()
    print(f"# sharded (shard_map SPMD) K=64 superstep over "
          f"{n_mesh_dev}-device mesh: {sharded_streams:.0f} realtime "
          f"streams ({sharded_streams / n_mesh_dev:.0f}/chip)",
          file=sys.stderr)
    print(f"# device synthesis (transposed fused step, synchronized, "
          f"varied lags): {dev_ms:.1f} ms/frame at B=2048 -> "
          f"{dev_streams:.0f} realtime streams/chip; K=64 superstep -> "
          f"{sstep_streams:.0f} (by B: {sstep_by_B}; with staging "
          f"upload in the timed loop: {sstep_upload_by_B}; compile "
          f"{compile_s:.0f}s)", file=sys.stderr)

    silk_streams, silk_ms, silk_ss_streams, silk_ss_ms, silk_ss_by_B = \
        bench_device_silk()
    print(f"# silk device step (fused Pallas core + resampler): "
          f"{silk_ms:.1f} ms at B=2048 -> {silk_streams:.0f} realtime "
          f"streams/chip; K=64 superstep {silk_ss_ms:.2f} ms/frame -> "
          f"{silk_ss_streams:.0f} (by B: {silk_ss_by_B})",
          file=sys.stderr)

    host_frame, cores, host_curve = bench_host()
    host_streams_core = 0.02 / host_frame
    cores_for_10k = int(np.ceil(10000 / host_streams_core))
    print(f"# host symbol phase (batched C++): "
          f"{host_frame * 1e6:.0f} us/frame/core -> "
          f"{host_streams_core:.0f} streams/core; {cores_for_10k} cores "
          f"for 10k ({cores} core(s) here; us/frame by threads: "
          f"{host_curve})", file=sys.stderr)

    h2d, d2h = bench_link()
    print(f"# link: H2D {h2d:.0f} MB/s, D2H {d2h:.0f} MB/s "
          f"(synchronized-mode, per-call)", file=sys.stderr)

    configs = {}
    matrix = [
        ("celt_fb_mono", f"{FIX}/celt_fb_mono_20ms.opus", B, 1,
         "device", dict(compat_ref=True)),
        # K-frame superstep e2e: one device dispatch per 16 frames per
        # bucket (the per-dispatch RPC cost on this rig's tunneled link
        # amortizes 16x; on PCIe it amortizes the launch overhead)
        ("celt_fb_mono_ss16", f"{FIX}/celt_fb_mono_20ms.opus", B, 1,
         "device", dict(compat_ref=True, superstep_k=16)),
        ("celt_fb_mono_pcm_to_host", f"{FIX}/celt_fb_mono_20ms.opus",
         B, 1, "host", dict(compat_ref=True)),
        # pcm-to-host + superstep: the K-frame PCM block also comes
        # back as ONE fetch, amortizing the per-call D2H overhead
        ("celt_fb_mono_pcm_to_host_ss16",
         f"{FIX}/celt_fb_mono_20ms.opus", B, 1, "host",
         dict(compat_ref=True, superstep_k=16)),
        ("silk_wb_mono", f"{FIX}/silk_wb_mono_20ms.opus", B // 2, 1,
         "device", dict(compat_ref=True)),
        ("silk_wb_mono_ss8", f"{FIX}/silk_wb_mono_20ms.opus", B // 2, 1,
         "device", dict(compat_ref=True, superstep_k=8)),
        ("hybrid_fb_stereo", f"{FIX}/hybrid_fb_stereo_20ms.opus",
         B // 4, 2, "device", dict(compat_ref=True)),
        # fused K-frame SILK+CELT+mix program (one dispatch per 8 frames)
        ("hybrid_fb_stereo_ss8", f"{FIX}/hybrid_fb_stereo_20ms.opus",
         B // 4, 2, "device", dict(compat_ref=True, superstep_k=8)),
        # decode + on-chip log-mel consumer: PCM never crosses the link
        ("celt_fb_mono_consumer", f"{FIX}/celt_fb_mono_20ms.opus", B, 1,
         "device", dict(compat_ref=True, consume=True)),
    ]
    phase_split = {}
    for name, src, b, ch, out, kw in matrix:
        streams, step_ms, phases = bench_pool(src, b, ch, iters, out,
                                              **kw)
        configs[name] = round(streams, 1)
        phase_split[name] = phases
        print(f"# e2e {name} [{out}]: {step_ms:.0f} ms/step at B={b} -> "
              f"{streams:.0f} realtime streams (phases {phases})",
              file=sys.stderr)
    # overlap evidence: raw PCM bytes/step over the measured D2H rate
    # vs the materialize phase actually paid in the pcm-to-host config
    pcm_mb = B * 960 * 2 / 1e6

    # CELT 10% loss with REAL pitch-repeat concealment (the libopus
    # celt_decode_lost the reference deleted, as a device bucket)
    streams, step_ms, phases = bench_pool_loss(
        f"{FIX}/celt_fb_mono_20ms.opus", B, 1, iters)
    configs["celt_fb_10pct_loss_plc"] = round(streams, 1)
    phase_split["celt_fb_10pct_loss_plc"] = phases
    print(f"# e2e celt_fb + 10% loss (batched pitch-repeat PLC): "
          f"{step_ms:.0f} ms/step -> {streams:.0f} realtime streams "
          f"(phases {phases})", file=sys.stderr)

    # lossy CELT superstep (r05): conceal lanes ride the K-frame
    # window as compact rows (_celt_pool_superstep_T_lossy) — no
    # per-loss window flush, dispatch phase stays ~0
    streams, step_ms, phases = bench_pool_loss(
        f"{FIX}/celt_fb_mono_20ms.opus", B, 1, iters, superstep_k=16)
    configs["celt_fb_10pct_loss_plc_ss16"] = round(streams, 1)
    phase_split["celt_fb_10pct_loss_plc_ss16"] = phases
    print(f"# e2e celt_fb + 10% loss (in-window PLC, K=16 superstep): "
          f"{step_ms:.0f} ms/step -> {streams:.0f} realtime streams "
          f"(phases {phases})", file=sys.stderr)

    streams, step_ms, phases = bench_pool_loss(
        f"{FIX}/silk_wb_mono_20ms.opus", B // 2, 1, iters)
    configs["silk_wb_10pct_loss_plc"] = round(streams, 1)
    phase_split["silk_wb_10pct_loss_plc"] = phases
    print(f"# e2e silk_wb + 10% loss (batched PLC): {step_ms:.0f} ms/step"
          f" -> {streams:.0f} realtime streams (phases {phases})",
          file=sys.stderr)

    # lossy superstep: conceal rows ride the K-frame window as masked
    # rows (no flush, no per-frame conceal launches)
    streams, step_ms, phases = bench_pool_loss(
        f"{FIX}/silk_wb_mono_20ms.opus", B // 2, 1, iters,
        superstep_k=8)
    configs["silk_wb_10pct_loss_plc_ss8"] = round(streams, 1)
    phase_split["silk_wb_10pct_loss_plc_ss8"] = phases
    print(f"# e2e silk_wb + 10% loss (in-window PLC, K=8 superstep): "
          f"{step_ms:.0f} ms/step -> {streams:.0f} realtime streams "
          f"(phases {phases})", file=sys.stderr)

    # pod-vehicle capacity row (VERDICT r04 #6): the SAME lossy
    # superstep workload driven through PoolFarm — the full-featured
    # deployment vehicle (loss/FEC routing by global index, stats,
    # checkpoint, elastic admission) — so the deployable number is
    # measured, not inferred from the raw pool
    streams, step_ms, phases = bench_farm_loss(
        f"{FIX}/celt_fb_mono_20ms.opus", B, 1, iters, superstep_k=16)
    configs["farm_celt_10pct_loss_ss16"] = round(streams, 1)
    phase_split["farm_celt_10pct_loss_ss16"] = phases
    print(f"# e2e PoolFarm celt + 10% loss (in-window PLC, K=16): "
          f"{step_ms:.0f} ms/step -> {streams:.0f} realtime streams "
          f"(phases {phases})", file=sys.stderr)

    # 10% loss recovered via in-band FEC (LBRR from the next packet,
    # fixture encoded with FEC enabled): FEC rows run the normal decode
    # program, so the whole lossy step stays inside the K-frame
    # superstep window
    streams, step_ms, phases = bench_pool_loss(
        f"{FIX}/silk_wb_fec_mono_20ms.opus", B // 2, 1, iters,
        fec=True, superstep_k=8)
    configs["silk_wb_10pct_fec_ss8"] = round(streams, 1)
    phase_split["silk_wb_10pct_fec_ss8"] = phases
    print(f"# e2e silk_wb + 10% loss -> in-band FEC (K=8 superstep): "
          f"{step_ms:.0f} ms/step -> {streams:.0f} realtime streams "
          f"(phases {phases})", file=sys.stderr)

    # headline = the CHIP's full decode capacity (PCM to HBM, K-frame
    # superstep, varied lags, synchronized execution): the north-star
    # metric is per-chip; this rig's 1-core host + tunneled link bound
    # the e2e configs far below the chip and are reported alongside.
    print(json.dumps({
        "metric": "concurrent_realtime_48k_streams_per_chip",
        "value": round(sstep_streams, 1),
        "unit": "streams",
        "vs_baseline": round(sstep_streams / 1.0, 1),
        "configs": dict(configs,
                        device_chip_capacity=round(sstep_streams, 1)),
        "components": {
            "device_synthesis_streams": round(dev_streams),
            "device_superstep_streams": round(sstep_streams),
            "device_superstep_streams_by_B": sstep_by_B,
            "device_superstep_streams_with_upload_by_B":
                sstep_upload_by_B,
            "device_sharded_superstep_streams": round(sharded_streams),
            "sharded_mesh_devices": n_mesh_dev,
            "device_silk_streams": round(silk_streams),
            "device_silk_superstep_streams": round(silk_ss_streams),
            "device_silk_superstep_streams_by_B": silk_ss_by_B,
            "e2e_rig_celt_fb_mono": configs["celt_fb_mono"],
            "host_symbol_us_per_frame_by_threads": host_curve,
            "host_symbol_us_per_frame_per_core": round(host_frame * 1e6,
                                                       1),
            "host_streams_per_core": round(host_streams_core),
            "cores_for_10k_streams": cores_for_10k,
            "host_cores_available": cores,
            "link_h2d_MBps": round(h2d, 1),
            "link_d2h_MBps": round(d2h, 1),
            # pipeline overlap (SURVEY §2.7): in the pcm-to-host config
            # each step ships B*960*2 bytes; if materialize_ms is far
            # below the raw transfer time at the measured D2H rate, the
            # copy rode copy_to_host_async behind later host phases
            "e2e_phase_ms_by_config": phase_split,
            "d2h_raw_pcm_ms_per_step": round(pcm_mb / d2h * 1000, 1),
        },
    }))
    print(f"# headline = the chip's full decode pipeline capacity with "
          f"PCM delivered to HBM (device-resident serving, K-frame "
          f"superstep, varied pitch lags, synchronized execution). The "
          f"e2e configs are this DEV RIG's numbers: a 1-core host "
          f"(symbol phase {host_frame * 1e6:.0f} us/frame/core) and a "
          f"~40 MB/s tunneled link bound them far below the chip; a "
          f"production host (PCIe, many cores) feeds ~1.0 GB/s of "
          f"staging per 10k streams (2,040 B/frame x 50 fps; ~4.7 GB/s "
          f"at the 46.5k headline — under PCIe gen3 x16) and "
          f"~{cores_for_10k} cores per 10k streams — see components "
          f"(device_superstep_streams_with_upload_by_B is the measured "
          f"window WITH its upload).", file=sys.stderr)


if __name__ == "__main__":
    main()
