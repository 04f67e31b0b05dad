"""Benchmark: concurrent realtime 48 kHz Opus streams per chip.

Measures the REAL StreamPool pipeline end to end (batched C++ symbol
phase -> fused jitted device synthesis -> PCM back on host) for each
BASELINE config on the available accelerator, plus the individual
component capacities that bound it:

  * e2e per config (celt / silk_wb / hybrid_stereo / mixed / loss_plc):
    measured steady-state step time of an actual StreamPool.
  * host symbol phase: one batched C++ call per step (GIL released,
    thread-strip scalable) — the sequential entropy-decode cost.
  * device synthesis capacity: the fused CELT step chained on-device.
  * link: measured D2H throughput of the PCM transfer path.

On this dev rig the binding constraint is the single host core, which
runs the symbol phase AND the TPU tunnel transport; the JSON therefore
also reports cores_for_10k = measured per-frame host cost vs the 10k
north star (BASELINE.md).

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


def bench_pool(src, B, channels, iters, warm=4, **pool_kw):
    """Measured steady-state e2e streams/chip of a real StreamPool."""
    from esp32_opus_player_tpu.models.stream_pool import StreamPool
    pool = StreamPool([src] * B, channels=channels, native=True,
                      fixed_buckets=True, **pool_kw)
    pool.warmup()
    for _ in range(warm):
        pool.step()
    pool._flush()
    t0 = time.time()
    n = 0
    for _ in range(iters):
        if not pool.step():
            break
        n += 1
    pool._flush()
    dt = time.time() - t0
    if n == 0:
        return 0.0, 0.0
    step_ms = dt / n * 1000
    return B * 0.02 / (dt / n), step_ms


def bench_pool_loss(src, B, channels, iters):
    """Config 5: 10% periodic loss with real batched PLC (rfc mode)."""
    from esp32_opus_player_tpu.models.stream_pool import StreamPool
    pool = StreamPool([src] * B, channels=channels, native=True,
                      fixed_buckets=True, compat_ref=False, rfc_plc=True)
    pool.warmup()
    # warm WITH loss so the conceal/CNG/glue kernels compile before the
    # timed window
    for k in range(4):
        pool.step({i for i in range(B) if i % 10 == k % 10})
    pool._flush()
    t0 = time.time()
    n = 0
    for k in range(iters):
        # 10% loss, spread evenly: each step a different tenth of the
        # pool loses its packet (concealed by the batched PLC kernels)
        lost = {i for i in range(B) if i % 10 == k % 10}
        if not pool.step(lost):
            break
        n += 1
    pool._flush()
    dt = time.time() - t0
    return (B * 0.02 / (dt / n), dt / n * 1000) if n else (0.0, 0.0)


def bench_host(B=256, reps=3):
    """Batched C++ symbol phase cost per frame (one call per step)."""
    import os
    from esp32_opus_player_tpu.host import opusfile
    from esp32_opus_player_tpu.models.host_groups import CeltGroup
    s = opusfile.parse_stream(open(f"{FIX}/celt_fb_mono_20ms.opus",
                                   "rb").read())
    g = CeltGroup(list(range(B)), [s.jobs] * B, 960, 1, 0, [21] * B)
    npk = len(s.jobs)
    active = np.ones(B, dtype=bool)
    for k in range(3):
        g.decode(np.full(B, k, dtype=np.int64), active)
    t0 = time.time()
    nfr = 0
    for _ in range(reps):
        for k in range(npk):
            g.decode(np.full(B, k, dtype=np.int64), active)
            nfr += B
    per_frame = (time.time() - t0) / nfr
    cores = len(os.sched_getaffinity(0))
    return per_frame, cores


def bench_device(B=2048, iters=20):
    """Fused device synthesis capacity: chained on-device, no per-step
    transfers (what the chip itself can sustain)."""
    import jax
    import jax.numpy as jnp
    from esp32_opus_player_tpu.models import batch_celt
    from esp32_opus_player_tpu.models.stream_pool import _celt_pool_step
    st = batch_celt.make_state(B, 1)
    X = jnp.zeros((B, 1, 960), jnp.int16)
    bE = jnp.zeros((B, 2, 21), jnp.int16)
    sec = np.zeros((14, B), np.int32)
    sec[1] = 21
    secd = jnp.asarray(sec)
    idx = jnp.arange(B, dtype=jnp.int32)
    tr = jnp.zeros(B, dtype=bool)
    dm, pre = st["decode_mem"], st["preemph"]
    t0 = time.time()
    pcm, dm, pre = _celt_pool_step(dm, pre, idx, X, bE, secd, tr,
                                   LM=3, C=1, CC=1)
    jax.block_until_ready(pcm)
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(iters):
        pcm, dm, pre = _celt_pool_step(dm, pre, idx, X, bE, secd, tr,
                                       LM=3, C=1, CC=1)
    jax.block_until_ready(pcm)
    step = (time.time() - t0) / iters
    return B * 0.02 / step, step * 1000, compile_s


def bench_link():
    """PCM-path D2H throughput (the tunnel/PCIe link)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def f(x):
        return (x + 1).astype(jnp.int16)

    x = jnp.zeros((1024, 960), jnp.int32)
    b = f(x)
    np.asarray(b)   # prime
    t0 = time.time()
    for _ in range(3):
        _ = np.asarray(f(x))
    dt = (time.time() - t0) / 3
    return (1024 * 960 * 2) / dt / 1e6


def main():
    import jax
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 15
    dev = jax.devices()[0]
    print(f"# device: {dev}, B={B}", file=sys.stderr)

    dev_streams, dev_ms, compile_s = bench_device()
    print(f"# device synthesis (fused, chained on-device): "
          f"{dev_ms:.2f} ms/step at B=2048 -> {dev_streams:.0f} realtime "
          f"streams/chip (compile {compile_s:.0f}s)", file=sys.stderr)

    host_frame, cores = bench_host()
    host_streams_core = 0.02 / host_frame
    cores_for_10k = int(np.ceil(10000 / host_streams_core))
    print(f"# host symbol phase (batched C++): "
          f"{host_frame * 1e6:.0f} us/frame/core -> "
          f"{host_streams_core:.0f} streams/core; {cores_for_10k} cores "
          f"for 10k ({cores} core(s) here)", file=sys.stderr)

    link = bench_link()
    print(f"# PCM D2H link: {link:.0f} MB/s "
          f"(10k streams need 960 MB/s)", file=sys.stderr)

    configs = {}
    matrix = [
        ("celt_fb_mono", f"{FIX}/celt_fb_mono_20ms.opus", B, 1,
         dict(compat_ref=True)),
        ("silk_wb_mono", f"{FIX}/silk_wb_mono_20ms.opus", B // 2, 1,
         dict(compat_ref=True)),
        ("hybrid_fb_stereo", f"{FIX}/hybrid_fb_stereo_20ms.opus",
         B // 4, 2, dict(compat_ref=True)),
    ]
    for name, src, b, ch, kw in matrix:
        streams, step_ms = bench_pool(src, b, ch, iters, **kw)
        configs[name] = round(streams, 1)
        print(f"# e2e {name}: {step_ms:.0f} ms/step at B={b} -> "
              f"{streams:.0f} realtime streams", file=sys.stderr)

    streams, step_ms = bench_pool_loss(
        f"{FIX}/silk_wb_mono_20ms.opus", B // 2, 1, iters)
    configs["silk_wb_10pct_loss_plc"] = round(streams, 1)
    print(f"# e2e silk_wb + 10% loss (batched PLC): {step_ms:.0f} ms/step"
          f" -> {streams:.0f} realtime streams", file=sys.stderr)

    e2e = configs["celt_fb_mono"]
    print(json.dumps({
        "metric": "concurrent_realtime_48k_streams_per_chip",
        "value": round(e2e, 1),
        "unit": "streams",
        "vs_baseline": round(e2e / 1.0, 1),
        "configs": configs,
        "components": {
            "device_synthesis_streams": round(dev_streams),
            "host_symbol_us_per_frame_per_core": round(host_frame * 1e6,
                                                       1),
            "host_streams_per_core": round(host_streams_core),
            "cores_for_10k_streams": cores_for_10k,
            "host_cores_available": cores,
            "pcm_d2h_MBps": round(link, 1),
        },
    }))
    print("# note: e2e on this rig is bound by the single host core, "
          "which runs the symbol phase AND the TPU-tunnel transport; "
          "the C++ symbol batch thread-strips across cores on a real "
          "host (see components.cores_for_10k_streams)", file=sys.stderr)


if __name__ == "__main__":
    main()
