"""Benchmark: concurrent realtime 48 kHz Opus streams per chip.

Measures the batched CELT synthesis device step (the dense half of the
decode pipeline, BASELINE config 4 shape) at a large batch size on the
available accelerator, and derives how many concurrent 48 kHz streams
decode faster than realtime on one chip.

Baseline (BASELINE.md): the reference ESP32 player sustains 1 stream per
2x240 MHz chip.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np


def build_inputs(B: int):
    """Real synthesis inputs from a fixture frame, replicated across B."""
    import jax.numpy as jnp
    from esp32_opus_player_tpu.host import opusfile
    from esp32_opus_player_tpu.host.packet import parse_packet
    from esp32_opus_player_tpu.host.range_decoder import RangeDecoder
    from esp32_opus_player_tpu.models.celt_decoder import CELTDecoder
    from esp32_opus_player_tpu.models import batch_celt
    from esp32_opus_player_tpu.ops.celt.jax_synthesis import I32

    s = opusfile.open_file("tests/fixtures/celt_fb_mono_20ms.opus")
    host = CELTDecoder(1, compat_ref=True)
    pkt = parse_packet(s.jobs[1].data).frames[0]
    si = host.decode_with_ec(RangeDecoder(pkt), None, 960,
                             defer_synthesis=True)
    N = 960
    X = np.broadcast_to(
        np.asarray(si["X"][:N], dtype=np.int32)[None, None, :],
        (B, 1, N)).copy()
    bandE = np.broadcast_to(
        np.asarray(si["bandE"], dtype=np.int32).reshape(1, 2, 21),
        (B, 2, 21)).copy()
    start = np.full(B, si["start"], dtype=np.int32)
    end = np.full(B, si["end"], dtype=np.int32)
    comb1 = tuple(np.full(B, v, dtype=np.int32) for v in si["comb1"])
    comb2 = tuple(np.full(B, v, dtype=np.int32) for v in si["comb2"])
    state = batch_celt.make_state(B, 1)
    return (state["decode_mem"], state["preemph"], jnp.asarray(X),
            jnp.asarray(bandE), jnp.asarray(start), jnp.asarray(end),
            tuple(jnp.asarray(v) for v in comb1),
            tuple(jnp.asarray(v) for v in comb2))


def main():
    import functools
    import jax
    from esp32_opus_player_tpu.models.batch_celt import celt_synth_step

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    dev = jax.devices()[0]
    print(f"# device: {dev}, B={B}", file=sys.stderr)

    args = build_inputs(B)
    fn = jax.jit(functools.partial(celt_synth_step, LM=3, C=1, CC=1,
                                   transient=False))
    t0 = time.time()
    pcm, dm, pre = fn(*args)
    jax.block_until_ready(pcm)
    print(f"# compile+first step: {time.time() - t0:.1f}s", file=sys.stderr)

    # steady-state: chain the state like a real decode loop
    dm0, pre0 = args[0], args[1]
    t0 = time.time()
    for _ in range(iters):
        pcm, dm0, pre0 = fn(dm0, pre0, *args[2:])
    jax.block_until_ready(pcm)
    step = (time.time() - t0) / iters
    frame_seconds = 960 / 48000.0
    device_streams = B * frame_seconds / step
    print(f"# device step={step * 1000:.2f} ms for B={B} "
          f"({device_streams:.0f} realtime streams, device phase)",
          file=sys.stderr)

    # host entropy phase: native C++ engine, per-stream sequential work
    import os
    from esp32_opus_player_tpu.host import opusfile
    from esp32_opus_player_tpu.host.packet import parse_packet
    from esp32_opus_player_tpu.host.native import NativeCELTHost
    s = opusfile.open_file("tests/fixtures/celt_fb_mono_20ms.opus")
    pkts = [parse_packet(j.data).frames[0] for j in s.jobs]
    host = NativeCELTHost(1)
    for p in pkts[:10]:
        host.decode_symbol_phase(p, 960)
    t0 = time.time()
    nfr = 0
    for _ in range(5):
        for p in pkts:
            host.decode_symbol_phase(p, 960)
            nfr += 1
    host_frame = (time.time() - t0) / nfr
    n_cores = len(os.sched_getaffinity(0))
    host_streams = frame_seconds / host_frame * n_cores
    print(f"# host symbol phase={host_frame * 1e6:.0f} us/frame "
          f"({host_streams:.0f} realtime streams on {n_cores} core(s))",
          file=sys.stderr)

    # end-to-end: host and device pipeline in steady state overlap; the
    # sustainable rate is min(host, device) on this machine
    e2e = min(device_streams, host_streams)
    print(json.dumps({
        "metric": "concurrent_realtime_48k_celt_streams_per_chip",
        "value": round(e2e, 1),
        "unit": "streams",
        "vs_baseline": round(e2e / 1.0, 1),
    }))
    print(f"# note: host-bound on this {n_cores}-core container; device "
          f"capacity is {device_streams:.0f} streams/chip", file=sys.stderr)


if __name__ == "__main__":
    main()
