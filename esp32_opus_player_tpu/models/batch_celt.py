"""Batched CELT decode: host symbol phase per stream, device synthesis
over a streams axis (the SURVEY §7.1 split; BASELINE configs 1 & 4).

The host (models/celt_decoder.py with defer_synthesis=True) produces
fixed-shape per-frame inputs (normalized spectrum X, band energies,
postfilter params); frames are grouped into static-shape buckets
(LM, C, CC, transient) and each bucket runs the jitted device step in
ops/celt/jax_synthesis.py. Device state per stream: decode_mem + deemphasis
memory — a pytree, sharded over the streams axis at pod scale
(parallel/mesh.py).
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from ..ops.celt import jax_synthesis as js
from ..ops.celt.jax_synthesis import (DECODE_BUFFER_SIZE, OVERLAP,
                                      SHORT_MDCT_SIZE, SIG_SAT, I32)

NB_EBANDS = 21


def make_state(n_streams: int, channels: int):
    """Device state pytree for a pool of CELT streams."""
    return {
        "decode_mem": jnp.zeros(
            (n_streams, channels, DECODE_BUFFER_SIZE + OVERLAP), dtype=I32),
        "preemph": jnp.zeros((n_streams, channels), dtype=I32),
    }


@functools.partial(jax.jit, static_argnames=("LM", "C", "CC", "transient",
                                              "use_pallas"))
def celt_synth_step(decode_mem, preemph, X, bandE, start, end,
                    comb1, comb2, *, LM: int, C: int, CC: int,
                    transient: bool, use_pallas: bool = False):
    """One batched CELT frame synthesis.

    decode_mem: (B, CC, 2048+120) int32; preemph: (B, CC) int32.
    X: (B, C, N) int32 Q14; bandE: (B, 2, 21) int32 Q10.
    start/end: (B,) int32. comb1/comb2: each a tuple of six (B,) int32
    vectors (T0, T1, g0, g1, tapset0, tapset1).
    Returns (pcm (B, CC, N) int32 int16-range, decode_mem', preemph').
    """
    N = SHORT_MDCT_SIZE << LM
    # roll history left by N (OPUS_MOVE, src/celt.cpp:2347)
    dm = jnp.roll(decode_mem, -N, axis=-1)

    # denormalise per coded channel
    freqs = []
    for c in range(C):
        freqs.append(js.denormalise_bands_b(
            X[:, c], bandE[:, c], start, end, 1 << LM))
    if CC == 1 and C == 2:
        freqs = [(freqs[0] >> 1) + (freqs[1] >> 1)]
    syn_ch = []
    for cc in range(CC):
        freq = freqs[min(cc, len(freqs) - 1)]
        hist = dm[:, cc, DECODE_BUFFER_SIZE - N:
                  DECODE_BUFFER_SIZE - N + OVERLAP // 2]
        region = js.celt_imdct_frame(freq, hist, LM, transient)
        finished = jnp.clip(region[..., :N], -SIG_SAT, SIG_SAT)
        tail = region[..., N:]
        dm = dm.at[:, cc, DECODE_BUFFER_SIZE - N:DECODE_BUFFER_SIZE].set(
            finished)
        dm = dm.at[:, cc, DECODE_BUFFER_SIZE:
                   DECODE_BUFFER_SIZE + OVERLAP // 2].set(tail)
        syn_ch.append(cc)

    # comb postfilter per channel, in place on dm
    T0a, T1a, g0a, g1a, ta0, ta1 = comb1
    T0b, T1b, g0b, g1b, tb0, tb1 = comb2
    for cc in range(CC):
        buf = dm[:, cc, :]
        buf = js.comb_filter_batch(buf, DECODE_BUFFER_SIZE - N,
                                   SHORT_MDCT_SIZE, T0a, T1a, g0a, g1a,
                                   ta0, ta1)
        if LM != 0:
            buf = js.comb_filter_batch(
                buf, DECODE_BUFFER_SIZE - N + SHORT_MDCT_SIZE,
                N - SHORT_MDCT_SIZE, T0b, T1b, g0b, g1b, tb0, tb1)
        dm = dm.at[:, cc, :].set(buf)

    syn = dm[:, :, DECODE_BUFFER_SIZE - N:DECODE_BUFFER_SIZE]
    if use_pallas:
        from ..ops.celt.pallas_kernels import deemphasis_pallas
        pcm, preemph = deemphasis_pallas(syn, preemph)
    else:
        pcm, preemph = js.deemphasis_batch(syn, preemph)
    return pcm, dm, preemph


def celt_synth_step_dual(decode_mem, preemph, X, bandE, start, end,
                         comb1, comb2, tr, *, LM: int, C: int, CC: int,
                         chunk: int = 13, pallas_fft: bool | None = None,
                         downsample: int = 1):
    """Per-row transient flag without doubling the frame cost.

    The transient flag only changes the iMDCT block structure, so only
    the synthesis fork needs both variants; the comb postfilter and the
    deemphasis (the expensive recurrences) run ONCE on the selected
    signal. comb(select(a, b)) == select(comb(a), comb(b)) row-wise, so
    this is bit-identical to running the full step per variant
    (reference block loop src/celt.cpp:2057; comb :848; deemph :1988)."""
    if pallas_fft is None:
        # the in-VMEM FFT kernel is TPU-only; the XLA path serves as
        # the portable fallback (both bit-exact)
        pallas_fft = jax.default_backend() == "tpu"
    if pallas_fft:
        from ..ops.celt.pallas_fft import celt_imdct_frame_pallas as imdct
    else:
        imdct = js.celt_imdct_frame
    N = SHORT_MDCT_SIZE << LM
    dm = jnp.roll(decode_mem, -N, axis=-1)
    freqs = []
    for c in range(C):
        freqs.append(js.denormalise_bands_b(
            X[:, c], bandE[:, c], start, end, 1 << LM,
            downsample=downsample))
    if CC == 1 and C == 2:
        freqs = [(freqs[0] >> 1) + (freqs[1] >> 1)]
    for cc in range(CC):
        freq = freqs[min(cc, len(freqs) - 1)]
        hist = dm[:, cc, DECODE_BUFFER_SIZE - N:
                  DECODE_BUFFER_SIZE - N + OVERLAP // 2]
        regions = [imdct(freq, hist, LM, t) for t in (False, True)]
        region = jnp.where(tr[:, None], regions[1], regions[0])
        finished = jnp.clip(region[..., :N], -SIG_SAT, SIG_SAT)
        tail = region[..., N:]
        dm = dm.at[:, cc, DECODE_BUFFER_SIZE - N:DECODE_BUFFER_SIZE].set(
            finished)
        dm = dm.at[:, cc, DECODE_BUFFER_SIZE:
                   DECODE_BUFFER_SIZE + OVERLAP // 2].set(tail)

    T0a, T1a, g0a, g1a, ta0, ta1 = comb1
    T0b, T1b, g0b, g1b, tb0, tb1 = comb2
    for cc in range(CC):
        buf = dm[:, cc, :]
        buf = js.comb_filter_batch(buf, DECODE_BUFFER_SIZE - N,
                                   SHORT_MDCT_SIZE, T0a, T1a, g0a, g1a,
                                   ta0, ta1, chunk=chunk)
        if LM != 0:
            buf = js.comb_filter_batch(
                buf, DECODE_BUFFER_SIZE - N + SHORT_MDCT_SIZE,
                N - SHORT_MDCT_SIZE, T0b, T1b, g0b, g1b, tb0, tb1,
                chunk=chunk)
        dm = dm.at[:, cc, :].set(buf)

    syn = dm[:, :, DECODE_BUFFER_SIZE - N:DECODE_BUFFER_SIZE]
    if pallas_fft:
        # in-VMEM IIR (time on sublanes) beats the 960-step XLA scan;
        # TPU-gated like the FFT kernel, same bit-exact semantics
        from ..ops.celt.pallas_kernels import deemphasis_pallas
        pcm, preemph = deemphasis_pallas(syn, preemph,
                                         downsample=downsample)
    else:
        pcm, preemph = js.deemphasis_batch(syn, preemph,
                                           downsample=downsample)
    return pcm, dm, preemph


class BatchedCELTDecoder:
    """Decode many CELT streams with batched device synthesis.

    Host symbol phase: either the Python model (native=False) or the C++
    entropy engine (host/native, ~100x faster, GIL-free so it scales over
    host cores with threads); device synthesis runs once per
    (bucket, frame)."""

    def __init__(self, n_streams: int, channels: int,
                 compat_ref: bool = False, native: bool = False,
                 host_threads: int = 0):
        self.n = n_streams
        self.channels = channels
        self.native = native
        self.state = make_state(n_streams, channels)
        self._pool = None
        if native:
            from ..host.native import NativeCELTHost
            self.hosts = [NativeCELTHost(channels)
                          for _ in range(n_streams)]
            if host_threads > 1:
                from concurrent.futures import ThreadPoolExecutor
                self._pool = ThreadPoolExecutor(host_threads)
        else:
            from .celt_decoder import CELTDecoder
            self.hosts = [CELTDecoder(channels, compat_ref=compat_ref)
                          for _ in range(n_streams)]

    def host_phase(self, packets, frame_size: int = 960):
        if self.native:
            if self._pool is not None:
                return list(self._pool.map(
                    lambda hp: hp[0].decode_symbol_phase(hp[1], frame_size),
                    zip(self.hosts, packets)))
            return [h.decode_symbol_phase(p, frame_size)
                    for h, p in zip(self.hosts, packets)]
        from ..host.range_decoder import RangeDecoder
        return [h.decode_with_ec(RangeDecoder(p), None, frame_size,
                                 defer_synthesis=True)
                for h, p in zip(self.hosts, packets)]

    def decode_frames(self, packets, frame_size: int = 960):
        """packets: list of n_streams byte strings (one CELT frame each).
        Returns pcm (n_streams, CC, frame_size) int16 numpy."""
        return self.synthesize(self.host_phase(packets, frame_size),
                               frame_size)

    def synthesize(self, inputs, frame_size: int):
        """Run the device phase for a list of per-stream synth inputs
        (all must share one bucket for now)."""
        LM = inputs[0]["LM"]
        C = inputs[0]["C"]
        CC = inputs[0]["CC"]
        transient = inputs[0]["transient"]
        assert all(si["LM"] == LM and si["C"] == C and si["CC"] == CC
                   and si["transient"] == transient for si in inputs)
        N = SHORT_MDCT_SIZE << LM
        B = len(inputs)
        X = np.zeros((B, C, N), dtype=np.int32)
        bandE = np.zeros((B, 2, NB_EBANDS), dtype=np.int32)
        start = np.zeros(B, dtype=np.int32)
        end = np.zeros(B, dtype=np.int32)
        comb1 = np.zeros((6, B), dtype=np.int32)
        comb2 = np.zeros((6, B), dtype=np.int32)
        for b, si in enumerate(inputs):
            X[b] = np.asarray(si["X"][:C * N], dtype=np.int32).reshape(C, N)
            bandE[b] = np.asarray(si["bandE"], dtype=np.int32).reshape(
                2, NB_EBANDS)
            start[b] = si["start"]
            end[b] = si["end"]
            comb1[:, b] = si["comb1"]
            comb2[:, b] = si["comb2"]
        pcm, dm, pre = celt_synth_step(
            self.state["decode_mem"], self.state["preemph"],
            jnp.asarray(X), jnp.asarray(bandE), jnp.asarray(start),
            jnp.asarray(end), tuple(jnp.asarray(v) for v in comb1),
            tuple(jnp.asarray(v) for v in comb2),
            LM=LM, C=C, CC=CC, transient=transient)
        self.state["decode_mem"] = dm
        self.state["preemph"] = pre
        return np.asarray(pcm).astype(np.int16)
