"""Transposed-layout CELT synthesis: time/freq on sublanes, streams on
lanes, end to end.

The round-2 pipeline kept per-stream rows on sublanes and time on lanes,
which forced (a) a full relayout (transpose) on both sides of the Pallas
FFT kernel (whose natural layout is transposed), (b) lane-dimension
gathers in the comb postfilter (25-950 ms/frame at B=2048 — half the
step or far worse with varied pitch lags), and (c) internal transposes
in the deemphasis kernel. This module re-expresses the WHOLE synthesis
chain (src/celt.cpp:2057-2446: denormalise -> iMDCT -> TDAC -> comb ->
deemphasis) in the transposed layout:

  * denormalise: per-band gains broadcast over static row ranges
    (21 concatenated broadcasts — no gather, no matmul);
  * iMDCT: the existing in-VMEM FFT kernel consumed directly (its
    input/output are already transposed) + TDAC as static row ops;
  * comb: ops/celt/pallas_comb.py — in-VMEM bit-decomposed per-lane
    delay (no gathers at all);
  * deemphasis: the in-VMEM IIR without boundary transposes.

decode_mem is carried TRANSPOSED per channel: (CC, 2048+120, B) int32.
Bit-exact to the row-layout path (same integer ops in a different
layout); tests/test_synthT.py compares full steps against
batch_celt.celt_synth_step_dual on CPU.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from ..tables.celt_tables import eMeans, eband5ms, window120
from .synthesis import FFT_STATES
from .jax_synthesis import (exp2_frac, smul, DECODE_BUFFER_SIZE, OVERLAP,
                            SHORT_MDCT_SIZE, SIG_SAT, NB_EBANDS)
from .pallas_fft import fft_blocks_pallas
from .pallas_comb import comb_filter_step_T

I32 = jnp.int32
_EB = np.asarray(eband5ms, dtype=np.int32)
_WINDOW = np.asarray(window120, dtype=np.int32)
_EMEANS = np.asarray(eMeans, dtype=np.int32)


def denormalise_bands_T(X_T, bandLogE, start, end, M,
                        downsample: int = 1):
    """Transposed denormalise (src/celt.cpp:948): X_T (N, B) int32 Q14,
    bandLogE (B, 21) int32 Q10, start/end (B,). Returns (N, B).

    The per-band gain/shift broadcast to bins is 21 static row-range
    broadcasts concatenated — replaces the one-hot HIGHEST matmul of
    the row-layout path (no MXU, no gather; XLA fuses it into one
    write pass)."""
    N = M * SHORT_MDCT_SIZE
    B = X_T.shape[1]
    lg = bandLogE + (jnp.asarray(_EMEANS[:NB_EBANDS], dtype=I32)[None, :]
                     << 6)
    lg = jnp.clip(lg, -32768, 32767)
    shift = 16 - (lg >> 10)
    g = exp2_frac(lg & 1023)
    big = shift > 31
    neg2 = shift <= -2
    g = jnp.where(big, 0, jnp.where(neg2, 16384, g))
    shift = jnp.where(big, 0, jnp.where(neg2, -2, shift))

    def bcast(v):                       # (B, 21) -> (N, B) per-bin rows
        parts = [jnp.broadcast_to(v[None, :, i],
                                  (M * int(_EB[i + 1] - _EB[i]), B))
                 for i in range(NB_EBANDS)]
        tail = N - M * int(_EB[NB_EBANDS])
        if tail:        # bins beyond eBands[21] are always masked to 0
            parts.append(jnp.zeros((tail, B), dtype=I32))
        return jnp.concatenate(parts, axis=0)

    gb = bcast(g)
    sb = bcast(shift)
    prod = X_T * gb
    pos = prod >> jnp.maximum(sb, 0)
    neg = prod << jnp.maximum(-sb, 0)
    f = jnp.where(sb >= 0, pos, neg)

    bin_band = np.zeros((N, 1), dtype=np.int32)
    for i in range(NB_EBANDS):
        bin_band[M * _EB[i]:M * _EB[i + 1], 0] = i
    band = jnp.asarray(bin_band)
    active = (band >= start[None, :]) & (band < end[None, :])
    ends = jnp.asarray(_EB, dtype=I32)[end] * M
    if downsample > 1:
        # anti-alias clamp before decimated output (src/celt.cpp:957)
        ends = jnp.minimum(ends, N // downsample)
    rows = jnp.arange(N, dtype=I32)[:, None]
    active = active & (rows < ends[None, :])
    return jnp.where(active, f, 0)


def imdct_tdac_T(hist_half, block):
    """TDAC mirror (src/celt.cpp:3283-3296), transposed: hist_half
    (OVERLAP/2, B), block (N2, B). Returns (OVERLAP/2 + N2, B)."""
    ov = OVERLAP
    full = jnp.concatenate([hist_half, block], axis=0)
    x2 = full[:ov // 2]
    x1 = full[ov // 2:ov][::-1]
    wp1 = jnp.asarray(_WINDOW[:ov // 2])[:, None]
    wp2 = jnp.asarray(_WINDOW[ov // 2:][::-1].copy())[:, None]
    lo = smul(x2, wp2) - smul(x1, wp1)
    hi = smul(x2, wp1) + smul(x1, wp2)
    return jnp.concatenate([lo, hi[::-1], full[ov:]], axis=0)


def celt_imdct_frame_T(freq_T, hist_T, LM: int, transient: bool,
                       interpret: bool = False):
    """Full-frame iMDCT, transposed: freq_T (N, B), hist_T
    (OVERLAP/2, B) previous unwindowed tail. Returns (N + OVERLAP/2, B)
    = N finished samples + new tail (src/celt.cpp:2057 block loop)."""
    N = SHORT_MDCT_SIZE << LM
    if transient:
        Bblk, NB, shift = 1 << LM, SHORT_MDCT_SIZE, 3
    else:
        Bblk, NB, shift = 1, N, 3 - LM
    N4 = FFT_STATES[shift].nfft
    N2 = 2 * N4
    yr, yi = fft_blocks_pallas(freq_T, shift=shift, Bblk=Bblk,
                               interpret=interpret)
    B = freq_T.shape[1]
    yrB = yr.reshape(Bblk, N4, B)
    yiB = yi.reshape(Bblk, N4, B)
    # out[2i] = yr[i]; out[N2-1-2i] = yi[i] (post-rotate interleave)
    out = jnp.stack([yrB, yiB[:, ::-1, :]], axis=2).reshape(Bblk, N2, B)
    parts = []
    cur_hist = hist_T
    for b in range(Bblk):
        region = imdct_tdac_T(cur_hist, out[b])
        parts.append(region[:NB])
        cur_hist = region[NB:NB + OVERLAP // 2]
    parts.append(cur_hist)
    return jnp.concatenate(parts, axis=0)


def deemphasis_T(synT, mem, downsample: int = 1,
                 interpret: bool = False):
    """Transposed deemphasis: synT (CC, N, B), mem (B, CC). Returns
    (pcmT (CC, N//downsample, B) int32 int16-range, mem'). The in-VMEM
    IIR kernel (time on sublanes) consumed without boundary
    transposes."""
    from .pallas_kernels import _deemph_kernel, LANES
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    CC, N, B = synT.shape
    rows = CC * B
    x = jnp.moveaxis(synT, 0, 1).reshape(N, rows) if CC > 1 \
        else synT[0]
    m = mem.T.reshape(rows) if CC > 1 else mem[:, 0]
    pad = (-rows) % LANES
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad)))
        m = jnp.pad(m, ((0, pad),))
    mt = m[None, :]
    grid = (x.shape[1] // LANES,)
    pcm_t, m_out = pl.pallas_call(
        functools.partial(_deemph_kernel, n=N),
        grid=grid,
        in_specs=[
            pl.BlockSpec((N, LANES), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((N, LANES), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(x.shape, I32),
            jax.ShapeDtypeStruct(mt.shape, I32),
        ),
        interpret=interpret,
    )(x, mt)
    if downsample > 1:
        pcm_t = pcm_t[::downsample]
    Nd = N // downsample
    pcm_t = pcm_t[:, :rows]
    mem2 = m_out[0, :rows]
    if CC > 1:
        pcmT = jnp.moveaxis(pcm_t.reshape(Nd, CC, B), 1, 0)
        mem2 = mem2.reshape(CC, B).T
    else:
        pcmT = pcm_t[None]
        mem2 = mem2[:, None]
    return pcmT, mem2


def celt_synth_step_dual_T(dmT, preemph, X_T, bandE, start, end,
                           comb1, comb2, tr, *, LM: int, C: int,
                           CC: int, chunk: int = 13,
                           downsample: int = 1,
                           interpret: bool = False):
    """One batched CELT frame, fully transposed (bit-exact to
    batch_celt.celt_synth_step_dual).

    dmT: (CC, 2048+120, B) int32 decode_mem, TRANSPOSED. preemph:
    (B, CC). X_T: (C, N, B) int32 Q14. bandE: (B, 2, 21) int32 Q10.
    start/end: (B,). comb1/comb2: 6-tuples of (B,) int32. tr: (B,)
    bool per-row transient. Returns (pcmT (CC, N//downsample, B) int32
    int16-range, dmT', preemph')."""
    N = SHORT_MDCT_SIZE << LM
    DBS = DECODE_BUFFER_SIZE
    # roll history left by N (OPUS_MOVE, src/celt.cpp:2347); the rolled
    # tail rows are rewritten below, so a slice + pad keeps it exact
    dmT = jnp.concatenate([dmT[:, N:, :], dmT[:, :N, :]], axis=1)
    freqs = [denormalise_bands_T(X_T[c], bandE[:, c], start, end,
                                 1 << LM, downsample=downsample)
             for c in range(C)]
    if CC == 1 and C == 2:
        freqs = [(freqs[0] >> 1) + (freqs[1] >> 1)]
    chans = []
    for cc in range(CC):
        freq = freqs[min(cc, len(freqs) - 1)]
        dcc = dmT[cc]
        hist = dcc[DBS - N:DBS - N + OVERLAP // 2]
        regions = [celt_imdct_frame_T(freq, hist, LM, t,
                                      interpret=interpret)
                   for t in (False, True)]
        region = jnp.where(tr[None, :], regions[1], regions[0])
        finished = jnp.clip(region[:N], -SIG_SAT, SIG_SAT)
        tail = region[N:]
        dcc = jnp.concatenate([dcc[:DBS - N], finished, tail,
                               dcc[DBS + OVERLAP // 2:]], axis=0)
        dcc = comb_filter_step_T(dcc, DBS - N, N, comb1, comb2,
                                 chunk=chunk, interpret=interpret)
        chans.append(dcc)
    dmT = jnp.stack(chans, axis=0)
    synT = dmT[:, DBS - N:DBS, :]
    # NOT the fused comb+deemph kernel (pallas_comb.comb_deemph_step_T):
    # measured on the v5e it is ~1% SLOWER than this separate-kernel
    # form — XLA already hides the (N, B) round-trip behind the scan,
    # and the fused kernel's extra pcm output block adds copies
    # (docs/CEILING.md r05 addendum, measured negative result)
    pcmT, pre2 = deemphasis_T(synT, preemph, downsample=downsample,
                              interpret=interpret)
    return pcmT, dmT, pre2
