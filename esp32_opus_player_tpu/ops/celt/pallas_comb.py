"""Pallas TPU kernel: the CELT comb postfilter in the transposed
(time-on-sublanes, streams-on-lanes) layout.

The comb filter (reference src/celt.cpp:848) reads 5 taps at a
per-stream pitch lag T — a per-lane variable delay. XLA can only
express that as a lane-dimension gather, which measures ~25 ms/frame at
B=2048 on a v5e (half the whole synthesis step). Mosaic has no per-lane
dynamic indexing either. This kernel sidesteps both: the delayed window
is produced by a BIT-DECOMPOSED SHIFT along sublanes — for each bit k
of the remaining shift amount, select (per lane) between the view
shifted by 2^k rows and the unshifted view. Every step is a static
sublane slice + a lane-wise select, entirely in VMEM, so the
intermediate widths cost vector ops, not HBM passes. The feedback
recurrence keeps the host-chosen chunk structure of the XLA path
(chunk <= min(T)-2 makes every read land in finished chunks).

Bit-exact to ops/celt/jax_synthesis.comb_filter_batch (same integer
ops, same chunk walk); validated in interpret mode by CI and compiled
on silicon by tools/check_pallas_tpu.py.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..tables.celt_tables import window120

I32 = jnp.int32
LANES = 128
OVERLAP = 120
SHORT_BLOCK = 120
SIG_SAT = 300000000
COMBFILTER_MINPERIOD = 15
MAX_PERIOD = 1024

_COMB_GAINS = np.array([[10048, 7112, 4248], [15200, 8784, 0],
                        [26208, 3280, 0]], dtype=np.int32)
# crossfade factor per in-call index (window^2 >> 15), padded to the
# call region; beyond OVERLAP the factor column is unused (const path)
_F_TAB = (np.asarray(window120, np.int64) ** 2 >> 15).astype(np.int32)


def _smul(x, t):
    return t * (x >> 15) + ((t * (x & 0x7FFF)) >> 15)


def _mult16_16_q15(a, b):
    return (a * b) >> 15


def _shift_window(buf_get, s_lo, width, off, nrows):
    """Per-lane variable row shift via bit decomposition.

    buf_get(lo, n): returns rows [lo, lo+n) of the buffer as a value.
    Returns rows s_lo+1024-off .. +nrows (per lane offset off in
    [0, 1024)): w[j, l] = buf[s_lo + 1024 - off[l] + j, l].
    """
    w = buf_get(s_lo, width)
    rem = 1024
    for bit in (512, 256, 128, 64, 32, 16, 8, 4, 2, 1):
        rem -= bit
        keep = nrows if bit == 1 else min(w.shape[0] - bit, rem + nrows)
        m = (off & bit) > 0
        w = jnp.where(m, w[bit:bit + keep, :], w[:keep, :])
    return w


PREEMPH_COEF = 27853


def _make_comb_deemph_kernel(regions, CH: int, L: int, N: int,
                             dstart: int):
    """Comb postfilter + deemphasis IIR fused into ONE kernel
    (docs/CEILING.md lift #2): the deemphasis consumes exactly the
    region rows the comb just wrote — running it as the kernel's
    epilogue keeps those rows in VMEM instead of paying a second
    kernel's (N x B) int32 HBM read, and drops one kernel launch per
    frame per channel. Bit-exact: the epilogue is the same op sequence
    as pallas_kernels._deemph_kernel over out_ref[dstart:dstart+N)."""

    def kern(par_ref, f_ref, buf_ref, mem_ref, out_ref, pcm_ref,
             mem_out_ref):
        out_ref[:, :] = buf_ref[:, :]

        def src(lo, n):
            return out_ref[lo:lo + n, :]

        for start, n, po in regions:
            _comb_region(par_ref, f_ref, out_ref, src, start, n, po,
                         min(CH, n))

        m = mem_ref[0:1, :]

        def body(i, m):
            tmp = out_ref[pl.ds(dstart + i, 1), :] + m
            m = _smul(tmp, PREEMPH_COEF)
            pcm_ref[pl.ds(i, 1), :] = jnp.clip((tmp + 2048) >> 12,
                                               -32768, 32767)
            return m

        m = jax.lax.fori_loop(0, N, body, m)
        mem_out_ref[0:1, :] = m

    return kern


def _make_comb_kernel(regions, CH: int, L: int):
    """regions: static list of (start, N, param_row_offset) — each an
    independent comb_filter call applied in order (the CELT step runs
    one call over the first 120 samples with the old->old params and a
    second over the rest with old->new, src/celt.cpp:2385-2389; one
    kernel invocation walks both)."""

    def kern(par_ref, f_ref, buf_ref, out_ref):
        # copy the history region through (everything before `start`
        # plus the tail after start+n_chunks*CH stays untouched)
        out_ref[:, :] = buf_ref[:, :]

        def src(lo, n):
            return out_ref[lo:lo + n, :]

        for start, N, po in regions:
            _comb_region(par_ref, f_ref, out_ref, src, start, N, po,
                         min(CH, N))

    return kern


def _comb_region(par_ref, f_ref, out_ref, src, start, N, po, CH):
        n_chunks = (N + CH - 1) // CH
        # params: rows = [T0, T1, g00, g01, g02, g10, g11, g12,
        #                 same, nop, g1z] each (1, LANES)
        T0 = par_ref[po + 0:po + 1, :]
        T1 = par_ref[po + 1:po + 2, :]
        g00 = par_ref[po + 2:po + 3, :]
        g01 = par_ref[po + 3:po + 4, :]
        g02 = par_ref[po + 4:po + 5, :]
        g10 = par_ref[po + 5:po + 6, :]
        g11 = par_ref[po + 6:po + 7, :]
        g12 = par_ref[po + 7:po + 8, :]
        same = par_ref[po + 8:po + 9, :] > 0
        nop = par_ref[po + 9:po + 10, :] > 0
        g1z = par_ref[po + 10:po + 11, :] > 0      # g1 == 0
        off0 = MAX_PERIOD - T0
        off1 = MAX_PERIOD - T1

        for c in range(n_chunks):
            i0 = start + c * CH
            nrows = CH + 4
            s_lo = i0 - 2 - MAX_PERIOD
            width = MAX_PERIOD + nrows
            w0 = _shift_window(src, s_lo, width, off0, nrows)
            w1 = _shift_window(src, s_lo, width, off1, nrows)
            x = out_ref[i0:i0 + CH, :]
            x_t0m2, x_t0m1, x_t0 = w0[0:CH], w0[1:CH + 1], w0[2:CH + 2]
            x_t0p1, x_t0p2 = w0[3:CH + 3], w0[4:CH + 4]
            x_t1m2, x_t1m1, x_t1 = w1[0:CH], w1[1:CH + 1], w1[2:CH + 2]
            x_t1p1, x_t1p2 = w1[3:CH + 3], w1[4:CH + 4]

            # crossfade factor: static per row (in-call index); rows
            # >= OVERLAP never select the f-dependent path
            f = f_ref[c * CH:c * CH + CH, :]          # (CH, 1) bcast
            rel_ov = (c * CH + jax.lax.broadcasted_iota(
                I32, (CH, 1), 0)) < OVERLAP
            use_ov = rel_ov & (~same)
            fc = jnp.where(use_ov, f, 0)
            y_ov = (x
                    + _smul(x_t0, _mult16_16_q15(32767 - fc, g00))
                    + _smul(x_t0p1 + x_t0m1,
                            _mult16_16_q15(32767 - fc, g01))
                    + _smul(x_t0p2 + x_t0m2,
                            _mult16_16_q15(32767 - fc, g02))
                    + _smul(x_t1, _mult16_16_q15(fc, g10))
                    + _smul(x_t1p1 + x_t1m1, _mult16_16_q15(fc, g11))
                    + _smul(x_t1p2 + x_t1m2, _mult16_16_q15(fc, g12)))
            # past the crossfade the NEW params apply with RAW gains
            # (comb_filter_const_c, src/celt.cpp:830) — not the fc=0
            # blend, whose q15 rounding differs
            y_const = (x + _smul(x_t1, g10)
                       + _smul(x_t1p1 + x_t1m1, g11)
                       + _smul(x_t1p2 + x_t1m2, g12))
            y = jnp.where(use_ov, y_ov, y_const)
            y = jnp.clip(y, -SIG_SAT, SIG_SAT)
            if (c + 1) * CH > N:       # tail chunk past the region
                valid = (c * CH + jax.lax.broadcasted_iota(
                    I32, (CH, 1), 0)) < N
            else:
                valid = None
            keep = nop | (g1z & ~use_ov)
            if valid is not None:
                keep = keep | ~valid
            y = jnp.where(keep, x, y)
            out_ref[i0:i0 + CH, :] = y


def _comb_params(T0, T1, g0, g1, tapset0, tapset1):
    gains = jnp.asarray(_COMB_GAINS)
    T0c = jnp.maximum(T0, COMBFILTER_MINPERIOD)
    T1c = jnp.maximum(T1, COMBFILTER_MINPERIOD)
    return jnp.stack([
        T0c, T1c,
        (16384 + g0 * gains[tapset0, 0]) >> 15,
        (16384 + g0 * gains[tapset0, 1]) >> 15,
        (16384 + g0 * gains[tapset0, 2]) >> 15,
        (16384 + g1 * gains[tapset1, 0]) >> 15,
        (16384 + g1 * gains[tapset1, 1]) >> 15,
        (16384 + g1 * gains[tapset1, 2]) >> 15,
        ((g0 == g1) & (T0c == T1c) & (tapset0 == tapset1)).astype(I32),
        ((g0 == 0) & (g1 == 0)).astype(I32),
        (g1 == 0).astype(I32),
        jnp.zeros_like(T0),
    ], axis=0)                                   # (12, B)


def _f_col(n_rows: int):
    f = np.zeros((n_rows, 1), dtype=np.int32)
    f[:min(OVERLAP, n_rows), 0] = _F_TAB[:min(OVERLAP, n_rows)]
    return jnp.asarray(f)


def _run_comb(bufT, par, regions, CH: int, max_n: int, interpret: bool):
    L, B = bufT.shape
    n_rows = ((max_n + CH - 1) // CH) * CH
    padB = (-B) % LANES
    if padB:
        bufT = jnp.pad(bufT, ((0, 0), (0, padB)))
        par = jnp.pad(par, ((0, 0), (0, padB)))
    Bp = B + padB
    P = par.shape[0]
    kern = _make_comb_kernel(tuple(regions), CH, L)
    out = pl.pallas_call(
        kern,
        grid=(Bp // LANES,),
        in_specs=[
            pl.BlockSpec((P, LANES), lambda l: (0, l),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_rows, 1), lambda l: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, LANES), lambda l: (0, l),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((L, LANES), lambda l: (0, l),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((L, Bp), I32),
        interpret=interpret,
    )(par, _f_col(n_rows), bufT)
    return out[:, :B]


@functools.partial(jax.jit, static_argnames=("start", "N", "chunk",
                                             "interpret"))
def comb_deemph_step_T(bufT, start: int, N: int, comb1, comb2, mem,
                       chunk: int = 13, interpret: bool = False):
    """comb_filter_step_T + the frame's deemphasis IIR fused into one
    kernel invocation (see _make_comb_deemph_kernel). mem: (B,) int32
    deemphasis memory for this channel. Returns (bufT', pcm (N, B)
    int32 int16-range, mem')."""
    L, B = bufT.shape
    par = jnp.concatenate([_comb_params(*comb1), _comb_params(*comb2)],
                          axis=0)
    n1 = min(SHORT_BLOCK, N)
    regions = [(start, n1, 0)]
    if N > n1:
        regions.append((start + n1, N - n1, 12))
    CH = min(chunk, N)
    while start + ((N + CH - 1) // CH) * CH > L:
        CH -= 1
    max_n = max(n1, N - n1)
    n_rows = ((max_n + CH - 1) // CH) * CH
    padB = (-B) % LANES
    if padB:
        bufT = jnp.pad(bufT, ((0, 0), (0, padB)))
        par = jnp.pad(par, ((0, 0), (0, padB)))
        mem = jnp.pad(mem, ((0, padB),))
    Bp = B + padB
    P = par.shape[0]
    kern = _make_comb_deemph_kernel(tuple(regions), CH, L, N, start)
    out, pcm, mem2 = pl.pallas_call(
        kern,
        grid=(Bp // LANES,),
        in_specs=[
            pl.BlockSpec((P, LANES), lambda l: (0, l),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_rows, 1), lambda l: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, LANES), lambda l: (0, l),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), lambda l: (0, l),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((L, LANES), lambda l: (0, l),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N, LANES), lambda l: (0, l),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), lambda l: (0, l),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((L, Bp), I32),
            jax.ShapeDtypeStruct((N, Bp), I32),
            jax.ShapeDtypeStruct((1, Bp), I32),
        ),
        interpret=interpret,
    )(par, _f_col(n_rows), bufT, mem[None, :])
    return out[:, :B], pcm[:, :B], mem2[0, :B]


@functools.partial(jax.jit, static_argnames=("start", "N", "chunk",
                                             "interpret"))
def comb_filter_step_T(bufT, start: int, N: int, comb1, comb2,
                       chunk: int = 13, interpret: bool = False):
    """Both comb calls of one CELT frame in ONE kernel invocation:
    region 1 = [start, start+120) with param set comb1, region 2 =
    [start+120, start+N) with comb2 (src/celt.cpp:2385-2389; for LM=0
    frames N==120 and region 2 is empty). comb1/comb2: 6-tuples of (B,)
    int32 (T0, T1, g0, g1, tapset0, tapset1)."""
    L, B = bufT.shape
    par = jnp.concatenate([_comb_params(*comb1), _comb_params(*comb2)],
                          axis=0)
    n1 = min(SHORT_BLOCK, N)
    regions = [(start, n1, 0)]
    if N > n1:
        regions.append((start + n1, N - n1, 12))
    CH = min(chunk, N)
    while start + ((N + CH - 1) // CH) * CH > L:
        CH -= 1
    return _run_comb(bufT, par, regions, CH, max(n1, N - n1), interpret)


@functools.partial(jax.jit, static_argnames=("start", "N", "chunk",
                                             "interpret"))
def comb_filter_batch_T(bufT, start: int, N: int, T0, T1, g0, g1,
                        tapset0, tapset1, chunk: int = 13,
                        interpret: bool = False):
    """Transposed-layout comb: bufT (L, B) int32, updates rows
    [start, start+N). Per-stream params (B,) int32. Drop-in transposed
    equivalent of jax_synthesis.comb_filter_batch (same semantics,
    reference src/celt.cpp:848)."""
    L, B = bufT.shape
    par = _comb_params(T0, T1, g0, g1, tapset0, tapset1)
    CH = min(chunk, N)
    # shrink CH until the padded tail fits inside the buffer (same rule
    # as the XLA path so the chunk walk matches bit-for-bit)
    while start + ((N + CH - 1) // CH) * CH > L:
        CH -= 1
    return _run_comb(bufT, par, [(start, N, 0)], CH, N, interpret)
