"""Batched SILK packet-loss concealment on device (RFC mode).

Mirrors silk_PLC_conceal (reference src/silk.cpp:2973), silk_CNG (:1342)
and silk_PLC_glue_frames (:3138) over a streams axis. The split matches
the decode core's: everything sequential/symbolic is prepared on host
(rand excitation terms, per-subframe decayed LTP coefs, drifting lags,
bandwidth-expanded LPC — see models/batch_silk.silk_plc_host_params);
the dense feedback recurrences run here — the same rewhitening FIR,
lag-safe chunked LTP and per-sample LPC scan shapes as
ops/silk/jax_core.silk_core_frame, with conceal's scalings.

All math is exact int32 fixed point.
"""
from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from .jax_core import (I32, add_sat32, lpc_analysis_tail, lshift_sat32,
                       rshift_round, sat16, smlawb, smulwb, smulww)

MAX_LPC_ORDER = 16
LTP_ORDER = 5


def clz32(x):
    """m.CLZ32 semantics: bit pattern leading zeros (negative -> 0,
    zero -> 32)."""
    return jax.lax.clz(x.astype(I32))


def _ror32(x, rot):
    """m.ROR32 with per-element rotate amounts (rot may be negative)."""
    u = x.astype(jnp.uint32)
    r = jnp.mod(rot, 32).astype(jnp.uint32)
    out = (u >> r) | (u << ((32 - r) & 31))
    return jnp.where(r == 0, u, out).astype(I32)


def sqrt_approx(x):
    """m.SQRT_APPROX, elementwise (int32 -> int32)."""
    lz = clz32(x)
    frac_q7 = _ror32(x, 24 - lz) & 0x7F
    y = jnp.where((lz & 1) == 1, jnp.int32(32768), jnp.int32(46214))
    y = y >> (lz >> 1)
    out = smlawb(y, y, (jnp.int32(213) * frac_q7))
    return jnp.where(x <= 0, jnp.int32(0), out)


def sum_sqr_shift_b(x, length: int):
    """silk_sum_sqr_shift (:3839) batched over rows. x: (B, length) in
    int16 range. Returns (nrg (B,), shift (B,)). Exact, incl. the wrapped
    int32 accumulation (wrap-add is associative, so the pairwise order
    doesn't matter)."""
    shft0 = max(length.bit_length() - 1, 0)   # 31 - CLZ32(length), static
    npairs = length // 2
    x0 = x[:, 0:2 * npairs:2]
    x1 = x[:, 1:2 * npairs:2]
    pair = x0 * x0 + x1 * x1                   # < 2^31, no wrap
    tail = (x[:, -1] * x[:, -1]) if length % 2 else jnp.zeros(
        x.shape[0], dtype=I32)
    nrg1 = jnp.sum(pair >> shft0, axis=-1, dtype=I32) + length + \
        (tail >> shft0)
    shft = jnp.maximum(0, shft0 + 3 - clz32(nrg1))
    nrg = jnp.sum(pair >> shft[:, None], axis=-1, dtype=I32) + \
        (tail >> shft)
    return nrg, shft


@partial(jax.jit, static_argnames=("fs_khz", "nb_subfr", "order"))
def silk_plc_conceal_frame(outBuf, sLPC0, rand_q12, A_Q12, B_Q14_4, lag4,
                           inv_gain_q30, prev_gain_q10_1, *,
                           fs_khz: int, nb_subfr: int, order: int):
    """Batched silk_PLC_conceal dense phase.

    outBuf: (B, ltp_mem + frame) int32 — synthesis history (first ltp_mem
      samples meaningful). sLPC0: (B, 16) carried LPC state.
    rand_q12: (B, frame) host-precomputed SMULWB(exc_rand, rand_scale)
      per sample (the rand seed walk and per-subframe scale decay are
      sequential host work). A_Q12: (B, order) bandwidth-expanded prevLPC.
    B_Q14_4: (B, 4, 5) per-subframe decayed LTP coefs. lag4: (B, 4)
      per-subframe drifted lags. inv_gain_q30: (B,) rewhitening inverse
      gain. prev_gain_q10_1: (B,) output scale.
    Returns (xq (B, frame), new sLPC (B, 16)). The glue energy is taken
    AFTER comfort-noise addition (scalar order: conceal -> outBuf roll of
    the raw signal -> CNG add -> glue energy of the audible frame) — use
    frame_energy() on the post-CNG output.
    """
    if jax.default_backend() == "tpu" and outBuf.shape[0] >= 128:
        # fused transposed kernel for full-lane batches; below one lane
        # tile the XLA gathers win (conceal buckets are usually small —
        # the lost fraction of a pool). The XLA body below
        # (silk_plc_conceal_frame_xla) stays the CPU/test reference
        # (tools/check_pallas_tpu.py compares on silicon).
        from .pallas_core import silk_plc_conceal_pallas
        return silk_plc_conceal_pallas(
            outBuf, sLPC0, rand_q12, A_Q12, B_Q14_4, lag4,
            inv_gain_q30, prev_gain_q10_1, fs_khz=fs_khz,
            nb_subfr=nb_subfr, order=order)
    return silk_plc_conceal_frame_xla(
        outBuf, sLPC0, rand_q12, A_Q12, B_Q14_4, lag4, inv_gain_q30,
        prev_gain_q10_1, fs_khz=fs_khz, nb_subfr=nb_subfr, order=order)


@partial(jax.jit, static_argnames=("fs_khz", "nb_subfr", "order"))
def silk_plc_conceal_frame_xla(outBuf, sLPC0, rand_q12, A_Q12, B_Q14_4,
                               lag4, inv_gain_q30, prev_gain_q10_1, *,
                               fs_khz: int, nb_subfr: int, order: int):
    """The XLA expression of silk_plc_conceal_frame (see its
    docstring) — the CPU path and the Pallas kernel's reference."""
    Bsz = outBuf.shape[0]
    subfr = 5 * fs_khz
    frame = nb_subfr * subfr
    lm = 20 * fs_khz
    max_lag = 18 * fs_khz
    CH = 2 * fs_khz - 2   # lag-safe: reads reach back lag-2 >= 2*fs_khz-2

    # ---- rewhitening of the last (lag0+2) history samples -------------
    W = max_lag + 2
    white = lpc_analysis_tail(outBuf[:, :lm], A_Q12, W, order)   # (B, W)
    scaled = smulwb(inv_gain_q30[:, None], white)
    lag0 = lag4[:, 0]
    t = jnp.arange(W, dtype=I32)[None, :]
    valid = (W - t) <= (lag0[:, None] + 2)
    sLTP_Q14 = jnp.zeros((Bsz, lm + frame + CH), dtype=I32)
    sLTP_Q14 = jax.lax.dynamic_update_slice(
        sLTP_Q14, jnp.where(valid, scaled, 0), (0, lm - W))

    # ---- LTP recurrence with rand excitation, lag-safe chunks ---------
    rand_pad = jnp.concatenate(
        [rand_q12, jnp.zeros((Bsz, CH), dtype=I32)], axis=-1)
    for k in range(nb_subfr):
        Bk = B_Q14_4[:, k]
        lag = lag4[:, k]
        n_chunks = (subfr + CH - 1) // CH

        def ltp_chunk(sltp, c):
            i0 = c * CH
            # one windowed gather serves all 5 consecutive taps (same
            # rewrite as silk_core_frame — LTP_ORDER x fewer dynamic
            # lane-gathers in the hot recurrence)
            gidx0 = lm + k * subfr + i0
            wbase = gidx0 - lag[:, None] - LTP_ORDER // 2
            win = jnp.take_along_axis(
                sltp, wbase + jnp.arange(CH + LTP_ORDER - 1,
                                         dtype=I32)[None, :], axis=1)
            pred = 2 + jnp.zeros((Bsz, CH), dtype=I32)
            for tt in range(LTP_ORDER):
                tap = win[:, LTP_ORDER - 1 - tt:
                          LTP_ORDER - 1 - tt + CH]
                pred = smlawb(pred, tap, Bk[:, tt][:, None])
            rnd = jax.lax.dynamic_slice_in_dim(
                rand_pad, k * subfr + i0, CH, axis=-1)
            v = (pred + rnd) << 2
            sltp = jax.lax.dynamic_update_slice(
                sltp, v, (0, lm + k * subfr + i0))
            return sltp, None

        sLTP_Q14, _ = jax.lax.scan(ltp_chunk, sLTP_Q14,
                                   jnp.arange(n_chunks, dtype=I32))

    # ---- LPC synthesis over the frame (state = sLPC, like :3100) ------
    vals = sLTP_Q14[:, lm:lm + frame]

    if jax.default_backend() == "tpu":
        from .pallas_core import lpc_synth_pallas
        vs, sLPC = lpc_synth_pallas(vals, A_Q12[:, :order], sLPC0,
                                    order=order)
    else:
        def lpc_step(state, x):
            pred = jnp.full((Bsz,), order >> 1, dtype=I32)
            for j in range(order):
                pred = smlawb(pred, state[:, MAX_LPC_ORDER - 1 - j],
                              A_Q12[:, j])
            v = add_sat32(x, lshift_sat32(pred, 4))
            state = jnp.concatenate([state[:, 1:], v[:, None]], axis=1)
            return state, v

        sLPC, vs = jax.lax.scan(lpc_step, sLPC0,
                                jnp.moveaxis(vals, -1, 0))
        vs = jnp.moveaxis(vs, 0, -1)
    xq = sat16(rshift_round(smulww(vs, prev_gain_q10_1[:, None]), 8))
    return xq, sLPC


@partial(jax.jit, static_argnames=("frame", "order"))
def cng_add(xq, cng_exc_q14, a_q12, gain_q10, state0, apply_mask, *,
            frame: int, order: int):
    """Batched comfort-noise addition on concealed frames
    (silk_CNG :1342, lossCnt branch). Rows with apply_mask False pass
    through untouched (state also kept). Returns (xq', new_state)."""
    if jax.default_backend() == "tpu" and xq.shape[0] >= 128:
        from .pallas_core import cng_add_pallas
        return cng_add_pallas(xq, cng_exc_q14, a_q12, gain_q10, state0,
                              apply_mask, frame=frame, order=order)
    return cng_add_xla(xq, cng_exc_q14, a_q12, gain_q10, state0,
                       apply_mask, frame=frame, order=order)


@partial(jax.jit, static_argnames=("frame", "order"))
def cng_add_xla(xq, cng_exc_q14, a_q12, gain_q10, state0, apply_mask, *,
                frame: int, order: int):
    """The XLA expression of cng_add (see its docstring)."""
    Bsz = xq.shape[0]

    def step(state, xs):
        exc_i, xq_i = xs
        pred = jnp.full((Bsz,), order >> 1, dtype=I32)
        for j in range(order):
            pred = smlawb(pred, state[:, MAX_LPC_ORDER - 1 - j],
                          a_q12[:, j])
        v = add_sat32(exc_i, lshift_sat32(pred, 4))
        state = jnp.concatenate([state[:, 1:], v[:, None]], axis=1)
        out = sat16(xq_i + sat16(rshift_round(smulww(v, gain_q10), 8)))
        return state, (out, v)

    state, (outs, _vs) = jax.lax.scan(
        step, state0, (jnp.moveaxis(cng_exc_q14, -1, 0),
                       jnp.moveaxis(xq, -1, 0)))
    outs = jnp.moveaxis(outs, 0, -1)
    m = apply_mask[:, None]
    return jnp.where(m, outs, xq), jnp.where(m, state, state0)


@partial(jax.jit, static_argnames=("frame",))
def glue_frames(xq, conc_energy, conc_shift, apply_mask, *, frame: int):
    """Batched silk_PLC_glue_frames (:3138), the first-good-frame-after-
    loss energy ramp. Returns the (masked) smoothed frame."""
    energy, eshift = sum_sqr_shift_b(xq, frame)
    d1 = jnp.maximum(eshift - conc_shift, 0)
    d2 = jnp.maximum(conc_shift - eshift, 0)
    ce = conc_energy >> d1
    en = energy >> d2
    cond = apply_mask & (en > ce)
    lz = clz32(ce) - 1
    ce2 = (ce.astype(jnp.uint32) << lz.astype(jnp.uint32)).astype(I32)
    en2 = en >> jnp.maximum(24 - lz, 0)
    frac_q24 = ce2 // jnp.maximum(en2, 1)
    gain_q16 = sqrt_approx(frac_q24) << 4
    slope_q16 = ((65536 - gain_q16) // frame) << 2
    i = jnp.arange(frame, dtype=I32)[None, :]
    g = gain_q16[:, None] + i * slope_q16[:, None]
    live = (i == 0) | (g <= 65536)   # the scalar loop breaks once g > 1
    out = jnp.where(live, smulwb(g, xq), xq)
    return jnp.where(cond[:, None], out, xq)


@partial(jax.jit, static_argnames=("frame",))
def frame_energy(xq, *, frame: int):
    """sum_sqr_shift of the audible (post-CNG) concealed frame — the
    glue reference energy (silk_PLC_glue_frames :2590 lost branch)."""
    return sum_sqr_shift_b(xq, frame)
