"""Pallas TPU kernels for the SILK sequential recurrences.

lpc_synth_pallas: the order-10/16 LPC synthesis feedback
(silk_decode_core, reference src/silk.cpp:1930-1950) as one in-VMEM
kernel — time on sublanes, streams on lanes. The recurrence state is a
16-row ring held as a STATIC python list inside an unrolled 20-sample
block, so the per-sample state shift costs no data movement at all
(the list rotation is tracked at trace time; a fori_loop carries the
re-canonicalized (16, L) stack between blocks). The XLA lax.scan this
replaces paid a full cross-iteration carry shuffle per sample.

up2_hq_pallas: the 2x allpass upsampler (silk_resampler_private_up2_HQ
:3513), 6 carried biquad states, same layout/block structure.

Bit-exact: identical int32 wrap/saturate chains as ops/silk/jax_core.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..tables import silk_tables as st

I32 = jnp.int32
INT32_MAX = 2147483647
INT32_MIN = -2147483648
LANES = 128
BLOCK = 20          # divides every subframe length (40/60/80)


def _smulwb(a, b16):
    return (a >> 16) * b16 + (((a & 0xFFFF) * b16) >> 16)


def _add_sat32(a, b):
    r = a + b
    ovf_pos = (a > 0) & (b > 0) & (r < 0)
    ovf_neg = (a < 0) & (b < 0) & (r >= 0)
    return jnp.where(ovf_pos, INT32_MAX,
                     jnp.where(ovf_neg, INT32_MIN, r))


def _lshift_sat32(a, shift: int):
    return jnp.clip(a, INT32_MIN >> shift, INT32_MAX >> shift) << shift


def _lpc_kernel(pres_ref, A_ref, st_ref, out_ref, stout_ref, *,
                n: int, order: int):
    A_rows = [A_ref[j:j + 1, :] for j in range(order)]

    def body(blk, carry):
        ring = [carry[j:j + 1, :] for j in range(16)]   # oldest..newest
        for t in range(BLOCK):
            x = pres_ref[pl.ds(blk * BLOCK + t, 1), :]
            pred = jnp.full(x.shape, order >> 1, dtype=I32)
            for j in range(order):
                pred = pred + _smulwb(ring[15 - j], A_rows[j])
            v = _add_sat32(x, _lshift_sat32(pred, 4))
            out_ref[pl.ds(blk * BLOCK + t, 1), :] = v
            ring = ring[1:] + [v]
        return jnp.concatenate(ring, axis=0)

    stout_ref[:] = jax.lax.fori_loop(0, n // BLOCK, body, st_ref[:])


@functools.partial(jax.jit, static_argnames=("order", "interpret"))
def lpc_synth_pallas(pres, A, state0, *, order: int,
                     interpret: bool = False):
    """pres: (B, n) int32 LTP-resolved excitation; A: (B, order) Q12;
    state0: (B, 16) carried LPC state (most recent last).
    Returns (vs (B, n) int32, state' (B, 16))."""
    B, n = pres.shape
    assert n % BLOCK == 0
    padL = (-B) % LANES
    presT = pres.T
    AT = A.T.astype(I32)
    stT = state0.T
    if padL:
        presT = jnp.concatenate(
            [presT, jnp.zeros((n, padL), I32)], axis=1)
        AT = jnp.concatenate([AT, jnp.zeros((order, padL), I32)], axis=1)
        stT = jnp.concatenate([stT, jnp.zeros((16, padL), I32)], axis=1)
    Bp = B + padL
    grid = (Bp // LANES,)

    def spec(rows):
        return pl.BlockSpec((rows, LANES), lambda l: (0, l),
                            memory_space=pltpu.VMEM)

    vs, st2 = pl.pallas_call(
        functools.partial(_lpc_kernel, n=n, order=order),
        grid=grid,
        in_specs=[spec(n), spec(order), spec(16)],
        out_specs=(spec(n), spec(16)),
        out_shape=(jax.ShapeDtypeStruct((n, Bp), I32),
                   jax.ShapeDtypeStruct((16, Bp), I32)),
        interpret=interpret,
    )(presT, AT, stT)
    return vs[:, :B].T, st2[:, :B].T


_UP2_HQ_0 = [int(x) for x in st.silk_resampler_up2_hq_0]
_UP2_HQ_1 = [int(x) for x in st.silk_resampler_up2_hq_1]


def _rshift_round(a, shift: int):
    if shift == 1:
        return (a >> 1) + (a & 1)
    return ((a >> (shift - 1)) + 1) >> 1


def _up2_kernel(in_ref, s_ref, ev_ref, od_ref, sout_ref, *, n: int):
    c00, c01, c02 = _UP2_HQ_0
    c10, c11, c12 = _UP2_HQ_1

    def steps(S, base, count):
        for t in range(count):
            x = in_ref[pl.ds(base + t, 1), :]
            in32 = x << 10
            Y = in32 - S[0]
            X = _smulwb(Y, c00)
            out1 = S[0] + X
            s0 = in32 + X
            Y = out1 - S[1]
            X = _smulwb(Y, c01)
            out2 = S[1] + X
            s1 = out1 + X
            Y = out2 - S[2]
            X = Y + _smulwb(Y, c02)
            oe = S[2] + X
            s2 = out2 + X
            Y = in32 - S[3]
            X = _smulwb(Y, c10)
            out1 = S[3] + X
            s3 = in32 + X
            Y = out1 - S[4]
            X = _smulwb(Y, c11)
            out2 = S[4] + X
            s4 = out1 + X
            Y = out2 - S[5]
            X = Y + _smulwb(Y, c12)
            oo = S[5] + X
            s5 = out2 + X
            ev_ref[pl.ds(base + t, 1), :] = jnp.clip(
                _rshift_round(oe, 10), -32768, 32767)
            od_ref[pl.ds(base + t, 1), :] = jnp.clip(
                _rshift_round(oo, 10), -32768, 32767)
            S = [s0, s1, s2, s3, s4, s5]
        return S

    full, rem = divmod(n, BLOCK)

    def body(blk, carry):
        S = steps([carry[j:j + 1, :] for j in range(6)],
                  blk * BLOCK, BLOCK)
        return jnp.concatenate(S, axis=0)

    carry = jax.lax.fori_loop(0, full, body, s_ref[:]) if full \
        else s_ref[:]
    if rem:
        S = steps([carry[j:j + 1, :] for j in range(6)],
                  full * BLOCK, rem)
        carry = jnp.concatenate(S, axis=0)
    sout_ref[:] = carry


@functools.partial(jax.jit, static_argnames=("interpret",))
def up2_hq_pallas(S, inp, *, interpret: bool = False):
    """silk_resampler_private_up2_HQ (:3513): S (B, 6), inp (B, n).
    Returns (out (B, 2n) interleaved even/odd, S')."""
    B, n = inp.shape
    padL = (-B) % LANES
    inT = inp.T
    sT = S.T
    if padL:
        inT = jnp.concatenate([inT, jnp.zeros((n, padL), I32)], axis=1)
        sT = jnp.concatenate([sT, jnp.zeros((6, padL), I32)], axis=1)
    Bp = B + padL
    grid = (Bp // LANES,)

    def spec(rows):
        return pl.BlockSpec((rows, LANES), lambda l: (0, l),
                            memory_space=pltpu.VMEM)

    ev, od, s2 = pl.pallas_call(
        functools.partial(_up2_kernel, n=n),
        grid=grid,
        in_specs=[spec(n), spec(6)],
        out_specs=(spec(n), spec(n), spec(6)),
        out_shape=(jax.ShapeDtypeStruct((n, Bp), I32),
                   jax.ShapeDtypeStruct((n, Bp), I32),
                   jax.ShapeDtypeStruct((6, Bp), I32)),
        interpret=interpret,
    )(inT, sT)
    out = jnp.stack([ev[:, :B].T, od[:, :B].T], axis=-1).reshape(B, 2 * n)
    return out, s2[:, :B].T


# ---------------------------------------------------------------------------
# the WHOLE silk_decode_core as one in-VMEM kernel (transposed layout)
# ---------------------------------------------------------------------------

LTP_ORDER = 5


def _smulww(a, b):
    """((int64)a32 * b32) >> 16 (mod 2^32) — same hi/lo split as
    jax_core.smulww."""
    ah = a >> 16
    al = a & 0xFFFF
    bh = b >> 16
    bl = b & 0xFFFF
    low = al * bl
    return (ah * bh << 16) + ah * bl + al * bh + ((low >> 16) & 0xFFFF)


def _sat16(a):
    return jnp.clip(a, -32768, 32767)


def _shift_fwd(src, s_lo, width, off, nrows, maxsh):
    """Per-lane variable forward row shift by off (bit decomposition,
    same recipe as the CELT comb kernel): returns w with
    w[j, l] = src(s_lo, width)[off[l] + j], j in [0, nrows)."""
    w = src(s_lo, width)
    rem = maxsh
    bit = maxsh // 2
    while bit >= 1:
        rem -= bit
        keep = nrows if bit == 1 else min(w.shape[0] - bit, rem + nrows)
        m = (off & bit) > 0
        w = jnp.where(m, w[bit:bit + keep, :], w[:keep, :])
        bit //= 2
    return w


def _silk_core_kernel(ob_ref, exc_ref, A_ref, B_ref, par_ref, st_ref,
                      xq_ref, stout_ref, work_ref, sltp_ref, res_ref, *,
                      fs_khz: int, nb_subfr: int, order: int):
    """Transposed silk_decode_core (reference src/silk.cpp:1806): the
    rewhitening FIR, the per-lane-lag LTP feedback recurrence (bit-
    decomposed sublane shifts, no gathers), and the LPC synthesis ring
    all in ONE VMEM-resident program. Mirrors jax_core.silk_core_frame
    step for step; every integer op is the same wrap/saturate chain."""
    subfr = 5 * fs_khz
    frame = nb_subfr * subfr
    ltp_mem = 20 * fs_khz
    max_lag = 18 * fs_khz
    W = max_lag + LTP_ORDER // 2 + 2
    CH = 2 * fs_khz - 2
    n_chunks = (subfr + CH - 1) // CH
    maxsh = 1
    while maxsh < max_lag + 2:
        maxsh *= 2
    P0 = maxsh - ltp_mem          # head pad so shift reads stay >= 0
    nb = nb_subfr

    work_ref[:, :] = ob_ref[:, :]
    sltp_ref[:, :] = jnp.zeros(sltp_ref.shape, I32)

    def prow(r):
        return par_ref[r:r + 1, :]

    ring = [st_ref[j:j + 1, :] for j in range(16)]

    for k in range(nb_subfr):
        A_rows = [A_ref[(k >> 1) * order + j:(k >> 1) * order + j + 1, :]
                  for j in range(order)]
        B_rows = [B_ref[k * 5 + t:k * 5 + t + 1, :] for t in range(5)]
        gain_q10 = prow(k) >> 6
        inv_gain = prow(nb + k)
        lag = prow(2 * nb + k)
        adj = prow(3 * nb + k)
        voiced = prow(4 * nb + k) > 0
        do_rw = prow(5 * nb + k) > 0
        no_adj = prow(6 * nb + k) > 0

        # gain adjustment of the LPC ring (sLPC state)
        ring = [jnp.where(no_adj, r, _smulww(adj, r)) for r in ring]

        # ---- rewhitening / rescale of the LTP state -------------------
        if k == 2:
            work_ref[ltp_mem:ltp_mem + 2 * subfr, :] = \
                xq_ref[0:2 * subfr, :]
        win_end = ltp_mem + k * subfr
        # FIR whiten the last W rows: V = work[win_end-W-order, win_end)
        V = work_ref[win_end - W - order:win_end, :]
        acc = jnp.zeros((W, V.shape[1]), I32)
        for j in range(order):
            acc = acc + V[order - 1 - j:order - 1 - j + W, :] * A_rows[j]
        cur = V[order:order + W, :]
        white = _sat16(_rshift_round((cur << 12) - acc, 12))
        scaled = _smulwb(inv_gain, white)
        boundary = P0 + ltp_mem + k * subfr
        cur_slice = sltp_ref[boundary - W:boundary, :]
        rescaled = jnp.where(no_adj, cur_slice, _smulww(adj, cur_slice))
        # column i of the W-window is position base+i; valid when
        # W-1-i < lag+2 (the last lag+2 rows)
        iidx = (W - 1) - jax.lax.broadcasted_iota(I32, (W, 1), 0)
        valid = iidx < (lag + LTP_ORDER // 2)
        upd = jnp.where(do_rw & valid, scaled,
                        jnp.where((~do_rw) & valid & voiced,
                                  rescaled, cur_slice))
        sltp_ref[boundary - W:boundary, :] = upd

        # ---- LTP 5-tap feedback recurrence, lag-safe chunks -----------
        off = maxsh - lag - LTP_ORDER // 2
        for c in range(n_chunks):
            i0 = c * CH
            gidx0 = boundary + i0

            def src(lo, nrows):
                return sltp_ref[lo:lo + nrows, :]

            win = _shift_fwd(src, gidx0 - maxsh, maxsh + CH + 4, off,
                             CH + 4, maxsh)
            pred = jnp.full((CH, win.shape[1]), 2, I32)
            for t in range(LTP_ORDER):
                pred = pred + _smulwb(
                    win[LTP_ORDER - 1 - t:LTP_ORDER - 1 - t + CH, :],
                    B_rows[t])
            exc_sl = exc_ref[k * subfr + i0:k * subfr + i0 + CH, :]
            r = exc_sl + (pred << 1)
            sltp_ref[gidx0:gidx0 + CH, :] = r << 1
            res_ref[i0:i0 + CH, :] = r

        # ---- pres + LPC synthesis ring --------------------------------
        exc_k = exc_ref[k * subfr:k * subfr + subfr, :]
        pres = jnp.where(voiced, res_ref[0:subfr, :], exc_k)
        res_ref[0:subfr, :] = pres     # reuse as the LPC input buffer

        def body(blk, carry):
            ring = [carry[j:j + 1, :] for j in range(16)]
            for t in range(BLOCK):
                x = res_ref[pl.ds(blk * BLOCK + t, 1), :]
                pred = jnp.full(x.shape, order >> 1, dtype=I32)
                for j in range(order):
                    pred = pred + _smulwb(ring[15 - j], A_rows[j])
                v = _add_sat32(x, _lshift_sat32(pred, 4))
                xq_ref[pl.ds(k * subfr + blk * BLOCK + t, 1), :] = v
                ring = ring[1:] + [v]
            return jnp.concatenate(ring, axis=0)

        carry = jax.lax.fori_loop(0, subfr // BLOCK, body,
                                  jnp.concatenate(ring, axis=0))
        ring = [carry[j:j + 1, :] for j in range(16)]
        # scale the raw vs rows to xq in place (the ring keeps raw vs)
        vs = xq_ref[k * subfr:k * subfr + subfr, :]
        xq_ref[k * subfr:k * subfr + subfr, :] = _sat16(
            _rshift_round(_smulww(vs, gain_q10), 8))

    stout_ref[:, :] = jnp.concatenate(ring, axis=0)


@functools.partial(jax.jit, static_argnames=("fs_khz", "nb_subfr",
                                             "order", "interpret"))
def silk_core_pallas(outBuf, sLPC0, exc, A_Q12, B_Q14, gains_q16,
                     inv_gain_q31_k0, pitchL, signal_type_voiced,
                     rewhiten_k, gain_adj_q16, prev_gain_match, *,
                     fs_khz: int, nb_subfr: int, order: int,
                     interpret: bool = False):
    """Drop-in replacement for jax_core.silk_core_frame (same argument
    order and semantics, reference src/silk.cpp:1806) running the whole
    core as one transposed Pallas kernel. Bit-exact by construction
    (identical integer chains); validated against the XLA path in CI
    and on silicon by tools/check_pallas_tpu.py."""
    B = exc.shape[0]
    subfr = 5 * fs_khz
    frame = nb_subfr * subfr
    ltp_mem = 20 * fs_khz
    max_lag = 18 * fs_khz
    CH = 2 * fs_khz - 2
    n_chunks = (subfr + CH - 1) // CH
    maxsh = 1
    while maxsh < max_lag + 2:
        maxsh *= 2
    P0 = maxsh - ltp_mem
    nb = nb_subfr

    obT = outBuf.T
    excT = jnp.concatenate([exc, jnp.zeros((B, CH), I32)], axis=-1).T
    AT = A_Q12[:, :, :order].reshape(B, 2 * order).T.astype(I32)
    BT = B_Q14.reshape(B, nb * 5).T.astype(I32)
    par = jnp.concatenate([
        gains_q16.T, inv_gain_q31_k0.T, pitchL.T, gain_adj_q16.T,
        signal_type_voiced.T.astype(I32), rewhiten_k.T.astype(I32),
        prev_gain_match.T.astype(I32)], axis=0).astype(I32)
    stT = sLPC0.T

    padL = (-B) % LANES
    if padL:
        def pad(x):
            return jnp.concatenate(
                [x, jnp.zeros((x.shape[0], padL), I32)], axis=1)
        obT, excT, AT, BT, par, stT = map(pad, (obT, excT, AT, BT,
                                                par, stT))
    Bp = B + padL

    def spec(rows):
        return pl.BlockSpec((rows, LANES), lambda l: (0, l),
                            memory_space=pltpu.VMEM)

    xqT, st2 = pl.pallas_call(
        functools.partial(_silk_core_kernel, fs_khz=fs_khz,
                          nb_subfr=nb_subfr, order=order),
        grid=(Bp // LANES,),
        in_specs=[spec(ltp_mem + frame), spec(frame + CH),
                  spec(2 * order), spec(nb * 5), spec(7 * nb),
                  spec(16)],
        out_specs=(spec(frame), spec(16)),
        out_shape=(jax.ShapeDtypeStruct((frame, Bp), I32),
                   jax.ShapeDtypeStruct((16, Bp), I32)),
        scratch_shapes=[
            pltpu.VMEM((ltp_mem + frame, LANES), I32),
            pltpu.VMEM((P0 + ltp_mem + frame + CH + 4, LANES), I32),
            pltpu.VMEM((n_chunks * CH, LANES), I32),
        ],
        interpret=interpret,
    )(obT, excT, AT, BT, par, stT)
    return xqT[:, :B].T, st2[:, :B].T


# ---------------------------------------------------------------------------
# PLC conceal dense phase + CNG addition as in-VMEM kernels
# ---------------------------------------------------------------------------


def _plc_conceal_kernel(ob_ref, rand_ref, A_ref, B_ref, par_ref, st_ref,
                        xq_ref, stout_ref, sltp_ref, *, fs_khz: int,
                        nb_subfr: int, order: int):
    """Transposed silk_PLC_conceal dense phase (reference
    src/silk.cpp:2973): rewhitening FIR of the last lag0+2 history
    samples, the rand-excited LTP recurrence (bit-shift windows), and
    the LPC synthesis ring — one VMEM program, mirroring
    jax_plc.silk_plc_conceal_frame step for step."""
    subfr = 5 * fs_khz
    frame = nb_subfr * subfr
    lm = 20 * fs_khz
    max_lag = 18 * fs_khz
    W = max_lag + 2
    CH = 2 * fs_khz - 2
    n_chunks = (subfr + CH - 1) // CH
    maxsh = 1
    while maxsh < max_lag + 2:
        maxsh *= 2
    P0 = maxsh - lm
    nb = nb_subfr

    sltp_ref[:, :] = jnp.zeros(sltp_ref.shape, I32)

    def prow(r):
        return par_ref[r:r + 1, :]

    lag_rows = [prow(k) for k in range(nb)]
    inv_gain = prow(nb)
    prev_gain = prow(nb + 1)
    A_rows = [A_ref[j:j + 1, :] for j in range(order)]
    B_rows = [[B_ref[k * 5 + t:k * 5 + t + 1, :] for t in range(5)]
              for k in range(nb)]

    # ---- rewhitening of the last (lag0+2) history samples -------------
    V = ob_ref[lm - W - order:lm, :]
    acc = jnp.zeros((W, V.shape[1]), I32)
    for j in range(order):
        acc = acc + V[order - 1 - j:order - 1 - j + W, :] * A_rows[j]
    cur = V[order:order + W, :]
    white = _sat16(_rshift_round((cur << 12) - acc, 12))
    scaled = _smulwb(inv_gain, white)
    t = jax.lax.broadcasted_iota(I32, (W, 1), 0)
    valid = (W - t) <= (lag_rows[0] + 2)
    sltp_ref[P0 + lm - W:P0 + lm, :] = jnp.where(valid, scaled, 0)

    # ---- LTP recurrence with rand excitation --------------------------
    for k in range(nb_subfr):
        lag = lag_rows[k]
        off = maxsh - lag - LTP_ORDER // 2
        for c in range(n_chunks):
            i0 = c * CH
            gidx0 = P0 + lm + k * subfr + i0

            def src(lo, nrows):
                return sltp_ref[lo:lo + nrows, :]

            win = _shift_fwd(src, gidx0 - maxsh, maxsh + CH + 4, off,
                             CH + 4, maxsh)
            pred = jnp.full((CH, win.shape[1]), 2, I32)
            for tt in range(LTP_ORDER):
                pred = pred + _smulwb(
                    win[LTP_ORDER - 1 - tt:LTP_ORDER - 1 - tt + CH, :],
                    B_rows[k][tt])
            rnd = rand_ref[k * subfr + i0:k * subfr + i0 + CH, :]
            sltp_ref[gidx0:gidx0 + CH, :] = (pred + rnd) << 2

    # ---- LPC synthesis ring over the frame ----------------------------
    def body(blk, carry):
        ring = [carry[j:j + 1, :] for j in range(16)]
        for t in range(BLOCK):
            x = sltp_ref[pl.ds(P0 + lm + blk * BLOCK + t, 1), :]
            pred = jnp.full(x.shape, order >> 1, dtype=I32)
            for j in range(order):
                pred = pred + _smulwb(ring[15 - j], A_rows[j])
            v = _add_sat32(x, _lshift_sat32(pred, 4))
            xq_ref[pl.ds(blk * BLOCK + t, 1), :] = v
            ring = ring[1:] + [v]
        return jnp.concatenate(ring, axis=0)

    stout_ref[:, :] = jax.lax.fori_loop(0, frame // BLOCK, body,
                                        st_ref[:])
    vs = xq_ref[0:frame, :]
    xq_ref[0:frame, :] = _sat16(_rshift_round(_smulww(vs, prev_gain), 8))


@functools.partial(jax.jit, static_argnames=("fs_khz", "nb_subfr",
                                             "order", "interpret"))
def silk_plc_conceal_pallas(outBuf, sLPC0, rand_q12, A_Q12, B_Q14_4,
                            lag4, inv_gain_q30, prev_gain_q10_1, *,
                            fs_khz: int, nb_subfr: int, order: int,
                            interpret: bool = False):
    """Drop-in for jax_plc.silk_plc_conceal_frame (same args/semantics,
    reference src/silk.cpp:2973) as one fused transposed kernel."""
    B = outBuf.shape[0]
    subfr = 5 * fs_khz
    frame = nb_subfr * subfr
    lm = 20 * fs_khz
    max_lag = 18 * fs_khz
    CH = 2 * fs_khz - 2
    maxsh = 1
    while maxsh < max_lag + 2:
        maxsh *= 2
    P0 = maxsh - lm
    nb = nb_subfr

    obT = outBuf[:, :lm].T
    randT = jnp.concatenate(
        [rand_q12, jnp.zeros((B, CH), I32)], axis=-1).T
    AT = A_Q12[:, :order].T.astype(I32)
    BT = B_Q14_4.reshape(B, nb * 5).T.astype(I32)
    par = jnp.concatenate(
        [lag4.T, inv_gain_q30[None, :], prev_gain_q10_1[None, :]],
        axis=0).astype(I32)
    stT = sLPC0.T

    padL = (-B) % LANES
    if padL:
        def pad(x):
            return jnp.concatenate(
                [x, jnp.zeros((x.shape[0], padL), I32)], axis=1)
        obT, randT, AT, BT, par, stT = map(pad, (obT, randT, AT, BT,
                                                 par, stT))
    Bp = B + padL

    def spec(rows):
        return pl.BlockSpec((rows, LANES), lambda l: (0, l),
                            memory_space=pltpu.VMEM)

    xqT, st2 = pl.pallas_call(
        functools.partial(_plc_conceal_kernel, fs_khz=fs_khz,
                          nb_subfr=nb_subfr, order=order),
        grid=(Bp // LANES,),
        in_specs=[spec(lm), spec(frame + CH), spec(order), spec(nb * 5),
                  spec(nb + 2), spec(16)],
        out_specs=(spec(frame), spec(16)),
        out_shape=(jax.ShapeDtypeStruct((frame, Bp), I32),
                   jax.ShapeDtypeStruct((16, Bp), I32)),
        scratch_shapes=[
            pltpu.VMEM((P0 + lm + frame + CH + 4, LANES), I32),
        ],
        interpret=interpret,
    )(obT, randT, AT, BT, par, stT)
    return xqT[:, :B].T, st2[:, :B].T


def _cng_kernel(xq_ref, exc_ref, A_ref, par_ref, st_ref,
                out_ref, stout_ref, *, frame: int, order: int):
    """silk_CNG lossCnt branch (reference src/silk.cpp:1342): the CNG
    LPC ring over the comfort-noise excitation, added to the concealed
    frame; rows with apply=0 pass through (state kept)."""
    A_rows = [A_ref[j:j + 1, :] for j in range(order)]
    gain = par_ref[0:1, :]
    apply_m = par_ref[1:2, :] > 0

    def body(blk, carry):
        ring = [carry[j:j + 1, :] for j in range(16)]
        for t in range(BLOCK):
            x = exc_ref[pl.ds(blk * BLOCK + t, 1), :]
            pred = jnp.full(x.shape, order >> 1, dtype=I32)
            for j in range(order):
                pred = pred + _smulwb(ring[15 - j], A_rows[j])
            v = _add_sat32(x, _lshift_sat32(pred, 4))
            xq_i = xq_ref[pl.ds(blk * BLOCK + t, 1), :]
            out = _sat16(xq_i + _sat16(
                _rshift_round(_smulww(v, gain), 8)))
            out_ref[pl.ds(blk * BLOCK + t, 1), :] = jnp.where(
                apply_m, out, xq_i)
            ring = ring[1:] + [v]
        return jnp.concatenate(ring, axis=0)

    st2 = jax.lax.fori_loop(0, frame // BLOCK, body, st_ref[:])
    stout_ref[:, :] = jnp.where(apply_m, st2, st_ref[:])


@functools.partial(jax.jit, static_argnames=("frame", "order",
                                             "interpret"))
def cng_add_pallas(xq, cng_exc_q14, a_q12, gain_q10, state0, apply_mask,
                   *, frame: int, order: int, interpret: bool = False):
    """Drop-in for jax_plc.cng_add (reference src/silk.cpp:1342)."""
    B = xq.shape[0]
    xqT = xq.T
    excT = cng_exc_q14.T
    AT = a_q12[:, :order].T.astype(I32)
    par = jnp.stack([gain_q10, apply_mask.astype(I32)], axis=0)
    stT = state0.T
    padL = (-B) % LANES
    if padL:
        def pad(x):
            return jnp.concatenate(
                [x, jnp.zeros((x.shape[0], padL), I32)], axis=1)
        xqT, excT, AT, par, stT = map(pad, (xqT, excT, AT, par, stT))
    Bp = B + padL

    def spec(rows):
        return pl.BlockSpec((rows, LANES), lambda l: (0, l),
                            memory_space=pltpu.VMEM)

    outT, st2 = pl.pallas_call(
        functools.partial(_cng_kernel, frame=frame, order=order),
        grid=(Bp // LANES,),
        in_specs=[spec(frame), spec(frame), spec(order), spec(2),
                  spec(16)],
        out_specs=(spec(frame), spec(16)),
        out_shape=(jax.ShapeDtypeStruct((frame, Bp), I32),
                   jax.ShapeDtypeStruct((16, Bp), I32)),
        interpret=interpret,
    )(xqT, excT, AT, par, stT)
    return outT[:, :B].T, st2[:, :B].T
