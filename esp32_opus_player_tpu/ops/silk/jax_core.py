"""Batched SILK dense kernels on device (JAX/XLA, TPU-native path).

Bit-exact int32 re-expression of the SILK synthesis recurrences over a
streams batch axis (reference src/silk.cpp): the LTP-state rewhitening FIR
(silk_LPC_analysis_filter :2268), the 5-tap LTP feedback recurrence blocked
into lag-safe chunks, the order-10/16 LPC synthesis recurrence (lax.scan),
and the 2x-allpass + 12-phase FIR polyphase upsampler
(silk_resampler_private_up2_HQ :3513 / _IIR_FIR :3451) that takes the
8/12/16 kHz internal rate to the 48 kHz API rate.

Buckets are static over (fs_khz, nb_subfr, lpc_order); per-stream variation
(voiced/unvoiced, lag, gains, rewhiten-vs-rescale) is handled with masks.
TPU has no int64: all 32x32 and 32x16 Q16 products use exact hi/lo splits.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from ..tables import silk_tables as st

I32 = jnp.int32
INT32_MAX = 2147483647
INT32_MIN = -2147483648
LTP_ORDER = 5
MAX_LPC_ORDER = 16


# ---------------------------------------------------------------------------
# exact fixed-point lane ops (int32, wrapping)
# ---------------------------------------------------------------------------

def smulwb(a, b16):
    """((int64)a32 * (int16)b) >> 16, truncated to int32."""
    ah = a >> 16
    al = a & 0xFFFF
    return ah * b16 + ((al * b16) >> 16)


def smlawb(a, b, c16):
    return a + smulwb(b, c16)


def smulww(a, b):
    """((int64)a32 * b32) >> 16 (mod 2^32)."""
    ah = a >> 16
    al = a & 0xFFFF
    bh = b >> 16
    bl = b & 0xFFFF
    low = al * bl                       # wraps; need bits [16:32)
    return (ah * bh << 16) + ah * bl + al * bh + ((low >> 16) & 0xFFFF)


def add_sat32(a, b):
    r = a + b                           # wraps in int32
    ovf_pos = (a > 0) & (b > 0) & (r < 0)
    ovf_neg = (a < 0) & (b < 0) & (r >= 0)
    return jnp.where(ovf_pos, INT32_MAX, jnp.where(ovf_neg, INT32_MIN, r))


def lshift_sat32(a, shift: int):
    lo = INT32_MIN >> shift
    hi = INT32_MAX >> shift
    return jnp.clip(a, lo, hi) << shift


def rshift_round(a, shift: int):
    if shift == 1:
        return (a >> 1) + (a & 1)
    return ((a >> (shift - 1)) + 1) >> 1


def sat16(a):
    return jnp.clip(a, -32768, 32767)


# ---------------------------------------------------------------------------
# LTP-state rewhitening FIR (silk_LPC_analysis_filter)
# ---------------------------------------------------------------------------

def lpc_analysis_tail(inp, A_Q12, W: int, order: int):
    """FIR whitening of the last W samples of inp (B, L) with per-stream
    coefficients A_Q12 (B, order). Exact silk semantics: out32_Q12 wraps,
    then rounds and saturates to int16. Returns (B, W)."""
    L = inp.shape[-1]
    # windows: out position p = L-W+i  reads inp[p-1-j], j in [0, order)
    idx = (L - W + np.arange(W))[None, :, None] - 1 \
        - np.arange(order)[None, None, :]
    taps = inp[:, idx[0]]                       # (B, W, order)
    acc = jnp.sum(taps * A_Q12[:, None, :], axis=-1,
                  dtype=I32)                     # wraps like SMLABB_ovflw
    cur = inp[:, L - W + np.arange(W)]
    out = (cur << 12) - acc
    return sat16(rshift_round(out, 12))


# ---------------------------------------------------------------------------
# batched decode_core (one frame, static bucket)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit,
                   static_argnames=("fs_khz", "nb_subfr", "order"))
def silk_core_frame(outBuf, sLPC0, exc, A_Q12, B_Q14, gains_q16,
                    inv_gain_q31_k0, pitchL, signal_type_voiced,
                    rewhiten_k, gain_adj_q16, prev_gain_match, *,
                    fs_khz: int, nb_subfr: int, order: int):
    """Batched silk_decode_core (src/silk.cpp:1806).

    outBuf: (B, ltp_mem + frame) int32 — rewhitening source; the caller has
      already placed this frame's "future" xq slots (k==2 path writes them
      on the fly here instead, see below).
    sLPC0: (B, 16) carried LPC state. exc: (B, frame) int32 Q14 excitation.
    A_Q12: (B, 2, order); B_Q14: (B, nb_subfr, 5); gains_q16: (B, nb_subfr);
    inv_gain_q31_k0: (B, nb_subfr) precomputed inverse gains (with the
      k==0 LTP-scale downscale already applied where rewhitening happens);
    pitchL: (B, nb_subfr); signal_type_voiced: (B, nb_subfr) bool;
    rewhiten_k: (B, nb_subfr) bool; gain_adj_q16: (B, nb_subfr);
    prev_gain_match: (B, nb_subfr) bool (gain equal to previous -> no adj).
    Returns (xq (B, frame) int32 int16-range, new sLPC (B, 16)).
    """
    if jax.default_backend() == "tpu" and exc.shape[0] >= 128:
        # whole-core fused Pallas kernel (no gathers, no relayouts) for
        # full-lane batches; tiny buckets keep the XLA path (below one
        # lane tile the gathers win). The XLA path below
        # (silk_core_frame_xla) remains the CPU / test reference.
        from .pallas_core import silk_core_pallas
        return silk_core_pallas(
            outBuf, sLPC0, exc, A_Q12, B_Q14, gains_q16,
            inv_gain_q31_k0, pitchL, signal_type_voiced, rewhiten_k,
            gain_adj_q16, prev_gain_match, fs_khz=fs_khz,
            nb_subfr=nb_subfr, order=order)
    return silk_core_frame_xla(
        outBuf, sLPC0, exc, A_Q12, B_Q14, gains_q16, inv_gain_q31_k0,
        pitchL, signal_type_voiced, rewhiten_k, gain_adj_q16,
        prev_gain_match, fs_khz=fs_khz, nb_subfr=nb_subfr, order=order)


@functools.partial(jax.jit,
                   static_argnames=("fs_khz", "nb_subfr", "order"))
def silk_core_frame_xla(outBuf, sLPC0, exc, A_Q12, B_Q14, gains_q16,
                        inv_gain_q31_k0, pitchL, signal_type_voiced,
                        rewhiten_k, gain_adj_q16, prev_gain_match, *,
                        fs_khz: int, nb_subfr: int, order: int):
    """The XLA expression of silk_core_frame (see its docstring) —
    the CPU path and the reference the Pallas kernel is checked
    against, on CPU in CI and on silicon by tools/check_pallas_tpu.py."""
    Bsz = exc.shape[0]
    subfr = 5 * fs_khz
    frame = nb_subfr * subfr
    ltp_mem = 20 * fs_khz
    max_lag = 18 * fs_khz
    W = max_lag + LTP_ORDER // 2 + 2          # rewhitening tail window
    # lag-safe chunk: reads reach back lag-2, and the decoder's minimum
    # pitch lag is 2 ms = 2*fs_khz samples (PE_MIN_LAG_MS), so chunks of
    # 2*fs_khz-2 never read into unfinished rows — half the sequential
    # chunk count at WB vs a global worst-case 14
    CH = 2 * fs_khz - 2

    # CH-padded so the last chunk never clamps its dynamic slices
    sLTP_Q15 = jnp.zeros((Bsz, ltp_mem + frame + CH), dtype=I32)
    exc = jnp.concatenate([exc, jnp.zeros((Bsz, CH), dtype=I32)], axis=-1)
    xq = jnp.zeros((Bsz, frame), dtype=I32)
    work = outBuf  # (B, ltp_mem + frame): history + this frame's xq

    sLPC = sLPC0
    for k in range(nb_subfr):
        Ak = A_Q12[:, k >> 1]                # (B, order)
        Bk = B_Q14[:, k]                     # (B, 5)
        voiced = signal_type_voiced[:, k]
        lag = pitchL[:, k]
        gain_q10 = gains_q16[:, k] >> 6
        adj = gain_adj_q16[:, k]
        no_adj = prev_gain_match[:, k]

        # gain adjustment of LPC state
        sLPC = jnp.where(no_adj[:, None], sLPC,
                         smulww(adj[:, None], sLPC))

        # ---- rewhitening / rescale of LTP state --------------------------
        if k == 2:
            # outBuf gains this frame's first two subframes
            work = jax.lax.dynamic_update_slice_in_dim(
                work, xq[:, :2 * subfr], ltp_mem, axis=-1)
        # whiten the tail of the (shifted) buffer: input window ends at
        # ltp_mem + k*subfr
        win_end = ltp_mem + k * subfr
        fir_in = work[:, :win_end]
        white = lpc_analysis_tail(fir_in, Ak[:, :order], W, order)  # (B, W)
        inv_gain = inv_gain_q31_k0[:, k]
        # scatter: sLTP_Q15[buf_idx - 1 - i] = SMULWB(inv_gain, white_tail)
        # for i < lag+2 where buf_idx = ltp_mem + k*subfr
        pos_in_win = W - 1 - np.arange(W)[None, :]          # i for each col
        iidx = jnp.asarray(pos_in_win)
        valid = iidx < (lag[:, None] + LTP_ORDER // 2)
        scaled = smulwb(inv_gain[:, None], white)
        base = ltp_mem + k * subfr - W
        cur_slice = jax.lax.dynamic_slice_in_dim(sLTP_Q15, base, W, axis=-1)
        rescaled = jnp.where(no_adj[:, None], cur_slice,
                             smulww(adj[:, None], cur_slice))
        do_rw = rewhiten_k[:, k][:, None]
        upd = jnp.where(do_rw & valid, scaled,
                        jnp.where((~do_rw) & valid & voiced[:, None],
                                  rescaled, cur_slice))
        sLTP_Q15 = jax.lax.dynamic_update_slice_in_dim(sLTP_Q15, upd, base,
                                                       axis=-1)

        # ---- LTP 5-tap feedback recurrence, lag-safe chunks of 14 --------
        n_chunks = (subfr + CH - 1) // CH
        res = jnp.zeros((Bsz, n_chunks * CH), dtype=I32)

        def ltp_chunk(carry, c):
            sltp, res = carry
            i0 = c * CH
            # the 5 taps read CONSECUTIVE positions (i - lag + 2 - t,
            # t = 0..4), so ONE windowed gather of CH+4 columns serves
            # all of them via static slices — the same
            # scattered-gathers -> windowed-gather rewrite that made
            # the CELT comb filter fast (one dynamic lane-gather per
            # chunk instead of LTP_ORDER)
            gidx0 = ltp_mem + k * subfr + i0
            wbase = gidx0 - lag[:, None] - LTP_ORDER // 2
            win = jnp.take_along_axis(
                sltp, wbase + jnp.arange(CH + LTP_ORDER - 1,
                                         dtype=I32)[None, :], axis=1)
            pred = 2 + jnp.zeros((Bsz, CH), dtype=I32)
            for t in range(LTP_ORDER):
                tap = win[:, LTP_ORDER - 1 - t:
                          LTP_ORDER - 1 - t + CH]
                pred = smlawb(pred, tap, Bk[:, t][:, None])
            exc_sl = jax.lax.dynamic_slice_in_dim(
                exc, k * subfr + i0, CH, axis=-1)
            r = exc_sl + (pred << 1)
            sltp = jax.lax.dynamic_update_slice(
                sltp, r << 1, (0, ltp_mem + k * subfr + i0))
            res = jax.lax.dynamic_update_slice(res, r, (0, i0))
            return (sltp, res), None

        (sLTP_Q15, res), _ = jax.lax.scan(
            ltp_chunk, (sLTP_Q15, res), jnp.arange(n_chunks, dtype=I32))
        res = res[:, :subfr]
        exc_k = exc[:, k * subfr:k * subfr + subfr]
        pres = jnp.where(voiced[:, None], res, exc_k)

        # ---- LPC synthesis recurrence ------------------------------------
        if jax.default_backend() == "tpu":
            # in-VMEM Pallas kernel: the 16-row state ring rotates as a
            # trace-time list (zero data movement per sample)
            from .pallas_core import lpc_synth_pallas
            vs, sLPC = lpc_synth_pallas(pres, Ak[:, :order], sLPC,
                                        order=order)
        else:
            def lpc_step(carry, x):
                state = carry                 # (B, 16) most recent last
                pred = jnp.full((Bsz,), order >> 1, dtype=I32)
                for j in range(order):
                    pred = smlawb(pred, state[:, MAX_LPC_ORDER - 1 - j],
                                  Ak[:, j])
                v = add_sat32(x, lshift_sat32(pred, 4))
                state = jnp.concatenate([state[:, 1:], v[:, None]],
                                        axis=1)
                return state, v

            sLPC, vs = jax.lax.scan(lpc_step, sLPC,
                                    jnp.moveaxis(pres, -1, 0))
            vs = jnp.moveaxis(vs, 0, -1)      # (B, subfr)
        xq_k = sat16(rshift_round(smulww(vs, gain_q10[:, None]), 8))
        xq = jax.lax.dynamic_update_slice(xq, xq_k, (0, k * subfr))

    return xq, sLPC


# ---------------------------------------------------------------------------
# batched resampler: up2-HQ allpass (scan) + 12-phase FIR interpolation
# ---------------------------------------------------------------------------

_UP2_HQ_0 = [int(x) for x in st.silk_resampler_up2_hq_0]
_UP2_HQ_1 = [int(x) for x in st.silk_resampler_up2_hq_1]
_FRAC_FIR_12 = np.asarray(st.silk_resampler_frac_FIR_12,
                          dtype=np.int32).reshape(12, 4)


def up2_hq_scan(S, inp):
    """silk_resampler_private_up2_HQ (:3513) batched: S (B, 6), inp (B, L)
    int32. Returns (out (B, 2L), S')."""
    c00, c01, c02 = _UP2_HQ_0
    c10, c11, c12 = _UP2_HQ_1

    def step(S, x):
        in32 = x << 10
        Y = in32 - S[:, 0]
        X = smulwb(Y, c00)
        out1 = S[:, 0] + X
        s0 = in32 + X
        Y = out1 - S[:, 1]
        X = smulwb(Y, c01)
        out2 = S[:, 1] + X
        s1 = out1 + X
        Y = out2 - S[:, 2]
        X = smlawb(Y, Y, c02)
        oe = S[:, 2] + X
        s2 = out2 + X
        Y = in32 - S[:, 3]
        X = smulwb(Y, c10)
        out1 = S[:, 3] + X
        s3 = in32 + X
        Y = out1 - S[:, 4]
        X = smulwb(Y, c11)
        out2 = S[:, 4] + X
        s4 = out1 + X
        Y = out2 - S[:, 5]
        X = smlawb(Y, Y, c12)
        oo = S[:, 5] + X
        s5 = out2 + X
        S = jnp.stack([s0, s1, s2, s3, s4, s5], axis=1)
        return S, (sat16(rshift_round(oe, 10)),
                   sat16(rshift_round(oo, 10)))

    S, (ev, od) = jax.lax.scan(step, S, jnp.moveaxis(inp, -1, 0))
    out = jnp.stack([jnp.moveaxis(ev, 0, -1), jnp.moveaxis(od, 0, -1)],
                    axis=-1).reshape(inp.shape[0], -1)
    return out, S


def iir_fir_interpol(buf, max_index_q16: int, index_increment_q16: int):
    """silk_resampler_private_IIR_FIR_INTERPOL (:3451) batched, static
    rate: buf (B, 2L + 8). Output length = #indices (static)."""
    idxs = np.arange(0, max_index_q16, index_increment_q16, dtype=np.int64)
    table_index = ((idxs & 0xFFFF) * 12) >> 16
    base = (idxs >> 16).astype(np.int64)
    fir = _FRAC_FIR_12
    coef = np.stack([np.concatenate(
        [fir[t], fir[11 - t][::-1]]) for t in table_index])  # (n, 8)
    taps = buf[:, base[:, None] + np.arange(8)[None, :]]     # (B, n, 8)
    acc = jnp.sum(taps * jnp.asarray(coef, dtype=I32)[None], axis=-1,
                  dtype=I32)
    return sat16(rshift_round(acc, 15))


def down_fir_interpol(buf, max_index_q16: int, index_increment_q16: int,
                      *, order: int, fracs: int, fir_coefs):
    """silk_resampler_private_down_FIR_INTERPOL (:3305) batched, static
    rate: the output index walk (index_q16 += increment) is fully
    static, so the data-dependent loop becomes one windowed gather +
    per-output coefficient rows. Per-tap SMULWB truncation and int32
    wrap-add accumulation are preserved exactly."""
    idxs = np.arange(0, max_index_q16, index_increment_q16,
                     dtype=np.int64)
    base = (idxs >> 16).astype(np.int64)
    fir = np.asarray(fir_coefs, dtype=np.int32)
    if order == 18:                       # RESAMPLER_DOWN_ORDER_FIR0
        ii = ((idxs & 0xFFFF) * fracs) >> 16
        coef = np.zeros((len(idxs), 18), dtype=np.int32)
        for r, i in enumerate(ii):
            coef[r, :9] = fir[9 * i:9 * i + 9]
            coef[r, 9:] = fir[9 * (fracs - 1 - i):
                              9 * (fracs - 1 - i) + 9][::-1]
        taps = buf[:, base[:, None] + np.arange(18)]       # (B, n, 18)
        acc = jnp.sum(smulwb(taps, jnp.asarray(coef)[None]),
                      axis=-1, dtype=I32)
    else:                                 # 24 = RESAMPLER_DOWN_ORDER_FIR1
        taps = buf[:, base[:, None] + np.arange(24)]       # (B, n, 24)
        pair = taps[..., :12] + taps[..., 12:][..., ::-1]  # ADD32 wrap
        acc = jnp.sum(smulwb(pair, jnp.asarray(fir[:12])[None, None]),
                      axis=-1, dtype=I32)
    return sat16(rshift_round(acc, 6))


def ar2_scan(sIIR2, inp, a0: int, a1: int):
    """silk_resampler_private_AR2 (:3286) batched: sIIR2 (B, 2) int32,
    inp (B, L) int32. Returns (out_Q8 (B, L) int32, sIIR2')."""
    def step(S, x):
        S0, S1 = S
        out32 = S0 + (x << 8)             # wraps in int32
        t = out32 << 2
        return (smlawb(S1, t, a0), smulwb(t, a1)), out32

    (S0, S1), ys = jax.lax.scan(step, (sIIR2[:, 0], sIIR2[:, 1]),
                                jnp.moveaxis(inp, -1, 0))
    return jnp.moveaxis(ys, 0, -1), jnp.stack([S0, S1], axis=1)


def _resampler_spec(fs_in_khz: int, fs_out_khz: int) -> dict:
    """silk_resampler_init (:3590) constants for a decoder rate pair,
    resolved at trace time (rates are static per bucket)."""
    from .resampler import _DELAY_MATRIX_DEC, _rate_id
    fs_in, fs_out = fs_in_khz * 1000, fs_out_khz * 1000
    spec = dict(
        delay=int(_DELAY_MATRIX_DEC[_rate_id(fs_in)][_rate_id(fs_out)]),
        batch_size=fs_in_khz * 10, order=0, fracs=1, coefs=None)
    if fs_out == fs_in:
        spec["kind"] = "copy"
        spec["inv_ratio"] = 0
        return spec
    if fs_out > fs_in:
        spec["kind"] = "up2" if fs_out == 2 * fs_in else "iir_fir"
        inv = ((fs_in << 15) // fs_out) << 2          # up2x = 1
        while ((inv * fs_out) >> 16) < (fs_in << 1):
            inv += 1
        spec["inv_ratio"] = inv
        return spec
    spec["kind"] = "down_fir"
    if fs_out * 4 == fs_in * 3:
        spec.update(fracs=3, order=18, coefs=st.silk_Resampler_3_4_COEFS)
    elif fs_out * 3 == fs_in * 2:
        spec.update(fracs=2, order=18, coefs=st.silk_Resampler_2_3_COEFS)
    elif fs_out * 2 == fs_in:
        spec.update(fracs=1, order=24, coefs=st.silk_Resampler_1_2_COEFS)
    else:
        raise ValueError(f"no decoder resampler {fs_in_khz}->"
                         f"{fs_out_khz} kHz")
    inv = ((fs_in << 14) // fs_out) << 2              # up2x = 0
    while ((inv * fs_out) >> 16) < fs_in:
        inv += 1
    spec["inv_ratio"] = inv
    return spec


def sfir_width(fs_in_khz: int, fs_out_khz: int) -> int:
    """FIR-state columns a pool bucket must carry for this rate pair
    (sFIR_i16[8] for IIR_FIR, sFIR_i32[order] for down-FIR; up2/copy
    carry none but keep 8 for a uniform minimum)."""
    spec = _resampler_spec(fs_in_khz, fs_out_khz)
    return max(8, spec["order"])


@functools.partial(jax.jit,
                   static_argnames=("fs_in_khz", "fs_out_khz", "in_len"))
def resample_batch(sIIR, sFIR, delay_buf, inp, *, fs_in_khz: int,
                   fs_out_khz: int, in_len: int):
    """Batched silk_resampler (:3676) for every DECODER rate pair
    (8/12/16 kHz internal -> 8/12/16/24/48 kHz API): copy, 2x allpass
    upsample (8->16, 12->24), IIR-FIR upsample (arbitrary up, incl.
    ->48k), and the AR2 + windowed-FIR down paths 3/4, 2/3, 1/2
    (silk_resampler_private_down_FIR :3420). inp: (B, in_len) int32.
    Returns (out (B, in_len*out/in), sIIR', sFIR', delay_buf').

    Mirrors the reference's exact two-call + batchSize chunking (the
    rounded-up invRatio makes output counts chunking-dependent).
    """
    spec = _resampler_spec(fs_in_khz, fs_out_khz)
    delay = spec["delay"]
    n_samples = fs_in_khz - delay
    batch_size = spec["batch_size"]
    inv_ratio = spec["inv_ratio"]

    db = jax.lax.dynamic_update_slice(delay_buf, inp[:, :n_samples],
                                      (0, delay))

    if jax.default_backend() == "tpu":
        from .pallas_core import up2_hq_pallas as up2
    else:
        up2 = up2_hq_scan

    def iir_fir(sIIR, sFIR, block):
        """private_IIR_FIR (:3481): batchSize chunks, state carried."""
        outs = []
        off = 0
        remaining = block.shape[-1]
        while True:
            n_in = min(remaining, batch_size)
            up, sIIR = up2(sIIR, block[:, off:off + n_in])
            buf = jnp.concatenate([sFIR[:, :8], up], axis=-1)
            outs.append(iir_fir_interpol(buf, n_in << 17, inv_ratio))
            sFIR = jax.lax.dynamic_update_slice(
                sFIR, buf[:, 2 * n_in:2 * n_in + 8], (0, 0))
            off += n_in
            remaining -= n_in
            if remaining <= 0:
                break
        return jnp.concatenate(outs, axis=-1), sIIR, sFIR

    def down_fir(sIIR, sFIR, block):
        """private_down_FIR (:3420): AR2 prefilter into a Q8 buffer,
        then the static-index FIR interpolation; batchSize chunks."""
        a0, a1 = int(spec["coefs"][0]), int(spec["coefs"][1])
        order = spec["order"]
        outs = []
        off = 0
        remaining = block.shape[-1]
        while True:
            n_in = min(remaining, batch_size)
            ar2, s2 = ar2_scan(sIIR[:, :2], block[:, off:off + n_in],
                               a0, a1)
            sIIR = jax.lax.dynamic_update_slice(sIIR, s2, (0, 0))
            buf = jnp.concatenate([sFIR[:, :order], ar2], axis=-1)
            outs.append(down_fir_interpol(
                buf, n_in << 16, inv_ratio, order=order,
                fracs=spec["fracs"], fir_coefs=spec["coefs"][2:]))
            sFIR = jax.lax.dynamic_update_slice(
                sFIR, buf[:, n_in:n_in + order], (0, 0))
            off += n_in
            remaining -= n_in
            if remaining <= 0:
                break
        return jnp.concatenate(outs, axis=-1), sIIR, sFIR

    def up2_block(sIIR, sFIR, block):
        out, sIIR = up2(sIIR, block)
        return out, sIIR, sFIR

    def copy_block(sIIR, sFIR, block):
        return block, sIIR, sFIR

    fn = dict(copy=copy_block, up2=up2_block, iir_fir=iir_fir,
              down_fir=down_fir)[spec["kind"]]
    out1, sIIR, sFIR = fn(sIIR, sFIR, db[:, :fs_in_khz])
    out2, sIIR, sFIR = fn(
        sIIR, sFIR, inp[:, n_samples:n_samples + in_len - fs_in_khz])
    if delay > 0:
        delay_buf = jax.lax.dynamic_update_slice(
            delay_buf, inp[:, in_len - delay:in_len], (0, 0))
    return jnp.concatenate([out1, out2], axis=-1), sIIR, sFIR, delay_buf


def resample_to_48k(sIIR, sFIR, delay_buf, inp, *, fs_in_khz: int,
                    in_len: int):
    """Batched silk_resampler for the ->48 kHz USE_IIR_FIR path — the
    pool's default egress rate. See resample_batch."""
    return resample_batch(sIIR, sFIR, delay_buf, inp,
                          fs_in_khz=fs_in_khz, fs_out_khz=48,
                          in_len=in_len)
