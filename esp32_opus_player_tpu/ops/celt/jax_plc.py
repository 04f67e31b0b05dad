"""Batched CELT packet-loss concealment (pitch-repeat PLC) — the one
decode feature the reference DELETED (its celt_decode_lost is gone;
lost CELT frames play silence, reference src/celt.cpp pruned dispatch,
src/opus_decoder.cpp:154 NULL path). RFC-mode pools restore the libopus
semantics so the "RFC 6716-correct" loss story covers CELT too:

  libopus 1.3.1 celt_decoder.c::celt_decode_lost, pitch branch —
    1. pitch search over the decode history (pitch.c::pitch_downsample
       + pitch_search: 4x-decimated coarse xcorr, 2x refinement around
       the two best normalized candidates, pseudo-interpolation);
    2. order-24 LPC fit (lag-windowed autocorrelation + Levinson);
    3. whiten the last excitation, measure its energy decay;
    4. extrapolate one period at the found pitch with per-period decay
       (+0.8 fade on repeated losses), re-synthesize through 1/A(z);
    5. clamp synthesis energy against the source region, TDAC-blend the
       overlap tail so the next good MDCT frame crossfades cleanly.

Everything here is float32 ON DEVICE, batched over the lost rows of a
StreamPool (R rows x CC channels), built from vectorizable pieces:
depthwise correlations (jnp.correlate under vmap -> conv), shifted-add
FIRs, a 24-step unrolled Levinson, and one lax.scan for the order-24
IIR. Divergence vs the libopus float build is bounded (fixed-vs-float
decode LSBs + float32 accumulation): measured 20-75 dB SNR per
concealed frame (tests/test_celt_plc.py enforces a floor).

The noise-based branch (loss_count >= 5, narrowband starts) is out of
scope: rows past 5 consecutive losses keep decaying by the same
pitch-repeat (energy * decay per period), which converges toward
silence like libopus' noise floor does.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from ..tables.celt_tables import window120
from .jax_synthesis import DECODE_BUFFER_SIZE as DBS, OVERLAP

MAX_PERIOD = 1024
LPC_ORDER = 24
PLC_PITCH_LAG_MAX = 720
PLC_PITCH_LAG_MIN = 100
N = 960           # 20 ms frame the conceal fills (LM 3)
ELEN = N + OVERLAP

_WIN = jnp.asarray(np.asarray(window120, np.float32) / 32768.0)
_PRE = 27853.0 / 32768.0      # the 0.85 deemphasis coef, Q15-exact


# ------------------------------------------------------------ helpers
def _autocorr(x, lag, window=None, overlap=0):
    """ac[k] = sum x[i]x[i+k], k=0..lag; optional symmetric windowing
    of `overlap` samples at both ends (celt_lpc.c::_celt_autocorr)."""
    if window is not None and overlap:
        n = x.shape[-1]
        head = x[:, :overlap] * window[None, :overlap]
        tail = x[:, n - overlap:] * window[None, :overlap][:, ::-1]
        x = jnp.concatenate([head, x[:, overlap:n - overlap], tail],
                            axis=1)
    return jnp.stack(
        [jnp.einsum("rn,rn->r", x[:, :x.shape[1] - k], x[:, k:])
         for k in range(lag + 1)], axis=1)


def _celt_lpc(ac, p):
    """Levinson-Durbin (celt_lpc.c::_celt_lpc), batched over rows;
    the early 30 dB bail-out becomes a per-row done mask."""
    R = ac.shape[0]
    lpc = jnp.zeros((R, p), jnp.float32)
    error = ac[:, 0]
    done = ac[:, 0] == 0
    for i in range(p):
        rr = ac[:, i + 1]
        for j in range(i):
            rr = rr + lpc[:, j] * ac[:, i - j]
        r = -rr / jnp.where(error != 0, error, 1.0)
        r = jnp.where(done, 0.0, r)
        new = lpc.at[:, i].set(r)
        for j in range((i + 1) >> 1):
            t1, t2 = new[:, j], new[:, i - 1 - j]
            new = new.at[:, j].set(t1 + r * t2)
            new = new.at[:, i - 1 - j].set(t2 + r * t1)
        lpc = jnp.where(done[:, None], lpc, new)
        error = jnp.where(done, error, error - r * r * error)
        done = done | (error < 0.001 * ac[:, 0])
    return lpc


def _fir_shifted(xh, num, hist):
    """y[i] = x[i] + sum_k num[k] * x[i-k-1] (celt_lpc.c::celt_fir
    semantics — past INPUTS, so it vectorizes as shifted adds).
    xh: (R, n), num: (R, ord), hist: (R, ord) the ord samples BEFORE
    xh[...,0] (hist[:, -1] is x[-1])."""
    full = jnp.concatenate([hist, xh], axis=1)
    ordn = num.shape[1]
    y = xh
    for k in range(ordn):
        y = y + num[:, k:k + 1] * full[:, ordn - k - 1:
                                       ordn - k - 1 + xh.shape[1]]
    return y


def _find_best_pitch(xcorr, y, length, max_pitch):
    """pitch.c::find_best_pitch — top-2 lags by normalized squared
    correlation with a running window energy; exact sequential
    semantics via lax.scan, batched over rows."""
    R = y.shape[0]
    Syy0 = 1.0 + jnp.sum(y[:, :length] * y[:, :length], axis=1)
    e_in = y[:, length:length + max_pitch] ** 2
    e_out = y[:, :max_pitch] ** 2

    def body(carry, xs):
        bn0, bn1, bd0, bd1, bp0, bp1, Syy = carry
        xc, ein, eout, i = xs
        x16 = xc * 1e-12
        num = x16 * x16
        c1 = (xc > 0) & (num * bd1 > bn1 * Syy)
        c0 = c1 & (num * bd0 > bn0 * Syy)
        bn1n = jnp.where(c0, bn0, jnp.where(c1, num, bn1))
        bd1n = jnp.where(c0, bd0, jnp.where(c1, Syy, bd1))
        bp1n = jnp.where(c0, bp0, jnp.where(c1, i, bp1))
        bn0n = jnp.where(c0, num, bn0)
        bd0n = jnp.where(c0, Syy, bd0)
        bp0n = jnp.where(c0, i, bp0)
        Syy2 = jnp.maximum(1.0, Syy + ein - eout)
        return (bn0n, bn1n, bd0n, bd1n, bp0n, bp1n, Syy2), None

    init = (jnp.full((R,), -1.0), jnp.full((R,), -1.0),
            jnp.zeros((R,)), jnp.zeros((R,)),
            jnp.zeros((R,), jnp.int32), jnp.ones((R,), jnp.int32),
            Syy0)
    xs = (xcorr.T, e_in.T, e_out.T,
          jnp.arange(max_pitch, dtype=jnp.int32))
    (bn0, bn1, bd0, bd1, bp0, bp1, _), _ = jax.lax.scan(body, init, xs)
    return bp0, bp1


def _corr(y, x, out_len):
    """Per-row valid cross-correlation: out[r,i] = sum_n x[r,n]*y[r,i+n]
    (celt_pitch_xcorr). Depthwise conv under vmap — memory-light."""
    return jax.vmap(lambda a, v: jnp.correlate(a, v, mode="valid"))(
        y, x)[:, :out_len]


def _pitch_search(x_lp, y, length, max_pitch):
    """pitch.c::pitch_search at the PLC operating point (inputs already
    2x-decimated; length/max_pitch in full-rate units)."""
    lag = length + max_pitch
    n4, mp4 = length >> 2, max_pitch >> 2
    n2, mp2 = length >> 1, max_pitch >> 1
    x4 = x_lp[:, :2 * n4:2]
    y4 = y[:, :2 * (lag >> 2):2]
    xc4 = _corr(y4, x4, mp4)
    bp0, bp1 = _find_best_pitch(xc4, y4, n4, mp4)
    # refine at 2x: only lags within +-2 of the doubled candidates are
    # computed (others stay 0, exactly like the reference's skip)
    xc_full = jnp.maximum(-1.0, _corr(y, x_lp[:, :n2], mp2))
    lags = jnp.arange(mp2, dtype=jnp.int32)[None, :]
    cand = (jnp.abs(lags - 2 * bp0[:, None]) <= 2) \
        | (jnp.abs(lags - 2 * bp1[:, None]) <= 2)
    xc = jnp.where(cand, xc_full, 0.0)
    b0, _ = _find_best_pitch(xc, y, n2, mp2)
    # pseudo-interpolation
    idx = jnp.arange(x_lp.shape[0])
    a = xc[idx, jnp.maximum(b0 - 1, 0)]
    b = xc[idx, b0]
    c = xc[idx, jnp.minimum(b0 + 1, mp2 - 1)]
    off = jnp.where((c - a) > 0.7 * (b - a), 1,
                    jnp.where((a - c) > 0.7 * (b - c), -1, 0))
    off = jnp.where((b0 > 0) & (b0 < mp2 - 1), off, 0)
    return 2 * b0 - off


def _plc_pitch_search(chans):
    """celt_decoder.c::celt_plc_pitch_search: 2x downsample + whiten
    (pitch.c::pitch_downsample), then search. chans: (R, CC, DBS)."""
    R = chans.shape[0]
    hl = DBS >> 1
    i = jnp.arange(1, hl)
    x = jnp.sum(chans, axis=1)        # channel sum, each 0.25/0.5/0.25
    x_lp = jnp.zeros((R, hl), jnp.float32)
    x_lp = x_lp.at[:, 1:].set(
        0.25 * (x[:, 2 * i - 1] + x[:, 2 * i + 1]) + 0.5 * x[:, 2 * i])
    x_lp = x_lp.at[:, 0].set(0.25 * x[:, 1] + 0.5 * x[:, 0])
    ac = _autocorr(x_lp, 4)
    ac = ac.at[:, 0].multiply(1.0001)
    k = jnp.arange(1, 5, dtype=jnp.float32)
    ac = ac.at[:, 1:].multiply(1.0 - (0.008 * k[None, :]) ** 2)
    lpc = _celt_lpc(ac, 4)
    lpc = lpc * (0.9 ** jnp.arange(1, 5, dtype=jnp.float32))[None, :]
    c1 = 0.8
    lpc2 = jnp.stack([lpc[:, 0] + 0.8,
                      lpc[:, 1] + c1 * lpc[:, 0],
                      lpc[:, 2] + c1 * lpc[:, 1],
                      lpc[:, 3] + c1 * lpc[:, 2],
                      c1 * lpc[:, 3]], axis=1)
    x_lp = _fir_shifted(x_lp, lpc2, jnp.zeros((R, 5), jnp.float32))
    pi = _pitch_search(x_lp[:, PLC_PITCH_LAG_MAX >> 1:], x_lp,
                       DBS - PLC_PITCH_LAG_MAX,
                       PLC_PITCH_LAG_MAX - PLC_PITCH_LAG_MIN)
    return PLC_PITCH_LAG_MAX - pi


def _iir24(x, den, mem):
    """y[i] = x[i] - sum_k den[k]*y[i-k-1] (celt_lpc.c::celt_iir) —
    the one genuinely sequential stage; lax.scan over time with a
    (R, 24) output-history carry. mem[:, k] = y[-k-1]."""
    def body(hist, xt):
        yt = xt - jnp.sum(den * hist, axis=1)
        hist = jnp.concatenate([yt[:, None], hist[:, :-1]], axis=1)
        return hist, yt
    _, ys = jax.lax.scan(body, mem, x.T)
    return ys.T


# ------------------------------------------------------------ conceal
def celt_plc_core(dm, pre, pitch, lpc, first, *,
                  CC: int, downsample: int = 1):
    """UNMASKED conceal core: one concealed 20 ms frame per row.

    dm (R, CC, DBS+OVERLAP) int32 Q12 decode_mem rows; pre (R, CC)
    int32 deemphasis memory; pitch (R,) int32 last pitch (used when
    first=False); lpc (R, CC, 24) float32 last LPC fit; first (R,) bool
    loss_count==0. Returns raw (pcm (R, Nd, CC) int16, dm', pre', T,
    lpc') with no row masking — celt_plc_bucket (per-frame buckets)
    masks inactive rows, the in-window superstep path
    (_celt_pool_superstep_T_lossy) instead gathers compact lost rows
    and drop-scatters, so pads never write back at all."""
    R = dm.shape[0]
    f = dm.astype(jnp.float32) / 4096.0
    new_pitch = _plc_pitch_search(f[:, :, :DBS])
    T = jnp.where(first, new_pitch, pitch).astype(jnp.int32)
    T = jnp.clip(T, PLC_PITCH_LAG_MIN, PLC_PITCH_LAG_MAX)
    fade = jnp.where(first, 1.0, 0.8).astype(jnp.float32)
    exc_len = jnp.minimum(2 * T, MAX_PERIOD)

    outs, dms, pres, lpcs = [], [], [], []
    iota_mp = jnp.arange(MAX_PERIOD)
    iota_el = jnp.arange(ELEN)
    for c in range(CC):
        buf = f[:, c]
        _exc = buf[:, DBS - MAX_PERIOD - LPC_ORDER:DBS]
        exc = _exc[:, LPC_ORDER:]
        ac = _autocorr(exc, LPC_ORDER, _WIN, OVERLAP)
        ac = ac.at[:, 0].multiply(1.0001)
        k = jnp.arange(1, LPC_ORDER + 1, dtype=jnp.float32)
        ac = ac.at[:, 1:].multiply(1.0 - (0.008 * k[None, :]) ** 2)
        lpc_new = _celt_lpc(ac, LPC_ORDER)
        lpc_c = jnp.where(first[:, None], lpc_new, lpc[:, c])
        # whiten the last exc_len samples (FIR over past inputs)
        wh = _fir_shifted(exc, lpc_c, _exc[:, :LPC_ORDER])
        mask_wh = iota_mp[None, :] >= (MAX_PERIOD - exc_len)[:, None]
        exc_w = jnp.where(mask_wh, wh, exc)
        # energy decay over the last two half-exc_len windows
        dl = exc_len >> 1
        m1 = iota_mp[None, :] >= (MAX_PERIOD - dl)[:, None]
        m2 = mask_wh & ~m1
        e2sq = exc_w * exc_w
        E1 = 1.0 + jnp.sum(jnp.where(m1, e2sq, 0.0), axis=1)
        E2 = 1.0 + jnp.sum(jnp.where(m2, e2sq, 0.0), axis=1)
        decay = jnp.sqrt(jnp.minimum(E1, E2) / E2)
        # roll left by N, then extrapolate one period with decay
        rolled = jnp.concatenate(
            [buf[:, N:DBS], jnp.zeros((R, N), jnp.float32),
             buf[:, DBS:]], axis=1)
        eoff = MAX_PERIOD - T
        jmod = iota_el[None, :] % T[:, None]
        wraps = iota_el[None, :] // T[:, None]
        att = fade[:, None] * decay[:, None] ** (1 + wraps)
        ex = att * jnp.take_along_axis(exc_w, eoff[:, None] + jmod,
                                       axis=1)
        src = jnp.take_along_axis(
            rolled, DBS - MAX_PERIOD - N + eoff[:, None] + jmod, axis=1)
        S1 = jnp.sum(src * src, axis=1) / 1024.0
        lpc_mem = rolled[:, DBS - N - LPC_ORDER:DBS - N][:, ::-1]
        syn = _iir24(ex, lpc_c, lpc_mem)
        S2 = jnp.sum(syn * syn, axis=1) / 1024.0
        # anti-explosion clamp + soft ratio fade (celt_decoder.c)
        ratio = jnp.sqrt((S1 / 2 + 1) / (S2 / 2 + 1))
        g_ov = 1.0 - _WIN[None, :] * (1.0 - ratio[:, None])
        gain = jnp.where(iota_el[None, :] < OVERLAP,
                         jnp.pad(g_ov, ((0, 0), (0, ELEN - OVERLAP))),
                         ratio[:, None])
        gain = jnp.where((S1 < S2)[:, None], gain, 1.0)
        syn = jnp.where((S1 > 0.25 * S2)[:, None], syn * gain, 0.0)
        # write back: N samples + TDAC-blended half-overlap tail
        etmp = syn[:, N:N + OVERLAP]
        i2 = jnp.arange(OVERLAP // 2)
        tdac = _WIN[None, i2] * etmp[:, OVERLAP - 1 - i2] \
            + _WIN[None, OVERLAP - 1 - i2] * etmp[:, i2]
        buf2 = jnp.concatenate(
            [rolled[:, :DBS - N], syn[:, :N], tdac,
             rolled[:, DBS + OVERLAP // 2:]], axis=1)
        # deemphasis (float mirror of ops/celt/synthesis.deemphasis)
        def de_body(m, xt):
            t = xt + m
            return _PRE * t, t
        m0 = pre[:, c].astype(jnp.float32) / 4096.0
        _, tmps = jax.lax.scan(de_body, m0, syn[:, :N].T)
        pcm48 = tmps.T
        m_last = _PRE * pcm48[:, -1]
        pcm = jnp.clip(jnp.rint(pcm48[:, ::downsample]),
                       -32768, 32767).astype(jnp.int32)
        outs.append(pcm)
        dms.append(jnp.rint(jnp.clip(buf2, -2**19, 2**19 - 1) * 4096.0)
                   .astype(jnp.int32))
        pres.append(jnp.rint(m_last * 4096.0).astype(jnp.int32))
        lpcs.append(lpc_c)

    pcm = jnp.stack(outs, axis=2)                      # (R, Nd, CC)
    dm2 = jnp.stack(dms, axis=1)                       # (R, CC, L)
    pre2 = jnp.stack(pres, axis=1)                     # (R, CC)
    lpc2 = jnp.stack(lpcs, axis=1)                     # (R, CC, 24)
    return pcm.astype(jnp.int16), dm2, pre2, T, lpc2


@functools.partial(jax.jit, static_argnames=("CC", "downsample"))
def celt_plc_bucket(dm, pre, pitch, lpc, first, active, *,
                    CC: int, downsample: int = 1):
    """One concealed 20 ms frame for a bucket of lost CELT rows
    (celt_plc_core + inactive-row masking: padded rows keep state
    untouched). Returns (pcm (R, N//downsample, CC) int16, dm', pre',
    pitch', lpc')."""
    pcm, dm2, pre2, T, lpc2 = celt_plc_core(
        dm, pre, pitch, lpc, first, CC=CC, downsample=downsample)
    am = active[:, None]
    dm2 = jnp.where(am[:, :, None], dm2, dm)
    pre2 = jnp.where(am, pre2, pre)
    pitch2 = jnp.where(active, T, pitch)
    lpc2 = jnp.where(am[:, :, None], lpc2, lpc)
    pcm = jnp.where(am[:, :, None], pcm, 0).astype(jnp.int16)
    return pcm, dm2, pre2, pitch2, lpc2
