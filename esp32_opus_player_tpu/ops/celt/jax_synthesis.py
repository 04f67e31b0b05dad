"""Batched CELT synthesis on device (JAX/XLA, TPU-native path).

Bit-exact int32 re-expression of ops/celt/synthesis.py over a streams batch
axis B: band denormalization, the mixed-radix iMDCT (pre-rotate + kiss FFT
stages + post-rotate + TDAC), the pitch comb postfilter (feedback recurrence
blocked into lag-safe chunks), and the deemphasis IIR (lax.scan).

Everything is fixed-shape per "bucket" (LM, C, CC, transient); the host
groups frames into buckets and calls the jitted step. 16x32 Q15 products use
the exact hi/lo split from ops/fixed_point.py — TPU has no int64. All adds
wrap in int32 like the reference's ovflw macros (reference src/celt.cpp:
denormalise_bands :948, clt_mdct_backward :3204, opus_fft_impl :2997,
comb_filter :848, deemphasis :1988).

State carried on device per stream: decode_mem (CC, 2048+120) int32 and the
deemphasis memory (CC,) int32. Everything else is per-frame input.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from ..tables.celt_tables import (eMeans, eband5ms, mdct_twiddles960,
                                  window120)
from .synthesis import FFT_STATES

NB_EBANDS = 21
SHORT_MDCT_SIZE = 120
OVERLAP = 120
DECODE_BUFFER_SIZE = 2048
SIG_SAT = 300000000
COMBFILTER_MINPERIOD = 15
PREEMPH_COEF = 27853
MAX_PERIOD = 1024

_EB = np.asarray(eband5ms, dtype=np.int32)
_WINDOW = np.asarray(window120, dtype=np.int32)
_TRIG = np.asarray(mdct_twiddles960, dtype=np.int32)
_EMEANS = np.asarray(eMeans, dtype=np.int32)

I32 = jnp.int32


def smul(x, t):
    """S_MUL: ((int64)t16 * x32) >> 15 -> int32, via exact hi/lo split."""
    return t * (x >> 15) + ((t * (x & 0x7FFF)) >> 15)


def mult16_16_q15(a, b):
    return (a * b) >> 15


def sat16(x):
    return jnp.clip(x, -32768, 32767)


# ---------------------------------------------------------------------------
# denormalise_bands
# ---------------------------------------------------------------------------

def exp2_frac(x):
    """celt_exp2_frac (src/celt.h:494): Q10 frac -> Q14, int32 lanes."""
    frac = (x << 4) & 0xFFFF
    frac = jnp.where(frac >= 32768, frac - 65536, frac)  # SHL16 wrap
    r = 14819 + mult16_16_q15(10204, frac)
    r = 22804 + mult16_16_q15(frac, r)
    return 16383 + mult16_16_q15(frac, r)


def denormalise_bands_b(X, bandLogE, start, end, M, downsample: int = 1):
    """Vectorized denormalise (src/celt.cpp:948) for one channel.

    X: (B, N) int32 Q14 spectrum. bandLogE: (B, 21) int32 Q10 (logE).
    start/end: (B,) int32. Returns freq (B, N) int32.

    downsample > 1 caps the spectral bound at N/downsample (the
    reference's anti-alias clamp before decimated output,
    src/celt.cpp:957) — without it high-band MDCT energy would alias
    into the decimated PCM.
    """
    N = M * SHORT_MDCT_SIZE
    lg = bandLogE + (jnp.asarray(_EMEANS[:NB_EBANDS], dtype=I32)[None, :]
                     << 6)
    lg = jnp.clip(lg, -32768, 32767)
    shift = 16 - (lg >> 10)
    g = exp2_frac(lg & 1023)
    big = shift > 31          # -> g = 0, shift = 0
    neg2 = shift <= -2        # -> g = 16384, shift = -2
    g = jnp.where(big, 0, jnp.where(neg2, 16384, g))
    shift = jnp.where(big, 0, jnp.where(neg2, -2, shift))

    # per-bin band index (static); broadcast per-band g/shift to bins
    # with an MXU selection matmul — exact in f32 (g <= 16384, shift
    # offset <= 63, one-hot weights), ~10x faster than a lane-dim gather
    bin_band = np.zeros(N, dtype=np.int32)
    for i in range(NB_EBANDS):
        bin_band[M * _EB[i]:M * _EB[i + 1]] = i
    sel = np.zeros((NB_EBANDS, N), dtype=np.float32)
    sel[bin_band, np.arange(N)] = 1.0
    sel = jnp.asarray(sel)
    # HIGHEST precision: default TPU matmul rounds f32 inputs to bf16,
    # which would corrupt the 15-bit g values; bf16x6 passes accumulate
    # the one-hot products exactly
    hi = jax.lax.Precision.HIGHEST
    gb = jnp.dot(g.astype(jnp.float32), sel, precision=hi,
                 preferred_element_type=jnp.float32).astype(I32)
    sb = jnp.dot((shift + 2).astype(jnp.float32), sel, precision=hi,
                 preferred_element_type=jnp.float32).astype(I32) - 2
    bin_band = jnp.asarray(bin_band)
    prod = X * gb
    pos = prod >> jnp.maximum(sb, 0)
    neg = prod << jnp.maximum(-sb, 0)
    f = jnp.where(sb >= 0, pos, neg)

    band = bin_band[None, :]
    active = (band >= start[:, None]) & (band < end[:, None])
    # bound zeroing: bins >= min(M*eBands[end], N/downsample) are cleared
    ends = jnp.asarray(_EB, dtype=I32)[end] * M          # (B,)
    if downsample > 1:
        ends = jnp.minimum(ends, N // downsample)
    idx = jnp.arange(N, dtype=I32)[None, :]
    active = active & (idx < ends[:, None])
    return jnp.where(active, f, 0)


# ---------------------------------------------------------------------------
# FFT + iMDCT
# ---------------------------------------------------------------------------

def _c_mul(ar, ai, br, bi):
    return smul(ar, br) - smul(ai, bi), smul(ar, bi) + smul(ai, br)


def _kf_bfly2(r, i_, Nblk):
    tw = jnp.asarray(23170, dtype=I32)
    r = r.reshape(r.shape[:-1] + (Nblk, 8))
    i_ = i_.reshape(i_.shape[:-1] + (Nblk, 8))
    f0r, f0i = r[..., 0:4], i_[..., 0:4]
    f2r, f2i = r[..., 4:8], i_[..., 4:8]
    t1r = smul(f2r[..., 1] + f2i[..., 1], tw)
    t1i = smul(f2i[..., 1] - f2r[..., 1], tw)
    t3r = smul(f2i[..., 3] - f2r[..., 3], tw)
    t3i = smul(-(f2i[..., 3] + f2r[..., 3]), tw)
    tr = jnp.stack([f2r[..., 0], t1r, f2i[..., 2], t3r], axis=-1)
    ti = jnp.stack([f2i[..., 0], t1i, -f2r[..., 2], t3i], axis=-1)
    newr = jnp.concatenate([f0r + tr, f0r - tr], axis=-1)
    newi = jnp.concatenate([f0i + ti, f0i - ti], axis=-1)
    return (newr.reshape(r.shape[:-2] + (Nblk * 8,)),
            newi.reshape(r.shape[:-2] + (Nblk * 8,)))


def _gather_tw(idx):
    from ..tables.celt_tables import fft_twiddles48000_960 as tw
    t = np.asarray(tw, dtype=np.int32)
    return jnp.asarray(t[idx, 0]), jnp.asarray(t[idx, 1])


def _assemble(parts, idx_list, nfft):
    """Functional stage assembly: parts[q] lands at positions idx_list[q].

    Replaces scatters with one static permutation gather per FFT stage —
    compiles and runs far faster under XLA than .at[].set chains."""
    flat = jnp.concatenate(
        [pt.reshape(pt.shape[:-2] + (-1,)) for pt in parts], axis=-1)
    order = np.concatenate([ix.ravel() for ix in idx_list])
    perm = np.empty(nfft, dtype=np.int64)
    perm[order] = np.arange(len(order))
    return flat[..., perm]


def _kf_bfly4(r, i_, fstride, m, Nblk, mm, nfft):
    if m == 1:
        idx = (np.arange(Nblk)[:, None] * mm + np.arange(4)[None, :])
        fr = r[..., idx]
        fi = i_[..., idx]
        s0r = fr[..., 0] - fr[..., 2]
        s0i = fi[..., 0] - fi[..., 2]
        f0r = fr[..., 0] + fr[..., 2]
        f0i = fi[..., 0] + fi[..., 2]
        s1r = fr[..., 1] + fr[..., 3]
        s1i = fi[..., 1] + fi[..., 3]
        d1r = fr[..., 1] - fr[..., 3]
        d1i = fi[..., 1] - fi[..., 3]
        idxs = [idx[:, q:q + 1] for q in range(4)]
        r = _assemble([(f0r + s1r)[..., None], (s0r + d1i)[..., None],
                       (f0r - s1r)[..., None], (s0r - d1i)[..., None]],
                      idxs, nfft)
        i_ = _assemble([(f0i + s1i)[..., None], (s0i - d1r)[..., None],
                        (f0i - s1i)[..., None], (s0i + d1r)[..., None]],
                       idxs, nfft)
        return r, i_
    j = np.arange(m)
    tw1r, tw1i = _gather_tw(j * fstride)
    tw2r, tw2i = _gather_tw(j * fstride * 2)
    tw3r, tw3i = _gather_tw(j * fstride * 3)
    base = np.arange(Nblk)[:, None] * mm + j[None, :]
    f0, f1, f2, f3 = base, base + m, base + 2 * m, base + 3 * m
    s0r, s0i = _c_mul(r[..., f1], i_[..., f1], tw1r, tw1i)
    s1r, s1i = _c_mul(r[..., f2], i_[..., f2], tw2r, tw2i)
    s2r, s2i = _c_mul(r[..., f3], i_[..., f3], tw3r, tw3i)
    s5r = r[..., f0] - s1r
    s5i = i_[..., f0] - s1i
    f0r = r[..., f0] + s1r
    f0i = i_[..., f0] + s1i
    s3r = s0r + s2r
    s3i = s0i + s2i
    s4r = s0r - s2r
    s4i = s0i - s2i
    idxs = [f0, f1, f2, f3]
    rout = _assemble([f0r + s3r, s5r + s4i, f0r - s3r, s5r - s4i], idxs,
                     nfft)
    iout = _assemble([f0i + s3i, s5i - s4r, f0i - s3i, s5i + s4r], idxs,
                     nfft)
    return rout, iout


def _kf_bfly3(r, i_, fstride, m, Nblk, mm, nfft):
    epi3i = jnp.asarray(-28378, dtype=I32)
    j = np.arange(m)
    tw1r, tw1i = _gather_tw(j * fstride)
    tw2r, tw2i = _gather_tw(j * fstride * 2)
    base = np.arange(Nblk)[:, None] * mm + j[None, :]
    f0, f1, f2 = base, base + m, base + 2 * m
    s1r, s1i = _c_mul(r[..., f1], i_[..., f1], tw1r, tw1i)
    s2r, s2i = _c_mul(r[..., f2], i_[..., f2], tw2r, tw2i)
    s3r = s1r + s2r
    s3i = s1i + s2i
    s0r = s1r - s2r
    s0i = s1i - s2i
    f1r = r[..., f0] - (s3r >> 1)
    f1i = i_[..., f0] - (s3i >> 1)
    s0r = smul(s0r, epi3i)
    s0i = smul(s0i, epi3i)
    idxs = [f0, f1, f2]
    rout = _assemble([r[..., f0] + s3r, f1r - s0i, f1r + s0i], idxs, nfft)
    iout = _assemble([i_[..., f0] + s3i, f1i + s0r, f1i - s0r], idxs, nfft)
    return rout, iout


def _kf_bfly5(r, i_, fstride, m, Nblk, mm, nfft):
    yar = jnp.asarray(10126, I32)
    yai = jnp.asarray(-31164, I32)
    ybr = jnp.asarray(-26510, I32)
    ybi = jnp.asarray(-19261, I32)
    u = np.arange(m)
    t1r, t1i = _gather_tw(u * fstride)
    t2r, t2i = _gather_tw(2 * u * fstride)
    t3r, t3i = _gather_tw(3 * u * fstride)
    t4r, t4i = _gather_tw(4 * u * fstride)
    base = np.arange(Nblk)[:, None] * mm + u[None, :]
    f0, f1, f2, f3, f4 = (base, base + m, base + 2 * m, base + 3 * m,
                          base + 4 * m)
    s0r, s0i = r[..., f0], i_[..., f0]
    s1r, s1i = _c_mul(r[..., f1], i_[..., f1], t1r, t1i)
    s2r, s2i = _c_mul(r[..., f2], i_[..., f2], t2r, t2i)
    s3r, s3i = _c_mul(r[..., f3], i_[..., f3], t3r, t3i)
    s4r, s4i = _c_mul(r[..., f4], i_[..., f4], t4r, t4i)
    s7r, s7i = s1r + s4r, s1i + s4i
    s10r, s10i = s1r - s4r, s1i - s4i
    s8r, s8i = s2r + s3r, s2i + s3i
    s9r, s9i = s2r - s3r, s2i - s3i
    o0r = s0r + (s7r + s8r)
    o0i = s0i + (s7i + s8i)
    s5r = s0r + (smul(s7r, yar) + smul(s8r, ybr))
    s5i = s0i + (smul(s7i, yar) + smul(s8i, ybr))
    s6r = smul(s10i, yai) + smul(s9i, ybi)
    s6i = -(smul(s10r, yai) + smul(s9r, ybi))
    s11r = s0r + (smul(s7r, ybr) + smul(s8r, yar))
    s11i = s0i + (smul(s7i, ybr) + smul(s8i, yar))
    s12r = smul(s9i, yai) - smul(s10i, ybi)
    s12i = smul(s10r, ybi) - smul(s9r, yai)
    idxs = [f0, f1, f2, f3, f4]
    rout = _assemble([o0r, s5r - s6r, s11r + s12r, s11r - s12r, s5r + s6r],
                     idxs, nfft)
    iout = _assemble([o0i, s5i - s6i, s11i + s12i, s11i - s12i, s5i + s6i],
                     idxs, nfft)
    return rout, iout


def opus_fft_batch(shift: int, r, i_):
    """opus_fft_impl (src/celt.cpp:2997) over leading batch dims."""
    st = FFT_STATES[shift]
    sh = st.shift if st.shift > 0 else 0
    factors = st.factors
    L = len(factors)
    fstride = [1]
    for lvl in range(L):
        fstride.append(fstride[lvl] * factors[lvl][0])
    for lvl in range(L - 1, -1, -1):
        m2 = factors[lvl - 1][1] if lvl != 0 else 1
        p = factors[lvl][0]
        m = factors[lvl][1]
        fs = fstride[lvl]
        if p == 2:
            r, i_ = _kf_bfly2(r, i_, fs)
        elif p == 4:
            r, i_ = _kf_bfly4(r, i_, fs << sh, m, fs, m2, st.nfft)
        elif p == 3:
            r, i_ = _kf_bfly3(r, i_, fs << sh, m, fs, m2, st.nfft)
        elif p == 5:
            r, i_ = _kf_bfly5(r, i_, fs << sh, m, fs, m2, st.nfft)
    return r, i_


def imdct_prerotate(freq_blk, shift: int, stride: int, b: int):
    """Pre-rotate block b of the iMDCT (src/celt.cpp:3221-3240).

    freq_blk: (B, N_freq) full frame spectrum. Returns (rbuf, ibuf) (B, N4)
    in bitrev order.
    """
    N = 1920
    trig_off = 0
    for _ in range(shift):
        N >>= 1
        trig_off += N
    N2, N4 = N >> 1, N >> 2
    st = FFT_STATES[shift]
    idx = np.arange(N4)
    i1 = b + 2 * stride * idx
    i2 = b + stride * (N2 - 1) - 2 * stride * idx
    t0 = jnp.asarray(_TRIG[trig_off + idx])
    t1 = jnp.asarray(_TRIG[trig_off + N4 + idx])
    xp1 = freq_blk[..., i1]
    xp2 = freq_blk[..., i2]
    yr = smul(xp2, t0) + smul(xp1, t1)
    yi = smul(xp1, t0) - smul(xp2, t1)
    rev = np.asarray(st.bitrev, dtype=np.int64)
    inv = np.empty_like(rev)
    inv[rev] = np.arange(N4)
    # rbuf[rev[i]] = yi[i]  ->  rbuf[j] = yi[inv[j]]
    return yi[..., inv], yr[..., inv]


def imdct_postrotate(rbuf, ibuf, shift: int):
    """Post-rotate (src/celt.cpp:3244-3280). Returns (B, N2) block output."""
    N = 1920 >> shift
    trig_off = sum(1920 >> s for s in range(1, shift + 1))
    N2, N4 = N >> 1, N >> 2
    i = np.arange(N4)
    t0 = jnp.asarray(_TRIG[trig_off + i])
    t1 = jnp.asarray(_TRIG[trig_off + N4 + i])
    re = ibuf
    im = rbuf
    yr = smul(re, t0) + smul(im, t1)
    yi = smul(re, t1) - smul(im, t0)
    out = jnp.zeros(rbuf.shape[:-1] + (N2,), dtype=I32)
    out = out.at[..., 2 * i].set(yr)
    out = out.at[..., N2 - 1 - 2 * i].set(yi)
    return out


def imdct_tdac(hist_half, block):
    """TDAC mirror (src/celt.cpp:3283-3296).

    hist_half: (B, OVERLAP/2) pre-existing samples at the block's start
    (previous frame/block tail). block: (B, N2) post-rotate output.
    Returns the (B, OVERLAP/2 + N2) time-domain output region: the first
    OVERLAP samples TDAC-mixed, rest passthrough.
    """
    ov = OVERLAP
    full = jnp.concatenate([hist_half, block], axis=-1)
    i = np.arange(ov // 2)
    x2 = full[..., i]
    x1 = full[..., ov - 1 - i]
    wp1 = jnp.asarray(_WINDOW[i])
    wp2 = jnp.asarray(_WINDOW[ov - 1 - i])
    lo = smul(x2, wp2) - smul(x1, wp1)
    hi = smul(x2, wp1) + smul(x1, wp2)
    full = full.at[..., i].set(lo)
    full = full.at[..., ov - 1 - i].set(hi)
    return full


def celt_imdct_frame(freq, hist, LM: int, transient: bool):
    """Full-frame iMDCT with overlap (src/celt.cpp:2057 block loop).

    freq: (B, N) denormalized spectrum. hist: (B, OVERLAP//2) saved tail
    from the previous frame (unwindowed). Returns (B, N + OVERLAP//2):
    N finished samples + the new unwindowed tail.
    """
    N = SHORT_MDCT_SIZE << LM
    if transient:
        Bblk = 1 << LM
        NB = SHORT_MDCT_SIZE
        shift = 3
    else:
        Bblk = 1
        NB = N
        shift = 3 - LM
    out = jnp.zeros(freq.shape[:-1] + (N + OVERLAP // 2,), dtype=I32)
    cur_hist = hist
    for b in range(Bblk):
        rbuf, ibuf = imdct_prerotate(freq, shift, Bblk, b)
        rbuf, ibuf = opus_fft_batch(shift, rbuf, ibuf)
        blk = imdct_postrotate(rbuf, ibuf, shift)
        region = imdct_tdac(cur_hist, blk)  # (B, ov/2 + N2); N2 = NB + ov/2
        # finished samples: first NB; new tail: last ov/2
        out = jax.lax.dynamic_update_slice_in_dim(
            out, region[..., :NB], b * NB, axis=-1)
        cur_hist = region[..., NB:NB + OVERLAP // 2]
    out = jax.lax.dynamic_update_slice_in_dim(out, cur_hist, N, axis=-1)
    return out


# ---------------------------------------------------------------------------
# comb postfilter (feedback; chunked in lag-safe blocks of 15)
# ---------------------------------------------------------------------------

_COMB_GAINS = np.array([[10048, 7112, 4248], [15200, 8784, 0],
                        [26208, 3280, 0]], dtype=np.int32)


def mult16_16_p15(a, b):
    return (16384 + a * b) >> 15


def comb_filter_batch(buf, start: int, N: int, T0, T1, g0, g1, tapset0,
                      tapset1, chunk: int = COMBFILTER_MINPERIOD - 2):
    """In-place feedback comb over buf[..., start:start+N]
    (src/celt.cpp:848). T0,T1,g0,g1,tapset0,tapset1: (B,) int32. buf:
    (B, L) with at least MAX_PERIOD+2 history before `start`.

    chunk: static feedback-safe block length — sample j reads back to
    j - (T-2), so any chunk <= min(T)-2 over the batch keeps every read
    in an already-finished chunk (13 is always safe since T >= 15; the
    host passes a larger value when it knows the batch minimum, cutting
    the sequential scan length ~10x for typical pitch lags).
    Each chunk does ONE windowed gather per lag (5 taps are consecutive
    positions, so they come from shifted views of a chunk+4 window)
    instead of ten scattered take_along_axis gathers.
    """
    Bsz = buf.shape[0]
    gains = jnp.asarray(_COMB_GAINS)
    T0 = jnp.maximum(T0, COMBFILTER_MINPERIOD)
    T1 = jnp.maximum(T1, COMBFILTER_MINPERIOD)
    g00 = mult16_16_p15(g0, gains[tapset0, 0])
    g01 = mult16_16_p15(g0, gains[tapset0, 1])
    g02 = mult16_16_p15(g0, gains[tapset0, 2])
    g10 = mult16_16_p15(g1, gains[tapset1, 0])
    g11 = mult16_16_p15(g1, gains[tapset1, 1])
    g12 = mult16_16_p15(g1, gains[tapset1, 2])
    same = (g0 == g1) & (T0 == T1) & (tapset0 == tapset1)
    nop = (g0 == 0) & (g1 == 0)
    # window crossfade factor per in-call sample index
    f_ov = (np.asarray(_WINDOW, np.int64) ** 2 >> 15).astype(np.int32)
    f_tab = jnp.asarray(f_ov)

    CH = min(chunk, N)
    # the tail chunk reads/writes (masked) up to n_chunks*CH past start;
    # shrink CH until that padding fits inside the buffer, else the
    # clamped dynamic_update_slice would shift the final write
    while start + ((N + CH - 1) // CH) * CH > buf.shape[1]:
        CH -= 1
    n_chunks = (N + CH - 1) // CH
    pos_base = jnp.arange(CH, dtype=I32)
    win_base = jnp.arange(CH + 4, dtype=I32)

    def chunk_body(carry, c):
        buf = carry
        i0 = c * CH
        pos = jnp.broadcast_to(start + i0 + pos_base[None, :],
                               (Bsz, CH))                # abs positions
        rel = i0 + pos_base[None, :]                     # in-call index
        valid = rel < N

        def window(T):
            # one (CH+4)-wide contiguous gather: columns k+2+j hold
            # position pos0 - T + j + k for tap offset k in [-2, 2]
            idx = (start + i0 - T[:, None] - 2) + win_base[None, :]
            return jnp.take_along_axis(buf, idx, axis=1)

        w0 = window(T0)
        w1 = window(T1)
        x_t0m2, x_t0m1, x_t0, x_t0p1, x_t0p2 = (
            w0[:, 0:CH], w0[:, 1:CH + 1], w0[:, 2:CH + 2],
            w0[:, 3:CH + 3], w0[:, 4:CH + 4])
        x_t1m2, x_t1m1, x_t1, x_t1p1, x_t1p2 = (
            w1[:, 0:CH], w1[:, 1:CH + 1], w1[:, 2:CH + 2],
            w1[:, 3:CH + 3], w1[:, 4:CH + 4])
        xin = jax.lax.dynamic_slice(buf, (0, start + i0), (Bsz, CH))

        # overlap-section formula (f-dependent), f per in-call index
        f = jnp.take(f_tab, jnp.clip(rel, 0, OVERLAP - 1))
        use_ov = (rel < OVERLAP) & (~same[:, None])
        fc = jnp.where(use_ov, f, 0)
        y_ov = (xin
                + smul(x_t0, mult16_16_q15(32767 - fc, g00[:, None]))
                + smul(x_t0p1 + x_t0m1,
                       mult16_16_q15(32767 - fc, g01[:, None]))
                + smul(x_t0p2 + x_t0m2,
                       mult16_16_q15(32767 - fc, g02[:, None]))
                + smul(x_t1, mult16_16_q15(fc, g10[:, None]))
                + smul(x_t1p1 + x_t1m1, mult16_16_q15(fc, g11[:, None]))
                + smul(x_t1p2 + x_t1m2, mult16_16_q15(fc, g12[:, None])))
        y_const = (xin + smul(x_t1, g10[:, None])
                   + smul(x_t1p1 + x_t1m1, g11[:, None])
                   + smul(x_t1p2 + x_t1m2, g12[:, None]))
        y = jnp.where(use_ov, y_ov, y_const)
        y = jnp.clip(y, -SIG_SAT, SIG_SAT)
        # g1==0: after the overlap part nothing changes (copy)
        keep = nop[:, None] | ((g1 == 0)[:, None] & ~use_ov) | ~valid
        y = jnp.where(keep, xin, y)
        buf = jax.lax.dynamic_update_slice(buf, y, (0, start + i0))
        return buf, None

    buf, _ = jax.lax.scan(chunk_body, buf, jnp.arange(n_chunks, dtype=I32))
    return buf


# ---------------------------------------------------------------------------
# deemphasis
# ---------------------------------------------------------------------------

def deemphasis_batch(syn, mem, downsample: int = 1):
    """First-order IIR + Q12 rounding (src/celt.cpp:1988).

    syn: (B, C, N) int32. mem: (B, C) int32. Returns (pcm int16-range
    (B, C, N//downsample) int32, new mem). The IIR always runs at 48 kHz
    and the output keeps every downsample-th sample — exactly the
    reference's scratch-then-decimate structure (src/celt.cpp:2000-2013,
    resampling_factor :817), so 24/16/12/8 kHz output is bit-exact."""
    x = jnp.moveaxis(syn, -1, 0)  # (N, B, C)

    def step(mval, xj):
        tmp = xj + mval
        mval = smul(tmp, jnp.asarray(PREEMPH_COEF, I32))
        pcm = jnp.clip((tmp + 2048) >> 12, -32768, 32767)
        return mval, pcm

    mem, pcm = jax.lax.scan(step, mem, x)
    pcm = jnp.moveaxis(pcm, 0, -1)
    if downsample > 1:
        pcm = pcm[..., ::downsample]
    return pcm, mem
