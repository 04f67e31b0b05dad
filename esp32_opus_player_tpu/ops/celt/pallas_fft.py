"""Pallas TPU kernel for the batched int32 iMDCT FFT core.

The XLA path (jax_synthesis.opus_fft_batch) expresses each kiss-FFT
stage as a permutation gather on the LANE dimension of a (B, nfft)
array — every stage relayouts the whole register file, which measures
~6 ms per frame at B=1024 on a v5e. This kernel runs the entire chain
(pre-rotation twiddles -> all butterfly stages -> post-rotation
twiddles) in VMEM with the layout transposed: FFT index on sublanes,
streams on lanes. In that layout every kiss stage is a pure strided
VIEW — position blk*p*m + q*m + j of the working buffer is element
[blk, q, j] of a (G, p, m, L) reshape — so no data movement happens
between butterflies at all, and the only true permutation of the
algorithm (bitrev composed with the pre-rotation interleave) is folded
into the static gather that builds the kernel's INPUT outside.

Bit-exactness: identical integer ops as the XLA path (smul hi/lo
split, int32 wraparound), same table values, same order.
Reference: clt_mdct_backward src/celt.cpp:3204-3280, opus_fft_impl
:2997, kf_bfly* :2545-2930.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..tables.celt_tables import fft_twiddles48000_960, mdct_twiddles960
from .synthesis import FFT_STATES

I32 = jnp.int32
LANES = 128
_TRIG = np.asarray(mdct_twiddles960, dtype=np.int32)
_TW = np.asarray(fft_twiddles48000_960, dtype=np.int32)   # (N, 2) r,i


def _smul(x, t):
    return t * (x >> 15) + ((t * (x & 0x7FFF)) >> 15)


def _c_mul(ar, ai, br, bi):
    return _smul(ar, br) - _smul(ai, bi), _smul(ar, bi) + _smul(ai, br)


# ---------------------------------------------------------------------------
# static plan per (shift, Bblk)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _plan(shift: int, Bblk: int):
    """Static gather indices + twiddle arrays for one kernel variant."""
    st = FFT_STATES[shift]
    nfft = st.nfft                      # == N4
    N = 1920 >> shift
    N2, N4 = N >> 1, N >> 2
    assert N4 == nfft
    trig_off = sum(1920 >> s for s in range(1, shift + 1))
    sh = st.shift if st.shift > 0 else 0

    rev = np.asarray(st.bitrev, dtype=np.int64)
    inv = np.empty_like(rev)
    inv[rev] = np.arange(N4)
    idx = np.arange(N4)

    # input gather (freq row per kernel row) and pre-rotation twiddles,
    # both already in bitrev order (kernel row j <- pre-rotate index
    # inv[j] of block b)
    i1g = np.empty(Bblk * N4, dtype=np.int64)
    i2g = np.empty(Bblk * N4, dtype=np.int64)
    stride = Bblk
    for b in range(Bblk):
        i1 = b + 2 * stride * idx
        i2 = b + stride * (N2 - 1) - 2 * stride * idx
        i1g[b * N4:(b + 1) * N4] = i1[inv]
        i2g[b * N4:(b + 1) * N4] = i2[inv]
    pre = np.stack([_TRIG[trig_off + idx], _TRIG[trig_off + N4 + idx]],
                   axis=1)[inv]                     # (N4, 2)
    pre = np.tile(pre, (Bblk, 1)).astype(np.int32)  # (rows, 2)
    post = np.stack([_TRIG[trig_off + idx], _TRIG[trig_off + N4 + idx]],
                    axis=1).astype(np.int32)        # (N4, 2)
    post = np.tile(post, (Bblk, 1))

    # stage descriptors, processed lvl = L-1 .. 0
    factors = st.factors
    L = len(factors)
    fstride = [1]
    for lvl in range(L):
        fstride.append(fstride[lvl] * factors[lvl][0])
    stages = []
    for lvl in range(L - 1, -1, -1):
        p, m = factors[lvl]
        G = fstride[lvl]
        fs = fstride[lvl] << sh
        if p == 2 and m == 4:
            stages.append(("b2", G, p, m, None))
        elif m == 1:
            assert p == 4
            stages.append(("b4m1", G, p, m, None))
        else:
            j = np.arange(m)
            tw = np.stack([_TW[j * fs * q] for q in range(1, p)],
                          axis=0).astype(np.int32)  # (p-1, m, 2)
            stages.append((f"b{p}", G, p, m, tw))
    rows = Bblk * N4
    return dict(rows=rows, nfft=nfft, N2=N2, N4=N4, i1g=i1g, i2g=i2g,
                pre=pre, post=post, stages=stages)


# ---------------------------------------------------------------------------
# kernel body (statically specialized per plan)
# ---------------------------------------------------------------------------

def _stage_b2(r, i_, G, Bblk, nfft, L):
    # kf_bfly2 (src/celt.cpp:2545): groups of 8 = (p=2, m=4) with the
    # fixed sqrt(1/2) twiddle 23170
    tw = 23170
    R = r.reshape(Bblk * G, 8, L)
    I = i_.reshape(Bblk * G, 8, L)
    f0r, f0i = R[:, 0:4], I[:, 0:4]
    f2r, f2i = R[:, 4:8], I[:, 4:8]
    t1r = _smul(f2r[:, 1:2] + f2i[:, 1:2], tw)
    t1i = _smul(f2i[:, 1:2] - f2r[:, 1:2], tw)
    t3r = _smul(f2i[:, 3:4] - f2r[:, 3:4], tw)
    t3i = _smul(-(f2i[:, 3:4] + f2r[:, 3:4]), tw)
    tr = jnp.concatenate([f2r[:, 0:1], t1r, f2i[:, 2:3], t3r], axis=1)
    ti = jnp.concatenate([f2i[:, 0:1], t1i, -f2r[:, 2:3], t3i], axis=1)
    nr = jnp.concatenate([f0r + tr, f0r - tr], axis=1)
    ni = jnp.concatenate([f0i + ti, f0i - ti], axis=1)
    return nr.reshape(Bblk * G * 8, L), ni.reshape(Bblk * G * 8, L)


def _stage_b4m1(r, i_, G, Bblk, nfft, L):
    R = r.reshape(Bblk * G, 4, L)
    I = i_.reshape(Bblk * G, 4, L)
    s0r = R[:, 0] - R[:, 2]
    s0i = I[:, 0] - I[:, 2]
    f0r = R[:, 0] + R[:, 2]
    f0i = I[:, 0] + I[:, 2]
    s1r = R[:, 1] + R[:, 3]
    s1i = I[:, 1] + I[:, 3]
    d1r = R[:, 1] - R[:, 3]
    d1i = I[:, 1] - I[:, 3]
    nr = jnp.stack([f0r + s1r, s0r + d1i, f0r - s1r, s0r - d1i], axis=1)
    ni = jnp.stack([f0i + s1i, s0i - d1r, f0i - s1i, s0i + d1r], axis=1)
    return nr.reshape(Bblk * G * 4, L), ni.reshape(Bblk * G * 4, L)


def _stage_b4(r, i_, G, p, m, tw_ref, Bblk, nfft, L):
    R = r.reshape(Bblk * G, 4, m, L)
    I = i_.reshape(Bblk * G, 4, m, L)
    tw = tw_ref[:]                                  # (3, m, 2)

    def t(q):
        return (tw[q - 1, :, 0].reshape(1, m, 1),
                tw[q - 1, :, 1].reshape(1, m, 1))

    t1r, t1i = t(1)
    t2r, t2i = t(2)
    t3r, t3i = t(3)
    s0r, s0i = _c_mul(R[:, 1], I[:, 1], t1r, t1i)
    s1r, s1i = _c_mul(R[:, 2], I[:, 2], t2r, t2i)
    s2r, s2i = _c_mul(R[:, 3], I[:, 3], t3r, t3i)
    s5r = R[:, 0] - s1r
    s5i = I[:, 0] - s1i
    f0r = R[:, 0] + s1r
    f0i = I[:, 0] + s1i
    s3r = s0r + s2r
    s3i = s0i + s2i
    s4r = s0r - s2r
    s4i = s0i - s2i
    nr = jnp.stack([f0r + s3r, s5r + s4i, f0r - s3r, s5r - s4i], axis=1)
    ni = jnp.stack([f0i + s3i, s5i - s4r, f0i - s3i, s5i + s4r], axis=1)
    return nr.reshape(Bblk * G * 4 * m, L), ni.reshape(Bblk * G * 4 * m, L)


def _stage_b3(r, i_, G, p, m, tw_ref, Bblk, nfft, L):
    epi3i = -28378
    R = r.reshape(Bblk * G, 3, m, L)
    I = i_.reshape(Bblk * G, 3, m, L)
    tw = tw_ref[:]                                  # (2, m, 2)
    t1r = tw[0, :, 0].reshape(1, m, 1)
    t1i = tw[0, :, 1].reshape(1, m, 1)
    t2r = tw[1, :, 0].reshape(1, m, 1)
    t2i = tw[1, :, 1].reshape(1, m, 1)
    s1r, s1i = _c_mul(R[:, 1], I[:, 1], t1r, t1i)
    s2r, s2i = _c_mul(R[:, 2], I[:, 2], t2r, t2i)
    s3r = s1r + s2r
    s3i = s1i + s2i
    s0r = s1r - s2r
    s0i = s1i - s2i
    f1r = R[:, 0] - (s3r >> 1)
    f1i = I[:, 0] - (s3i >> 1)
    s0r = _smul(s0r, epi3i)
    s0i = _smul(s0i, epi3i)
    nr = jnp.stack([R[:, 0] + s3r, f1r - s0i, f1r + s0i], axis=1)
    ni = jnp.stack([I[:, 0] + s3i, f1i + s0r, f1i - s0r], axis=1)
    return nr.reshape(Bblk * G * 3 * m, L), ni.reshape(Bblk * G * 3 * m, L)


def _stage_b5(r, i_, G, p, m, tw_ref, Bblk, nfft, L):
    yar, yai = 10126, -31164
    ybr, ybi = -26510, -19261
    R = r.reshape(Bblk * G, 5, m, L)
    I = i_.reshape(Bblk * G, 5, m, L)
    tw = tw_ref[:]                                  # (4, m, 2)

    def t(q):
        return (tw[q - 1, :, 0].reshape(1, m, 1),
                tw[q - 1, :, 1].reshape(1, m, 1))

    s0r, s0i = R[:, 0], I[:, 0]
    s1r, s1i = _c_mul(R[:, 1], I[:, 1], *t(1))
    s2r, s2i = _c_mul(R[:, 2], I[:, 2], *t(2))
    s3r, s3i = _c_mul(R[:, 3], I[:, 3], *t(3))
    s4r, s4i = _c_mul(R[:, 4], I[:, 4], *t(4))
    s7r, s7i = s1r + s4r, s1i + s4i
    s10r, s10i = s1r - s4r, s1i - s4i
    s8r, s8i = s2r + s3r, s2i + s3i
    s9r, s9i = s2r - s3r, s2i - s3i
    o0r = s0r + (s7r + s8r)
    o0i = s0i + (s7i + s8i)
    s5r = s0r + (_smul(s7r, yar) + _smul(s8r, ybr))
    s5i = s0i + (_smul(s7i, yar) + _smul(s8i, ybr))
    s6r = _smul(s10i, yai) + _smul(s9i, ybi)
    s6i = -(_smul(s10r, yai) + _smul(s9r, ybi))
    s11r = s0r + (_smul(s7r, ybr) + _smul(s8r, yar))
    s11i = s0i + (_smul(s7i, ybr) + _smul(s8i, yar))
    s12r = _smul(s9i, yai) - _smul(s10i, ybi)
    s12i = _smul(s10r, ybi) - _smul(s9r, yai)
    nr = jnp.stack([o0r, s5r - s6r, s11r + s12r, s11r - s12r, s5r + s6r],
                   axis=1)
    ni = jnp.stack([o0i, s5i - s6i, s11i + s12i, s11i - s12i, s5i + s6i],
                   axis=1)
    return nr.reshape(Bblk * G * 5 * m, L), ni.reshape(Bblk * G * 5 * m, L)


def _make_kernel(shift: int, Bblk: int):
    plan = _plan(shift, Bblk)
    stages = plan["stages"]
    rows = plan["rows"]
    nfft = plan["nfft"]

    def kern(xp1_ref, xp2_ref, pre_ref, *rest):
        tw_refs = rest[:-3]
        post_ref, yr_ref, yi_ref = rest[-3:]
        L = xp1_ref.shape[1]
        xp1 = xp1_ref[:]
        xp2 = xp2_ref[:]
        t0 = pre_ref[:, 0:1]
        t1 = pre_ref[:, 1:2]
        yr = _smul(xp2, t0) + _smul(xp1, t1)
        yi = _smul(xp1, t0) - _smul(xp2, t1)
        r, i_ = yi, yr          # rbuf <- yi, ibuf <- yr (prerotate swap)
        ti = 0
        for kind, G, p, m, tw in stages:
            if kind == "b2":
                r, i_ = _stage_b2(r, i_, G, Bblk, nfft, L)
            elif kind == "b4m1":
                r, i_ = _stage_b4m1(r, i_, G, Bblk, nfft, L)
            elif kind == "b4":
                r, i_ = _stage_b4(r, i_, G, p, m, tw_refs[ti], Bblk,
                                  nfft, L)
                ti += 1
            elif kind == "b3":
                r, i_ = _stage_b3(r, i_, G, p, m, tw_refs[ti], Bblk,
                                  nfft, L)
                ti += 1
            else:
                r, i_ = _stage_b5(r, i_, G, p, m, tw_refs[ti], Bblk,
                                  nfft, L)
                ti += 1
        re, im = i_, r
        p0 = post_ref[:, 0:1]
        p1 = post_ref[:, 1:2]
        yr_ref[:] = _smul(re, p0) + _smul(im, p1)
        yi_ref[:] = _smul(re, p1) - _smul(im, p0)

    return kern, plan


@functools.partial(jax.jit, static_argnames=("shift", "Bblk",
                                             "interpret"))
def fft_blocks_pallas(freq_T, *, shift: int, Bblk: int,
                      interpret: bool = False):
    """freq_T: (N_freq, B) int32 transposed denormalized spectrum.
    Returns (yr, yi) each (Bblk*N4, B): post-rotated FFT outputs per
    block (block b in rows [b*N4, (b+1)*N4))."""
    kern, plan = _make_kernel(shift, Bblk)
    rows = plan["rows"]
    B = freq_T.shape[1]
    padL = (-B) % LANES
    xp1 = freq_T[jnp.asarray(plan["i1g"])]
    xp2 = freq_T[jnp.asarray(plan["i2g"])]
    if padL:
        z = jnp.zeros((rows, padL), dtype=I32)
        xp1 = jnp.concatenate([xp1, z], axis=1)
        xp2 = jnp.concatenate([xp2, z], axis=1)
    Bp = B + padL
    grid = (Bp // LANES,)
    tw_arrays = [jnp.asarray(tw) for kind, G, p, m, tw in plan["stages"]
                 if tw is not None]
    const_spec = [pl.BlockSpec(a.shape,
                               (lambda l, nd=a.ndim: (0,) * nd),
                               memory_space=pltpu.VMEM)
                  for a in [jnp.asarray(plan["pre"])] + tw_arrays
                  + [jnp.asarray(plan["post"])]]
    yr, yi = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((rows, LANES), lambda l: (0, l),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, LANES), lambda l: (0, l),
                         memory_space=pltpu.VMEM),
        ] + const_spec,
        out_specs=(
            pl.BlockSpec((rows, LANES), lambda l: (0, l),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, LANES), lambda l: (0, l),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((rows, Bp), I32),
            jax.ShapeDtypeStruct((rows, Bp), I32),
        ),
        interpret=interpret,
    )(xp1, xp2, jnp.asarray(plan["pre"]), *tw_arrays,
      jnp.asarray(plan["post"]))
    return yr[:, :B], yi[:, :B]


def celt_imdct_frame_pallas(freq, hist, LM: int, transient: bool,
                            interpret: bool = False):
    """Drop-in for jax_synthesis.celt_imdct_frame with the FFT core in
    Pallas. freq: (B, N) int32; hist: (B, 60). Returns
    (B, N + 60)."""
    from . import jax_synthesis as js
    N = js.SHORT_MDCT_SIZE << LM
    if transient:
        Bblk, NB, shift = 1 << LM, js.SHORT_MDCT_SIZE, 3
    else:
        Bblk, NB, shift = 1, N, 3 - LM
    N4 = FFT_STATES[shift].nfft
    N2 = 2 * N4
    yr, yi = fft_blocks_pallas(freq.T, shift=shift, Bblk=Bblk,
                               interpret=interpret)
    B = freq.shape[0]
    yrB = yr.reshape(Bblk, N4, B)
    yiB = yi.reshape(Bblk, N4, B)
    # out[2i] = yr[i]; out[N2-1-2i] = yi[i]  (post-rotate interleave)
    out = jnp.stack([yrB, yiB[:, ::-1]], axis=2).reshape(Bblk, N2, B)
    out = jnp.moveaxis(out, -1, 0)              # (B, Bblk, N2)

    res = jnp.zeros((B, N + js.OVERLAP // 2), dtype=I32)
    cur_hist = hist
    for b in range(Bblk):
        region = js.imdct_tdac(cur_hist, out[:, b])
        res = jax.lax.dynamic_update_slice_in_dim(
            res, region[..., :NB], b * NB, axis=-1)
        cur_hist = region[..., NB:NB + js.OVERLAP // 2]
    res = jax.lax.dynamic_update_slice_in_dim(res, cur_hist, N, axis=-1)
    return res
