"""Batched SILK stereo MS->LR unmixing on device.

Mirrors silk_stereo_MS_to_LR (reference src/silk.cpp:4028-4076) over a
streams axis. The unmix has NO time recurrence — the predictor ramp over
the first 8 ms is a closed-form integer sequence (prev + delta*(n+1)) and
every output sample depends only on mid[n-1..n+1] and side[n] — so the
whole frame vectorizes; the only carried state is the 2-sample mid/side
history and the previous predictor pair.

All math is exact int32 fixed point (smulwb operands split per
ops/silk/jax_core.py).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .jax_core import I32, rshift_round, sat16, smulwb

STEREO_INTERP_LEN_MS = 8


@partial(jax.jit, static_argnames=("fs_khz", "frame_length"))
def ms_to_lr_batch(sMid, sSide, pred_prev, xq_mid, xq_side, pred_q13, *,
                   fs_khz: int, frame_length: int):
    """sMid/sSide: (B,2) carried history; pred_prev/pred_q13: (B,2);
    xq_mid/xq_side: (B, frame_length). Returns (L, R, new_sMid, new_sSide)
    with L/R shaped (B, frame_length) — the out_tmp[.][1:frame+1] rows the
    resampler consumes."""
    B = xq_mid.shape[0]
    fl = frame_length
    # x1/x2 = [2-sample history, current frame] (length fl+2)
    x1 = jnp.concatenate([sMid.astype(I32), xq_mid.astype(I32)], axis=-1)
    x2 = jnp.concatenate([sSide.astype(I32), xq_side.astype(I32)], axis=-1)
    new_sMid = x1[:, fl:fl + 2]
    new_sSide = x2[:, fl:fl + 2]

    interp_len = STEREO_INTERP_LEN_MS * fs_khz
    denom_q16 = (1 << 16) // (STEREO_INTERP_LEN_MS * fs_khz)
    prev0 = pred_prev[:, 0]
    prev1 = pred_prev[:, 1]
    # SMULBB on (diff, denom): both comfortably 16-bit here
    delta0 = rshift_round((pred_q13[:, 0] - prev0).astype(I32)
                          * jnp.int32(denom_q16), 16)
    delta1 = rshift_round((pred_q13[:, 1] - prev1).astype(I32)
                          * jnp.int32(denom_q16), 16)
    n = jnp.arange(fl, dtype=I32)
    ramp = jnp.where(n < interp_len, n + 1, 0)
    pred0_t = jnp.where(n[None, :] < interp_len,
                        prev0[:, None] + delta0[:, None] * ramp[None, :],
                        pred_q13[:, 0][:, None])
    pred1_t = jnp.where(n[None, :] < interp_len,
                        prev1[:, None] + delta1[:, None] * ramp[None, :],
                        pred_q13[:, 1][:, None])

    mid_m1 = x1[:, 0:fl]        # x1[n]
    mid_0 = x1[:, 1:fl + 1]     # x1[n+1]
    mid_p1 = x1[:, 2:fl + 2]    # x1[n+2]
    side_0 = x2[:, 1:fl + 1]    # x2[n+1]
    # 3-tap smoothed mid, Q9; wrapping int32 like the reference
    s = ((mid_m1 + mid_p1 + (mid_0 << 1)).astype(I32)) << 9
    s = (side_0 << 8) + smulwb(s, pred0_t)
    s = s + smulwb(mid_0 << 11, pred1_t)
    side_pred = sat16(rshift_round(s, 8))

    L = sat16(mid_0 + side_pred)
    R = sat16(mid_0 - side_pred)
    return L, R, new_sMid, new_sSide
