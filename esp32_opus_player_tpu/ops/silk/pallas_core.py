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
