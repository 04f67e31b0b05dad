"""Pallas TPU kernels for the CELT hot path.

deemphasis_pallas: the first-order deemphasis IIR (reference
src/celt.cpp:1988) as a single in-VMEM kernel. The recurrence is sequential
in time but elementwise across streams, so the layout puts time on sublanes
and streams on lanes: each grid cell loops over the 960 samples of a
(N, 128)-lane block entirely in VMEM — one HBM read + one write per value,
no per-step XLA scan overhead.

Falls back to interpret mode off-TPU (tests run on the CPU backend).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PREEMPH_COEF = 27853
I32 = jnp.int32
LANES = 128


def _smul(x, t):
    return t * (x >> 15) + ((t * (x & 0x7FFF)) >> 15)


def _deemph_kernel(syn_ref, mem_ref, pcm_ref, mem_out_ref, *, n: int):
    m = mem_ref[0:1, :]                       # keep 2-D: (1, LANES)

    def body(i, m):
        tmp = syn_ref[pl.ds(i, 1), :] + m
        m = _smul(tmp, PREEMPH_COEF)
        pcm_ref[pl.ds(i, 1), :] = jnp.clip((tmp + 2048) >> 12,
                                           -32768, 32767)
        return m

    m = jax.lax.fori_loop(0, n, body, m)
    mem_out_ref[0:1, :] = m


@functools.partial(jax.jit, static_argnames=("interpret", "downsample"))
def deemphasis_pallas(syn, mem, interpret: bool = False,
                      downsample: int = 1):
    """syn: (B, C, N) int32; mem: (B, C) int32.
    Returns (pcm (B, C, N//downsample) int32 int16-range, mem').

    downsample keeps every d-th output sample (the IIR always runs at
    48 kHz — reference scratch-then-decimate, src/celt.cpp:2000-2013);
    the decimation is a static row slice on the kernel's (N, rows)
    output, free compared to the recurrence."""
    B, C, N = syn.shape
    rows = B * C
    pad = (-rows) % LANES
    x = syn.reshape(rows, N)
    m = mem.reshape(rows)
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, N), dtype=I32)], axis=0)
        m = jnp.concatenate([m, jnp.zeros((pad,), dtype=I32)], axis=0)
    xt = x.T  # (N, rows): time on sublanes, streams on lanes
    mt = m[None, :]
    grid = (xt.shape[1] // LANES,)
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
            jax.ShapeDtypeStruct(xt.shape, I32),
            jax.ShapeDtypeStruct(mt.shape, I32),
        ),
        interpret=interpret,
    )(xt, mt)
    if downsample > 1:
        pcm_t = pcm_t[::downsample]
    pcm = pcm_t.T[:rows].reshape(B, C, N // downsample)
    mem2 = m_out[0, :rows].reshape(B, C)
    return pcm, mem2
