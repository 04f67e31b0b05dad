"""Transposed-layout CELT synthesis (ops/celt/jax_synthesis_T.py) must
be bit-exact to the row-layout device path across layouts, channel
configs, frame sizes, and downsample factors (Pallas kernels in
interpret mode on the CPU backend)."""
import numpy as np
import pytest

import jax.numpy as jnp

from esp32_opus_player_tpu.models.batch_celt import celt_synth_step_dual
from esp32_opus_player_tpu.ops.celt import jax_synthesis_T as jt
from esp32_opus_player_tpu.ops.celt.jax_synthesis import (
    DECODE_BUFFER_SIZE, OVERLAP)


def _rand_inputs(rng, B, C, CC, LM):
    N = 120 << LM
    dm = rng.integers(-(1 << 20), 1 << 20,
                      (B, CC, DECODE_BUFFER_SIZE + OVERLAP)).astype(
        np.int32)
    pre = rng.integers(-100000, 100000, (B, CC)).astype(np.int32)
    X = rng.integers(-8192, 8192, (B, C, N)).astype(np.int32)
    bandE = rng.integers(0, 1200, (B, 2, 21)).astype(np.int32)
    start = np.zeros(B, np.int32)
    end = np.full(B, 21, np.int32)
    tr = rng.integers(0, 2, B).astype(bool)

    def comb():
        return tuple(v.astype(np.int32) for v in (
            rng.integers(15, 1024, B), rng.integers(15, 1024, B),
            rng.integers(0, 32768, B), rng.integers(0, 32768, B),
            rng.integers(0, 3, B), rng.integers(0, 3, B)))
    return dm, pre, X, bandE, start, end, comb(), comb(), tr


@pytest.mark.parametrize("C,CC,LM,downsample", [
    (1, 1, 3, 1), (2, 2, 3, 1), (2, 1, 3, 1), (1, 1, 1, 1),
    (1, 1, 0, 1), (1, 1, 3, 2), (1, 1, 3, 3),
])
def test_transposed_step_matches_row_layout(C, CC, LM, downsample):
    rng = np.random.default_rng(11 + C * 7 + CC + LM + downsample)
    B = 8
    dm, pre, X, bandE, start, end, c1, c2, tr = _rand_inputs(
        rng, B, C, CC, LM)
    pcm_r, dm_r, pre_r = celt_synth_step_dual(
        jnp.asarray(dm), jnp.asarray(pre), jnp.asarray(X),
        jnp.asarray(bandE), jnp.asarray(start), jnp.asarray(end),
        tuple(jnp.asarray(v) for v in c1),
        tuple(jnp.asarray(v) for v in c2), jnp.asarray(tr),
        LM=LM, C=C, CC=CC, chunk=13, downsample=downsample)
    dmT = jnp.asarray(np.moveaxis(dm, 0, 2))       # (CC, L, B)
    X_T = jnp.asarray(np.moveaxis(X, 0, 2))        # (C, N, B)
    pcm_t, dmT2, pre_t = jt.celt_synth_step_dual_T(
        dmT, jnp.asarray(pre), X_T, jnp.asarray(bandE),
        jnp.asarray(start), jnp.asarray(end),
        tuple(jnp.asarray(v) for v in c1),
        tuple(jnp.asarray(v) for v in c2), jnp.asarray(tr),
        LM=LM, C=C, CC=CC, chunk=13, downsample=downsample,
        interpret=True)
    assert np.array_equal(np.moveaxis(np.asarray(pcm_t), 2, 0),
                          np.asarray(pcm_r)), "pcm"
    assert np.array_equal(np.moveaxis(np.asarray(dmT2), 2, 0),
                          np.asarray(dm_r)), "decode_mem"
    assert np.array_equal(np.asarray(pre_t), np.asarray(pre_r)), "pre"
