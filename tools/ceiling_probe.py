"""Per-stage timing of the CELT K-frame superstep on the real chip —
the measurement behind docs/CEILING.md (VERDICT r03 #3: why does
capacity/stream regress from B=2048/4096 to B=8192?).

Each stage of celt_synth_step_dual_T (ops/celt/jax_synthesis_T.py:197)
gets its own K=64 lax.scan program (so the tunneled per-dispatch cost
amortizes exactly like the production superstep) and is timed at
B=2048/4096/8192:

  roll    — the OPUS_MOVE history shift (reference src/celt.cpp:2347):
            one full rewrite of decode_mem (CC,2168,B) int32 per frame
  denorm  — denormalise_bands_T (one-hot MXU matmul + shifts)
  imdct   — both transient variants of celt_imdct_frame_T (Pallas FFT
            + TDAC) + the where() select, as the frame body runs them
  comb    — comb_filter_step_T (per-lane delay Pallas kernel)
  deemph  — deemphasis_T scan + downsample
  full    — the production _celt_pool_superstep_T for reference

Run: python tools/ceiling_probe.py [iters]
Prints one JSON line: {stage: {B: ms_per_frame}}.
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

from esp32_opus_player_tpu.models.stream_pool import (  # noqa: E402
    _CELT_HDR, _celt_pool_superstep_T, NB_EBANDS)
from esp32_opus_player_tpu.ops.celt.jax_synthesis_T import (  # noqa: E402
    celt_imdct_frame_T, deemphasis_T, denormalise_bands_T)
from esp32_opus_player_tpu.ops.celt.pallas_comb import (  # noqa: E402
    comb_filter_step_T)
from esp32_opus_player_tpu.ops.celt.jax_synthesis import (  # noqa: E402
    DECODE_BUFFER_SIZE as DBS, OVERLAP)

K = 64
N = 960
L = DBS + OVERLAP
INTERP = jax.default_backend() != "tpu"


def staging(B):
    rng = np.random.default_rng(0)
    W = _CELT_HDR + 2 * NB_EBANDS + 960
    stg = np.zeros((B, W), dtype=np.int16)
    stg[:, 2] = rng.integers(0, 2, B)
    stg[:, 4] = 21
    stg[:, 5:7] = rng.integers(15, 1024, (B, 2))
    stg[:, 11:13] = rng.integers(15, 1024, (B, 2))
    stg[:, 7:9] = 12288
    stg[:, 13:15] = 12288
    stg[:, 17] = 1
    stg[:, _CELT_HDR:] = rng.integers(-8192, 8192, (B, W - _CELT_HDR),
                                      dtype=np.int16)
    return stg


def timed(fn, args, iters):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    o = out
    for _ in range(iters):
        o = fn(*o) if isinstance(o, tuple) else fn(o)
    jax.block_until_ready(o)
    return (time.time() - t0) / iters / K * 1000  # ms per frame


def probe(B, iters):
    stg = staging(B)
    stgK = jnp.asarray(np.broadcast_to(stg, (K,) + stg.shape).copy())
    res = {}

    # roll: the per-frame OPUS_MOVE decode_mem rewrite alone
    @jax.jit
    def p_roll(dmT):
        def f(d, _):
            return jnp.concatenate([d[:, N:, :], d[:, :N, :]],
                                   axis=1), 0
        d, _ = lax.scan(f, dmT, None, length=K)
        return (d,)
    res["roll"] = timed(p_roll, (jnp.zeros((1, L, B), jnp.int32),),
                        iters)

    # denorm: one-hot MXU denormalisation per frame
    @jax.jit
    def p_denorm(acc):
        def f(a, stg):
            s32 = stg.astype(jnp.int32)
            bandE = s32[:, _CELT_HDR:_CELT_HDR + 2 * NB_EBANDS] \
                .reshape(B, 2, NB_EBANDS)
            X_T = stg[:, _CELT_HDR + 2 * NB_EBANDS:].astype(jnp.int32) \
                .reshape(B, 1, 960).transpose(1, 2, 0)
            fq = denormalise_bands_T(X_T[0], bandE[:, 0], s32[:, 3],
                                     s32[:, 4], 8)
            return a + fq[0], 0
        a, _ = lax.scan(f, acc, stgK)
        return (a,)
    res["denorm"] = timed(p_denorm, (jnp.zeros((B,), jnp.int32),),
                          iters)

    # imdct: both transient variants + select (as the frame body runs)
    @jax.jit
    def p_imdct(hist):
        def f(h, stg):
            fq = stg[:, _CELT_HDR + 2 * NB_EBANDS:] \
                .astype(jnp.int32).T
            tr = stg[:, 2].astype(bool)
            rs = [celt_imdct_frame_T(fq, h, 3, t, interpret=INTERP)
                  for t in (False, True)]
            r = jnp.where(tr[None, :], rs[1], rs[0])
            return r[N:N + OVERLAP // 2], 0
        h, _ = lax.scan(f, hist, stgK)
        return (h,)
    res["imdct"] = timed(
        p_imdct, (jnp.zeros((OVERLAP // 2, B), jnp.int32),), iters)

    # comb: the per-lane delay Pallas kernel on the rolled buffer
    @jax.jit
    def p_comb(dcc):
        def f(d, stg):
            s32 = stg.astype(jnp.int32)
            sec = s32[:, 3:17].T
            c1 = tuple(sec[2 + k] for k in range(6))
            c2 = tuple(sec[8 + k] for k in range(6))
            d = comb_filter_step_T(d, DBS - N, N, c1, c2, chunk=13,
                                   interpret=INTERP)
            return d, 0
        d, _ = lax.scan(f, dcc, stgK)
        return (d,)
    res["comb"] = timed(p_comb, (jnp.zeros((L, B), jnp.int32),), iters)

    # deemph: IIR scan + PCM emit
    @jax.jit
    def p_deemph(pre):
        def f(p, stg):
            synT = stg[:, _CELT_HDR + 2 * NB_EBANDS:] \
                .astype(jnp.int32).T[None]
            pcmT, p2 = deemphasis_T(synT, p, interpret=INTERP)
            return p2, pcmT[0, 0]
        p, _ = lax.scan(f, pre, stgK)
        return (p,)
    res["deemph"] = timed(p_deemph, (jnp.zeros((B, 1), jnp.int32),),
                          iters)

    # full production superstep for reference
    dmS = jnp.zeros((1, L, B), jnp.int32)
    preS = jnp.zeros((B, 1), jnp.int32)

    def p_full(dmS, preS):
        _pcm, d, p = _celt_pool_superstep_T(
            dmS, preS, stgK, LM=3, C=1, CC=1, chunk=13, masked=False,
            interpret=INTERP)
        return d, p
    res["full"] = timed(p_full, (dmS, preS), iters)
    return res


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    out = {}
    Bs = [int(b) for b in sys.argv[2].split(",")] \
        if len(sys.argv) > 2 else (2048, 4096, 8192)
    for B in Bs:
        out[str(B)] = {k: round(v, 3) for k, v in probe(B, iters).items()}
        print(f"# B={B}: {out[str(B)]}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
