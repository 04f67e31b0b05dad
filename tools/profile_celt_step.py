"""Per-stage timing breakdown of the packed CELT device step on the real TPU.

Times each sub-stage of celt_synth_step_dual (roll, denorm, iMDCT variants,
comb, deemphasis) as an isolated jitted program so we know where the
~23 us/row goes before fusing. Run standalone:

    python tools/profile_celt_step.py [B]
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def force_sync():
    np.asarray(jnp.zeros(4) + 1)


def timeit(fn, *args, iters=10, name=""):
    t0 = time.time()
    out = fn(*args)
    jax.block_until_ready(out)
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    ms = (time.time() - t0) / iters * 1000
    print(f"{name:34s} {ms:9.3f} ms   (compile {compile_s:.1f}s)")
    return ms


def timeit_carry(fn, state, iters=10, name=""):
    """For steps that DONATE their state args: rebind each call."""
    t0 = time.time()
    state = fn(*state)
    jax.block_until_ready(state)
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(iters):
        state = fn(*state)
    jax.block_until_ready(state)
    ms = (time.time() - t0) / iters * 1000
    print(f"{name:34s} {ms:9.3f} ms   (compile {compile_s:.1f}s)")
    return ms


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    from esp32_opus_player_tpu.models import batch_celt as bc
    from esp32_opus_player_tpu.models.stream_pool import (
        _CELT_HDR, _celt_pool_step_packed, NB_EBANDS)
    from esp32_opus_player_tpu.ops.celt import jax_synthesis as js
    from esp32_opus_player_tpu.ops.celt.pallas_fft import (
        celt_imdct_frame_pallas, fft_blocks_pallas)

    print(f"backend={jax.default_backend()} B={B}")
    force_sync()

    W = _CELT_HDR + 2 * NB_EBANDS + 960
    rng = np.random.default_rng(0)
    stg = np.zeros((B, W), dtype=np.int16)
    stg[:, 4] = 21
    stg[:, 5:7] = 200
    stg[:, 11:13] = 200
    stg[:, 7:9] = 12288
    stg[:, 13:15] = 12288
    stg[:, _CELT_HDR:] = rng.integers(-8192, 8192, (B, W - _CELT_HDR),
                                      dtype=np.int16)
    sdev = jnp.asarray(stg)
    st = bc.make_state(B, 1)
    dm, pre = st["decode_mem"], st["preemph"]

    # --- full step baseline (state is donated: carry it)
    def full(dm, pre):
        outs = _celt_pool_step_packed(dm, pre, sdev, LM=3, C=1, CC=1,
                                      chunk=62, identity=True)
        return outs[-2], outs[-1]
    total = timeit_carry(full, (dm, pre), name="FULL packed step")

    X = jnp.asarray(rng.integers(-8192, 8192, (B, 960), dtype=np.int32))
    bandE = jnp.asarray(rng.integers(0, 1200, (B, 21), dtype=np.int32))
    start = jnp.zeros(B, jnp.int32)
    end = jnp.full(B, 21, jnp.int32)
    freq = jnp.asarray(rng.integers(-(1 << 28), 1 << 28, (B, 960),
                                    dtype=np.int32))
    hist = jnp.asarray(rng.integers(-(1 << 20), 1 << 20, (B, 60),
                                    dtype=np.int32))
    buf = jnp.asarray(rng.integers(-(1 << 20), 1 << 20, (B, 2168),
                                   dtype=np.int32))
    T = jnp.full(B, 200, jnp.int32)
    g = jnp.full(B, 12288, jnp.int32)
    ts = jnp.zeros(B, jnp.int32)
    syn = jnp.asarray(rng.integers(-(1 << 20), 1 << 20, (B, 1, 960),
                                   dtype=np.int32))
    mem = jnp.zeros((B, 1), jnp.int32)

    timeit(jax.jit(lambda d: jnp.roll(d, -960, axis=-1)), dm,
           name="roll decode_mem")
    timeit(jax.jit(lambda X, e: js.denormalise_bands_b(X, e, start, end, 8)),
           X, bandE, name="denormalise")
    timeit(jax.jit(lambda f, h: celt_imdct_frame_pallas(f, h, 3, False)),
           freq, hist, name="iMDCT pallas non-transient")
    timeit(jax.jit(lambda f, h: celt_imdct_frame_pallas(f, h, 3, True)),
           freq, hist, name="iMDCT pallas transient")
    timeit(jax.jit(lambda f: fft_blocks_pallas(f.T, shift=0, Bblk=1)),
           freq, name="  fft kernel only (shift0)")
    timeit(jax.jit(lambda f: fft_blocks_pallas(f.T, shift=3, Bblk=8)),
           freq, name="  fft kernel only (shift3 x8)")

    def comb2(b):
        b = js.comb_filter_batch(b, 2048 - 960, 120, T, T, g, g, ts, ts,
                                 chunk=62)
        b = js.comb_filter_batch(b, 2048 - 960 + 120, 840, T, T, g, g,
                                 ts, ts, chunk=62)
        return b
    timeit(jax.jit(comb2), buf, name="comb x2 (chunk=62)")
    timeit(jax.jit(lambda s, m: js.deemphasis_batch(s, m)), syn, mem,
           name="deemphasis scan")

    print(f"\nFULL = {total:.2f} ms -> {B * 0.02 / (total / 1000):.0f} "
          f"realtime streams")


if __name__ == "__main__":
    main()
