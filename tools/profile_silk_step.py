"""Sub-stage timing of the batched SILK device step on real TPU.

Isolates silk_core_frame's phases (rewhitening FIR, LTP chunk scan,
Pallas LPC) and the 48 kHz resampler so the next kernel rework aims at
the right stage. Run: python tools/profile_silk_step.py [B]
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=10, name=""):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    ms = (time.time() - t0) / iters * 1000
    print(f"{name:36s} {ms:9.3f} ms")
    return ms


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    np.asarray(jnp.zeros(4) + 1)
    from esp32_opus_player_tpu.ops.silk import jax_core as sjc

    fs = 16
    frame = 20 * fs
    subfr = 5 * fs
    ltp_mem = 20 * fs
    order = 16
    rng = np.random.default_rng(0)
    print(f"backend={jax.default_backend()} B={B} fs={fs}k")

    outBuf = jnp.asarray(rng.integers(-30000, 30000,
                                      (B, ltp_mem + frame), np.int32))
    sLPC = jnp.asarray(rng.integers(-(1 << 20), 1 << 20, (B, 16),
                                    np.int32))
    exc = jnp.asarray(rng.integers(-(1 << 16), 1 << 16, (B, frame),
                                   np.int32))
    A = jnp.asarray(rng.integers(-(1 << 12), 1 << 12, (B, 2, 16),
                                 np.int32))
    Bq = jnp.asarray(rng.integers(-(1 << 12), 1 << 12, (B, 4, 5),
                                  np.int32))
    gains = jnp.full((B, 4), 1 << 16, jnp.int32)
    inv = jnp.full((B, 4), 1 << 30, jnp.int32)
    lag = jnp.asarray(rng.integers(2 * fs + 3, 18 * fs - 3, (B, 4),
                                   np.int32))
    voiced = jnp.ones((B, 4), bool)
    rw = jnp.zeros((B, 4), bool).at[:, 0].set(True)
    adj = jnp.full((B, 4), 1 << 14, jnp.int32)
    match = jnp.ones((B, 4), bool)

    def full(outBuf, sLPC):
        return sjc.silk_core_frame(outBuf, sLPC, exc, A, Bq, gains, inv,
                                   lag, voiced, rw, adj, match,
                                   fs_khz=fs, nb_subfr=4, order=order)
    t_full = timeit(full, outBuf, sLPC, name="FULL silk_core_frame")

    # rewhitening FIR alone (4 windows)
    W = 18 * fs + 2 + 2

    @jax.jit
    def fir4(buf, Ak):
        outs = []
        for k in range(4):
            outs.append(sjc.lpc_analysis_tail(
                buf[:, :ltp_mem + k * subfr], Ak[:, 0], W, order))
        return outs
    timeit(fir4, outBuf, A, name="rewhitening FIR x4")

    # LTP chunk scan alone (one subframe's worth, 4x)
    CH = 14

    @jax.jit
    def ltp4(sltp_in, exc):
        n_chunks = (subfr + CH - 1) // CH
        excp = jnp.concatenate(
            [exc, jnp.zeros((B, CH), jnp.int32)], axis=-1)
        outs = []
        sltp = sltp_in
        for k in range(4):
            res = jnp.zeros((B, n_chunks * CH), jnp.int32)

            def ltp_chunk(carry, c):
                sltp, res = carry
                i0 = c * CH
                gidx0 = ltp_mem + k * subfr + i0
                wbase = gidx0 - lag[:, k][:, None] - 2
                win = jnp.take_along_axis(
                    sltp, wbase + jnp.arange(CH + 4,
                                             dtype=jnp.int32)[None, :],
                    axis=1)
                pred = 2 + jnp.zeros((B, CH), jnp.int32)
                for t in range(5):
                    tap = win[:, 4 - t:4 - t + CH]
                    pred = sjc.smlawb(pred, tap, Bq[:, k, t][:, None])
                exc_sl = jax.lax.dynamic_slice_in_dim(
                    excp, k * subfr + i0, CH, axis=-1)
                r = exc_sl + (pred << 1)
                sltp = jax.lax.dynamic_update_slice(
                    sltp, r << 1, (0, ltp_mem + k * subfr + i0))
                res = jax.lax.dynamic_update_slice(res, r, (0, i0))
                return (sltp, res), None

            (sltp, res), _ = jax.lax.scan(
                ltp_chunk, (sltp, res),
                jnp.arange(n_chunks, dtype=jnp.int32))
            outs.append(res)
        return outs
    sltp0 = jnp.zeros((B, ltp_mem + frame + CH), jnp.int32)
    timeit(ltp4, sltp0, exc, name="LTP chunk scan x4")

    # Pallas LPC alone
    from esp32_opus_player_tpu.ops.silk.pallas_core import lpc_synth_pallas
    pres = jnp.asarray(rng.integers(-(1 << 16), 1 << 16, (B, subfr),
                                    np.int32))

    @jax.jit
    def lpc4(pres, sLPC):
        outs = []
        for _ in range(4):
            vs, sLPC = lpc_synth_pallas(pres, A[:, 0, :order], sLPC,
                                        order=order)
            outs.append(vs)
        return outs, sLPC
    timeit(lpc4, pres, sLPC, name="Pallas LPC x4")

    # resampler
    sIIR = jnp.zeros((B, 6), jnp.int32)
    sFIR = jnp.zeros((B, 8), jnp.int32)
    delay = jnp.zeros((B, fs), jnp.int32)
    xq = jnp.asarray(rng.integers(-30000, 30000, (B, frame), np.int32))

    @jax.jit
    def rs(sIIR, sFIR, delay, xq):
        return sjc.resample_to_48k(sIIR, sFIR, delay, xq,
                                   fs_in_khz=fs, in_len=frame)
    timeit(rs, sIIR, sFIR, delay, xq, name="resample_to_48k")

    print(f"\nFULL core = {t_full:.2f} ms")


if __name__ == "__main__":
    main()
