"""Real-hardware Pallas kernel checker (run with the TPU platform).

Compiles the in-VMEM FFT/deemphasis kernels on the attached TPU (no
interpret mode) and verifies bit-exactness against the XLA paths for
every (LM, transient) iMDCT variant. The pytest suite runs the same
comparisons in interpret mode on the CPU backend; this script is the
on-silicon proof.

Usage: python tools/check_pallas_tpu.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main():
    from esp32_opus_player_tpu.ops.celt import jax_synthesis as js
    from esp32_opus_player_tpu.ops.celt.pallas_fft import \
        celt_imdct_frame_pallas
    from esp32_opus_player_tpu.ops.celt.pallas_kernels import \
        deemphasis_pallas

    backend = jax.default_backend()
    print(f"backend: {backend} ({jax.devices()[0]})")
    if backend != "tpu":
        print("WARNING: not a TPU — kernels will run via interpret "
              "lowering only in the pytest suite; this script expects "
              "real hardware")
    rng = np.random.default_rng(0)
    B = 256
    failed = 0
    for LM in (3, 2, 1, 0):
        for tr in ((False, True) if LM else (False,)):
            N = 120 << LM
            freq = jnp.asarray(rng.integers(-(1 << 20), 1 << 20, (B, N)),
                               jnp.int32)
            hist = jnp.asarray(rng.integers(-(1 << 20), 1 << 20, (B, 60)),
                               jnp.int32)
            ref = np.asarray(js.celt_imdct_frame(freq, hist, LM, tr))
            got = np.asarray(celt_imdct_frame_pallas(freq, hist, LM, tr))
            ok = np.array_equal(ref, got)
            failed += not ok
            print(f"imdct LM={LM} transient={tr}: "
                  f"{'BIT-EXACT' if ok else 'MISMATCH'}")
    syn = jnp.asarray(rng.integers(-(1 << 24), 1 << 24, (B, 2, 960)),
                      jnp.int32)
    mem = jnp.asarray(rng.integers(-100000, 100000, (B, 2)), jnp.int32)
    p1, m1 = js.deemphasis_batch(syn, mem)
    p2, m2 = deemphasis_pallas(syn, mem)
    ok = (np.array_equal(np.asarray(p1), np.asarray(p2))
          and np.array_equal(np.asarray(m1), np.asarray(m2)))
    failed += not ok
    print(f"deemphasis: {'BIT-EXACT' if ok else 'MISMATCH'}")
    # comb chunk variants: the pool flips between 13 and 62 on TPU —
    # both must agree compiled on silicon (lags drawn >= 64 so 62 is
    # feedback-safe)
    buf = jnp.asarray(rng.integers(-(1 << 24), 1 << 24, (B, 2168)),
                      jnp.int32)
    T0 = jnp.asarray(rng.integers(64, 1024, B), jnp.int32)
    T1 = jnp.asarray(rng.integers(64, 1024, B), jnp.int32)
    g0 = jnp.asarray(rng.integers(0, 32768, B), jnp.int32)
    g1 = jnp.asarray(rng.integers(0, 32768, B), jnp.int32)
    t0 = jnp.asarray(rng.integers(0, 3, B), jnp.int32)
    t1 = jnp.asarray(rng.integers(0, 3, B), jnp.int32)
    outs = [np.asarray(js.comb_filter_batch(
        buf, 2048 - 960, 960, T0, T1, g0, g1, t0, t1, chunk=c))
        for c in (13, 62)]
    ok = np.array_equal(outs[0], outs[1])
    failed += not ok
    print(f"comb chunk 13 vs 62: {'BIT-EXACT' if ok else 'MISMATCH'}")
    # fused SILK core kernel vs the XLA reference path, on silicon
    from esp32_opus_player_tpu.ops.silk.jax_core import \
        silk_core_frame_xla
    from esp32_opus_player_tpu.ops.silk.pallas_core import \
        silk_core_pallas
    for fs, nb, order in ((16, 4, 16), (12, 4, 16), (8, 4, 10),
                          (16, 2, 16)):
        subfr, ltp_mem = 5 * fs, 20 * fs
        frame = nb * subfr
        ob = jnp.asarray(rng.integers(-30000, 30000,
                                      (B, ltp_mem + frame)), jnp.int32)
        sl = jnp.asarray(rng.integers(-(1 << 20), 1 << 20, (B, 16)),
                         jnp.int32)
        exc = jnp.asarray(rng.integers(-(1 << 16), 1 << 16, (B, frame)),
                          jnp.int32)
        A = jnp.asarray(rng.integers(-(1 << 12), 1 << 12, (B, 2, 16)),
                        jnp.int32)
        Bq = jnp.asarray(rng.integers(-(1 << 12), 1 << 12, (B, nb, 5)),
                         jnp.int32)
        gains = jnp.asarray(rng.integers(1 << 14, 1 << 20, (B, nb)),
                            jnp.int32)
        inv = jnp.asarray(rng.integers(1 << 24, 1 << 30, (B, nb)),
                          jnp.int32)
        lag = jnp.asarray(rng.integers(2 * fs, 18 * fs + 1, (B, nb)),
                          jnp.int32)
        voiced = jnp.asarray(rng.integers(0, 2, (B, nb)).astype(bool))
        rw = jnp.asarray(rng.integers(0, 2, (B, nb)).astype(bool))
        adj = jnp.asarray(rng.integers(1 << 14, 1 << 17, (B, nb)),
                          jnp.int32)
        match = jnp.asarray(rng.integers(0, 2, (B, nb)).astype(bool))
        args = (ob, sl, exc, A, Bq, gains, inv, lag, voiced, rw, adj,
                match)
        kw = dict(fs_khz=fs, nb_subfr=nb, order=order)
        xr, sr = silk_core_frame_xla(*args, **kw)
        xp, sp = silk_core_pallas(*args, **kw)
        ok = (np.array_equal(np.asarray(xr), np.asarray(xp))
              and np.array_equal(np.asarray(sr), np.asarray(sp)))
        failed += not ok
        print(f"silk core fs={fs} nb={nb} order={order}: "
              f"{'BIT-EXACT' if ok else 'MISMATCH'}")
    # PLC conceal + CNG kernels vs their XLA bodies, on silicon
    from esp32_opus_player_tpu.ops.silk import jax_plc as jp
    from esp32_opus_player_tpu.ops.silk.pallas_core import (
        cng_add_pallas, silk_plc_conceal_pallas)
    for fs, order in ((16, 16), (12, 16), (8, 10)):
        nbs, frame, lm = 4, 4 * 5 * fs, 20 * fs
        ob = jnp.asarray(rng.integers(-30000, 30000, (B, lm + frame)),
                         jnp.int32)
        sl = jnp.asarray(rng.integers(-(1 << 20), 1 << 20, (B, 16)),
                         jnp.int32)
        rand = jnp.asarray(rng.integers(-(1 << 14), 1 << 14, (B, frame)),
                           jnp.int32)
        A = jnp.asarray(rng.integers(-(1 << 12), 1 << 12, (B, order)),
                        jnp.int32)
        B4 = jnp.asarray(rng.integers(-(1 << 12), 1 << 12, (B, 4, 5)),
                         jnp.int32)
        lag4 = jnp.asarray(rng.integers(2 * fs, 18 * fs + 1, (B, 4)),
                           jnp.int32)
        inv = jnp.asarray(rng.integers(1 << 24, 1 << 30, B), jnp.int32)
        pg = jnp.asarray(rng.integers(1 << 10, 1 << 16, B), jnp.int32)
        kw = dict(fs_khz=fs, nb_subfr=nbs, order=order)
        xr, sr = jp.silk_plc_conceal_frame_xla(ob, sl, rand, A, B4,
                                               lag4, inv, pg, **kw)
        xp, sp = silk_plc_conceal_pallas(ob, sl, rand, A, B4, lag4,
                                         inv, pg, **kw)
        ok = (np.array_equal(np.asarray(xr), np.asarray(xp))
              and np.array_equal(np.asarray(sr), np.asarray(sp)))
        failed += not ok
        print(f"plc conceal fs={fs}: "
              f"{'BIT-EXACT' if ok else 'MISMATCH'}")
        xq = jnp.asarray(rng.integers(-30000, 30000, (B, frame)),
                         jnp.int32)
        exc = jnp.asarray(rng.integers(-(1 << 16), 1 << 16, (B, frame)),
                          jnp.int32)
        gain = jnp.asarray(rng.integers(1 << 8, 1 << 14, B), jnp.int32)
        msk = jnp.asarray(rng.integers(0, 2, B).astype(bool))
        o1, s1 = jp.cng_add_xla(xq, exc, A, gain, sl, msk, frame=frame,
                                order=order)
        o2, s2 = cng_add_pallas(xq, exc, A, gain, sl, msk, frame=frame,
                                order=order)
        ok = (np.array_equal(np.asarray(o1), np.asarray(o2))
              and np.array_equal(np.asarray(s1), np.asarray(s2)))
        failed += not ok
        print(f"cng add fs={fs}: {'BIT-EXACT' if ok else 'MISMATCH'}")
    if failed:
        sys.exit(f"{failed} kernel comparison(s) FAILED")
    print("all Pallas kernels bit-exact on", backend)


if __name__ == "__main__":
    main()
