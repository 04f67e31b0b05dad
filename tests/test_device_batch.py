"""Batched device-path bit-exactness: the JAX synthesis kernels must equal
the scalar fixed-point model sample-for-sample (BASELINE config 4 split).

Runs on the CPU backend (conftest); int32 semantics are identical on TPU.
"""
import numpy as np
import pytest

from esp32_opus_player_tpu.host import opusfile
from esp32_opus_player_tpu.host.packet import parse_packet
from esp32_opus_player_tpu.models.opus_decoder import OpusDecoder

from conftest import fixture_path


@pytest.mark.slow
def test_batched_celt_matches_scalar():
    from esp32_opus_player_tpu.models.batch_celt import BatchedCELTDecoder
    # drums fixture: mixes transient and long-block buckets across frames
    s = opusfile.open_file(fixture_path("celt_fb_mono_drums_20ms"))
    sdec = OpusDecoder(1, compat_ref=True)
    n_frames = 8
    scalar = [sdec.decode(j.data) for j in s.jobs[:n_frames]]
    B = 3
    bdec = BatchedCELTDecoder(B, 1, compat_ref=True)
    for j in range(n_frames):
        pkt = parse_packet(s.jobs[j].data).frames[0]
        pcm = bdec.decode_frames([pkt] * B)
        for b in range(B):
            assert np.array_equal(pcm[b, 0], scalar[j][:, 0]), \
                f"frame {j} stream {b}"


@pytest.mark.slow
def test_batched_silk_matches_scalar():
    from esp32_opus_player_tpu.models.batch_silk import BatchedSilkDecoder
    s = opusfile.open_file(fixture_path("silk_wb_mono_20ms"))
    sdec = OpusDecoder(1, compat_ref=True)
    n_frames = 10
    scalar = [sdec.decode(j.data) for j in s.jobs[:n_frames]]
    B = 2
    bdec = BatchedSilkDecoder(B, fs_khz=16, payload_ms=20)
    for j in range(n_frames):
        pkt = parse_packet(s.jobs[j].data).frames[0]
        pcm = bdec.decode_frames([pkt] * B)
        for b in range(B):
            assert np.array_equal(pcm[b], scalar[j][:, 0]), \
                f"frame {j} stream {b}"


def test_multichip_dryrun_entry():
    import sys
    import pathlib
    sys.path.insert(0, str(pathlib.Path(__file__).parents[1]))
    import __graft_entry__ as g
    import jax
    if len(jax.devices()) >= 8:
        g.dryrun_multichip(8)
    else:
        pytest.skip("needs 8 virtual devices")


def test_pallas_deemphasis_matches_scan():
    import jax.numpy as jnp
    from esp32_opus_player_tpu.ops.celt.jax_synthesis import \
        deemphasis_batch
    from esp32_opus_player_tpu.ops.celt.pallas_kernels import \
        deemphasis_pallas
    rng = np.random.default_rng(1)
    syn = jnp.asarray(rng.integers(-30000000, 30000000, (16, 2, 960)),
                      dtype=jnp.int32)
    mem = jnp.asarray(rng.integers(-100000, 100000, (16, 2)),
                      dtype=jnp.int32)
    p1, m1 = deemphasis_batch(syn, mem)
    p2, m2 = deemphasis_pallas(syn, mem, interpret=True)
    assert jnp.array_equal(p1, p2) and jnp.array_equal(m1, m2)


@pytest.mark.parametrize("chunk", [13, 62])
def test_comb_filter_chunk_variants_match_scalar(chunk):
    """comb_filter_batch's feedback-safe chunk is a pure speed knob: the
    large-chunk (62) variant the pool selects on TPU when min(T) >= 64
    must be bit-identical to the always-safe 13 chunking AND to the
    scalar reference comb (src/celt.cpp:848). Random lags are drawn
    >= 64 so chunk=62 is legal."""
    import jax.numpy as jnp
    from esp32_opus_player_tpu.ops.celt import synthesis as ss
    from esp32_opus_player_tpu.ops.celt.jax_synthesis import \
        comb_filter_batch
    rng = np.random.default_rng(7)
    B, L, start, N = 8, 2168, 2048 - 960, 960
    buf = rng.integers(-(1 << 24), 1 << 24, (B, L)).astype(np.int64)
    T0 = rng.integers(64, 1024, B).astype(np.int32)
    T1 = rng.integers(64, 1024, B).astype(np.int32)
    g0 = rng.integers(0, 32768, B).astype(np.int32)
    g1 = rng.integers(0, 32768, B).astype(np.int32)
    t0 = rng.integers(0, 3, B).astype(np.int32)
    t1 = rng.integers(0, 3, B).astype(np.int32)
    got = comb_filter_batch(
        jnp.asarray(buf, jnp.int32), start, N,
        jnp.asarray(T0), jnp.asarray(T1), jnp.asarray(g0),
        jnp.asarray(g1), jnp.asarray(t0), jnp.asarray(t1), chunk=chunk)
    got = np.asarray(got)
    for b in range(B):
        ref = buf[b].copy()
        ss.comb_filter(ref, start, start, int(T0[b]), int(T1[b]), N,
                       int(g0[b]), int(g1[b]), int(t0[b]), int(t1[b]))
        assert np.array_equal(got[b], ref.astype(np.int32)), b


@pytest.mark.parametrize("LM,transient", [(3, False), (3, True),
                                          (2, False), (1, False),
                                          (1, True), (0, False)])
def test_pallas_fft_imdct_matches_xla(LM, transient):
    """The in-VMEM Pallas FFT core must reproduce the XLA iMDCT path
    bit-exactly (interpret mode here; tools/check_pallas_tpu.py runs
    the same comparison compiled on a real chip)."""
    import jax.numpy as jnp
    from esp32_opus_player_tpu.ops.celt import jax_synthesis as js
    from esp32_opus_player_tpu.ops.celt.pallas_fft import \
        celt_imdct_frame_pallas
    rng = np.random.default_rng(2)
    B = 8
    N = 120 << LM
    freq = jnp.asarray(rng.integers(-(1 << 20), 1 << 20, (B, N)),
                       dtype=jnp.int32)
    hist = jnp.asarray(rng.integers(-(1 << 20), 1 << 20, (B, 60)),
                       dtype=jnp.int32)
    ref = js.celt_imdct_frame(freq, hist, LM, transient)
    got = celt_imdct_frame_pallas(freq, hist, LM, transient,
                                  interpret=True)
    assert jnp.array_equal(ref, got)


@pytest.mark.parametrize("downsample", [2, 3, 6])
def test_deemphasis_downsample_matches_scalar(downsample):
    """Device-side output decimation (48k -> 24/16/8 kHz) must match the
    scalar deemphasis' scratch-then-decimate structure
    (reference src/celt.cpp:1988-2055)."""
    import jax.numpy as jnp
    from esp32_opus_player_tpu.ops.celt import synthesis as ss
    from esp32_opus_player_tpu.ops.celt.jax_synthesis import \
        deemphasis_batch
    rng = np.random.default_rng(3)
    B, N = 4, 960
    syn = rng.integers(-30000000, 30000000, (B, 1, N)).astype(np.int64)
    mem0 = rng.integers(-100000, 100000, (B, 1))
    pcm_b, mem_b = deemphasis_batch(
        jnp.asarray(syn, jnp.int32), jnp.asarray(mem0, jnp.int32),
        downsample=downsample)
    for b in range(B):
        pcm_s = np.zeros(N // downsample, dtype=np.int32)
        mem_s = [int(mem0[b, 0])]
        ss.deemphasis([(syn[b, 0], 0)], pcm_s, N, 1, downsample, mem_s)
        assert np.array_equal(np.asarray(pcm_b)[b, 0], pcm_s)
        assert int(np.asarray(mem_b)[b, 0]) == mem_s[0]


def test_pallas_lpc_synth_matches_scan():
    """The in-VMEM LPC recurrence kernel vs the lax.scan expression."""
    import jax.numpy as jnp
    from esp32_opus_player_tpu.ops.silk import jax_core as sjc
    from esp32_opus_player_tpu.ops.silk.pallas_core import \
        lpc_synth_pallas
    rng = np.random.default_rng(5)
    B, n, order = 8, 80, 16
    pres = jnp.asarray(rng.integers(-(1 << 24), 1 << 24, (B, n)),
                       jnp.int32)
    A = jnp.asarray(rng.integers(-20000, 20000, (B, order)), jnp.int32)
    st0 = jnp.asarray(rng.integers(-(1 << 24), 1 << 24, (B, 16)),
                      jnp.int32)

    def ref_scan(pres, A, st0):
        def step(state, x):
            pred = jnp.full((B,), order >> 1, jnp.int32)
            for j in range(order):
                pred = sjc.smlawb(pred, state[:, 15 - j], A[:, j])
            v = sjc.add_sat32(x, sjc.lshift_sat32(pred, 4))
            return jnp.concatenate([state[:, 1:], v[:, None]], 1), v
        st, vs = __import__("jax").lax.scan(
            step, st0, jnp.moveaxis(pres, -1, 0))
        return jnp.moveaxis(vs, 0, -1), st

    vr, sr = ref_scan(pres, A, st0)
    vp, sp_ = lpc_synth_pallas(pres, A, st0, order=order, interpret=True)
    assert jnp.array_equal(vr, vp) and jnp.array_equal(sr, sp_)


def test_pallas_up2_matches_scan():
    import jax.numpy as jnp
    from esp32_opus_player_tpu.ops.silk.jax_core import up2_hq_scan
    from esp32_opus_player_tpu.ops.silk.pallas_core import up2_hq_pallas
    rng = np.random.default_rng(6)
    B, n = 8, 144   # non-multiple of the 20-sample kernel block
    inp = jnp.asarray(rng.integers(-30000, 30000, (B, n)), jnp.int32)
    S = jnp.asarray(rng.integers(-(1 << 20), 1 << 20, (B, 6)), jnp.int32)
    o1, s1 = up2_hq_scan(S, inp)
    o2, s2 = up2_hq_pallas(S, inp, interpret=True)
    assert jnp.array_equal(o1, o2) and jnp.array_equal(s1, s2)


@pytest.mark.parametrize("fs,nb,order", [(16, 4, 16), (12, 4, 16),
                                         (8, 4, 10), (16, 2, 16)])
def test_pallas_silk_core_matches_xla(fs, nb, order):
    """The fused whole-core SILK kernel (silk_core_pallas: rewhitening
    FIR + bit-shift LTP recurrence + LPC ring, one VMEM program) must
    be bit-exact vs the XLA silk_core_frame across voiced/unvoiced
    rows, rewhiten/rescale/no-adj combinations and all rates (interpret
    mode here; tools/check_pallas_tpu.py compiles it on silicon)."""
    from esp32_opus_player_tpu.ops.silk.jax_core import silk_core_frame
    from esp32_opus_player_tpu.ops.silk.pallas_core import \
        silk_core_pallas

    import jax.numpy as jnp
    rng = np.random.default_rng(42 + fs + nb)
    B = 5
    subfr = 5 * fs
    frame = nb * subfr
    ltp_mem = 20 * fs
    outBuf = jnp.asarray(rng.integers(-30000, 30000,
                                      (B, ltp_mem + frame), np.int32))
    sLPC = jnp.asarray(rng.integers(-(1 << 20), 1 << 20, (B, 16),
                                    np.int32))
    exc = jnp.asarray(rng.integers(-(1 << 16), 1 << 16, (B, frame),
                                   np.int32))
    A = jnp.asarray(rng.integers(-(1 << 12), 1 << 12, (B, 2, 16),
                                 np.int32))
    Bq = jnp.asarray(rng.integers(-(1 << 12), 1 << 12, (B, nb, 5),
                                  np.int32))
    gains = jnp.asarray(rng.integers(1 << 14, 1 << 20, (B, nb),
                                     np.int32))
    inv = jnp.asarray(rng.integers(1 << 24, 1 << 30, (B, nb), np.int32))
    lag = jnp.asarray(rng.integers(2 * fs, 18 * fs + 1, (B, nb),
                                   np.int32))
    voiced = jnp.asarray(rng.integers(0, 2, (B, nb)).astype(bool)
                         ).at[0].set(True).at[1].set(False)
    rw = jnp.asarray(rng.integers(0, 2, (B, nb)).astype(bool))
    adj = jnp.asarray(rng.integers(1 << 14, 1 << 17, (B, nb), np.int32))
    match = jnp.asarray(rng.integers(0, 2, (B, nb)).astype(bool))

    args = (outBuf, sLPC, exc, A, Bq, gains, inv, lag, voiced, rw, adj,
            match)
    kw = dict(fs_khz=fs, nb_subfr=nb, order=order)
    xq_ref, st_ref = silk_core_frame(*args, **kw)
    xq_p, st_p = silk_core_pallas(*args, **kw, interpret=True)
    assert np.array_equal(np.asarray(xq_p), np.asarray(xq_ref))
    assert np.array_equal(np.asarray(st_p), np.asarray(st_ref))


def test_pallas_plc_conceal_and_cng_match_xla():
    """The fused PLC conceal kernel and the CNG-add ring kernel must be
    bit-exact vs their XLA reference bodies (interpret mode; silicon via
    tools/check_pallas_tpu.py)."""
    import jax.numpy as jnp
    import jax
    from esp32_opus_player_tpu.ops.silk import jax_plc as jp
    from esp32_opus_player_tpu.ops.silk.pallas_core import (
        cng_add_pallas, silk_plc_conceal_pallas)

    rng = np.random.default_rng(7)
    for fs, order in ((16, 16), (8, 10)):
        B, nb = 4, 4
        frame = nb * 5 * fs
        lm = 20 * fs
        outBuf = jnp.asarray(rng.integers(-30000, 30000,
                                          (B, lm + frame), np.int32))
        sLPC = jnp.asarray(rng.integers(-(1 << 20), 1 << 20, (B, 16),
                                        np.int32))
        rand = jnp.asarray(rng.integers(-(1 << 14), 1 << 14, (B, frame),
                                        np.int32))
        A = jnp.asarray(rng.integers(-(1 << 12), 1 << 12, (B, 16),
                                     np.int32))
        B4 = jnp.asarray(rng.integers(-(1 << 12), 1 << 12, (B, 4, 5),
                                      np.int32))
        lag4 = jnp.asarray(rng.integers(2 * fs, 18 * fs + 1, (B, 4),
                                        np.int32))
        inv = jnp.asarray(rng.integers(1 << 24, 1 << 30, B, np.int32))
        pg = jnp.asarray(rng.integers(1 << 10, 1 << 16, B, np.int32))
        kw = dict(fs_khz=fs, nb_subfr=nb, order=order)
        xr, sr = jp.silk_plc_conceal_frame(outBuf, sLPC, rand,
                                           A[:, :order], B4, lag4, inv,
                                           pg, **kw)
        xp, sp = silk_plc_conceal_pallas(outBuf, sLPC, rand,
                                         A[:, :order], B4, lag4, inv,
                                         pg, **kw, interpret=True)
        assert np.array_equal(np.asarray(xp), np.asarray(xr)), fs
        assert np.array_equal(np.asarray(sp), np.asarray(sr)), fs

        xq = jnp.asarray(rng.integers(-30000, 30000, (B, frame),
                                      np.int32))
        exc = jnp.asarray(rng.integers(-(1 << 16), 1 << 16, (B, frame),
                                       np.int32))
        gain = jnp.asarray(rng.integers(1 << 8, 1 << 14, B, np.int32))
        st0 = jnp.asarray(rng.integers(-(1 << 18), 1 << 18, (B, 16),
                                       np.int32))
        msk = jnp.asarray([True, False, True, True])
        o1, s1 = jp.cng_add(xq, exc, A[:, :order], gain, st0, msk,
                            frame=frame, order=order)
        o2, s2 = cng_add_pallas(xq, exc, A[:, :order], gain, st0, msk,
                                frame=frame, order=order,
                                interpret=True)
        assert np.array_equal(np.asarray(o2), np.asarray(o1)), fs
        assert np.array_equal(np.asarray(s2), np.asarray(s1)), fs
