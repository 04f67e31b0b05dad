"""Transposed-layout pool fast mode (StreamPool._t_mode): the identity
full-pool step with on-device masking must match the scalar decode
bit-exactly, including lost packets (state untouched, silence out) and
early stream exhaustion. Forced on the CPU backend via OTPU_T_MODE=1
with interpret-mode kernels (slow — a few steps only)."""
import numpy as np
import pytest

from conftest import fixture_path


@pytest.mark.slow
def test_tmode_pool_prefix_and_loss(monkeypatch):
    monkeypatch.setenv("OTPU_T_MODE", "1")
    from esp32_opus_player_tpu import DecoderConfig, decode_file
    from esp32_opus_player_tpu.models.opus_decoder import OpusDecoder
    from esp32_opus_player_tpu.host import opusfile
    from esp32_opus_player_tpu.models.stream_pool import StreamPool
    src = str(fixture_path("celt_fb_mono_20ms"))
    pool = StreamPool([src] * 3, channels=1, native=True,
                      compat_ref=True)
    assert pool._t_mode
    # stream 2 loses packet 1: silence out, state untouched (the
    # reference pruned celt_decode_lost) -> masked device row
    for k in range(5):
        pool.step(lost={2} if k == 1 else None)
    pool._flush()
    ref = decode_file(src, DecoderConfig(channels=1, compat_ref=True))
    got = np.concatenate(pool.pcm_out[0])
    assert np.array_equal(got, ref[:got.shape[0]])
    # lossy stream: scalar equivalent = decode with packet 1 skipped
    # as silence and decoder state untouched for that frame
    s = opusfile.open_file(src)
    dec = OpusDecoder(1, compat_ref=True)
    exp = []
    for k, job in enumerate(s.jobs[:5]):
        if k == 1:
            pcm = np.zeros((960, 1), np.int16)
        else:
            pcm = dec.decode(job.data)
        lo, te = job.discard_front, job.trim_end
        exp.append(pcm[lo:pcm.shape[0] - te])
    exp = np.concatenate(exp)
    got2 = np.concatenate(pool.pcm_out[2])
    assert np.array_equal(got2, exp)


@pytest.mark.slow
def test_tmode_superstep_bitexact(monkeypatch):
    """K-frame superstep (superstep_k=3): frames buffer into ONE
    K-frame device program (lax.scan) and must match the per-frame
    transposed path bit-exactly, including a lost packet mid-window, a
    partial final window (pipeline drain pads with inactive frames),
    and PCM routed per frame out of the cached K-frame fetch."""
    monkeypatch.setenv("OTPU_T_MODE", "1")
    from esp32_opus_player_tpu import DecoderConfig, decode_file
    from esp32_opus_player_tpu.models.stream_pool import StreamPool
    src = str(fixture_path("celt_fb_mono_20ms"))
    pool = StreamPool([src] * 2, channels=1, native=True,
                      compat_ref=True, superstep_k=3)
    assert pool._t_mode and pool._ss_k == 3
    for k in range(7):      # 2 full windows + 1-frame partial window
        pool.step(lost={1} if k == 2 else None)
    pool._flush()
    ref = decode_file(src, DecoderConfig(channels=1, compat_ref=True))
    got = np.concatenate(pool.pcm_out[0])
    assert np.array_equal(got, ref[:got.shape[0]])
    # the lossy stream: frame 2 is silence with state untouched
    pool2 = StreamPool([src], channels=1, native=True, compat_ref=True)
    for k in range(7):
        pool2.step(lost={0} if k == 2 else None)
    pool2._flush()
    assert np.array_equal(np.concatenate(pool.pcm_out[1]),
                          np.concatenate(pool2.pcm_out[0]))


@pytest.mark.slow
def test_silk_superstep_bitexact():
    """K-frame SILK superstep (uniform mono-SILK pool, superstep_k=3):
    frames buffer into ONE K-frame device program (lax.scan over
    _silk_step_body) and must match the per-frame pool bit-exactly,
    including fixed_buckets capacity padding and a partial final
    window (inactive pad frames leave the state untouched)."""
    from esp32_opus_player_tpu import DecoderConfig, decode_file
    from esp32_opus_player_tpu.models.stream_pool import StreamPool
    src = str(fixture_path("silk_wb_mono_20ms"))
    pool = StreamPool([src] * 3, channels=1, native=True,
                      compat_ref=True, fixed_buckets=True, superstep_k=3)
    assert pool._ss_silk and pool._ss_k == 3
    outs = pool.run()
    ref = decode_file(src, DecoderConfig(channels=1, compat_ref=True))
    for o in outs:
        assert np.array_equal(o, ref)


@pytest.mark.slow
def test_silk_superstep_loss_in_window():
    """Lossy steps stay INSIDE the K-frame window: every stream lost at
    the same step buffers a conceal-only window frame (the create path)
    and the window keeps filling — output must equal the per-frame
    rfc_plc pool replaying the same losses."""
    from esp32_opus_player_tpu.models.stream_pool import StreamPool
    src = str(fixture_path("silk_wb_mono_20ms"))
    loss = lambda i, k: k in (4, 11)
    pool = StreamPool([src] * 2, channels=1, native=True,
                      compat_ref=False, rfc_plc=True,
                      fixed_buckets=True, superstep_k=3)
    assert pool._ss_silk and pool._ss_silk1
    outs = pool.run(loss=loss)
    assert ("silk_plc_ss", 16, 20, pool._cap_silk[16]) \
        in pool.stats()["buckets"]
    ref_pool = StreamPool([src] * 2, channels=1, native=True,
                          compat_ref=False, rfc_plc=True,
                          fixed_buckets=True)
    refs = ref_pool.run(loss=loss)
    for o, r in zip(outs, refs):
        assert np.array_equal(o, r)


@pytest.mark.slow
def test_silk_superstep_mixed_loss_joins_frame():
    """Steps where SOME rows are lost and others decode: the conceal
    rows take over the staged good-frame's pad rows (join path) — one
    shared window frame per step, per-row masked dual-path program.
    Covers bursts (deepening lossCnt), glue on recovery, CNG state
    across the run, and a burst crossing a window boundary."""
    from esp32_opus_player_tpu.models.stream_pool import StreamPool
    src = str(fixture_path("silk_wb_mono_20ms"))
    pat = {0: {4, 11}, 1: {5, 6, 7}, 2: set(), 3: {2, 3, 14}}
    loss = lambda i, k: k in pat[i]
    pool = StreamPool([src] * 4, channels=1, native=True,
                      compat_ref=False, rfc_plc=True,
                      fixed_buckets=True, superstep_k=3)
    assert pool._ss_silk1
    outs = pool.run(loss=loss)
    ref_pool = StreamPool([src] * 4, channels=1, native=True,
                          compat_ref=False, rfc_plc=True,
                          fixed_buckets=True)
    refs = ref_pool.run(loss=loss)
    for i, (o, r) in enumerate(zip(outs, refs)):
        assert np.array_equal(o, r), f"stream {i}"


@pytest.mark.slow
def test_silk_superstep_loss_with_fec():
    """FEC-recovered rows decode (LBRR symbols) while unrecoverable
    ones conceal — both inside the superstep window."""
    from esp32_opus_player_tpu.models.stream_pool import StreamPool
    src = str(fixture_path("silk_wb_fec_mono_20ms"))
    loss = lambda i, k: k > 0 and k % 5 == (1 if i == 0 else 2)
    pool = StreamPool([src] * 2, channels=1, native=True,
                      compat_ref=False, rfc_plc=True,
                      fixed_buckets=True, superstep_k=3)
    assert pool._ss_silk1
    outs = pool.run(loss=loss, fec=True)
    ref_pool = StreamPool([src] * 2, channels=1, native=True,
                          compat_ref=False, rfc_plc=True,
                          fixed_buckets=True)
    refs = ref_pool.run(loss=loss, fec=True)
    for i, (o, r) in enumerate(zip(outs, refs)):
        assert np.array_equal(o, r), f"stream {i}"


@pytest.mark.slow
def test_silk2_superstep_loss_in_window():
    """STEREO lossy steps stay inside the silk2 K-frame window: mixed
    per-stream losses join the staged frame (pad-row takeover), an
    all-lost step becomes a conceal-only window frame; side conceals
    only when the previous frame had one, MS->LR keeps the previous
    predictors. Bit-exact vs the per-frame stereo rfc_plc pool."""
    from esp32_opus_player_tpu.models.stream_pool import StreamPool
    src = str(fixture_path("silk_wb_stereo_20ms"))
    pat = {0: {4, 5, 11}, 1: {4, 7}, 2: set()}
    loss = lambda i, k: k in pat[i]
    pool = StreamPool([src] * 3, channels=2, native=True,
                      compat_ref=False, rfc_plc=True,
                      fixed_buckets=True, superstep_k=3)
    assert pool._ss_silk and pool._ss_silk2
    outs = pool.run(loss=loss)
    ref_pool = StreamPool([src] * 3, channels=2, native=True,
                          compat_ref=False, rfc_plc=True,
                          fixed_buckets=True)
    refs = ref_pool.run(loss=loss)
    for i, (o, r) in enumerate(zip(outs, refs)):
        assert np.array_equal(o, r), f"stream {i}"
    # all-lost steps too (conceal-only window frames)
    loss2 = lambda i, k: k in (3, 4)
    pool2 = StreamPool([src] * 2, channels=2, native=True,
                       compat_ref=False, rfc_plc=True,
                       fixed_buckets=True, superstep_k=3)
    outs2 = pool2.run(loss=loss2)
    ref2 = StreamPool([src] * 2, channels=2, native=True,
                      compat_ref=False, rfc_plc=True,
                      fixed_buckets=True).run(loss=loss2)
    for i, (o, r) in enumerate(zip(outs2, ref2)):
        assert np.array_equal(o, r), f"stream {i}"


@pytest.mark.slow
def test_silk_superstep_multiframe_loss_still_flushes():
    """Lost 40 ms packets conceal 2 internal frames (deepening
    lossCnt) — multi-frame conceals keep the window-flush path and
    stay bit-exact."""
    from esp32_opus_player_tpu.models.stream_pool import StreamPool
    src = str(fixture_path("silk_wb_mono_40ms"))
    loss = lambda i, k: k in (3, 9)
    pool = StreamPool([src] * 2, channels=1, native=True,
                      compat_ref=False, rfc_plc=True,
                      fixed_buckets=True, superstep_k=3)
    assert pool._ss_silk
    outs = pool.run(loss=loss)
    ref_pool = StreamPool([src] * 2, channels=1, native=True,
                          compat_ref=False, rfc_plc=True,
                          fixed_buckets=True)
    refs = ref_pool.run(loss=loss)
    for o, r in zip(outs, refs):
        assert np.array_equal(o, r)


@pytest.mark.slow
def test_silk_superstep_out_fs():
    """Superstep + out_fs compose: the K-frame program resamples to the
    pool rate."""
    from esp32_opus_player_tpu import DecoderConfig, decode_file
    from esp32_opus_player_tpu.models.stream_pool import StreamPool
    src = str(fixture_path("silk_wb_mono_20ms"))
    pool = StreamPool([src] * 2, channels=1, native=True,
                      compat_ref=True, fixed_buckets=True,
                      superstep_k=4, out_fs=16000)
    assert pool._ss_silk
    outs = pool.run()
    ref = decode_file(src, DecoderConfig(channels=1, sample_rate=16000,
                                         compat_ref=True))
    for o in outs:
        assert np.array_equal(o, ref)


@pytest.mark.slow
def test_silk2_superstep_bitexact():
    """K-frame STEREO-SILK superstep (uniform silk2 pool,
    superstep_k=3): frames buffer into ONE K-frame device program
    (lax.scan over _silk2_step_body) and must match the per-frame pool
    bit-exactly, including a partial final window."""
    from esp32_opus_player_tpu import DecoderConfig, decode_file
    from esp32_opus_player_tpu.models.stream_pool import StreamPool
    src = str(fixture_path("silk_wb_stereo_20ms"))
    pool = StreamPool([src] * 3, channels=2, native=True,
                      compat_ref=True, fixed_buckets=True, superstep_k=3)
    assert pool._ss_silk and pool._ss_k == 3
    outs = pool.run()
    ref = decode_file(src, DecoderConfig(channels=2, compat_ref=True))
    for o in outs:
        assert np.array_equal(o, ref)


@pytest.mark.slow
def test_silk2_superstep_multiframe_and_loss():
    """Stereo superstep with 60 ms payloads (3 window entries/packet)
    under RFC loss: buffered frames flush before the conceal step, and
    the output equals the per-frame rfc_plc pool."""
    from esp32_opus_player_tpu.models.stream_pool import StreamPool
    src = str(fixture_path("silk_wb_stereo_60ms"))
    loss = lambda i, k: k == 2
    pool = StreamPool([src] * 2, channels=2, native=True,
                      compat_ref=False, rfc_plc=True,
                      fixed_buckets=True, superstep_k=4)
    assert pool._ss_silk
    outs = pool.run(loss=loss)
    ref_pool = StreamPool([src] * 2, channels=2, native=True,
                          compat_ref=False, rfc_plc=True,
                          fixed_buckets=True)
    refs = ref_pool.run(loss=loss)
    for o, r in zip(outs, refs):
        assert np.array_equal(o, r)


@pytest.mark.slow
def test_hybrid2_superstep_bitexact():
    """K-frame STEREO-HYBRID superstep: SILK core + CELT synthesis +
    saturating mix fused into ONE K-frame device program. Must match
    the per-frame hybrid pool bit-exactly, including a lost packet
    mid-window (impure step: window flushes, per-frame fallback, mute
    row) and a partial final window."""
    from esp32_opus_player_tpu.models.stream_pool import StreamPool
    src = str(fixture_path("hybrid_fb_stereo_20ms"))
    loss = lambda i, k: k == 5
    pool = StreamPool([src] * 3, channels=2, native=True,
                      compat_ref=True, fixed_buckets=True, superstep_k=3)
    assert pool._ss_hyb and pool._ss_k == 3
    outs = pool.run(loss=loss)
    ref_pool = StreamPool([src] * 3, channels=2, native=True,
                          compat_ref=True, fixed_buckets=True)
    refs = ref_pool.run(loss=loss)
    for o, r in zip(outs, refs):
        assert np.array_equal(o, r)
    assert any(k[0] == "hyb2" for k in pool.stats()["buckets"])


@pytest.mark.slow
def test_silk2_superstep_10ms_loss_in_window():
    """10 ms STEREO-SILK superstep (nb_subfr=2 frames in the K-frame
    window) with mixed per-stream losses concealed IN-window — bit-
    exact vs the per-frame stereo rfc_plc pool."""
    from esp32_opus_player_tpu.models.stream_pool import StreamPool
    src = str(fixture_path("silk_wb_fec_stereo_10ms"))
    pat = {0: {4, 5, 11}, 1: set()}
    loss = lambda i, k: k in pat[i]
    pool = StreamPool([src] * 2, channels=2, native=True,
                      compat_ref=False, rfc_plc=True,
                      fixed_buckets=True, superstep_k=3)
    assert pool._ss_silk and pool._ss_silk2
    assert pool.path[0] == ("silk2", 16, 1, 10, 10)
    outs = pool.run(loss=loss)
    ref_pool = StreamPool([src] * 2, channels=2, native=True,
                          compat_ref=False, rfc_plc=True,
                          fixed_buckets=True)
    refs = ref_pool.run(loss=loss)
    for i, (o, r) in enumerate(zip(outs, refs)):
        assert np.array_equal(o, r), f"stream {i}"


@pytest.mark.slow
def test_hybrid2_superstep_10ms_bitexact():
    """10 ms K-frame STEREO-HYBRID superstep (LM 2 CELT + nb_subfr=2
    SILK + mix in one program): bit-exact vs the per-frame pool,
    including a lost packet mid-window."""
    from esp32_opus_player_tpu.models.stream_pool import StreamPool
    src = str(fixture_path("hybrid_fb_stereo_10ms"))
    loss = lambda i, k: k == 5
    pool = StreamPool([src] * 2, channels=2, native=True,
                      compat_ref=False, rfc_plc=True,
                      fixed_buckets=True, superstep_k=3)
    assert pool._ss_hyb
    assert pool.path[0] == ("hybrid2", 21, 10)
    outs = pool.run(loss=loss)
    ref_pool = StreamPool([src] * 2, channels=2, native=True,
                          compat_ref=False, rfc_plc=True,
                          fixed_buckets=True)
    refs = ref_pool.run(loss=loss)
    for o, r in zip(outs, refs):
        assert np.array_equal(o, r)
    assert any(k[0] == "hyb2" and k[1] == 2
               for k in pool.stats()["buckets"])


@pytest.mark.slow
def test_hybrid2_mixed_duration_pool():
    """A pool mixing 10 ms and 20 ms stereo-hybrid streams: two
    per-duration groups (LM 2 + LM 3 CELT, nb 2 + nb 4 SILK) per step —
    the hybrid superstep sees an impure step and falls back to
    per-frame dispatch; output stays bit-exact per stream."""
    from esp32_opus_player_tpu import DecoderConfig, decode_file
    from esp32_opus_player_tpu.models.stream_pool import StreamPool
    srcs = [str(fixture_path("hybrid_fb_stereo_10ms")),
            str(fixture_path("hybrid_fb_stereo_20ms"))]
    pool = StreamPool(srcs, channels=2, native=True, compat_ref=False,
                      fixed_buckets=True, superstep_k=3)
    outs = pool.run()
    for src, out in zip(srcs, outs):
        ref = decode_file(src, DecoderConfig(channels=2,
                                             compat_ref=False))
        assert np.array_equal(out, ref), src


@pytest.mark.slow
def test_hybrid1_superstep_bitexact():
    """K-frame MONO-HYBRID superstep (fused SILK core + CELT + mix):
    bit-exact vs the per-frame hybrid pool, including a lost packet
    mid-window and a partial final window."""
    from esp32_opus_player_tpu.models.stream_pool import StreamPool
    src = str(fixture_path("hybrid_swb_mono_20ms"))
    loss = lambda i, k: k == 4
    pool = StreamPool([src] * 2, channels=1, native=True,
                      compat_ref=True, fixed_buckets=True, superstep_k=3)
    assert pool._ss_hyb1 and pool._ss_k == 3
    outs = pool.run(loss=loss)
    ref_pool = StreamPool([src] * 2, channels=1, native=True,
                          compat_ref=True, fixed_buckets=True)
    refs = ref_pool.run(loss=loss)
    for o, r in zip(outs, refs):
        assert np.array_equal(o, r)
    assert any(k[0] == "hyb1" for k in pool.stats()["buckets"])


@pytest.mark.slow
def test_celt_superstep_loss_in_window(monkeypatch):
    """CELT conceals ride the K-frame window (VERDICT r04 #3): lossy
    steps amend the buffered window frame with compact conceal lanes
    (_celt_pool_superstep_T_lossy) instead of flushing it — mixed
    decode/conceal steps, a 2-frame burst (pitch/LPC carry, first
    flags), and shared-loss steps across both streams. Bit-exact vs
    the per-frame T-mode rfc_plc pool replaying the same losses: the
    float32 conceal kernel's low bits vary with batch shape, so the
    loss pattern keeps each lossy frame's lost-row count equal to its
    window's max (in-window slot count S == per-frame compact cap)."""
    monkeypatch.setenv("OTPU_T_MODE", "1")
    from esp32_opus_player_tpu.models.stream_pool import StreamPool
    src = str(fixture_path("celt_fb_mono_20ms"))
    pat = {0: {4, 9, 10}, 1: {9, 10}}
    loss = lambda i, k: k in pat[i]
    kw = dict(channels=1, native=True, compat_ref=False, rfc_plc=True,
              fixed_buckets=True)
    pool = StreamPool([src] * 2, superstep_k=3, **kw)
    assert pool._t_mode and pool._ss_k == 3
    outs = pool.run(loss=loss)
    assert any(b[0] == "celtT_plc_ss"
               for b in pool.stats()["buckets"]), "in-window path unused"
    refs = StreamPool([src] * 2, **kw).run(loss=loss)
    for i, (o, r) in enumerate(zip(outs, refs)):
        assert np.array_equal(o, r), f"stream {i}"


@pytest.mark.slow
def test_celt_superstep_all_lost_step(monkeypatch):
    """A step where EVERY stream is lost staged no decode frame — the
    conceal becomes its own all-inactive window frame (create path),
    and the window keeps filling."""
    monkeypatch.setenv("OTPU_T_MODE", "1")
    from esp32_opus_player_tpu.models.stream_pool import StreamPool
    src = str(fixture_path("celt_fb_mono_20ms"))
    loss = lambda i, k: k in (3, 4)
    kw = dict(channels=1, native=True, compat_ref=False, rfc_plc=True,
              fixed_buckets=True)
    pool = StreamPool([src] * 2, superstep_k=3, **kw)
    outs = pool.run(loss=loss)
    refs = StreamPool([src] * 2, **kw).run(loss=loss)
    for i, (o, r) in enumerate(zip(outs, refs)):
        assert np.array_equal(o, r), f"stream {i}"


@pytest.mark.slow
def test_celt_superstep_long_burst_noise_in_window(monkeypatch):
    """A long burst inside superstep windows: conceals 0-4 ride the
    window as compact pitch-conceal lanes, conceals 5+ switch to the
    libopus noise branch — which stages as ORDINARY decode rows
    (host-fabricated LCG noise through the integer bucket), so they
    ride the window natively too. Bit-exact vs the per-frame pool
    (equal lost-row counts per frame keep the float pitch-branch batch
    shapes matched; noise frames are integer-exact)."""
    monkeypatch.setenv("OTPU_T_MODE", "1")
    from esp32_opus_player_tpu.models.stream_pool import StreamPool
    src = str(fixture_path("celt_fb_mono_20ms"))
    LOST = set(range(8, 16))          # 8-frame burst on both streams
    loss = lambda i, k: k in LOST
    kw = dict(channels=1, native=True, compat_ref=False, rfc_plc=True,
              fixed_buckets=True)
    pool = StreamPool([src] * 2, superstep_k=3, **kw)
    outs = pool.run(loss=loss)
    st = pool.stats()
    assert any(b[0] == "celtT_plc_ss" for b in st["buckets"])
    assert st["frames_lost"] == 2 * len(LOST)
    refs = StreamPool([src] * 2, **kw).run(loss=loss)
    for i, (o, r) in enumerate(zip(outs, refs)):
        assert np.array_equal(o, r), f"stream {i}"
