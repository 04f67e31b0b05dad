"""RFC-mode batched packet-loss concealment (StreamPool rfc_plc=True):
silk_PLC conceal + CNG + glue run as device kernels (ops/silk/jax_plc.py)
with host-prepped sequential params — bit-exact vs the scalar RFC decoder
replaying the same loss pattern (silk_Decode lostFlag=1 path,
reference src/silk.cpp:2871-3200)."""
import numpy as np
import pytest

from esp32_opus_player_tpu.host import opusfile
from esp32_opus_player_tpu.models.opus_decoder import OpusDecoder
from esp32_opus_player_tpu.models.stream_pool import StreamPool

from conftest import fixture_path


def _scalar_rfc_loss(name, lossfn, fec=False):
    s = opusfile.open_file(fixture_path(name))
    dec = OpusDecoder(1, compat_ref=False)
    out = []
    jobs = s.jobs
    for k, job in enumerate(jobs):
        if lossfn(k):
            pcm = None
            if fec and k + 1 < len(jobs) and not lossfn(k + 1):
                from esp32_opus_player_tpu.host.packet import parse_packet
                from esp32_opus_player_tpu.host.range_decoder import \
                    RangeDecoder
                d = RangeDecoder(parse_packet(jobs[k + 1].data).frames[0])
                d.dec_bit_logp(1)
                if d.dec_bit_logp(1):
                    pcm = dec.decode(jobs[k + 1].data, decode_fec=True)
            if pcm is None:
                pcm = dec.decode(None)
        else:
            pcm = dec.decode(job.data)
        lo = job.discard_front
        hi = pcm.shape[0] - job.trim_end
        out.append(pcm[lo:max(hi, lo)])
    return np.concatenate(out)


@pytest.mark.slow
@pytest.mark.parametrize("native", [True, False])
@pytest.mark.parametrize("name", ["silk_wb_mono_20ms", "silk_mb_mono_20ms",
                                  "silk_nb_mono_20ms",
                                  "hybrid_swb_mono_20ms"])
def test_rfc_plc_periodic_loss_bitexact(name, native):
    """native=True: the C symbol engine + NativePlcTracker state mirror;
    native=False: the python SILK host."""
    lossfn = lambda k: k > 0 and k % 7 == 0
    pool = StreamPool([str(fixture_path(name))], channels=1,
                      compat_ref=False, rfc_plc=True, native=native)
    out = pool.run(loss=lambda i, k: lossfn(k))[0]
    assert np.array_equal(out, _scalar_rfc_loss(name, lossfn)), name


@pytest.mark.slow
def test_rfc_plc_burst_loss_bitexact():
    """Consecutive losses: harmonic/rand attenuation deepens per lossCnt,
    CNG state persists across the run, glue fires on recovery."""
    burst = set(range(20, 24)) | {50}
    name = "silk_wb_mono_20ms"
    ref = _scalar_rfc_loss(name, lambda k: k in burst)
    for native in (True, False):
        pool = StreamPool([str(fixture_path(name))], channels=1,
                          compat_ref=False, rfc_plc=True, native=native)
        out = pool.run(loss=lambda i, k: k in burst)[0]
        assert np.array_equal(out, ref), f"native={native}"


@pytest.mark.slow
def test_rfc_plc_with_fec_fallback():
    """FEC recovers when the next packet carries LBRR; otherwise real
    concealment — both batched, mirroring the scalar policy."""
    name = "silk_wb_fec_mono_20ms"
    lossfn = lambda k: k > 0 and k % 5 == 0
    ref = _scalar_rfc_loss(name, lossfn, fec=True)
    for native in (True, False):
        pool = StreamPool([str(fixture_path(name))], channels=1,
                          compat_ref=False, rfc_plc=True, native=native)
        out = pool.run(loss=lambda i, k: lossfn(k), fec=True)[0]
        assert np.array_equal(out, ref), f"native={native}"
    pool = pool  # stats checked on the last (python) run
    st = pool.stats()
    assert st["frames_fec"] > 0 and st["frames_lost"] > st["frames_fec"]


@pytest.mark.slow
@pytest.mark.parametrize("name", ["silk_wb_fec_mono_10ms",
                                  "hybrid_swb_fec_mono_10ms"])
def test_rfc_fec_10ms_bitexact(name):
    """10 ms in-band FEC: a 10 ms packet carries ONE LBRR flag and one
    nb_subfr=2 LBRR copy (silk.cpp:1565 with nFramesPerPacket=1); the
    pool recovers lost 10 ms SILK/hybrid frames from it on the batched
    path, bit-exact vs the scalar decode_fec replay."""
    lossfn = lambda k: k > 0 and k % 5 == 0
    ref = _scalar_rfc_loss(name, lossfn, fec=True)
    for native in (True, False):
        pool = StreamPool([str(fixture_path(name))], channels=1,
                          compat_ref=False, rfc_plc=True, native=native)
        out = pool.run(loss=lambda i, k: lossfn(k), fec=True)[0]
        assert np.array_equal(out, ref), f"native={native}"
    assert pool.stats()["frames_fec"] > 0


@pytest.mark.slow
def test_rfc_plc_checkpoint_mid_conceal(tmp_path):
    name = "silk_wb_mono_20ms"
    lossfn = lambda i, k: k in (8, 9, 10)
    srcs = [str(fixture_path(name))]
    golden = StreamPool(srcs, channels=1, compat_ref=False,
                        rfc_plc=True).run(loss=lossfn)
    pool = StreamPool(srcs, channels=1, compat_ref=False, rfc_plc=True)
    for _ in range(10):   # stop INSIDE the concealment run
        pool.step({0} if lossfn(0, pool.positions[0]) else set())
    ck = tmp_path / "plc.ckpt"
    pool.save_checkpoint(str(ck))
    fresh = StreamPool(srcs, channels=1, compat_ref=False, rfc_plc=True)
    fresh.load_checkpoint(str(ck))
    rest = fresh.run(loss=lossfn)
    assert np.array_equal(rest[0], golden[0])


def test_rfc_plc_requires_rfc_mode():
    with pytest.raises(ValueError):
        StreamPool([str(fixture_path("silk_wb_mono_20ms"))], channels=1,
                   compat_ref=True, rfc_plc=True)


@pytest.mark.slow
@pytest.mark.parametrize("native", [True, False])
@pytest.mark.parametrize("name", ["silk_wb_mono_60ms",
                                  "silk_wb_mono_40ms",
                                  "silk_wb_mono_10ms"])
def test_rfc_plc_multiframe_packets(name, native):
    """A lost 40/60 ms packet conceals 2/3 internal 20 ms frames with
    deepening lossCnt, exactly like the scalar _decode_plc while-loop;
    a lost 10 ms packet conceals one nb_subfr=2 frame."""
    lossfn = lambda k: k > 0 and k % 6 == 0
    pool = StreamPool([str(fixture_path(name))], channels=1,
                      compat_ref=False, rfc_plc=True, native=native)
    out = pool.run(loss=lambda i, k: lossfn(k))[0]
    assert np.array_equal(out, _scalar_rfc_loss(name, lossfn)), name


def _scalar_stereo_replay(name, lossfn):
    from esp32_opus_player_tpu.host import opusfile as _of
    from esp32_opus_player_tpu.models.opus_decoder import OpusDecoder
    s = _of.open_file(str(fixture_path(name)))
    dec = OpusDecoder(2, compat_ref=False)
    ref = []
    for k, job in enumerate(s.jobs):
        pcm = dec.decode(None) if lossfn(k) else dec.decode(job.data)
        lo, hi = job.discard_front, pcm.shape[0] - job.trim_end
        ref.append(pcm[lo:max(hi, lo)])
    return np.concatenate(ref)


@pytest.mark.slow
@pytest.mark.parametrize("native", [True, False])
@pytest.mark.parametrize("name,period", [
    ("silk_wb_stereo_20ms", 6),
    ("silk_nb_stereo_20ms", 5),
    ("hybrid_fb_stereo_20ms", 7),
    ("silk_nb_stereo_40ms", 6),
    ("silk_wb_stereo_60ms", 5),
    ("hybrid_fb_stereo_10ms", 5),       # 10 ms: nb_subfr=2 conceal
    ("silk_wb_fec_stereo_10ms", 6),
])
def test_pool_rfc_plc_stereo(native, name, period):
    """Batched STEREO concealment (mid + masked side conceal/CNG,
    MS->LR with the previous predictors) — bit-exact vs the scalar
    decoder replaying the same loss (silk_Decode lostFlag=1 with
    nChannelsInternal=2, src/silk.cpp:2973)."""
    lossfn = lambda k: k > 0 and k % period == 0
    pool = StreamPool([str(fixture_path(name))], channels=2,
                      native=native, compat_ref=False, rfc_plc=True)
    out = pool.run(loss=lambda i, k: lossfn(k))[0]
    assert np.array_equal(out, _scalar_stereo_replay(name, lossfn))


@pytest.mark.slow
def test_pool_rfc_plc_stereo_burst_and_checkpoint(tmp_path):
    """Burst loss on stereo + checkpoint/resume mid-concealment: the
    per-channel trackers, conceal energy and predictors must survive."""
    name = "silk_wb_stereo_20ms"
    burst = set(range(18, 23))
    lossfn = lambda k: k in burst
    src = str(fixture_path(name))
    golden = StreamPool([src], channels=2, native=True, compat_ref=False,
                        rfc_plc=True).run(loss=lambda i, k: lossfn(k))[0]
    pool = StreamPool([src], channels=2, native=True, compat_ref=False,
                      rfc_plc=True)
    for _ in range(20):   # stop INSIDE the concealment burst
        pool.step({0} if lossfn(pool.positions[0]) else set())
    ck = tmp_path / "st2.ckpt"
    pool.save_checkpoint(str(ck))
    fresh = StreamPool([src], channels=2, native=True, compat_ref=False,
                       rfc_plc=True)
    fresh.load_checkpoint(str(ck))
    rest = fresh.run(loss=lambda i, k: lossfn(k))
    assert np.array_equal(rest[0], golden)


@pytest.mark.slow
@pytest.mark.parametrize("name", ["silk_wb_fec_stereo_20ms",
                                  "silk_wb_fec_stereo_10ms"])
def test_rfc_plc_stereo_fec_bitexact(name):
    """Stereo in-band FEC (per-channel LBRR, silk_Decode lostFlag=2
    with nChannelsInternal=2, src/silk.cpp:1565-1616): the pool's
    batched path recovers a lost stereo frame from the next packet's
    LBRR copies whenever mid has LBRR and the side is either present
    in LBRR or not needed; otherwise it conceals. The scalar reference
    follows the identical policy, so outputs must be bit-exact. 10 ms
    packets carry one nb_subfr=2 LBRR copy per channel."""
    lossfn = lambda k: k > 0 and k % 5 == 0
    s = opusfile.open_file(fixture_path(name))
    jobs = s.jobs

    from esp32_opus_player_tpu.host.packet import parse_packet
    from esp32_opus_player_tpu.host.range_decoder import RangeDecoder

    dec = OpusDecoder(2, compat_ref=False)
    out = []
    n_fec = 0
    for k, job in enumerate(jobs):
        if lossfn(k):
            pcm = None
            if k + 1 < len(jobs) and not lossfn(k + 1):
                d = RangeDecoder(parse_packet(jobs[k + 1].data).frames[0])
                d.dec_bit_logp(1)                 # ch0 VAD
                mid_lbrr = d.dec_bit_logp(1)      # ch0 LBRR
                d.dec_bit_logp(1)                 # ch1 VAD
                side_lbrr = d.dec_bit_logp(1)     # ch1 LBRR
                prev_dom = (dec.silk.prev_decode_only_middle
                            if dec.silk else 0)
                if mid_lbrr and (side_lbrr or not (
                        side_lbrr == 0 and not prev_dom)):
                    # pool policy: mid LBRR present AND NOT the mixed
                    # case (side required but absent)
                    if side_lbrr or prev_dom:
                        pcm = dec.decode(jobs[k + 1].data,
                                         decode_fec=True)
                        n_fec += 1
            if pcm is None:
                pcm = dec.decode(None)
        else:
            pcm = dec.decode(job.data)
        lo = job.discard_front
        hi = pcm.shape[0] - job.trim_end
        out.append(pcm[lo:max(hi, lo)])
    ref = np.concatenate(out)
    assert n_fec > 0, "fixture never exercises stereo FEC"

    pool = StreamPool([str(fixture_path(name))], channels=2,
                      compat_ref=False, rfc_plc=True, native=True)
    got = pool.run(loss=lambda i, k: lossfn(k), fec=True)[0]
    st = pool.stats()
    assert st["frames_fec"] == n_fec
    assert np.array_equal(got, ref)


@pytest.mark.slow
def test_rfc_plc_mixed_celt_hybrid_loss():
    """Fuse-vs-conceal interaction (r04 advisor, high): on a step where
    every CELT row is lost (its concealed PCM is already queued in
    pend['mix'] by _celt_plc_group) and every hybrid row decodes, the
    hybrid device-mix fuse fires — it must APPEND its mixed entry, not
    overwrite the queue, or the concealed frames silently vanish and
    the CELT stream's timeline shifts."""
    celt = str(fixture_path("celt_fb_mono_20ms"))
    hyb = str(fixture_path("hybrid_swb_mono_20ms"))
    LOST = {5, 11, 12}
    pool = StreamPool([celt, hyb], channels=1, compat_ref=False,
                      rfc_plc=True)
    out = pool.run(loss=lambda i, k: i == 0 and k in LOST)
    ref0 = StreamPool([celt], channels=1, compat_ref=False,
                      rfc_plc=True).run(loss=lambda i, k: k in LOST)[0]
    ref1 = StreamPool([hyb], channels=1, compat_ref=False,
                      rfc_plc=True).run()[0]
    assert out[0].shape == ref0.shape, "concealed frames were dropped"
    assert np.array_equal(out[0], ref0)
    assert np.array_equal(out[1], ref1)


@pytest.mark.slow
def test_rfc_celt_loss_scalar_pool_equiv():
    """Scalar-vs-batched loss equivalence for CELT (VERDICT r04 #4b):
    the scalar RFC decoder now runs celt_decode_lost too (pitch branch
    via the R=1 device kernel, noise branch in exact fixed point), so
    a single-stream pool and the scalar decoder replaying the same
    8-frame burst are BIT-IDENTICAL (the burst covers both branches
    and the skip_plc post-recovery semantics)."""
    lossfn = lambda k: 10 <= k < 18 or k == 20
    src = "celt_fb_mono_20ms"
    got = StreamPool([str(fixture_path(src))], channels=1,
                     compat_ref=False, rfc_plc=True).run(
        loss=lambda i, k: lossfn(k))[0]
    ref = _scalar_rfc_loss(src, lossfn)
    assert np.array_equal(got, ref)


@pytest.mark.slow
def test_rfc_hybrid_loss_highband_scalar_pool_equiv():
    """Hybrid loss conceals BOTH layers (VERDICT r04 #4a): SILK PLC for
    the low band + celt_decode_lost noise branch (start=17, libopus
    takes the noise path for start != 0) for the high band, SAT16-mixed.
    Scalar and batched agree bit-exactly, and the concealed frame keeps
    energy above 8 kHz (the r04 gap: high band went abruptly silent)."""
    LOST = {5, 11, 12}
    src = "hybrid_swb_mono_20ms"
    lossfn = lambda k: k in LOST
    got = StreamPool([str(fixture_path(src))], channels=1,
                     compat_ref=False, rfc_plc=True).run(
        loss=lambda i, k: lossfn(k))[0]
    ref = _scalar_rfc_loss(src, lossfn)
    assert np.array_equal(got, ref)
    # high-band energy present in a concealed frame: |fft| above 8 kHz
    s = opusfile.open_file(fixture_path(src))
    pre = s.jobs[0].discard_front
    frame = got[960 * 5 - pre:960 * 5 - pre + 960, 0].astype(np.float64)
    spec = np.abs(np.fft.rfft(frame))
    hi = spec[np.fft.rfftfreq(960, 1 / 48000) > 8000]
    assert np.sqrt(np.mean(hi ** 2)) > 50.0, \
        "concealed hybrid frame lost its high band"


def _scalar_rfc_loss2(name, lossfn):
    """Stereo scalar RFC loss replay (channels=2)."""
    s = opusfile.open_file(fixture_path(name))
    dec = OpusDecoder(2, compat_ref=False)
    out = []
    for k, job in enumerate(s.jobs):
        pcm = dec.decode(None) if lossfn(k) else dec.decode(job.data)
        lo = job.discard_front
        hi = pcm.shape[0] - job.trim_end
        out.append(pcm[lo:max(hi, lo)])
    return np.concatenate(out)


@pytest.mark.slow
def test_rfc_celt_stereo_loss_scalar_pool_equiv():
    """STEREO CELT loss (pitch branch CC=2, then noise branch past 5
    conceals): scalar and single-stream pool bit-identical."""
    lossfn = lambda k: 8 <= k < 15
    src = "celt_fb_stereo_20ms"
    got = StreamPool([str(fixture_path(src))], channels=2,
                     compat_ref=False, rfc_plc=True).run(
        loss=lambda i, k: lossfn(k))[0]
    ref = _scalar_rfc_loss2(src, lossfn)
    assert np.array_equal(got, ref)


@pytest.mark.slow
def test_rfc_hybrid_stereo_loss_scalar_pool_equiv():
    """STEREO hybrid loss: stereo SILK conceal (mid always, side per
    prev_decode_only_middle) + CELT high-band noise conceal (CC=2),
    SAT16-mixed — batched (hyb2_plc route) vs scalar bit-identical,
    and the concealed frame keeps high-band energy."""
    LOST = {5, 6, 12}
    src = "hybrid_fb_stereo_20ms"
    lossfn = lambda k: k in LOST
    got = StreamPool([str(fixture_path(src))], channels=2,
                     compat_ref=False, rfc_plc=True).run(
        loss=lambda i, k: lossfn(k))[0]
    ref = _scalar_rfc_loss2(src, lossfn)
    assert np.array_equal(got, ref)
    s = opusfile.open_file(fixture_path(src))
    pre = s.jobs[0].discard_front
    frame = got[960 * 5 - pre:960 * 5 - pre + 960, 0].astype(np.float64)
    spec = np.abs(np.fft.rfft(frame))
    hi = spec[np.fft.rfftfreq(960, 1 / 48000) > 8000]
    assert np.sqrt(np.mean(hi ** 2)) > 50.0
