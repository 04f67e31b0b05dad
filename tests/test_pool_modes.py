"""Pool bucket/mode policies: fixed-capacity serving buckets must be
bit-identical to dynamically sized ones while pinning every bucket to one
compiled shape; RFC-mode pools must route streams the compat-quirked
native engine cannot decode correctly (non-fullband CELT/hybrid) to the
scalar path, and refuse batched loss concealment (compat-only semantics)."""
import numpy as np
import pytest

from esp32_opus_player_tpu import DecoderConfig, decode_file
from esp32_opus_player_tpu.models.stream_pool import StreamPool

from conftest import fixture_path

MIXED = ["celt_fb_mono_20ms", "silk_wb_mono_20ms", "hybrid_swb_mono_20ms",
         "silk_nb_mono_20ms", "celt_fb_mono_drums_20ms"]


@pytest.mark.slow
def test_fixed_buckets_bitexact_and_single_shape():
    srcs = [str(fixture_path(n)) for n in MIXED]
    ref = StreamPool(srcs, channels=1).run()
    pool = StreamPool(srcs, channels=1, fixed_buckets=True)
    outs = pool.run()
    for a, b in zip(outs, ref):
        assert np.array_equal(a, b)
    # every bucket family launched exactly one capacity
    caps = {}
    for key in pool.stats()["buckets"]:
        fam = key[:-1]  # strip cap
        caps.setdefault(fam[0:2], set()).add(key[-1])
    for fam, sizes in caps.items():
        assert len(sizes) == 1, (fam, sizes)


@pytest.mark.slow
def test_rfc_pool_routes_and_matches():
    """RFC pools batch every bandwidth: the engines honor the per-stream
    end band (compat pins end=21 for the reference's end-band-ignored
    quirk, src/celt.cpp:2199)."""
    names = ["celt_fb_mono_20ms",     # end 21
             "celt_nb_mono_20ms",     # end 13 — RFC-correct, batched
             "hybrid_swb_mono_20ms",  # end 19 hybrid — batched
             "silk_wb_mono_20ms"]     # SILK: mode-independent, batched
    srcs = [str(fixture_path(n)) for n in names]
    pool = StreamPool(srcs, channels=1, compat_ref=False)
    assert pool.path[0] == ("celt", 960, 21)
    assert pool.path[1] == ("celt", 960, 13)
    assert pool.path[2] == ("hybrid", 19, 20)
    assert pool.path[3][0] == "silk"
    outs = pool.run()
    for i, src in enumerate(srcs):
        ref = decode_file(src, DecoderConfig(channels=1, compat_ref=False))
        assert np.array_equal(outs[i], ref), names[i]
    # compat keeps the quirk: end pinned to 21 regardless of bandwidth
    assert StreamPool([srcs[1]], channels=1,
                      compat_ref=True).path[0] == ("celt", 960, 21)


@pytest.mark.slow
@pytest.mark.parametrize("name,ch", [("celt_fb_mono_5ms", 1),
                                     ("celt_fb_stereo_2p5ms", 2)])
def test_rfc_pool_batches_short_celt_frames(name, ch):
    """RFC pools batch every CELT frame size (LM 0-3) — the device
    synthesis is LM-generic; compat keeps non-20ms scalar (the reference
    hard-codes audiosize 960 and crashes on short frames)."""
    src = str(fixture_path(name))
    pool = StreamPool([src], channels=ch, compat_ref=False)
    assert pool.path[0][0] == "celt" and pool.path[0][1] != 960
    out = pool.run()[0]
    ref = decode_file(src, DecoderConfig(channels=ch, compat_ref=False))
    assert np.array_equal(out, ref)
    assert StreamPool([src], channels=ch,
                      compat_ref=True).path[0] == ("scalar",)


@pytest.mark.slow
def test_modeswitch_stream_stays_scalar():
    """Classification must scan EVERY packet's TOC: the modeswitch
    fixture's first 50 packets are uniform stereo SILK, then it switches
    to CELT — a prefix-sampled classifier would batch it as silk2 and
    corrupt the CELT segments (regression)."""
    src = str(fixture_path("modeswitch_stereo_20ms"))
    for compat in (True, False):
        pool = StreamPool([src], channels=2, compat_ref=compat)
        assert pool.path[0] == ("scalar",)
        out = pool.run()[0]
        ref = decode_file(src, DecoderConfig(channels=2,
                                             compat_ref=compat))
        assert np.array_equal(out, ref)


def test_rfc_pool_rejects_batched_loss():
    srcs = [str(fixture_path("silk_wb_mono_20ms"))]
    pool = StreamPool(srcs, channels=1, compat_ref=False)
    with pytest.raises(NotImplementedError):
        pool.step(lost={0})


@pytest.mark.slow
def test_hybrid_device_mix_fused():
    """Uniform-hybrid steps mix SILK+CELT ON DEVICE (_hybrid_mix_step:
    one gather+clip program replaces the per-stream host mix,
    src/opus_decoder.cpp:272) and must stay bit-exact — mono and
    stereo, 48k and out_fs."""
    from esp32_opus_player_tpu.models import stream_pool as sp
    calls = []
    orig = sp._hybrid_mix_step
    sp._hybrid_mix_step = lambda *a: (calls.append(1), orig(*a))[1]
    try:
        for name, ch, fs in [("hybrid_swb_mono_20ms", 1, 48000),
                             ("hybrid_fb_stereo_20ms", 2, 48000),
                             ("hybrid_fb_stereo_20ms", 2, 16000)]:
            src = str(fixture_path(name))
            calls.clear()
            pool = StreamPool([src] * 3, channels=ch, native=True,
                              compat_ref=True, fixed_buckets=True,
                              out_fs=fs)
            outs = pool.run()
            assert calls, f"{name}: device mix path did not fire"
            ref = decode_file(src, DecoderConfig(
                channels=ch, sample_rate=fs, compat_ref=True))
            for o in outs:
                assert np.array_equal(o, ref)
    finally:
        sp._hybrid_mix_step = orig


@pytest.mark.slow
def test_pool_batches_10ms_hybrid():
    """10 ms hybrid packets (RFC 6716's other legal hybrid frame size,
    LM 2 / nb_subfr 2) batch on the device path in RFC mode instead of
    falling to the scalar decoder — bit-exact vs scalar decode_file.
    Compat mode keeps them scalar: the reference hard-codes audiosize
    960 (src/opus_decoder.cpp:161), so short payloads mis-decode and
    parity requires the scalar quirk path."""
    src = str(fixture_path("hybrid_fb_mono_10ms"))
    pool = StreamPool([src] * 3, channels=1, native=True,
                      compat_ref=False)
    assert pool.path[0] == ("hybrid", 21, 10), pool.path[0]
    outs = pool.run()
    ref = decode_file(src, DecoderConfig(channels=1, compat_ref=False))
    for o in outs:
        assert np.array_equal(o, ref)
    assert pool.stats()["frames_scalar"] == 0
    assert StreamPool([src], channels=1, native=True,
                      compat_ref=True).path[0] == ("scalar",)


@pytest.mark.slow
def test_pool_10ms_hybrid_loss_and_plc():
    """Loss on a batched 10 ms hybrid pool (rfc_plc): conceals one
    nb_subfr=2 SILK frame per lost packet — bit-exact vs the scalar
    RFC replay."""
    from esp32_opus_player_tpu.host import opusfile
    from esp32_opus_player_tpu.models.opus_decoder import OpusDecoder
    src = str(fixture_path("hybrid_fb_mono_10ms"))
    lossfn = lambda k: k in (5, 11, 12)
    s = opusfile.open_file(src)
    dec = OpusDecoder(1, compat_ref=False)
    exp = []
    for k, job in enumerate(s.jobs):
        pcm = dec.decode(None) if lossfn(k) else dec.decode(job.data)
        lo, hi = job.discard_front, pcm.shape[0] - job.trim_end
        exp.append(pcm[lo:max(hi, lo)])
    ref = np.concatenate(exp)
    pool = StreamPool([src] * 2, channels=1, native=True,
                      compat_ref=False, rfc_plc=True)
    outs = pool.run(loss=lambda i, k: lossfn(k))
    for o in outs:
        assert np.array_equal(o, ref)


@pytest.mark.slow
def test_pool_10ms_hybrid_superstep():
    """Uniform 10 ms hybrid pools superstep (LM 2 window key): the
    fused SILK+CELT+mix K-frame program matches the per-frame pool,
    including a loss step flushing the window."""
    src = str(fixture_path("hybrid_fb_mono_10ms"))
    loss = lambda i, k: k == 7 and i == 0
    pool = StreamPool([src] * 2, channels=1, native=True,
                      compat_ref=False, rfc_plc=True,
                      fixed_buckets=True, superstep_k=3)
    assert pool._ss_hyb1
    outs = pool.run(loss=loss)
    assert any(k[0] == "hyb1" and k[1] == 2
               for k in pool.stats()["buckets"]), \
        pool.stats()["buckets"]
    ref_pool = StreamPool([src] * 2, channels=1, native=True,
                          compat_ref=False, rfc_plc=True,
                          fixed_buckets=True)
    refs = ref_pool.run(loss=loss)
    for o, r in zip(outs, refs):
        assert np.array_equal(o, r)
