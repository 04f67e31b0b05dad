"""Batched stereo SILK and stereo hybrid (BASELINE config 3): the stereo
symbol phase runs on host (per-channel headers, stereo predictor,
mid/side frames, silk_Decode :1481), the MS->LR unmix and per-channel
resampling run on device (ops/silk/jax_stereo.py), and hybrid streams mix
with the batched stereo CELT output — all bit-exact vs the scalar file
decoder."""
import numpy as np
import pytest

from esp32_opus_player_tpu import DecoderConfig, decode_file
from esp32_opus_player_tpu.models.stream_pool import StreamPool
from esp32_opus_player_tpu.models.opus_decoder import OpusDecoder
from esp32_opus_player_tpu.host import opusfile

from conftest import fixture_path

NAMES = ["hybrid_fb_stereo_20ms", "silk_wb_stereo_20ms",
         "celt_fb_stereo_20ms"]


@pytest.mark.slow
def test_pool_nb_stereo_oracle_bitexact():
    """fs=8 stereo (different MS->LR interp length) — batched pool vs the
    compiled reference oracle directly."""
    src = str(fixture_path("silk_nb_stereo_20ms"))
    pool = StreamPool([src], channels=2)
    assert pool.path[0] == ("silk2", 8, 1, 20, 20)
    out = pool.run()[0]
    gold = np.fromfile(str(fixture_path("silk_nb_stereo_20ms")).replace(
        "fixtures", "golden").replace(".opus", ".pcm"),
        dtype=np.int16).reshape(-1, 2)
    m = min(len(out), len(gold))
    assert m > 90000
    assert np.array_equal(out[:m], gold[:m])


def test_mono_payload_stereo_api_matches_libopus():
    """The encoder collapses 16 kbps NB 'stereo' to MONO payloads; the
    reference then overwrites nChannelsAPI with the stream channel count
    (src/opus_decoder.cpp:167), undersizing pcm_silk and reading
    uninitialized heap — undefined behavior we do NOT reproduce. Our
    decode must match libopus' sane semantics instead (golden PCM)."""
    src = str(fixture_path("silk_nb2mono_20ms"))
    out = decode_file(src, DecoderConfig(channels=2, compat_ref=True))
    gold = np.fromfile(str(fixture_path("silk_nb2mono_20ms")).replace(
        "fixtures", "golden").replace(".opus", ".libopus.pcm"),
        dtype=np.int16).reshape(-1, 2)
    m = min(len(out), len(gold))
    assert m > 90000
    assert np.array_equal(out[:m], gold[:m])


@pytest.mark.slow
@pytest.mark.parametrize("native", [True, False])
def test_pool_stereo_batched_bitexact(native):
    srcs = [str(fixture_path(n)) for n in NAMES]
    pool = StreamPool(srcs, channels=2, native=native, compat_ref=True)
    assert [p[0] for p in pool.path] == ["hybrid2", "silk2", "celt"]
    outs = pool.run()
    for i, src in enumerate(srcs):
        ref = decode_file(src, DecoderConfig(channels=2, compat_ref=True))
        assert np.array_equal(outs[i], ref), NAMES[i]


@pytest.mark.slow
@pytest.mark.parametrize("name", ["silk_nb_stereo_40ms",
                                  "silk_wb_stereo_60ms"])
def test_pool_stereo_multiframe_batched_bitexact(name):
    """40/60 ms stereo payloads batch through the native silk2 path —
    nfr sequential launches of the SAME compiled 20 ms core per packet
    (silk_Decode :1481 frame loop) — bit-exact vs the scalar RFC
    decoder, with libopus-golden final ranges."""
    from conftest import golden_ranges
    src = str(fixture_path(name))
    pool = StreamPool([src], channels=2, compat_ref=False, native=True)
    assert pool.path[0][0] == "silk2" and pool.path[0][2] > 1
    out = pool.run()[0]
    ref = decode_file(src, DecoderConfig(channels=2, compat_ref=False))
    assert np.array_equal(out, ref)
    assert pool.final_ranges()[0] == golden_ranges(name)[-1]["final_range"]


@pytest.mark.slow
def test_pool_stereo_loss_bitexact():
    """Stereo SILK loss = empty-bitstream stereo decode; stereo hybrid
    loss = SILK advances + silence (CELT stage errors) — vs scalar."""
    period = 5
    srcs = [str(fixture_path(n)) for n in NAMES[:2]]
    pool = StreamPool(srcs, channels=2, compat_ref=True)
    outs = pool.run(loss=lambda i, k: k > 0 and k % period == 0)
    for i, src in enumerate(srcs):
        s = opusfile.open_file(src)
        dec = OpusDecoder(2, compat_ref=True)
        ref = []
        for k, job in enumerate(s.jobs):
            if k > 0 and k % period == 0:
                try:
                    pcm = dec.decode(None)
                except ValueError:
                    pcm = np.zeros((960, 2), dtype=np.int16)
            else:
                pcm = dec.decode(job.data)
            lo = job.discard_front
            hi = pcm.shape[0] - job.trim_end
            ref.append(pcm[lo:max(hi, lo)])
        assert np.array_equal(outs[i], np.concatenate(ref)), NAMES[i]


@pytest.mark.slow
def test_pool_stereo_checkpoint_resume(tmp_path):
    srcs = [str(fixture_path(n)) for n in NAMES]
    golden = StreamPool(srcs, channels=2).run()
    pool = StreamPool(srcs, channels=2)
    for _ in range(7):
        pool.step()
    ck = tmp_path / "st.ckpt"
    pool.save_checkpoint(str(ck))
    fresh = StreamPool(srcs, channels=2)
    fresh.load_checkpoint(str(ck))
    outs = fresh.run()
    for a, b in zip(outs, golden):
        assert np.array_equal(a, b)
