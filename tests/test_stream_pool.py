"""Heterogeneous stream pool (BASELINE configs 3+4 shape): batched device
synthesis with per-frame bucket grouping and state gather/scatter must
equal per-stream file decoding bit-exactly."""
import numpy as np
import pytest

from esp32_opus_player_tpu import DecoderConfig, decode_file
from esp32_opus_player_tpu.models.stream_pool import StreamPool

from conftest import fixture_path


@pytest.mark.slow
def test_pool_stereo_celt():
    srcs = [str(fixture_path("celt_fb_stereo_20ms"))]
    pool = StreamPool(srcs, channels=2, native=True, compat_ref=True)
    outs = pool.run()
    ref = decode_file(srcs[0], DecoderConfig(channels=2, compat_ref=True))
    assert np.array_equal(outs[0], ref)


@pytest.mark.slow
def test_pool_matches_file_decode():
    srcs = [str(fixture_path("celt_fb_mono_drums_20ms")),
            str(fixture_path("celt_nb_mono_20ms")),
            str(fixture_path("silk_wb_mono_20ms")),
            str(fixture_path("silk_nb_mono_20ms")),
            str(fixture_path("hybrid_swb_mono_20ms"))]
    pool = StreamPool(srcs, channels=1, native=True, compat_ref=True)
    outs = pool.run()
    for i, src in enumerate(srcs):
        ref = decode_file(src, DecoderConfig(channels=1, compat_ref=True))
        assert np.array_equal(outs[i], ref), src


@pytest.mark.parametrize("out_fs", [24000, 16000, 8000])
def test_pool_out_fs_downsampled_output(out_fs):
    """CELT-only pools emit decimated PCM bit-exact to the REFERENCE
    downsample path (src/celt.cpp:957 spectral bound + :1988-2055
    decimated deemphasis), i.e. the scalar CELTDecoder run with
    downsample=d — NOT a naive 48k-decode-then-decimate (those differ:
    the reference zeroes bins >= N/downsample before the iMDCT).
    Pre-skip and end-trim drop exactly the decimated samples whose 48k
    index falls in the trimmed ranges."""
    import numpy as np
    from esp32_opus_player_tpu.host import opusfile
    from esp32_opus_player_tpu.host.packet import parse_packet
    from esp32_opus_player_tpu.host.range_decoder import RangeDecoder
    from esp32_opus_player_tpu.models.celt_decoder import CELTDecoder
    from esp32_opus_player_tpu.models.stream_pool import StreamPool
    from conftest import fixture_path
    d = 48000 // out_fs
    src = str(fixture_path("celt_fb_mono_20ms"))
    s = opusfile.open_file(src)
    cd = CELTDecoder(1, compat_ref=True)
    cd.downsample = d
    exp = []
    for job in s.jobs:
        parsed = parse_packet(job.data)
        pcm = np.zeros(960 // d, dtype=np.int64)
        cd.decode_with_ec(RangeDecoder(parsed.frames[0]), pcm, 960 // d)
        fr = np.asarray(pcm, dtype=np.int16).reshape(-1, 1)
        n48 = 960
        lo = -(-job.discard_front // d)
        keep = -(-(n48 - job.trim_end) // d)
        exp.append(fr[lo:max(keep, lo)])
    exp = np.concatenate(exp)
    out = StreamPool([src] * 2, channels=1, native=True,
                     compat_ref=True, out_fs=out_fs).run()
    for o in out:
        assert np.array_equal(o, exp)


@pytest.mark.parametrize("name,out_fs", [
    ("silk_wb_mono_20ms", 16000),   # 16->16 copy
    ("silk_wb_mono_20ms", 12000),   # 16->12 down-FIR 3/4
    ("silk_wb_mono_20ms", 8000),    # 16->8  down-FIR 1/2
    ("silk_wb_mono_20ms", 24000),   # 16->24 IIR-FIR up
    ("silk_nb_mono_20ms", 16000),   # 8->16  2x allpass up
    ("silk_nb_mono_20ms", 12000),   # 8->12  IIR-FIR up (non-2x)
    ("silk_mb_mono_20ms", 8000),    # 12->8  down-FIR 2/3
    ("hybrid_swb_mono_20ms", 16000),  # SILK copy + CELT decimate, mixed
])
def test_pool_out_fs_silk_and_hybrid(name, out_fs):
    """SILK/hybrid pools at out_fs: the batched reference resampler bank
    (resample_batch — copy / up2 / IIR-FIR / down-FIR, silk.cpp:3590)
    takes the internal rate straight to out_fs; hybrid rows mix the
    resampled SILK with the decimated CELT at out_fs. Must equal the
    scalar multi-rate decoder (OpusDecoder(fs=out_fs), itself bit-exact
    vs libopus at every rate — test_multirate.py)."""
    src = str(fixture_path(name))
    ref = decode_file(src, DecoderConfig(channels=1, sample_rate=out_fs,
                                         compat_ref=True))
    outs = StreamPool([src] * 2, channels=1, native=True,
                      compat_ref=True, out_fs=out_fs).run()
    for o in outs:
        assert np.array_equal(o, ref)


def test_pool_out_fs_stereo_silk():
    src = str(fixture_path("silk_wb_stereo_20ms"))
    ref = decode_file(src, DecoderConfig(channels=2, sample_rate=16000,
                                         compat_ref=True))
    outs = StreamPool([src] * 2, channels=2, native=True,
                      compat_ref=True, out_fs=16000).run()
    for o in outs:
        assert np.array_equal(o, ref)


def test_pool_out_fs_silk_loss_plc():
    """Concealment frames resample through the same out_fs path."""
    from esp32_opus_player_tpu.host import opusfile
    from esp32_opus_player_tpu.models.opus_decoder import OpusDecoder
    name = "silk_wb_mono_20ms"
    src = str(fixture_path(name))
    s = opusfile.open_file(src)
    dec = OpusDecoder(1, fs=16000, compat_ref=True)
    exp = []
    for k, job in enumerate(s.jobs):
        pcm = dec.decode(None if (k > 0 and k % 5 == 0) else job.data)
        d = 3
        lo = -(-job.discard_front // d)
        hi = -(-(pcm.shape[0] * d - job.trim_end) // d)
        exp.append(pcm[lo:max(hi, lo)])
    exp = np.concatenate(exp)
    pool = StreamPool([src] * 2, channels=1, native=True,
                      compat_ref=True, out_fs=16000)
    outs = pool.run(loss=lambda i, k: k > 0 and k % 5 == 0)
    for o in outs:
        assert np.array_equal(o, exp)


def test_pool_phase_timing_and_device_trace(tmp_path):
    """SURVEY §5 tracing: stats() exposes per-phase host wall time for
    the step() pipeline, and device_trace captures a JAX profile."""
    import os
    from esp32_opus_player_tpu.utils.tracing import device_trace
    src = str(fixture_path("celt_fb_mono_20ms"))
    pool = StreamPool([src], channels=1, native=True, compat_ref=True)
    with device_trace(str(tmp_path)):
        pool.run()
    st = pool.stats()
    ph = st["phase_s"]
    assert set(ph) == {"host_symbol", "dispatch", "materialize"}
    assert ph["host_symbol"] > 0 and ph["dispatch"] > 0
    assert ph["materialize"] > 0
    # the profiler wrote a trace directory
    found = [f for _r, _d, fs in os.walk(tmp_path) for f in fs]
    assert found, "device_trace produced no profile files"
