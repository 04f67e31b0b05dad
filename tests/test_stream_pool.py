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


def test_pool_out_fs_rejects_silk():
    import pytest as _pytest
    from esp32_opus_player_tpu.models.stream_pool import StreamPool
    from conftest import fixture_path
    with _pytest.raises(ValueError):
        StreamPool([str(fixture_path("silk_wb_mono_20ms"))], channels=1,
                   out_fs=16000)
