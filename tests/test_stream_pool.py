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
