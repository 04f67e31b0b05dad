"""Multi-frame SILK packets (40/60 ms payloads, 2-3 internal frames) on
the batched pool path — RFC mode only (the reference hard-codes audiosize
960, so compat keeps these streams scalar for garbage parity). Each
internal frame reuses the same compiled device core, launched
sequentially; output must equal the RFC scalar decoder bit-exactly."""
import numpy as np
import pytest

from esp32_opus_player_tpu import DecoderConfig, decode_file
from esp32_opus_player_tpu.models.stream_pool import StreamPool

from conftest import fixture_path


@pytest.mark.slow
@pytest.mark.parametrize("native", [True, False])
def test_pool_multiframe_silk_rfc(native):
    names = ["silk_wb_mono_60ms", "silk_wb_mono_40ms", "silk_wb_mono_20ms",
             "silk_wb_mono_10ms"]
    srcs = [str(fixture_path(n)) for n in names]
    pool = StreamPool(srcs, channels=1, native=native, compat_ref=False)
    assert pool.path[0] == ("silk", 16, 3, 60, 20)
    assert pool.path[1] == ("silk", 16, 2, 40, 20)
    assert pool.path[2] == ("silk", 16, 1, 20, 20)
    assert pool.path[3] == ("silk", 16, 1, 10, 10)  # nb_subfr=2 core
    outs = pool.run()
    for i, src in enumerate(srcs):
        ref = decode_file(src, DecoderConfig(channels=1, compat_ref=False))
        assert np.array_equal(outs[i], ref), names[i]
    # all three stream kinds share ONE device core shape (fs=16, 20 ms)
    silk_caps = {k for k in pool.stats()["buckets"] if k[0] == "silk"}
    assert {k[1] for k in silk_caps} == {16}


def test_pool_multiframe_stays_scalar_in_compat():
    src = str(fixture_path("silk_wb_mono_60ms"))
    pool = StreamPool([src], channels=1, compat_ref=True)
    assert pool.path[0] == ("scalar",)
