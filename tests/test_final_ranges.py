"""final_ranges(): the OPUS_GET_FINAL_RANGE conformance probe must be
exact for every batched pool path (reference src/opus_decoder.cpp:375;
golden ranges from libopus). Round-1 gap: native SILK-only streams
returned None and python-engine pools returned stale values."""
import numpy as np
import pytest

from esp32_opus_player_tpu.models.stream_pool import StreamPool

from conftest import fixture_path, golden_ranges

CASES = [
    ("celt_fb_mono_20ms", 1),
    ("silk_wb_mono_20ms", 1),
    ("silk_nb_mono_20ms", 1),
    ("hybrid_swb_mono_20ms", 1),
]


@pytest.mark.parametrize("native", [True, False])
def test_pool_final_ranges_match_libopus(native):
    # RFC mode: the compat end-band-ignored quirk makes non-fullband
    # CELT consume different symbols than libopus, so ranges only line
    # up in spec-correct mode (they are identical there for all paths)
    srcs = [str(fixture_path(n)) for n, _c in CASES]
    pool = StreamPool(srcs, channels=1, native=native, compat_ref=False)
    pool.run()
    got = pool.final_ranges()
    for k, (name, _ch) in enumerate(CASES):
        want = golden_ranges(name)[-1]["final_range"]
        assert got[k] == want, (name, hex(got[k] or 0), hex(want))


@pytest.mark.parametrize("native", [True, False])
def test_pool_final_ranges_stereo(native):
    name = "silk_wb_stereo_20ms"
    pool = StreamPool([str(fixture_path(name))], channels=2,
                      native=native, compat_ref=True)
    assert pool.path[0][0] == "silk2"
    pool.run()
    want = golden_ranges(name)[-1]["final_range"]
    assert pool.final_ranges()[0] == want
