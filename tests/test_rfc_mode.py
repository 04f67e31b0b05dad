"""RFC-conformance mode tests: capabilities beyond the reference.

The reference hard-codes 20 ms frames (src/opus_decoder.cpp:161 crashes on
anything else) and ignores the CELT end band (src/celt.cpp:2199). With
compat_ref=False this framework decodes all RFC 6716 frame sizes
(2.5/5/10/20/40/60 ms) with correct end-band handling. Verified against
libopus: the per-packet final range must match exactly (entropy-path
conformance), and PCM must be within a small fixed-vs-float tolerance
(SILK-only output is bit-identical since libopus SILK is fixed-point).
"""
import numpy as np
import pytest

from esp32_opus_player_tpu.host import opusfile
from esp32_opus_player_tpu.models.opus_decoder import OpusDecoder

from conftest import fixture_path, golden_ranges

# (name, channels, pcm tolerance vs float libopus)
RFC_FIXTURES = [
    ("celt_swb_stereo_10ms", 2, 16),
    ("celt_fb_mono_5ms", 1, 16),
    ("celt_fb_stereo_2p5ms", 2, 16),
    ("silk_wb_mono_60ms", 1, 0),
    ("silk_wb_mono_40ms", 1, 0),
    ("silk_wb_mono_10ms", 1, 0),
    ("silk_nb_stereo_40ms", 2, 0),
    ("hybrid_fb_mono_10ms", 1, 4),
    ("celt_nb_mono_20ms", 1, 16),
    ("hybrid_swb_mono_20ms", 1, 4),
    ("hybrid_fb_stereo_10ms", 2, 4),
    ("silk_wb_fec_mono_10ms", 1, 0),
    ("silk_wb_fec_stereo_10ms", 2, 0),
    ("hybrid_swb_fec_mono_10ms", 1, 4),
]


@pytest.mark.parametrize("name,ch,tol", RFC_FIXTURES)
def test_rfc_mode_conformance(name, ch, tol):
    s = opusfile.open_file(fixture_path(name))
    ranges = golden_ranges(name)
    dec = OpusDecoder(ch, compat_ref=False)
    out = []
    for j, job in enumerate(s.jobs):
        out.append(dec.decode(job.data))
        assert dec.final_range == ranges[j]["final_range"], \
            f"{name}: final range mismatch at packet {j}"
    mine = np.concatenate(out)
    try:
        import sys
        import pathlib
        sys.path.insert(0, str(pathlib.Path(__file__).parents[1] / "tools"))
        import libopus_ctypes as lo
    except OSError:
        pytest.skip("system libopus unavailable")
    d2 = lo.Decoder(48000, ch)
    flt = np.concatenate([d2.decode(job.data) for job in s.jobs])
    n = min(len(mine), len(flt))
    diff = np.abs(mine[:n].astype(np.int32) - flt[:n].astype(np.int32))
    assert diff.max() <= tol, f"{name}: maxdiff {diff.max()} > {tol}"
