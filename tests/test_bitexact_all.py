"""Full-decoder bit-exactness: every fixture, every codec path, vs the
compiled reference oracle (PCM) and libopus (per-packet final range).

This is the core conformance suite (BASELINE: per-sample max error <= 1 LSB;
we achieve 0 LSB). compat_ref=True replicates the reference's quirks
(end-band ignored, 20 ms frames, redundancy skipped) so the comparison is
exact.
"""
import numpy as np
import pytest

from esp32_opus_player_tpu.host import opusfile
from esp32_opus_player_tpu.models.opus_decoder import OpusDecoder

from conftest import fixture_path, golden_pcm, golden_ranges

# (name, channels, final_range comparable to libopus)
# range_ok=False where the reference's end-band quirk desyncs the symbol
# walk from libopus (non-fullband CELT/hybrid), or redundancy frames exist.
FIXTURES = [
    ("celt_fb_mono_20ms", 1, True),
    ("celt_fb_stereo_20ms", 2, True),
    ("celt_nb_mono_20ms", 1, False),
    ("celt_fb_stereo_family1", 2, True),
    ("celt_fb_mono_drums_20ms", 1, True),
    ("celt_fb_stereo_drums_20ms", 2, True),
    ("silk_nb_mono_20ms", 1, True),
    ("silk_mb_mono_20ms", 1, True),
    ("silk_wb_mono_20ms", 1, True),
    ("silk_wb_stereo_20ms", 2, True),
    ("silk_wb_fec_mono_20ms", 1, True),
    ("hybrid_fb_stereo_20ms", 2, True),
    ("hybrid_swb_mono_20ms", 1, False),
    ("hybrid_swb_fec_mono_20ms", 1, False),
    ("modeswitch_stereo_20ms", 2, False),
]


@pytest.mark.parametrize("name,ch,range_comparable", FIXTURES)
def test_pcm_bitexact_vs_reference(name, ch, range_comparable, manifest):
    s = opusfile.open_file(fixture_path(name))
    gold = golden_pcm(name)
    ranges = golden_ranges(name)
    dec = OpusDecoder(ch, compat_ref=True)
    out = []
    n_range_ok = 0
    for j, job in enumerate(s.jobs):
        out.append(dec.decode(job.data))
        n_range_ok += dec.final_range == ranges[j]["final_range"]
    mine = np.concatenate(out)[manifest[name]["pre_skip"]:]
    if ch == 1:
        mine = np.repeat(mine, 2, axis=1)
    n = min(len(mine), len(gold))
    assert n > 0
    diff = np.abs(mine[:n].astype(np.int32) - gold[:n].astype(np.int32))
    assert diff.max() == 0, f"{name}: max PCM diff {diff.max()}"
    if range_comparable:
        assert n_range_ok == len(s.jobs), \
            f"{name}: only {n_range_ok}/{len(s.jobs)} final ranges match"
