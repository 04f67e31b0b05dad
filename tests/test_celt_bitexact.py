"""CELT decode bit-exactness vs the compiled reference oracle.

Two independent golden signals per fixture:
  * per-packet OPUS_GET_FINAL_RANGE from libopus — proves the entire
    entropy/symbol walk consumed identical symbols (in RFC mode);
  * PCM from the reference oracle (compat_ref mode) — proves the whole
    fixed-point synthesis path is bit-exact, ≤0 LSB error.
"""
import numpy as np
import pytest

from esp32_opus_player_tpu.host import opusfile
from esp32_opus_player_tpu.models.opus_decoder import OpusDecoder

from conftest import fixture_path, golden_pcm, golden_ranges

CELT_FIXTURES = [
    ("celt_fb_mono_20ms", 1),
    ("celt_fb_stereo_20ms", 2),
    ("celt_nb_mono_20ms", 1),
    ("celt_fb_stereo_family1", 2),
]


@pytest.mark.parametrize("name,ch", CELT_FIXTURES)
def test_celt_pcm_bitexact_vs_reference(name, ch, manifest):
    s = opusfile.open_file(fixture_path(name))
    gold = golden_pcm(name)
    dec = OpusDecoder(ch, compat_ref=True)
    out = [dec.decode(j.data) for j in s.jobs]
    mine = np.concatenate(out)[manifest[name]["pre_skip"]:]
    if ch == 1:
        mine = np.repeat(mine, 2, axis=1)
    n = min(len(mine), len(gold))
    assert n > 0
    diff = np.abs(mine[:n].astype(np.int32) - gold[:n].astype(np.int32))
    assert diff.max() == 0, f"{name}: max PCM diff {diff.max()}"


@pytest.mark.parametrize("name,ch", [
    ("celt_fb_mono_20ms", 1),
    ("celt_fb_stereo_20ms", 2),
    ("celt_fb_stereo_family1", 2),
])
def test_celt_final_range_matches_libopus(name, ch):
    """Entropy-path conformance: final range identical to libopus per packet
    (compat mode works here because these fixtures are fullband)."""
    s = opusfile.open_file(fixture_path(name))
    ranges = golden_ranges(name)
    dec = OpusDecoder(ch, compat_ref=True)
    for j, rec in zip(s.jobs, ranges):
        dec.decode(j.data)
        assert dec.final_range == rec["final_range"]
