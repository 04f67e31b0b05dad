"""Native C++ host entropy engine vs the Python host phase: identical
symbol-phase outputs (X, band energies, postfilter params, range state)."""
import numpy as np
import pytest

from esp32_opus_player_tpu.host import opusfile
from esp32_opus_player_tpu.host.packet import parse_packet
from esp32_opus_player_tpu.host.range_decoder import RangeDecoder
from esp32_opus_player_tpu.models.celt_decoder import CELTDecoder

from conftest import fixture_path


@pytest.mark.parametrize("name,ch", [
    ("celt_fb_mono_20ms", 1),
    ("celt_fb_stereo_20ms", 2),
    ("celt_nb_mono_20ms", 1),
])
def test_native_celt_host_matches_python(name, ch):
    native = pytest.importorskip(
        "esp32_opus_player_tpu.host.native")
    s = opusfile.open_file(fixture_path(name))
    py = CELTDecoder(ch, compat_ref=True)
    nat = native.NativeCELTHost(ch)
    for j, job in enumerate(s.jobs[:40]):
        pkt = parse_packet(job.data).frames[0]
        si_py = py.decode_with_ec(RangeDecoder(pkt), None, 960,
                                  defer_synthesis=True)
        si_nat = nat.decode_symbol_phase(pkt, 960)
        N = 960
        assert np.array_equal(si_py["X"][:ch * N].astype(np.int16),
                              si_nat["X"][:ch * N].astype(np.int16)), j
        assert np.array_equal(
            np.asarray(si_py["bandE"], dtype=np.int16),
            si_nat["bandE"].astype(np.int16)), j
        assert si_py["comb1"] == si_nat["comb1"], j
        assert si_py["comb2"] == si_nat["comb2"], j
        assert py.rng == si_nat["rng"], j


@pytest.mark.parametrize("name,fs", [
    ("silk_wb_mono_20ms", 16),
    ("silk_nb_mono_20ms", 8),
    ("silk_mb_mono_20ms", 12),
])
def test_native_silk_host_matches_python(name, fs):
    native = pytest.importorskip("esp32_opus_player_tpu.host.native")
    from esp32_opus_player_tpu.models.silk_decoder import SilkDecoder
    from esp32_opus_player_tpu.models.batch_silk import silk_host_frame
    s = opusfile.open_file(fixture_path(name))
    py = SilkDecoder()
    py.set_raw_params(1, 1, 20, fs * 1000, 48000)
    nat = native.NativeSilkHost()
    for j, job in enumerate(s.jobs[:40]):
        pkt = parse_packet(job.data).frames[0]
        pp = silk_host_frame(py, RangeDecoder(pkt), fs, 20)
        pn = nat.frame(pkt, fs)
        for key in ("A", "B", "gains", "inv", "lag", "voiced", "rewhiten",
                    "match", "adj", "exc"):
            assert np.array_equal(
                np.asarray(pp[key]).astype(np.int64),
                np.asarray(pn[key]).astype(np.int64)), (j, key)
