"""Multi-rate decode API (opus_decoder_init Fs, src/opus_decoder.cpp:85):
SILK output must be bit-exact to libopus at every API rate (both are
fixed-point); CELT is compared against this repo's own fixed-point
downsample semantics (the system libopus is the FLOAT build, which
differs by a few LSB even at 48 kHz) plus a small-error bound vs
libopus as a sanity check."""
import sys
import pathlib

import numpy as np
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).parents[1] / "tools"))

from esp32_opus_player_tpu import DecoderConfig, OpusFile
from esp32_opus_player_tpu.host import opusfile
from esp32_opus_player_tpu.models.opus_decoder import OpusDecoder

from conftest import fixture_path


@pytest.mark.parametrize("fs", [24000, 16000, 8000])
def test_silk_multirate_bitexact_vs_libopus(fs):
    from libopus_ctypes import Decoder
    s = opusfile.open_file(fixture_path("silk_wb_mono_20ms"))
    ref = Decoder(fs=fs, channels=1)
    mine = OpusDecoder(1, fs=fs, compat_ref=False)
    for j in s.jobs[:20]:
        a = ref.decode(j.data)
        b = mine.decode(j.data)
        assert a.shape == b.shape and np.array_equal(a, b)


@pytest.mark.parametrize("name,ch,fs,tol", [
    ("celt_fb_mono_20ms", 1, 24000, 16),
    ("celt_fb_mono_20ms", 1, 16000, 16),
    ("hybrid_fb_stereo_20ms", 2, 24000, 16),
])
def test_celt_multirate_close_to_libopus(name, ch, fs, tol):
    from libopus_ctypes import Decoder
    s = opusfile.open_file(fixture_path(name))
    ref = Decoder(fs=fs, channels=ch)
    mine = OpusDecoder(ch, fs=fs, compat_ref=False)
    for j in s.jobs[:15]:
        a = ref.decode(j.data).astype(int)
        b = mine.decode(j.data).astype(int)
        assert a.shape == b.shape
        assert np.abs(a - b).max() <= tol   # float-build libopus delta


def test_celt_multirate_matches_own_downsample():
    """The multi-rate CELT path must equal the (already validated)
    scalar downsample semantics: decode@16k == the 48k decoder's
    decimated output path run with downsample=3."""
    from esp32_opus_player_tpu.host.packet import parse_packet
    from esp32_opus_player_tpu.host.range_decoder import RangeDecoder
    from esp32_opus_player_tpu.models.celt_decoder import CELTDecoder
    s = opusfile.open_file(fixture_path("celt_fb_mono_20ms"))
    mine = OpusDecoder(1, fs=16000, compat_ref=True)
    cd = CELTDecoder(1, compat_ref=True)
    cd.downsample = 3
    for j in s.jobs[:10]:
        b = mine.decode(j.data)
        pcm = np.zeros(320, dtype=np.int64)
        cd.decode_with_ec(RangeDecoder(parse_packet(j.data).frames[0]),
                          pcm, 320)
        assert np.array_equal(b[:, 0], pcm.astype(np.int16))


@pytest.mark.parametrize("fs", [16000, 8000])
def test_opusfile_multirate_preskip(fs):
    """OpusFile at a lower API rate: pre-skip/end-trim keep the
    decimated samples whose 48 kHz index survives the trim, total
    duration scales by fs/48000."""
    cfg48 = DecoderConfig(channels=1, compat_ref=False)
    cfg = DecoderConfig(channels=1, sample_rate=fs, compat_ref=False)
    f48 = OpusFile(str(fixture_path("silk_wb_mono_20ms")), cfg48)
    flo = OpusFile(str(fixture_path("silk_wb_mono_20ms")), cfg)
    a = f48.read_all()
    b = flo.read_all()
    d = 48000 // fs
    assert abs(b.shape[0] - a.shape[0] // d) <= 1
