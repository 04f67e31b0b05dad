"""In-band FEC (SILK LBRR) decode-on-loss: bit-identical to libopus
opus_decode(..., decode_fec=1). A capability the reference carries in its
SILK layer (silk_Decode lostFlag=2, src/silk.cpp:1682) but never exposes."""
import ctypes
import pathlib
import sys

import numpy as np
import pytest

from esp32_opus_player_tpu.host import opusfile
from esp32_opus_player_tpu.models.opus_decoder import OpusDecoder

from conftest import fixture_path

sys.path.insert(0, str(pathlib.Path(__file__).parents[1] / "tools"))


def _lib():
    try:
        import libopus_ctypes as lo
        return lo
    except OSError:
        pytest.skip("system libopus unavailable")


def test_fec_bitexact_vs_libopus():
    lo = _lib()
    s = opusfile.open_file(fixture_path("silk_wb_fec_mono_20ms"))

    ref = lo.Decoder(48000, 1)

    def ref_decode(packet, fec):
        out = np.empty(960, dtype=np.int16)
        n = lo.lib.opus_decode(
            ctypes.c_void_p(ref._st), packet,
            len(packet) if packet else 0,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)), 960, fec)
        assert n > 0
        return out[:n].reshape(n, 1)

    mine = OpusDecoder(1, compat_ref=False)
    i = 0
    jobs = s.jobs
    while i < len(jobs):
        if i > 0 and i % 7 == 0 and i + 1 < len(jobs):
            # packet i lost: recover it from packet i+1's LBRR, then
            # decode packet i+1 normally
            r1 = ref_decode(jobs[i + 1].data, 1)
            m1 = mine.decode(jobs[i + 1].data, decode_fec=True)
            assert np.array_equal(r1, m1), f"FEC recovery at {i}"
            r2 = ref_decode(jobs[i + 1].data, 0)
            m2 = mine.decode(jobs[i + 1].data)
            assert np.array_equal(r2, m2), f"post-FEC decode at {i + 1}"
            i += 2
        else:
            r = ref_decode(jobs[i].data, 0)
            m = mine.decode(jobs[i].data)
            assert np.array_equal(r, m), f"normal decode at {i}"
            i += 1
