"""Robustness fuzzing: garbage and bit-corrupted packets must either decode
(to garbage audio, like the reference's in-band resilience) or raise the
intended InvalidPacket/ValueError — never crash with anything else."""
import numpy as np
import pytest

from esp32_opus_player_tpu.host import opusfile
from esp32_opus_player_tpu.host.packet import InvalidPacket
from esp32_opus_player_tpu.models.opus_decoder import OpusDecoder

from conftest import fixture_path


def test_fuzz_garbage_packets():
    rng = np.random.default_rng(42)
    dec = OpusDecoder(1, compat_ref=False)
    for _ in range(200):
        n = int(rng.integers(1, 200))
        pkt = bytes(rng.integers(0, 256, n, dtype=np.uint8))
        try:
            out = dec.decode(pkt)
            assert out.dtype == np.int16
        except (InvalidPacket, ValueError):
            pass  # intended error surface


@pytest.mark.parametrize("name", ["silk_wb_mono_20ms", "celt_fb_mono_20ms",
                                  "hybrid_swb_mono_20ms"])
def test_fuzz_bitflips_never_crash(name):
    rng = np.random.default_rng(7)
    s = opusfile.open_file(fixture_path(name))
    dec = OpusDecoder(1, compat_ref=False)
    for _ in range(120):
        j = int(rng.integers(0, len(s.jobs)))
        data = bytearray(s.jobs[j].data)
        for _ in range(int(rng.integers(1, 4))):
            data[int(rng.integers(0, len(data)))] ^= \
                1 << int(rng.integers(0, 8))
        try:
            dec.decode(bytes(data))
        except (InvalidPacket, ValueError):
            pass


def test_native_engines_survive_garbage():
    """The C symbol engines must never crash the farm process: garbage
    and bit-flipped payloads decode as deterministic nonsense (the range
    decoder reads zeros past the end, like the reference) or raise a
    clean ValueError — never a segfault."""
    import numpy as np
    from esp32_opus_player_tpu.host.native import (
        NativeCELTHost, NativeSilkHost, NativeSilkStereoHost)
    rng = np.random.default_rng(7)
    for trial in range(120):
        n = int(rng.integers(0, 120))
        data = bytes(rng.integers(0, 256, n, dtype=np.uint8))
        try:
            kind = trial % 4
            if kind == 0:
                NativeCELTHost(1).decode_symbol_phase(data, 960)
            elif kind == 1:
                NativeSilkHost().frame(data, 16)
            elif kind == 2:
                NativeSilkHost().packet(data, 16, 60)
            else:
                NativeSilkStereoHost().packet(data, 16)
        except ValueError:
            pass
