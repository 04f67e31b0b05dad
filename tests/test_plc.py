"""Packet-loss concealment tests.

compat_ref parity: the reference's NULL decode runs the normal frame path
over an empty bitstream (its upstream PLC dispatch was pruned); golden from
tests/oracle/ref_plc with every 7th packet lost.

RFC mode: proper SILK PLC (lostFlag=1 concealment) — verified behaviorally:
concealment extrapolates (non-silent on loss after voiced speech) and
decays over consecutive losses.
"""
import numpy as np

from esp32_opus_player_tpu.host import opusfile
from esp32_opus_player_tpu.models.opus_decoder import OpusDecoder

from conftest import GOLDEN, fixture_path


def _decode_with_loss(name, ch, period, compat):
    s = opusfile.open_file(fixture_path(name))
    dec = OpusDecoder(ch, compat_ref=compat)
    out = []
    for i, job in enumerate(s.jobs):
        if i > 0 and i % period == 0:
            out.append(dec.decode(None))
        else:
            out.append(dec.decode(job.data))
    return np.concatenate(out)


def test_plc_compat_bitexact_vs_reference():
    gold = np.fromfile(GOLDEN / "silk_wb_mono_20ms.loss7.pcm",
                       dtype=np.int16).reshape(-1, 1)
    mine = _decode_with_loss("silk_wb_mono_20ms", 1, 7, compat=True)
    n = min(len(mine), len(gold))
    assert n > 0
    assert np.array_equal(mine[:n], gold[:n])


def test_plc_rfc_conceals_and_decays():
    s = opusfile.open_file(fixture_path("silk_wb_mono_20ms"))
    dec = OpusDecoder(1, compat_ref=False)
    for job in s.jobs[:40]:
        dec.decode(job.data)
    # consecutive losses: energy must be nonzero then decay
    energies = []
    for _ in range(6):
        pcm = dec.decode(None)
        energies.append(float(np.abs(pcm.astype(np.int64)).mean()))
    assert energies[0] > 0, "PLC produced silence immediately"
    assert energies[-1] < energies[0], "PLC energy did not decay"
