"""In-band FEC on the batched StreamPool paths: a lost SILK/hybrid frame
is reconstructed from the NEXT packet's LBRR copy (silk_Decode lostFlag=2)
without leaving the device-batched path, bit-exact with a scalar decoder
applying the same recovery policy (decode_fec when LBRR is present, the
compat loss path otherwise)."""
import numpy as np
import pytest

from esp32_opus_player_tpu.host import opusfile
from esp32_opus_player_tpu.host.packet import parse_packet
from esp32_opus_player_tpu.host.range_decoder import RangeDecoder
from esp32_opus_player_tpu.models.opus_decoder import OpusDecoder
from esp32_opus_player_tpu.models.stream_pool import StreamPool

from conftest import fixture_path

PERIOD = 5


def _has_lbrr(packet_data):
    f = parse_packet(packet_data).frames[0]
    d = RangeDecoder(f)
    d.dec_bit_logp(1)  # VAD flag (mono 20 ms: one frame per packet)
    return bool(d.dec_bit_logp(1))


def _scalar_fec_replay(name, lossfn):
    s = opusfile.open_file(fixture_path(name))
    dec = OpusDecoder(1, compat_ref=True)
    out = []
    jobs = s.jobs
    for k, job in enumerate(jobs):
        if lossfn(k):
            pcm = None
            if k + 1 < len(jobs) and not lossfn(k + 1) \
                    and _has_lbrr(jobs[k + 1].data):
                pcm = dec.decode(jobs[k + 1].data, decode_fec=True)
            if pcm is None:
                try:
                    pcm = dec.decode(None)
                except ValueError:  # hybrid loss: CELT errors -> silence
                    pcm = np.zeros((960, 1), dtype=np.int16)
        else:
            pcm = dec.decode(job.data)
        lo = job.discard_front
        hi = pcm.shape[0] - job.trim_end
        out.append(pcm[lo:max(hi, lo)])
    return np.concatenate(out)


@pytest.mark.slow
@pytest.mark.parametrize("native", [True, False])
def test_pool_fec_bitexact_vs_scalar(native):
    names = ["silk_wb_fec_mono_20ms", "hybrid_swb_fec_mono_20ms",
             "silk_wb_mono_20ms"]  # last: FEC requested but no LBRR ever
    lossfn = lambda k: k > 0 and k % PERIOD == 0
    pool = StreamPool([str(fixture_path(n)) for n in names], channels=1,
                      native=native, compat_ref=True)
    outs = pool.run(loss=lambda i, k: lossfn(k), fec=True)
    for i, n in enumerate(names):
        ref = _scalar_fec_replay(n, lossfn)
        assert np.array_equal(outs[i], ref), n
    st = pool.stats()
    assert st["frames_fec"] > 0
    assert st["frames_lost"] > st["frames_fec"]  # some fell back to loss


@pytest.mark.slow
def test_pool_fec_beats_plain_loss():
    """FEC recovery must track the clean decode more closely than plain
    concealment on the same loss pattern (sanity that LBRR audio is real)."""
    name = "silk_wb_fec_mono_20ms"
    src = str(fixture_path(name))
    lossfn = lambda i, k: k > 0 and k % PERIOD == 0
    clean = StreamPool([src], channels=1).run()[0].astype(np.int64)
    fec = StreamPool([src], channels=1).run(loss=lossfn, fec=True)[0]
    plc = StreamPool([src], channels=1).run(loss=lossfn)[0]
    n = min(len(clean), len(fec), len(plc))
    err_fec = float(np.abs(fec[:n] - clean[:n]).mean())
    err_plc = float(np.abs(plc[:n] - clean[:n]).mean())
    assert err_fec < err_plc
