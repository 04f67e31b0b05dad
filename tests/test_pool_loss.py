"""Packet loss on the batched StreamPool paths (BASELINE config 5 shape):
concealment must stay on the device-batched path and remain bit-exact
with the scalar decoder replaying the same loss pattern (which is itself
golden-tested against the compiled reference in test_plc.py)."""
import numpy as np
import pytest

from esp32_opus_player_tpu.host import opusfile
from esp32_opus_player_tpu.models.opus_decoder import OpusDecoder
from esp32_opus_player_tpu.models.stream_pool import StreamPool

from conftest import fixture_path

PERIOD = 5


def _scalar_with_loss(name, period):
    s = opusfile.open_file(fixture_path(name))
    dec = OpusDecoder(1, compat_ref=True)
    out = []
    for k, job in enumerate(s.jobs):
        if k > 0 and k % period == 0:
            try:
                pcm = dec.decode(None)
            except ValueError:  # hybrid loss: CELT stage errors -> silence
                pcm = np.zeros((960, 1), dtype=np.int16)
        else:
            pcm = dec.decode(job.data)
        lo = job.discard_front
        hi = pcm.shape[0] - job.trim_end
        out.append(pcm[lo:max(hi, lo)])
    return np.concatenate(out)


@pytest.mark.slow
@pytest.mark.parametrize("native", [True, False])
def test_pool_loss_bitexact_vs_scalar(native):
    names = ["silk_wb_mono_20ms", "silk_nb_mono_20ms",
             "celt_fb_mono_20ms", "hybrid_swb_mono_20ms"]
    pool = StreamPool([str(fixture_path(n)) for n in names], channels=1,
                      native=native, compat_ref=True)
    outs = pool.run(loss=lambda i, k: k > 0 and k % PERIOD == 0)
    for i, n in enumerate(names):
        ref = _scalar_with_loss(n, PERIOD)
        assert np.array_equal(outs[i], ref), n
    st = pool.stats()
    assert st["frames_lost"] > 0


@pytest.mark.slow
def test_pool_burst_loss_recovers():
    """5 consecutive losses mid-stream, then clean decode to the end —
    the batched state must resynchronise exactly like the scalar path."""
    name = "silk_wb_mono_20ms"
    burst = set(range(20, 25))
    pool = StreamPool([str(fixture_path(name))], channels=1,
                      native=True, compat_ref=True)
    outs = pool.run(loss=lambda i, k: k in burst)

    s = opusfile.open_file(fixture_path(name))
    dec = OpusDecoder(1, compat_ref=True)
    ref = []
    for k, job in enumerate(s.jobs):
        pcm = dec.decode(None if k in burst else job.data)
        lo = job.discard_front
        hi = pcm.shape[0] - job.trim_end
        ref.append(pcm[lo:max(hi, lo)])
    assert np.array_equal(outs[0], np.concatenate(ref))
