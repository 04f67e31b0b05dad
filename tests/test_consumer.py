"""On-chip consumer: a downstream jitted feature stage fed straight
from the pool's device-resident PCM (no host round-trip) must produce
exactly the features of running the same stage over the scalar
decoder's raw per-packet blocks."""
import numpy as np
import pytest

from conftest import fixture_path


def _expected(fx, ch, fe):
    """Reference features: scalar decode per packet (raw, untrimmed
    blocks — the consumer contract) through the SAME jitted stage."""
    import jax.numpy as jnp
    from esp32_opus_player_tpu.host import opusfile
    from esp32_opus_player_tpu.models.opus_decoder import OpusDecoder
    s = opusfile.parse_stream(open(fx, "rb").read())
    dec = OpusDecoder(channels=ch, compat_ref=True)
    blocks = np.stack([dec.decode(j.data) for j in s.jobs])
    feats = np.asarray(fe(jnp.asarray(blocks)))       # (P, F, n_mel)
    return feats.reshape(-1, feats.shape[-1])


@pytest.mark.parametrize("name,ch,ss_k", [
    ("celt_fb_mono_20ms", 1, 1),     # transposed CELT layout
    ("silk_wb_mono_20ms", 1, 1),     # mono SILK layout
    ("silk_wb_stereo_20ms", 2, 1),   # stereo SILK layout
    ("hybrid_fb_stereo_20ms", 2, 1),  # fused device-mix layout
    ("celt_fb_mono_20ms", 1, 4),     # K-frame superstep, HBM slices
    ("silk_wb_mono_20ms", 1, 4),     # SILK superstep, HBM slices
])
def test_onchip_consumer_matches_scalar(name, ch, ss_k):
    from esp32_opus_player_tpu.models.consumer import (LogMelFrontend,
                                                       OnChipConsumer)
    from esp32_opus_player_tpu.models.stream_pool import StreamPool
    src = str(fixture_path(name))
    fe = LogMelFrontend()
    cons = OnChipConsumer(fe)
    pool = StreamPool([src] * 3, channels=ch, native=True,
                      compat_ref=True, fixed_buckets=True,
                      output="device", superstep_k=ss_k)
    pool.attach_consumer(cons)
    while pool.step():
        pass
    pool.sync()
    got = cons.fetch()
    assert not pool._dev_out       # nothing retained: consumer ate it
    want = _expected(src, ch, fe)
    assert set(got) == {0, 1, 2}
    for i, f in got.items():
        assert f.shape == want.shape
        np.testing.assert_allclose(f, want, rtol=0, atol=1e-5)


def test_consumer_requires_device_output():
    from esp32_opus_player_tpu.models.consumer import (LogMelFrontend,
                                                       OnChipConsumer)
    from esp32_opus_player_tpu.models.stream_pool import StreamPool
    src = str(fixture_path("silk_wb_mono_20ms"))
    pool = StreamPool([src], channels=1)
    with pytest.raises(ValueError):
        pool.attach_consumer(OnChipConsumer(LogMelFrontend()))


def test_consumer_survives_loss_step():
    """A conceal step in a consumer pool falls back to the host mix /
    routed PCM but still yields one feature block per frame."""
    from esp32_opus_player_tpu.models.consumer import (LogMelFrontend,
                                                       OnChipConsumer)
    from esp32_opus_player_tpu.models.stream_pool import StreamPool
    src = str(fixture_path("silk_wb_mono_20ms"))
    fe = LogMelFrontend()
    cons = OnChipConsumer(fe)
    pool = StreamPool([src] * 2, channels=1, native=True,
                      compat_ref=False, rfc_plc=True, fixed_buckets=True,
                      output="device")
    pool.attach_consumer(cons)
    k = 0
    while pool.step({0} if k == 3 else None):
        k += 1
    pool.sync()
    got = cons.fetch()
    n_pkts = len(got[1]) // 2       # F=2 feature frames per 20 ms
    assert len(got[0]) == len(got[1])
    assert n_pkts > 4
