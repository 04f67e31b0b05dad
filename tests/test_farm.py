"""PoolFarm (BASELINE config 5 shape): streams partitioned across all
devices of the (virtual 8-device CPU) mesh must decode bit-identically to
a single-device pool, including loss+FEC schedules routed by global
stream index, mid-flight stream admission, and shard checkpoints."""
import numpy as np
import pytest

import jax

from esp32_opus_player_tpu.models.stream_pool import StreamPool
from esp32_opus_player_tpu.parallel.farm import PoolFarm

from conftest import fixture_path

NAMES = ["celt_fb_mono_20ms", "silk_wb_mono_20ms", "hybrid_swb_mono_20ms",
         "silk_wb_fec_mono_20ms", "silk_nb_mono_20ms",
         "hybrid_swb_fec_mono_20ms", "celt_fb_mono_drums_20ms",
         "silk_mb_mono_20ms", "silk_wb_mono_20ms", "celt_fb_mono_20ms"]
SRCS = [str(fixture_path(n)) for n in NAMES]


@pytest.mark.slow
def test_farm_matches_single_pool():
    farm = PoolFarm(SRCS, channels=1)
    assert len({str(p.state["decode_mem"].devices()) for p in farm.pools
                }) > 1, "shards not spread over devices"
    outs = farm.run()
    ref = StreamPool(SRCS, channels=1).run()
    for i in range(len(SRCS)):
        assert np.array_equal(outs[i], ref[i]), NAMES[i]
    st = farm.stats()
    assert st["shards"] == len(jax.devices())
    assert st["active_streams"] == 0
    assert st["frames"] == sum(s["frames"] for s in st["per_shard"])


@pytest.mark.slow
def test_farm_loss_fec_global_indexing():
    lossfn = lambda g, k: k > 0 and (k + g) % 6 == 0
    farm = PoolFarm(SRCS, channels=1)
    outs = farm.run(loss=lossfn, fec=True)
    ref = StreamPool(SRCS, channels=1).run(
        loss=lossfn, fec=True)
    for i in range(len(SRCS)):
        assert np.array_equal(outs[i], ref[i]), NAMES[i]
    assert farm.stats()["frames_fec"] > 0


@pytest.mark.slow
def test_farm_superstep_matches_single_pool():
    """superstep_k plumbs through to every shard pool: a uniform
    mono-SILK farm at K=8 dispatches ONE device program per 8 frames
    per shard and stays bit-exact vs the plain single pool (VERDICT r03
    item 1b: farm.py used to hardcode its pool kwargs without
    superstep_k, so the pod-scale vehicle could not run the fast
    path)."""
    srcs = [str(fixture_path("silk_wb_mono_20ms"))] * 8
    farm = PoolFarm(srcs, channels=1, fixed_buckets=True, superstep_k=8)
    for pool in farm.pools:
        assert pool._ss_k == 8, "superstep_k did not reach the shard pool"
    outs = farm.run()
    ref = StreamPool(srcs, channels=1).run()
    for i in range(len(srcs)):
        assert np.array_equal(outs[i], ref[i])


@pytest.mark.slow
def test_farm_add_stream_midflight():
    farm = PoolFarm(SRCS[:4], channels=1)
    for _ in range(10):
        farm.step()
    g = farm.add_stream(SRCS[4])
    assert g == 4
    outs = farm.run()
    # pre-existing streams unaffected by admission
    ref = StreamPool(SRCS[:4], channels=1).run()
    for i in range(4):
        assert np.array_equal(outs[i], ref[i]), NAMES[i]
    # the admitted stream decodes from scratch, completely
    ref4 = StreamPool([SRCS[4]], channels=1).run()[0]
    assert np.array_equal(outs[4], ref4)


@pytest.mark.slow
def test_farm_add_stream_tmode(monkeypatch):
    """add_stream on a TRANSPOSED-mode shard: decode_mem carries its
    streams axis LAST (CC, L, n), so the state carry must slice that
    axis — a streams-leading copy would graft channel rows instead."""
    monkeypatch.setenv("OTPU_T_MODE", "1")
    import jax
    from esp32_opus_player_tpu import DecoderConfig, decode_file
    src = SRCS[0]                       # celt fixture
    farm = PoolFarm([src], devices=jax.devices()[:1], channels=1)
    assert farm.pools[0]._t_mode
    for _ in range(5):
        farm.step()
    g = farm.add_stream(src)
    assert farm.pools[0]._t_mode
    for _ in range(6):
        farm.step()
    outs = farm.collect()
    ref = decode_file(src, DecoderConfig(channels=1, compat_ref=True))
    n0, ng = outs[0].shape[0], outs[g].shape[0]
    assert n0 >= 9 * 960 and ng >= 4 * 960
    assert np.array_equal(outs[0], ref[:n0])
    assert np.array_equal(outs[g], ref[:ng])


@pytest.mark.slow
def test_farm_add_stream_cross_kind_reroutes():
    """Admitting a different-kind stream must not hard-fail the farm
    when a matching-kind shard exists: a shard whose uniform superstep
    pool would re-partition into kind sub-pools is skipped and the next
    shard (by load) is tried (r04 advisor / VERDICT weak #5)."""
    silk = str(fixture_path("silk_wb_mono_20ms"))
    celt = str(fixture_path("celt_fb_mono_20ms"))
    devs = jax.devices()[:2]
    farm = PoolFarm([silk, celt], devices=devs, channels=1,
                    fixed_buckets=True, superstep_k=4)
    for _ in range(3):
        farm.step()
    # shard 0 is uniform-SILK: celt admission there would re-partition;
    # it must land on shard 1 (uniform-CELT) instead of raising
    g = farm.add_stream(celt)
    assert farm.placement[g][0] == 1
    outs = farm.run()
    ref_s = StreamPool([silk], channels=1, fixed_buckets=True,
                       superstep_k=4).run()[0]
    ref_c = StreamPool([celt], channels=1, fixed_buckets=True,
                       superstep_k=4).run()[0]
    assert np.array_equal(outs[0], ref_s)
    assert np.array_equal(outs[1], ref_c)
    assert np.array_equal(outs[g], ref_c)
