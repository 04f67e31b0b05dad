"""Heterogeneous superstep pools: a MIXED CELT+SILK+hybrid population
with superstep_k>1 lifts each batchable kind into an internal uniform
sub-pool (StreamPool._kind_subs) so every kind runs its own K-frame
superstep — instead of silently dropping to per-frame dispatch (or,
worse, the scalar path). Decode must stay bit-exact vs the scalar
reference, stats must show zero scalar-path frames, and loss/FEC/
checkpoint/final-range plumbing must route through the sub-pools.
Reference unit of work: one opus_decode_frame per stream per frame
(reference src/opus_decoder.cpp:154)."""
import numpy as np
import pytest

from conftest import fixture_path

MIX = ["celt_fb_mono_20ms", "silk_wb_mono_20ms",
       "hybrid_swb_mono_20ms", "silk_nb_mono_20ms"]


@pytest.mark.slow
def test_hetero_pool_lifts_kinds_and_matches():
    from esp32_opus_player_tpu import DecoderConfig, decode_file
    from esp32_opus_player_tpu.models.stream_pool import StreamPool
    srcs = [str(fixture_path(n)) for n in MIX]
    pool = StreamPool(srcs, channels=1, compat_ref=False,
                      fixed_buckets=True, superstep_k=8)
    assert set(pool._kind_subs) == {"celt", "silk", "hybrid"}
    assert all(p[0] == "sub" for p in pool.path)
    # SILK and hybrid sub-pools superstep on any backend; the CELT
    # sub-pool supersteps in transposed mode (TPU, or OTPU_T_MODE=1 —
    # covered by test_hetero_tmode_celt_superstep below)
    assert pool._kind_subs["silk"]._ss_k == 8
    assert pool._kind_subs["hybrid"]._ss_k == 8
    outs = pool.run()
    for i, src in enumerate(srcs):
        ref = decode_file(src, DecoderConfig(channels=1,
                                             compat_ref=False))
        assert np.array_equal(outs[i], ref), MIX[i]
    st = pool.stats()
    assert st["frames_scalar"] == 0
    assert st["frames"] == 400
    assert st["kind_subs"]["silk"]["superstep_k"] == 8
    assert st["kind_subs"]["hybrid"]["superstep_k"] == 8
    # final ranges route through the sub-pools and match uniform pools
    rngs = pool.final_ranges()
    for i, src in enumerate(srcs):
        up = StreamPool([src], channels=1, compat_ref=False)
        up.run()
        assert rngs[i] == up.final_ranges()[0], MIX[i]


@pytest.mark.slow
def test_hetero_pool_loss_fec_routing():
    """Loss and FEC schedules keyed by PARENT stream index must reach
    the right sub-pool rows; output bit-exact vs uniform pools run with
    the same schedule."""
    from esp32_opus_player_tpu.models.stream_pool import StreamPool
    names = ["celt_fb_mono_20ms", "silk_wb_fec_mono_20ms"]
    srcs = [str(fixture_path(n)) for n in names]
    kw = dict(channels=1, compat_ref=False, rfc_plc=True,
              fixed_buckets=True, superstep_k=8)

    def loss(i, k):
        return k in (7, 31)

    pool = StreamPool(srcs, **kw)
    assert set(pool._kind_subs) == {"celt", "silk"}
    outs = pool.run(loss=loss, fec=True)
    for i, src in enumerate(srcs):
        ref = StreamPool([src], **kw).run(loss=loss, fec=True)[0]
        assert np.array_equal(outs[i], ref), names[i]
    st = pool.stats()
    assert st["frames_lost"] > 0 and st["frames_fec"] > 0
    assert st["frames_scalar"] == 0


@pytest.mark.slow
def test_hetero_tmode_celt_superstep(monkeypatch):
    """With transposed mode forced (OTPU_T_MODE=1, interpret-mode
    kernels on CPU) the CELT sub-pool of a mixed pool runs the K-frame
    superstep too — a few windows only (interpret is slow)."""
    monkeypatch.setenv("OTPU_T_MODE", "1")
    from esp32_opus_player_tpu import DecoderConfig, decode_file
    from esp32_opus_player_tpu.models.stream_pool import StreamPool
    srcs = [str(fixture_path(n))
            for n in ("celt_fb_mono_20ms", "silk_wb_mono_20ms")]
    pool = StreamPool(srcs, channels=1, compat_ref=True,
                      fixed_buckets=True, superstep_k=4)
    csub = pool._kind_subs["celt"]
    assert csub._t_mode and csub._ss_k == 4
    for _ in range(8):
        pool.step()
    got = pool.collected()
    for i, src in enumerate(srcs):
        ref = decode_file(src, DecoderConfig(channels=1,
                                             compat_ref=True))
        n = got[i].shape[0]
        assert n >= 4 * 960          # at least one full window retired
        assert np.array_equal(got[i], ref[:n]), srcs[i]


@pytest.mark.slow
def test_hetero_checkpoint_roundtrip(tmp_path):
    """Checkpoint/resume recurses into the kind sub-pools: a mixed
    superstep pool saved mid-stream resumes bit-exactly."""
    from esp32_opus_player_tpu import DecoderConfig, decode_file
    from esp32_opus_player_tpu.models.stream_pool import StreamPool
    srcs = [str(fixture_path(n)) for n in MIX[:3]]
    kw = dict(channels=1, compat_ref=False, fixed_buckets=True,
              superstep_k=8)
    a = StreamPool(srcs, **kw)
    for _ in range(17):              # mid-window (17 % 8 != 0)
        a.step()
    ck = str(tmp_path / "hetero.ck")
    a.save_checkpoint(ck)
    b = StreamPool(srcs, **kw)
    b.load_checkpoint(ck)
    outs = b.run()
    for i, src in enumerate(srcs):
        ref = decode_file(src, DecoderConfig(channels=1,
                                             compat_ref=False))
        assert np.array_equal(outs[i], ref), MIX[i]


@pytest.mark.slow
def test_farm_hetero_superstep():
    """PoolFarm shards a mixed population: each shard's StreamPool
    kind-partitions and supersteps; global loss indices route through
    shard AND sub-pool."""
    import jax
    from esp32_opus_player_tpu import DecoderConfig, decode_file
    from esp32_opus_player_tpu.parallel.farm import PoolFarm
    srcs = [str(fixture_path(n)) for n in MIX + MIX]
    farm = PoolFarm(srcs, devices=jax.devices()[:2], channels=1,
                    compat_ref=False, fixed_buckets=True, superstep_k=8)
    # round-robin puts celt+hybrid on shard 0 (mixed -> kind subs) and
    # all-silk on shard 1 (uniform -> direct superstep, no lifting)
    assert any(pool._kind_subs for pool in farm.pools)
    outs = farm.run()
    for i, src in enumerate(srcs):
        ref = decode_file(src, DecoderConfig(channels=1,
                                             compat_ref=False))
        assert np.array_equal(outs[i], ref), srcs[i]
    st = farm.stats()
    assert st["frames_scalar"] == 0
