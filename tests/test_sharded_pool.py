"""Single-program multi-chip pool: ONE jitted step over an 8-device
virtual mesh with the state pytree sharded on the streams axis —
decoding real fixtures bit-exactly (SURVEY.md §2.7; the conftest forces
an 8-device CPU platform). superstep_k=8 runs the same decode as ONE
K-frame sharded program per 8 frames (lax.scan over the full-batch
frame body) and must stay bit-exact, including the padded partial
trailing window."""
import numpy as np
import pytest

import jax

from esp32_opus_player_tpu.parallel.mesh import make_stream_mesh
from esp32_opus_player_tpu.parallel.sharded_pool import ShardedStreamPool

from conftest import fixture_path, golden_pcm


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest provides 8 virtual devices"
    return make_stream_mesh(jax.devices()[:8])


@pytest.mark.parametrize("superstep_k", [1, 8])
def test_sharded_celt_pool_bitexact(mesh, superstep_k):
    name = "celt_fb_mono_20ms"
    pool = ShardedStreamPool([str(fixture_path(name))] * 16, mesh=mesh,
                             channels=1, compat_ref=True,
                             superstep_k=superstep_k)
    # the state really is sharded over the mesh
    sh = pool.state["decode_mem"].sharding
    assert sh.mesh.devices.size == 8
    outs = pool.run()
    gold = golden_pcm(name)[:, :1]
    assert all(np.array_equal(o, gold) for o in outs)


@pytest.mark.parametrize("superstep_k", [1, 8])
def test_sharded_silk_pool_bitexact(mesh, superstep_k):
    name = "silk_wb_mono_20ms"
    pool = ShardedStreamPool([str(fixture_path(name))] * 8, mesh=mesh,
                             channels=1, compat_ref=True,
                             superstep_k=superstep_k)
    outs = pool.run()
    gold = golden_pcm(name)[:, :1]
    assert all(np.array_equal(o, gold) for o in outs)


def test_sharded_superstep_state_still_sharded(mesh):
    """After K-frame windows the carried state must KEEP its mesh
    sharding (a silent reshard to replicated would explode memory and
    serialize the next window)."""
    name = "celt_fb_mono_20ms"
    pool = ShardedStreamPool([str(fixture_path(name))] * 16, mesh=mesh,
                             channels=1, superstep_k=4)
    for _ in range(4):
        pool.step()
    sh = pool.state["decode_mem"].sharding
    assert getattr(sh, "mesh", None) is not None \
        and sh.mesh.devices.size == 8
    spec = sh.spec
    assert tuple(spec)[:1] == ("streams",)


@pytest.mark.slow
def test_sharded_fused_celt_prefix(mesh, monkeypatch):
    """fused (shard_map) mode: every shard runs StreamPool's transposed
    Pallas CELT body on its local lane block — the only composition
    that is legal on real multi-chip TPU (GSPMD cannot partition a
    pallas_call). Forced on the CPU mesh via OTPU_SHARDMAP=1 with
    interpret-mode kernels (slow — a short prefix only), bit-exact vs
    golden."""
    monkeypatch.setenv("OTPU_SHARDMAP", "1")
    name = "celt_fb_mono_20ms"
    pool = ShardedStreamPool([str(fixture_path(name))] * 8, mesh=mesh,
                             channels=1, compat_ref=True, superstep_k=3)
    assert pool.fused
    # transposed state: lanes axis sharded over the mesh
    assert pool.state["decode_mem"].shape[2] == 8
    for _ in range(7):          # 2 windows + 1-frame partial
        pool.step()
    pool.flush()
    gold = golden_pcm(name)[:, :1]
    for p in pool.pcm_out:
        got = np.concatenate(p)
        assert np.array_equal(got, gold[:got.shape[0]])
        assert got.shape[0] > 0


@pytest.mark.slow
def test_sharded_fused_silk_bitexact(mesh, monkeypatch):
    """fused (shard_map) mono-SILK pool: full decode, bit-exact, K=4
    windows with a padded trailing flush."""
    monkeypatch.setenv("OTPU_SHARDMAP", "1")
    name = "silk_wb_mono_20ms"
    pool = ShardedStreamPool([str(fixture_path(name))] * 8, mesh=mesh,
                             channels=1, compat_ref=True, superstep_k=4)
    assert pool.fused
    outs = pool.run()
    gold = golden_pcm(name)[:, :1]
    assert all(np.array_equal(o, gold) for o in outs)


def test_sharded_pool_rejects_uneven_split(mesh):
    with pytest.raises(ValueError):
        ShardedStreamPool([str(fixture_path("celt_fb_mono_20ms"))] * 3,
                          mesh=mesh, channels=1)


def test_sharded_celt_loss_matches_pool(mesh):
    """Pod-scale loss semantics (VERDICT r04 #6): lost CELT packets are
    consumed, the lane's state is KEPT and silence is emitted — the
    same non-rfc semantics as StreamPool (the reference deleted
    celt_decode_lost). Bit-exact vs the single-device pool replaying
    the same schedule; stats() records the losses."""
    from esp32_opus_player_tpu.models.stream_pool import StreamPool
    name = "celt_fb_mono_20ms"
    lossfn = lambda i, k: k > 0 and (k + i) % 5 == 0
    pool = ShardedStreamPool([str(fixture_path(name))] * 8, mesh=mesh,
                             channels=1, compat_ref=True, superstep_k=4)
    outs = pool.run(loss=lossfn)
    refs = StreamPool([str(fixture_path(name))] * 8,
                      channels=1, compat_ref=True).run(loss=lossfn)
    for i, (o, r) in enumerate(zip(outs, refs)):
        assert np.array_equal(o, r), f"stream {i}"
    st = pool.stats()
    assert st["frames_lost"] > 0 and st["active_streams"] == 0
    assert st["samples_out"] == sum(o.shape[0] for o in outs)


def test_sharded_silk_loss_fec_matches_pool(mesh):
    """Lost SILK packets decode the empty bitstream per-row into the
    group StateArray (compat loss semantics); FEC recovers from the
    next packet's LBRR. Bit-exact vs the single-device pool."""
    from esp32_opus_player_tpu.models.stream_pool import StreamPool
    name = "silk_wb_fec_mono_20ms"
    lossfn = lambda i, k: k > 0 and (k + i) % 6 == 0
    pool = ShardedStreamPool([str(fixture_path(name))] * 8, mesh=mesh,
                             channels=1, compat_ref=True, superstep_k=4)
    outs = pool.run(loss=lossfn, fec=True)
    refs = StreamPool([str(fixture_path(name))] * 8,
                      channels=1, compat_ref=True).run(
        loss=lossfn, fec=True)
    for i, (o, r) in enumerate(zip(outs, refs)):
        assert np.array_equal(o, r), f"stream {i}"
    assert pool.stats()["frames_fec"] > 0


def test_sharded_checkpoint_roundtrip(mesh, tmp_path):
    """Preemptible-safe resume for the SPMD vehicle: snapshot mid-decode
    (device pytrees + native StateArray + cursors + buffered window),
    restore onto a fresh pool, finish — bit-exact vs an uninterrupted
    run."""
    name = "celt_fb_mono_20ms"
    srcs = [str(fixture_path(name))] * 8
    ref = ShardedStreamPool(srcs, mesh=mesh, channels=1,
                            compat_ref=True, superstep_k=4).run()
    pool = ShardedStreamPool(srcs, mesh=mesh, channels=1,
                             compat_ref=True, superstep_k=4)
    for _ in range(6):      # mid-window: 6 = one dispatched + 2 buffered
        pool.step()
    ck = str(tmp_path / "sharded.ck")
    pool.save_checkpoint(ck)
    fresh = ShardedStreamPool(srcs, mesh=mesh, channels=1,
                              compat_ref=True, superstep_k=4)
    fresh.load_checkpoint(ck)
    outs = fresh.run()
    for i, (o, r) in enumerate(zip(outs, ref)):
        assert np.array_equal(o, r), f"stream {i}"
