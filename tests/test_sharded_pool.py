"""Single-program multi-chip pool: ONE jitted step over an 8-device
virtual mesh with the state pytree sharded on the streams axis —
decoding real fixtures bit-exactly (SURVEY.md §2.7; the conftest forces
an 8-device CPU platform)."""
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


def test_sharded_celt_pool_bitexact(mesh):
    name = "celt_fb_mono_20ms"
    pool = ShardedStreamPool([str(fixture_path(name))] * 16, mesh=mesh,
                             channels=1, compat_ref=True)
    # the state really is sharded over the mesh
    sh = pool.state["decode_mem"].sharding
    assert sh.mesh.devices.size == 8
    outs = pool.run()
    gold = golden_pcm(name)[:, :1]
    assert all(np.array_equal(o, gold) for o in outs)


def test_sharded_silk_pool_bitexact(mesh):
    name = "silk_wb_mono_20ms"
    pool = ShardedStreamPool([str(fixture_path(name))] * 8, mesh=mesh,
                             channels=1, compat_ref=True)
    outs = pool.run()
    gold = golden_pcm(name)[:, :1]
    assert all(np.array_equal(o, gold) for o in outs)


def test_sharded_pool_rejects_uneven_split(mesh):
    with pytest.raises(ValueError):
        ShardedStreamPool([str(fixture_path("celt_fb_mono_20ms"))] * 3,
                          mesh=mesh, channels=1)
