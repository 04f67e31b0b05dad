"""Checkpoint/resume + observability for StreamPool: a snapshot taken
mid-decode, restored onto a fresh pool over the same sources, must finish
with bit-identical output (device pytrees, native host structs, scalar
decoders and cursors all round-trip)."""
import numpy as np
import pytest

from esp32_opus_player_tpu import DecoderConfig, decode_file
from esp32_opus_player_tpu.models.stream_pool import StreamPool

from conftest import fixture_path

SRCS = ["celt_fb_mono_20ms", "silk_wb_mono_20ms", "hybrid_swb_mono_20ms",
        "silk_nb_stereo_40ms"]  # last one exercises the scalar path


def _mk():
    return StreamPool([str(fixture_path(s)) for s in SRCS], channels=1,
                      native=True, compat_ref=True)


@pytest.mark.slow
def test_checkpoint_resume_bitexact(tmp_path):
    golden = _mk().run()

    pool = _mk()
    for _ in range(3):
        assert pool.step()
    ck = tmp_path / "pool.ckpt"
    pool.save_checkpoint(str(ck))
    a = pool.run()
    for g, x in zip(golden, a):
        assert np.array_equal(g, x)

    pool2 = _mk()
    pool2.load_checkpoint(str(ck))
    b = pool2.run()
    for g, x in zip(golden, b):
        assert np.array_equal(g, x)

    st = pool2.stats()
    assert st["frames"] > 0 and st["samples_out"] > 0
    assert st["active_streams"] == 0
    assert sum(v for k, v in st["buckets"].items() if k[0] == "celt") > 0
    assert st["frames_scalar"] > 0  # the stereo-SILK stream


@pytest.mark.slow
def test_checkpoint_rejects_wrong_sources(tmp_path):
    pool = _mk()
    pool.step()
    ck = tmp_path / "pool.ckpt"
    pool.save_checkpoint(str(ck))
    other = StreamPool([str(fixture_path(s)) for s in
                        ["silk_wb_mono_20ms"] + SRCS[1:]], channels=1)
    with pytest.raises(ValueError):
        other.load_checkpoint(str(ck))


@pytest.mark.slow
def test_drain_is_incremental():
    golden = _mk().run()
    pool = _mk()
    parts = [[] for _ in SRCS]
    while pool.step():
        for i, p in enumerate(pool.drain()):
            parts[i].append(p)
    for g, ps in zip(golden, parts):
        assert np.array_equal(g, np.concatenate(ps))
