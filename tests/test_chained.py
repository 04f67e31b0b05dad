"""Chained Ogg streams (multiple links): a new BOS OpusHead after the
previous link's EOS starts an independent stream — fresh decoder,
per-link pre-skip/granule tracking/end-trim (op_fetch_and_process_page
chain handling, reference src/opusfile.cpp:835-1133; the reference
declares the machinery but this framework implements the full policy)."""
import numpy as np
import pytest

from esp32_opus_player_tpu import OpusFile, DecoderConfig, decode_file
from esp32_opus_player_tpu.api import StreamingOpusFile
from esp32_opus_player_tpu.host import opusfile
from esp32_opus_player_tpu.models.stream_pool import StreamPool

from conftest import fixture_path

A, B = "silk_wb_mono_20ms", "celt_fb_mono_20ms"


def _chain(*names):
    return b"".join(fixture_path(n).read_bytes() for n in names)


def _expected(*names):
    cfg = DecoderConfig(channels=1, compat_ref=True)
    return np.concatenate([decode_file(fixture_path(n), cfg)
                           for n in names])


def test_parse_stream_links():
    s = opusfile.parse_stream(_chain(A, B))
    assert s.n_links == 2
    links = sorted({j.link for j in s.jobs})
    assert links == [0, 1]
    # each link re-applies its own pre-skip
    first_of_link1 = next(j for j in s.jobs if j.link == 1)
    assert first_of_link1.discard_front == s.link_heads[1].pre_skip


def test_chained_opusfile_decodes_both_links():
    cfg = DecoderConfig(channels=1, compat_ref=True)
    got = OpusFile(_chain(A, B), cfg).read_all()
    want = _expected(A, B)
    assert np.array_equal(got, want)


def test_chained_three_links():
    cfg = DecoderConfig(channels=1, compat_ref=True)
    got = OpusFile(_chain(A, B, A), cfg).read_all()
    assert np.array_equal(got, _expected(A, B, A))


def test_chained_streaming_reader():
    cfg = DecoderConfig(channels=1, compat_ref=True)
    raw = _chain(A, B)
    sf = StreamingOpusFile(cfg)
    rng = np.random.default_rng(5)
    got, pos = [], 0
    while pos < len(raw):
        n = int(rng.integers(1, 1499))
        sf.feed(raw[pos:pos + n])
        pos += n
        got.append(sf.read(1 << 20))
    sf.close()
    got.append(sf.read(1 << 20))
    got = np.concatenate([g for g in got if len(g)])
    assert np.array_equal(got, _expected(A, B))


def test_chained_pool_scalar_path():
    chain = _chain(A, B)
    pool = StreamPool([chain], channels=1, compat_ref=True)
    assert pool.path[0] == ("scalar",)
    out = pool.run()[0]
    assert np.array_equal(out, _expected(A, B))
