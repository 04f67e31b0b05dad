"""Multistream decoder (mapping family 1): 5.1 surround, bit-exact.

Golden PCM is assembled from the UNMODIFIED reference binary decoding
each elementary stream in isolation (the reference's own multistream walk
shares one global codec state across sub-decoders — a pruning artifact —
so per-stream oracle runs + the reference's channel-routing semantics,
opus_multistream_decode_native src/opus_decoder.cpp:826, give the true
multichannel golden). Final ranges are cross-checked against libopus's
opus_multistream_decoder (entropy path, exact for float and fixed).
"""
import json

import numpy as np
import pytest

from esp32_opus_player_tpu.host import opusfile
from esp32_opus_player_tpu.models.ms_decoder import OpusMSDecoder
from esp32_opus_player_tpu import OpusFile, DecoderConfig

from conftest import FIXTURES, GOLDEN, fixture_path

NAMES = ["ms51_silk_wb_20ms", "ms51_music_fb_20ms"]


def _load(name):
    s = opusfile.parse_stream(fixture_path(name).read_bytes())
    gold = np.fromfile(GOLDEN / f"{name}.pcm",
                       dtype=np.int16).reshape(-1, 6)
    ranges = json.loads((GOLDEN / f"{name}.ranges.json").read_text())
    return s, gold, ranges


@pytest.mark.parametrize("name", NAMES)
def test_ms51_bitexact_and_ranges(name):
    s, gold, ranges = _load(name)
    h = s.head
    assert (h.channel_count, h.stream_count, h.coupled_count) == (6, 4, 2)
    dec = OpusMSDecoder(h.channel_count, h.stream_count, h.coupled_count,
                        h.mapping, compat_ref=True)
    outs = []
    for k, job in enumerate(s.jobs):
        out = dec.decode(job.data)
        assert dec.final_range == ranges[k]["final_range"], k
        outs.append(out)
    got = np.concatenate(outs)
    assert got.shape == gold.shape
    assert np.array_equal(got, gold)


def test_ms51_through_file_api(manifest):
    """OpusFile routes >2ch family-1 files through the MS decoder and
    applies pre-skip — the op_read_stereo-equivalent surface without the
    reference's OP_NCHANNELS_MAX=2 cap."""
    name = "ms51_silk_wb_20ms"
    f = OpusFile(fixture_path(name), DecoderConfig(channels=6,
                                                   compat_ref=True))
    pcm = f.read_all()
    gold = np.fromfile(GOLDEN / f"{name}.pcm",
                       dtype=np.int16).reshape(-1, 6)
    pre = manifest[name]["pre_skip"]
    assert pcm.shape == (gold.shape[0] - pre, 6)
    assert np.array_equal(pcm, gold[pre:])


def test_ms_layout_validation():
    # coupled > streams
    with pytest.raises(ValueError):
        OpusMSDecoder(2, 1, 2, b"\x00\x01")
    # mapping entry beyond stream channels
    with pytest.raises(ValueError):
        OpusMSDecoder(2, 1, 0, b"\x00\x05")
    # 255 = muted is always legal
    d = OpusMSDecoder(3, 1, 1, b"\x00\x01\xff")
    assert d.channels == 3


def test_ms_muted_channel_and_plc():
    """mapping 255 emits silence; data=None conceals on every
    sub-decoder (opus_multistream_decode_native do_plc path :847)."""
    s, _gold, _r = _load("ms51_silk_wb_20ms")
    h = s.head
    mapping = bytes(list(h.mapping[:5]) + [255])
    dec = OpusMSDecoder(6, h.stream_count, h.coupled_count, mapping,
                        compat_ref=True)
    out = dec.decode(s.jobs[0].data)
    assert np.all(out[:, 5] == 0)
    assert np.any(out[:, 0] != 0)
    conc = dec.decode(None)
    assert conc.shape == (960, 6)


def test_ms_packet_validation():
    s, _gold, _r = _load("ms51_silk_wb_20ms")
    h = s.head
    dec = OpusMSDecoder(h.channel_count, h.stream_count, h.coupled_count,
                        h.mapping, compat_ref=True)
    from esp32_opus_player_tpu.host.packet import InvalidPacket
    with pytest.raises(InvalidPacket):
        dec.decode(s.jobs[0].data[:3])   # truncated below 2*streams-1


@pytest.mark.parametrize("name", NAMES)
def test_ms51_in_stream_pool(name):
    """A >2ch family-1 source fed to a StreamPool must decode through
    the multistream layer (reference always does,
    src/opusfile.cpp:1238) — bit-exact vs a direct OpusMSDecoder walk —
    instead of being misclassified from its first TOC byte."""
    from esp32_opus_player_tpu.models.stream_pool import StreamPool
    s, gold, ranges = _load(name)
    pool = StreamPool([str(fixture_path(name))], channels=6,
                      native=True, compat_ref=True, ms_batch=False)
    assert pool.path[0][0] == "ms"
    out = pool.run()[0]
    # pool applies pre-skip/end-trim; gold is the raw frame concat
    pre = s.jobs[0].discard_front
    assert np.array_equal(out, gold[pre:pre + out.shape[0]])
    assert pool.final_ranges()[0] == ranges[len(s.jobs) - 1]["final_range"]


def test_split_multistream_repack():
    """split_multistream lifts each elementary stream out of the
    composite packets as ordinary undelimited packets; a scalar decode
    of each child must equal the MS decoder's per-stream internals —
    checked end to end by comparing the re-assembled surround PCM."""
    s, gold, _r = _load("ms51_silk_wb_20ms")
    subs = opusfile.split_multistream(s)
    assert len(subs) == s.head.stream_count
    assert [k.head.channel_count for k in subs] == [2, 2, 1, 1]
    for k in subs:
        assert len(k.jobs) == len(s.jobs)
        assert all(j.duration == pj.duration
                   for j, pj in zip(k.jobs, s.jobs))


@pytest.mark.parametrize("name", NAMES)
def test_ms51_batched_pool(name):
    """ms_batch=True (default) lifts the elementary streams into
    batched sub-pools and interleaves at egress — output and final
    range must be bit-identical to the scalar MS route."""
    from esp32_opus_player_tpu.models.stream_pool import StreamPool
    s, gold, ranges = _load(name)
    pool = StreamPool([str(fixture_path(name))], channels=6,
                      native=True, compat_ref=True)
    assert pool.path[0][0] == "msb"
    out = pool.run()[0]
    pre = s.jobs[0].discard_front
    assert np.array_equal(out, gold[pre:pre + out.shape[0]])
    assert pool.final_ranges()[0] == ranges[len(s.jobs) - 1]["final_range"]


def test_ms51_batched_pool_loss():
    """A lost composite packet conceals EVERY elementary stream
    (reference conceals every sub-decoder, src/opus_decoder.cpp:858)
    — batched route must equal the scalar MS route under loss."""
    from esp32_opus_player_tpu.models.stream_pool import StreamPool
    name = "ms51_silk_wb_20ms"
    loss = lambda i, k: k in (3, 7)
    ref = StreamPool([str(fixture_path(name))], channels=6,
                     native=True, compat_ref=True,
                     ms_batch=False).run(loss=loss)[0]
    got = StreamPool([str(fixture_path(name))], channels=6,
                     native=True, compat_ref=True).run(loss=loss)[0]
    assert np.array_equal(got, ref)


def test_ms51_batched_pool_mixed_sources():
    """Surround parents batch alongside ordinary mono/stereo rows in
    one pool; each row's output is unchanged by the company it keeps."""
    from esp32_opus_player_tpu.models.stream_pool import StreamPool
    name = "ms51_music_fb_20ms"
    mono = fixture_path("celt_fb_mono_20ms")
    solo_ms = StreamPool([str(fixture_path(name))], channels=6,
                         native=True, compat_ref=True).run()[0]
    solo_mono = StreamPool([str(mono)], channels=1,
                           native=True, compat_ref=True).run()[0]
    pool = StreamPool([str(fixture_path(name)), str(mono)], channels=1,
                      native=True, compat_ref=True)
    got = pool.run()
    assert np.array_equal(got[0], solo_ms)
    assert np.array_equal(got[1], solo_mono)


def test_ms51_batched_pool_rfc_loss():
    """RFC mode: a lost composite packet is concealed with REAL silk_PLC
    in every elementary stream — the batched sub-pool conceal kernels
    must match the scalar MS route (per-sub-decoder silk_PLC,
    src/silk.cpp:2871) bit-exactly, including burst loss."""
    from esp32_opus_player_tpu.models.stream_pool import StreamPool
    name = "ms51_silk_wb_20ms"
    loss = lambda i, k: k in (3, 4, 9)
    kw = dict(channels=6, native=True, compat_ref=False, rfc_plc=True)
    ref = StreamPool([str(fixture_path(name))], ms_batch=False,
                     **kw).run(loss=loss)[0]
    got = StreamPool([str(fixture_path(name))], **kw).run(loss=loss)[0]
    assert np.array_equal(got, ref)
