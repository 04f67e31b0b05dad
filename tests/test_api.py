"""Public API tests: file -> PCM/WAV, matching the oracle end to end
(BASELINE config 1)."""
import numpy as np
import pytest

from esp32_opus_player_tpu import (DecoderConfig, OpusFile, decode_file,
                                   decode_to_wav)

from conftest import fixture_path, golden_pcm


def test_decode_file_matches_oracle(manifest, tmp_path):
    name = "celt_fb_mono_20ms"
    pcm = decode_file(fixture_path(name),
                      DecoderConfig(channels=1, compat_ref=True))
    gold = golden_pcm(name)
    assert len(pcm) == manifest[name]["oracle_samples"]
    assert np.array_equal(np.repeat(pcm, 2, axis=1), gold)


def test_read_stereo_duplicates_mono():
    f = OpusFile(fixture_path("silk_wb_mono_20ms"),
                 DecoderConfig(channels=1, compat_ref=True))
    pcm = f.read_stereo(1024)
    assert pcm.shape == (1024, 2)
    assert np.array_equal(pcm[:, 0], pcm[:, 1])


def test_chunked_read_equals_bulk(manifest):
    name = "hybrid_fb_stereo_20ms"
    bulk = decode_file(fixture_path(name),
                       DecoderConfig(channels=2, compat_ref=True))
    f = OpusFile(fixture_path(name),
                 DecoderConfig(channels=2, compat_ref=True))
    chunks = []
    while True:
        c = f.read(777)   # odd chunk size on purpose
        if len(c) == 0:
            break
        chunks.append(c)
    assert np.array_equal(np.concatenate(chunks), bulk)


def test_wav_roundtrip(tmp_path):
    out = tmp_path / "out.wav"
    n = decode_to_wav(fixture_path("silk_nb_mono_20ms"), out,
                      DecoderConfig(channels=1, compat_ref=True))
    data = out.read_bytes()
    assert data[:4] == b"RIFF" and data[8:12] == b"WAVE"
    assert len(data) == 44 + n * 2


def test_gain_applied():
    cfg = DecoderConfig(channels=1, compat_ref=True, gain_q8=-256)  # -1 dB
    quiet = decode_file(fixture_path("celt_fb_mono_20ms"), cfg)
    loud = decode_file(fixture_path("celt_fb_mono_20ms"),
                       DecoderConfig(channels=1, compat_ref=True))
    assert np.abs(quiet.astype(int)).sum() < np.abs(loud.astype(int)).sum()


def test_streaming_reader_incremental():
    """StreamingOpusFile fed arbitrary chunk sizes must equal the
    one-shot decode (pre-skip, EOS end-trim and gain applied on the
    fly)."""
    import numpy as np
    from esp32_opus_player_tpu.api import (StreamingOpusFile,
                                           DecoderConfig, decode_file)
    from conftest import fixture_path
    src = str(fixture_path("silk_wb_mono_20ms"))
    cfg = DecoderConfig(channels=1, compat_ref=True)
    ref = decode_file(src, cfg)
    raw = open(src, "rb").read()
    rng = np.random.default_rng(3)
    sf = StreamingOpusFile(cfg)
    got, pos = [], 0
    while pos < len(raw):
        n = int(rng.integers(1, 997))
        sf.feed(raw[pos:pos + n])
        pos += n
        got.append(sf.read(1 << 20))
    sf.close()
    got.append(sf.read(1 << 20))
    got = np.concatenate([g for g in got if len(g)])
    assert np.array_equal(got, ref)


def _page_spans(raw: bytes):
    spans, pos = [], 0
    while True:
        idx = raw.find(b"OggS", pos)
        if idx < 0 or len(raw) < idx + 27:
            return spans
        nsegs = raw[idx + 26]
        total = 27 + nsegs + sum(raw[idx + 27:idx + 27 + nsegs])
        spans.append((idx, idx + total))
        pos = idx + total


def test_hole_discards_80ms_then_resumes(manifest):
    """A dropped page marks a hole; the 80 ms re-converge discard
    (src/opusfile.cpp:1022-1046) must consume exactly 80 ms and then
    STOP — audio after the hole must not be discarded (round-1 advisor
    bug: hole_discard was never decremented, silently discarding to
    EOF)."""
    from esp32_opus_player_tpu.api import StreamingOpusFile
    name = "silk_wb_mono_20ms"
    raw = fixture_path(name).read_bytes()
    spans = _page_spans(raw)
    assert len(spans) >= 5                    # head, tags, >=3 audio pages
    lo, hi = spans[3]                         # drop one mid-file audio page
    holey = raw[:lo] + raw[hi:]
    cfg = DecoderConfig(channels=1, compat_ref=True)
    pcm = OpusFile(holey, cfg).read_all()
    full = manifest[name]["oracle_samples"]
    # lost: the dropped page's packets plus the 80 ms re-converge window;
    # a page holds well under 1 s of audio
    assert full - 48000 < len(pcm) < full
    # push-based reader must agree exactly (it had the correct logic)
    sf = StreamingOpusFile(cfg)
    sf.feed(holey)
    sf.close()
    got = sf.read(1 << 22)
    assert np.array_equal(got, pcm)


def test_seek_sample_accurate():
    """seek(): 80 ms pre-roll reconverges the decoder; position is
    sample-exact and (for SILK) the PCM matches the continuous decode."""
    import numpy as np
    from esp32_opus_player_tpu.api import (OpusFile, DecoderConfig,
                                           decode_file)
    from conftest import fixture_path
    src = str(fixture_path("silk_wb_mono_20ms"))
    cfg = DecoderConfig(channels=1, compat_ref=True)
    ref = decode_file(src, cfg)
    f = OpusFile(src, cfg)
    assert f.duration == len(ref)
    for off in (0, 1234, 48000, f.duration - 500):
        f.seek(off)
        assert f.tell() == off
        a = f.read(2000)
        b = ref[off:off + 2000]
        n = min(len(a), len(b))
        assert n > 0 and np.array_equal(a[:n], b[:n]), off


def test_ctl_getters_and_bitrate():
    """OPUS_GET_* read-outs + the opusfile bitrate trackers
    (src/opus_decoder.cpp:361-454, src/opusfile.h:87-88)."""
    f = OpusFile(fixture_path("silk_wb_mono_20ms"),
                 DecoderConfig(channels=1, compat_ref=True))
    f.read(48000)
    assert f.bandwidth == 1103            # OPUS_BANDWIDTH_WIDEBAND
    assert f.last_packet_duration == 960
    assert f.final_range != 0
    assert f.pitch > 0                    # voiced fixture: SILK lag
    bps = f.bitrate_instant()
    assert 4000 < bps < 200000
    assert f.bitrate_instant() == 0       # accumulators reset
    f.read(1 << 20)
    assert f.bitrate_instant() > 0
