"""Native Ogg page scanner (host/native/ogg_host.cpp) must be
behavior-identical to the pure-Python scanner: page fields, CRC-mismatch
resync with skip counting, and incremental feeding."""
import numpy as np

from esp32_opus_player_tpu.host import ogg

from conftest import fixture_path


def _walk(data, native, chunks=None):
    s = ogg.OggSync(native=native)
    pages = []
    if chunks is None:
        s.write(data)
        s.set_eof()
        while True:
            p = s.pageout()
            if p is None:
                break
            pages.append(p)
    else:
        rng = np.random.default_rng(11)
        pos = 0
        while pos < len(data):
            n = int(rng.integers(1, chunks))
            s.write(data[pos:pos + n])
            pos += n
            while True:
                p = s.pageout()
                if p is None:
                    break
                pages.append(p)
        s.set_eof()
        while True:
            p = s.pageout()
            if p is None:
                break
            pages.append(p)
    key = [(p.serialno, p.pageno, p.granulepos, p.bos, p.eos,
            p.continued, bytes(p.lacing), bytes(p.body)) for p in pages]
    return key, s.bytes_skipped


def test_native_scan_equals_python():
    raw = fixture_path("hybrid_fb_stereo_20ms").read_bytes()
    assert _walk(raw, True) == _walk(raw, False)


def test_native_scan_resync_on_corruption():
    raw = bytearray(fixture_path("celt_fb_mono_20ms").read_bytes())
    raw[len(raw) // 3] ^= 0xFF
    raw[2 * len(raw) // 3] ^= 0x55
    a = _walk(bytes(raw), True)
    b = _walk(bytes(raw), False)
    assert a == b
    assert a[1] > 0   # bytes were skipped


def test_native_scan_incremental_feed():
    raw = fixture_path("silk_wb_mono_20ms").read_bytes()
    whole, _ = _walk(raw, True)
    chunked, _ = _walk(raw, True, chunks=613)
    assert whole == chunked
