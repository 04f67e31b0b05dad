"""Pure-Python Ogg/Opus muxer for building test fixtures (RFC 3533 + RFC 7845).

Test tooling only — the framework's demux side lives in
esp32_opus_player_tpu/host/ogg.py. Kept independent so fixtures are not
produced by the code under test.
"""
from __future__ import annotations

import struct

# Ogg CRC32: poly 0x04c11db7, not reflected, init 0, no final xor
# (cf. reference crc_lookup, /root/reference/src/ogg.cpp:26-265).
_CRC_TABLE = []
for _i in range(256):
    _r = _i << 24
    for _ in range(8):
        _r = ((_r << 1) ^ 0x04C11DB7) if (_r & 0x80000000) else (_r << 1)
        _r &= 0xFFFFFFFF
    _CRC_TABLE.append(_r)


def ogg_crc(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ _CRC_TABLE[((crc >> 24) & 0xFF) ^ b]
    return crc


def _lacing(n: int) -> bytes:
    """Segment table for one packet of n bytes (not continued)."""
    full, rem = divmod(n, 255)
    return bytes([255] * full + [rem])


def build_page(packets: list[bytes], *, serialno: int, pageno: int,
               granulepos: int, bos: bool = False, eos: bool = False,
               continued: bool = False) -> bytes:
    segs = b"".join(_lacing(len(p)) for p in packets)
    assert len(segs) <= 255, "too many segments for one page"
    body = b"".join(packets)
    header_type = (0x01 if continued else 0) | (0x02 if bos else 0) | \
                  (0x04 if eos else 0)
    gp64 = granulepos & 0xFFFFFFFFFFFFFFFF        # two's-complement wrap
    if gp64 >= 1 << 63:
        gp64 -= 1 << 64
    hdr = struct.pack("<4sBBqIII", b"OggS", 0, header_type,
                      gp64, serialno, pageno, 0)
    hdr += bytes([len(segs)]) + segs
    page = hdr + body
    crc = ogg_crc(page)
    return page[:22] + struct.pack("<I", crc) + page[26:]


def opus_head(channels: int, pre_skip: int, input_rate: int = 48000,
              output_gain: int = 0, mapping_family: int = 0,
              stream_count: int = 1, coupled_count: int | None = None,
              mapping: bytes | None = None) -> bytes:
    """OpusHead ID header (RFC 7845 §5.1; parsed by reference
    opus_head_parse, /root/reference/src/opusfile.cpp:1333-1385)."""
    head = struct.pack("<8sBBHIhB", b"OpusHead", 1, channels, pre_skip,
                       input_rate, output_gain, mapping_family)
    if mapping_family != 0:
        if coupled_count is None:
            coupled_count = 1 if channels == 2 else 0
        if mapping is None:
            mapping = bytes(range(channels))
        head += bytes([stream_count, coupled_count]) + mapping
    return head


def opus_tags(vendor: str = "tpu-opus-fixture") -> bytes:
    v = vendor.encode()
    return b"OpusTags" + struct.pack("<I", len(v)) + v + struct.pack("<I", 0)


def mux(packets: list[bytes], durations48k: list[int], *, channels: int,
        pre_skip: int, serialno: int = 0x6F707573, input_rate: int = 48000,
        mapping_family: int = 0, end_trim: int = 0,
        packets_per_page: int = 25, stream_count: int = 1,
        coupled_count: int | None = None,
        mapping: bytes | None = None) -> bytes:
    """Assemble a complete single-link Ogg/Opus stream.

    durations48k: per-packet output duration in 48 kHz samples (from TOC).
    end_trim: samples to trim off the end (final granulepos is reduced by it).
    """
    assert len(packets) == len(durations48k)
    out = [build_page([opus_head(channels, pre_skip, input_rate,
                                 mapping_family=mapping_family,
                                 stream_count=stream_count,
                                 coupled_count=coupled_count,
                                 mapping=mapping)],
                      serialno=serialno, pageno=0, granulepos=0, bos=True),
           build_page([opus_tags()], serialno=serialno, pageno=1,
                      granulepos=0)]
    pageno = 2
    gp = 0
    total = sum(durations48k)
    i = 0
    while i < len(packets):
        chunk = []
        segs = 0
        j = i
        while j < len(packets) and len(chunk) < packets_per_page:
            need = len(_lacing(len(packets[j])))
            if segs + need > 255:
                break
            segs += need
            chunk.append(packets[j])
            gp += durations48k[j]
            j += 1
        eos = j == len(packets)
        page_gp = gp - end_trim if eos else gp
        out.append(build_page(chunk, serialno=serialno, pageno=pageno,
                              granulepos=page_gp, eos=eos))
        pageno += 1
        i = j
    assert gp == total
    return b"".join(out)
