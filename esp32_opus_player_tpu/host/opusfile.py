"""Ogg/Opus stream reader — header parse, timestamping, pre-skip/end-trim.

Host-side equivalent of the reference stream reader (reference
src/opusfile.cpp): OpusHead parsing (:1333-1385), BOS stream selection
(:106-259), initial PCM offset from the first audio page's granulepos
(:486-633), steady-state packet collection with hole handling and end-trim
(:835-1133), and the pre-skip/end-trim bookkeeping of op_read_native
(:1171-1291).

Instead of a pull-based singleton, this emits an explicit sequence of
DecodeJobs (packet bytes + how many output samples to keep), which the decode
engines consume — the boundary where batching across streams happens.
"""
from __future__ import annotations

import struct
from dataclasses import dataclass, field

from . import ogg
from . import packet as pkt

OP_HOLE_DISCARD_MS = 80  # re-convergence discard after a hole (:1022-1046)


class NotOpusError(ValueError):
    pass


class BadHeaderError(ValueError):
    pass


@dataclass
class OpusHead:
    """ID header (RFC 7845 §5.1; reference OpusHead_t src/opusfile.h:42-52)."""
    version: int
    channel_count: int
    pre_skip: int
    input_sample_rate: int
    output_gain: int          # Q8 dB
    mapping_family: int
    stream_count: int = 1
    coupled_count: int = 0
    mapping: bytes = b"\x00\x01"

    @classmethod
    def parse(cls, data: bytes) -> "OpusHead":
        if len(data) < 8 or data[:8] != b"OpusHead":
            raise NotOpusError("missing OpusHead magic")
        if len(data) < 19:
            raise BadHeaderError("OpusHead too short")
        version, channels, pre_skip, rate, gain, family = struct.unpack_from(
            "<BBHIhB", data, 8)
        if (version & 0xF0) != 0:  # accept versions 0..15 (:1340)
            raise BadHeaderError(f"unsupported version {version}")
        if channels == 0:
            raise BadHeaderError("zero channels")
        if family == 0:
            if channels > 2:
                raise BadHeaderError("family 0 allows at most 2 channels")
            streams, coupled = 1, channels - 1
            mapping = bytes([0, 1])
        elif family == 1:
            if channels > 8:
                raise BadHeaderError("family 1 allows at most 8 channels")
            if len(data) < 21 + channels:
                raise BadHeaderError("truncated mapping table")
            streams, coupled = data[19], data[20]
            if streams < 1 or coupled > streams or streams + coupled > 255:
                raise BadHeaderError("bad stream counts")
            mapping = data[21:21 + channels]
            for m in mapping:
                if m != 255 and m >= streams + coupled:
                    raise BadHeaderError("bad channel mapping")
        else:
            raise BadHeaderError(f"unsupported mapping family {family}")
        return cls(version, channels, pre_skip, rate, gain, family,
                   streams, coupled, mapping)


@dataclass
class DecodeJob:
    """One packet to decode, with output bookkeeping applied afterwards."""
    data: bytes | None        # None = lost packet (PLC)
    duration: int             # samples at 48 kHz the decoder will produce
    discard_front: int = 0    # pre-skip / hole re-convergence discard
    trim_end: int = 0         # end-trim from the final granulepos
    granulepos: int = -1
    hole_before: bool = False

    @property
    def keep(self) -> int:
        return max(self.duration - self.discard_front - self.trim_end, 0)


@dataclass
class OggOpusStream:
    """Parsed single-link Ogg/Opus stream: header + timestamped decode jobs."""
    head: OpusHead
    tags_vendor: str
    jobs: list[DecodeJob]
    pcm_start: int = 0
    pcm_end: int = -1
    bytes_skipped: int = 0

    @property
    def total_samples(self) -> int:
        return sum(j.keep for j in self.jobs)


def _collect_packets(data: bytes):
    """Demux all pages; select the first Opus BOS stream like
    op_fetch_headers_impl (:106-259)."""
    sync = ogg.OggSync()
    sync.write(data)
    sync.set_eof()
    opus_stream: ogg.OggStream | None = None
    head: OpusHead | None = None
    packets: list[ogg.OggPacket] = []
    seen_serialnos: set[int] = set()
    while True:
        page = sync.pageout()
        if page is None:
            break
        if head is None:
            if not page.bos:
                if opus_stream is None:
                    raise NotOpusError("no BOS page found")
                # fallthrough: non-BOS page before a header completed
            if page.bos:
                seen_serialnos.add(page.serialno)
                body_start = page.body[:8]
                if body_start == b"OpusHead" and opus_stream is None:
                    opus_stream = ogg.OggStream(serialno=page.serialno)
                    for p in opus_stream.pagein(page):
                        head = OpusHead.parse(p.data)
                continue
        if opus_stream is not None and page.serialno == opus_stream.serialno:
            packets.extend(opus_stream.pagein(page))
    if head is None:
        raise NotOpusError("no Opus stream found")
    return head, packets, sync.bytes_skipped


def parse_stream(data: bytes) -> OggOpusStream:
    head, packets, skipped = _collect_packets(data)
    if not packets:
        raise BadHeaderError("no packets after OpusHead")
    # first packet after the header is OpusTags (content skipped, like the
    # stubbed tags parse at :226)
    tags_pkt = packets[0]
    vendor = ""
    if tags_pkt.data[:8] == b"OpusTags":
        vlen = struct.unpack_from("<I", tags_pkt.data, 8)[0]
        vendor = tags_pkt.data[12:12 + vlen].decode("utf-8", "replace")
    audio = packets[1:]

    jobs: list[DecodeJob] = []
    for p in audio:
        try:
            dur = pkt.get_nb_samples(p.data)
        except pkt.InvalidPacket:
            continue  # undecodable packet: skipped (treated as a hole)
        jobs.append(DecodeJob(data=p.data, duration=dur,
                              granulepos=p.granulepos,
                              hole_before=p.hole_before))
    if not jobs:
        raise BadHeaderError("no audio packets")

    # initial PCM offset (op_find_initial_pcm_offset :486-633): the first
    # page's granulepos minus the duration of its packets
    first_gp_idx = next((i for i, j in enumerate(jobs)
                         if j.granulepos >= 0), None)
    pcm_start = 0
    if first_gp_idx is not None:
        dur_to_first = sum(j.duration for j in jobs[:first_gp_idx + 1])
        pcm_start = max(jobs[first_gp_idx].granulepos - dur_to_first, 0)

    # pre-skip discard spread over the first packets (:1242-1275)
    remaining = head.pre_skip
    for j in jobs:
        if remaining <= 0:
            break
        d = min(remaining, j.duration)
        j.discard_front = d
        remaining -= d

    # end-trim from the final granulepos (op_fetch_and_process_page end-trim
    # propagation :1056-1092)
    last_gp = next((j.granulepos for j in reversed(jobs)
                    if j.granulepos >= 0), -1)
    if last_gp >= 0:
        cum = pcm_start
        total_end = None
        for j in jobs:
            cum += j.duration
        total_end = cum
        overshoot = total_end - last_gp
        if overshoot > 0:
            for j in reversed(jobs):
                if overshoot <= 0:
                    break
                t = min(overshoot, j.duration - j.trim_end)
                j.trim_end += t
                overshoot -= t

    return OggOpusStream(head=head, tags_vendor=vendor, jobs=jobs,
                         pcm_start=pcm_start, pcm_end=last_gp,
                         bytes_skipped=skipped)


def open_file(path) -> OggOpusStream:
    with open(path, "rb") as f:
        return parse_stream(f.read())
