"""Public decode API: file/stream -> PCM.

The framework equivalent of the reference's public surface
(opus_init_decoder + op_read_stereo, reference src/opusfile.cpp:784,1293):
open an Ogg/Opus file or byte stream and pull PCM frames, with pre-skip,
end-trim, gain and hole handling applied. Adds what the reference lacks:
WAV export, non-20ms frames (RFC mode), and a streaming reader.
"""
from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np

from .host import opusfile
from .host.packet import get_nb_samples
from .models.opus_decoder import OpusDecoder

OP_HOLE_DISCARD_MS = 80


@dataclass
class DecoderConfig:
    """Typed replacement for the reference's three config layers
    (SURVEY.md §5: ctl varargs + silk_DecControlStruct + compile-time)."""
    channels: int = 2
    gain_q8: int = 0              # OPUS_SET_GAIN equivalent (Q8 dB)
    phase_inversion_disabled: bool = False
    compat_ref: bool = False      # bit-exact reference behavior
    apply_header_gain: bool = True


class OpusFile:
    """Pull-based file decoder (op_read_stereo equivalent)."""

    def __init__(self, path_or_bytes, config: DecoderConfig | None = None):
        if isinstance(path_or_bytes, (bytes, bytearray)):
            self.stream = opusfile.parse_stream(bytes(path_or_bytes))
        else:
            self.stream = opusfile.open_file(path_or_bytes)
        head = self.stream.head
        self.config = config or DecoderConfig(
            channels=min(head.channel_count, 2))
        self.decoder = OpusDecoder(self.config.channels,
                                   compat_ref=self.config.compat_ref)
        if self.config.phase_inversion_disabled:
            self.decoder.celt.disable_inv = 1
        self._job_idx = 0
        self._buffer = np.zeros((0, self.config.channels), dtype=np.int16)
        self._gain_q8 = (head.output_gain if self.config.apply_header_gain
                         else 0) + self.config.gain_q8

    @property
    def channel_count(self) -> int:
        return self.stream.head.channel_count

    @property
    def pre_skip(self) -> int:
        return self.stream.head.pre_skip

    def _apply_gain(self, pcm: np.ndarray) -> np.ndarray:
        """OPUS_SET_GAIN semantics (Q8 dB scale, like src/opus_decoder.cpp
        decode_gain handling)."""
        if self._gain_q8 == 0:
            return pcm
        from .ops.silk.decode import log2lin
        from .ops.silk import macros as m
        gain = log2lin(m.SMULWB(6488, self._gain_q8) + (16 << 7))
        x = pcm.astype(np.int64)
        out = np.clip((x * gain) >> 16, -32768, 32767)
        return out.astype(np.int16)

    def _decode_next_job(self):
        hole_discard = 0
        while self._job_idx < len(self.stream.jobs):
            job = self.stream.jobs[self._job_idx]
            self._job_idx += 1
            if job.hole_before:
                # hole policy: decode continues; discard 80 ms to
                # re-converge (src/opusfile.cpp:1022-1046)
                hole_discard = OP_HOLE_DISCARD_MS * 48
            pcm = self.decoder.decode(job.data)
            lo = job.discard_front + min(hole_discard, len(pcm))
            hi = len(pcm) - job.trim_end
            if lo >= hi:
                continue
            return self._apply_gain(pcm[lo:hi])
        return None

    def read(self, n_samples: int = 2048) -> np.ndarray:
        """Return up to n_samples frames of PCM, (n, channels) int16.
        Empty array = end of stream."""
        while len(self._buffer) < n_samples:
            nxt = self._decode_next_job()
            if nxt is None:
                break
            self._buffer = np.concatenate([self._buffer, nxt])
        out = self._buffer[:n_samples]
        self._buffer = self._buffer[n_samples:]
        return out

    def read_stereo(self, n_samples: int = 2048) -> np.ndarray:
        """op_read_stereo semantics (src/opusfile.cpp:1293): mono is
        duplicated into both channels."""
        pcm = self.read(n_samples)
        if pcm.shape[1] == 1:
            pcm = np.repeat(pcm, 2, axis=1)
        return pcm

    def read_all(self) -> np.ndarray:
        chunks = []
        while True:
            c = self.read(48000)
            if len(c) == 0:
                break
            chunks.append(c)
        if not chunks:
            return np.zeros((0, self.config.channels), dtype=np.int16)
        return np.concatenate(chunks)


def decode_file(path, config: DecoderConfig | None = None) -> np.ndarray:
    """One-shot: Ogg/Opus file -> (n, channels) int16 PCM at 48 kHz."""
    return OpusFile(path, config).read_all()


def write_wav(path, pcm: np.ndarray, rate: int = 48000) -> None:
    """Minimal WAV writer (s16le)."""
    pcm = np.ascontiguousarray(pcm, dtype="<i2")
    n, ch = pcm.shape
    data = pcm.tobytes()
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE")
        f.write(b"fmt " + struct.pack("<IHHIIHH", 16, 1, ch, rate,
                                      rate * ch * 2, ch * 2, 16))
        f.write(b"data" + struct.pack("<I", len(data)) + data)


def decode_to_wav(in_path, out_path,
                  config: DecoderConfig | None = None) -> int:
    """BASELINE config 1: Ogg/Opus file -> PCM WAV. Returns sample count."""
    pcm = decode_file(in_path, config)
    write_wav(out_path, pcm)
    return len(pcm)
