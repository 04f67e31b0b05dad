"""Minimal ctypes binding to the system libopus, used ONLY by test tooling:
fixture encoding (tools/gen_fixtures.py) and per-packet final-range golden
generation. The framework itself never calls libopus.

The final range value (OPUS_GET_FINAL_RANGE, the canonical Opus conformance
probe, cf. reference src/opus_decoder.cpp:375-381) is identical for float and
fixed-point decoders, so the system (float) libopus is a valid golden source
for verifying our entropy/symbol path.
"""
from __future__ import annotations

import ctypes
import ctypes.util

_libname = ctypes.util.find_library("opus")
if _libname is None:  # pragma: no cover
    raise OSError("system libopus not found")
lib = ctypes.CDLL(_libname)

# --- ctl request codes (public opus_defines.h values) ---
OPUS_SET_BITRATE = 4002
OPUS_SET_MAX_BANDWIDTH = 4004
OPUS_SET_VBR = 4006
OPUS_SET_BANDWIDTH = 4008
OPUS_SET_COMPLEXITY = 4010
OPUS_SET_INBAND_FEC = 4012
OPUS_SET_PACKET_LOSS_PERC = 4014
OPUS_SET_DTX = 4016
OPUS_SET_VBR_CONSTRAINT = 4020
OPUS_SET_FORCE_CHANNELS = 4022
OPUS_SET_SIGNAL = 4024
OPUS_GET_LOOKAHEAD = 4027
OPUS_GET_FINAL_RANGE = 4031
OPUS_SET_LSB_DEPTH = 4036
OPUS_SET_PREDICTION_DISABLED = 4042
OPUS_SET_FORCE_MODE = 11002  # opus_private.h; honored by stock builds

OPUS_AUTO = -1000
OPUS_APPLICATION_VOIP = 2048
OPUS_APPLICATION_AUDIO = 2049
OPUS_APPLICATION_RESTRICTED_LOWDELAY = 2051
OPUS_SIGNAL_VOICE = 3001
OPUS_SIGNAL_MUSIC = 3002
OPUS_BANDWIDTH_NARROWBAND = 1101
OPUS_BANDWIDTH_MEDIUMBAND = 1102
OPUS_BANDWIDTH_WIDEBAND = 1103
OPUS_BANDWIDTH_SUPERWIDEBAND = 1104
OPUS_BANDWIDTH_FULLBAND = 1105
MODE_SILK_ONLY = 1000
MODE_HYBRID = 1001
MODE_CELT_ONLY = 1002

lib.opus_encoder_create.restype = ctypes.c_void_p
lib.opus_encoder_create.argtypes = [
    ctypes.c_int32, ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_int)]
lib.opus_encode.restype = ctypes.c_int32
lib.opus_encode.argtypes = [
    ctypes.c_void_p, ctypes.POINTER(ctypes.c_int16), ctypes.c_int,
    ctypes.c_char_p, ctypes.c_int32]
lib.opus_encoder_destroy.argtypes = [ctypes.c_void_p]
lib.opus_decoder_create.restype = ctypes.c_void_p
lib.opus_decoder_create.argtypes = [
    ctypes.c_int32, ctypes.c_int, ctypes.POINTER(ctypes.c_int)]
lib.opus_decode.restype = ctypes.c_int
lib.opus_decode.argtypes = [
    ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int32,
    ctypes.POINTER(ctypes.c_int16), ctypes.c_int, ctypes.c_int]
lib.opus_decoder_destroy.argtypes = [ctypes.c_void_p]


class Encoder:
    def __init__(self, fs: int = 48000, channels: int = 1,
                 application: int = OPUS_APPLICATION_AUDIO):
        err = ctypes.c_int(0)
        self._st = lib.opus_encoder_create(fs, channels, application,
                                           ctypes.byref(err))
        if err.value != 0:
            raise RuntimeError(f"opus_encoder_create failed: {err.value}")
        self.channels = channels
        self.fs = fs

    def ctl_set(self, request: int, value: int) -> None:
        fn = lib.opus_encoder_ctl
        fn.restype = ctypes.c_int
        ret = fn(ctypes.c_void_p(self._st), ctypes.c_int(request),
                 ctypes.c_int32(value))
        if ret != 0:
            raise RuntimeError(f"opus_encoder_ctl({request},{value}) -> {ret}")

    def ctl_get(self, request: int) -> int:
        fn = lib.opus_encoder_ctl
        fn.restype = ctypes.c_int
        out = ctypes.c_int32(0)
        ret = fn(ctypes.c_void_p(self._st), ctypes.c_int(request),
                 ctypes.byref(out))
        if ret != 0:
            raise RuntimeError(f"opus_encoder_ctl({request}) -> {ret}")
        return out.value

    def encode(self, pcm, frame_size: int) -> bytes:
        import numpy as np
        pcm = np.ascontiguousarray(pcm, dtype=np.int16)
        assert pcm.size == frame_size * self.channels
        out = ctypes.create_string_buffer(4000)
        n = lib.opus_encode(
            ctypes.c_void_p(self._st),
            pcm.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
            frame_size, out, 4000)
        if n < 0:
            raise RuntimeError(f"opus_encode -> {n}")
        return out.raw[:n]

    def __del__(self):
        if getattr(self, "_st", None):
            lib.opus_encoder_destroy(ctypes.c_void_p(self._st))
            self._st = None


class Decoder:
    def __init__(self, fs: int = 48000, channels: int = 2):
        err = ctypes.c_int(0)
        self._st = lib.opus_decoder_create(fs, channels, ctypes.byref(err))
        if err.value != 0:
            raise RuntimeError(f"opus_decoder_create failed: {err.value}")
        self.channels = channels
        self.fs = fs

    def decode(self, packet: bytes | None, frame_size: int = 5760):
        import numpy as np
        out = np.empty(frame_size * self.channels, dtype=np.int16)
        n = lib.opus_decode(
            ctypes.c_void_p(self._st),
            packet if packet is not None else None,
            len(packet) if packet is not None else 0,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
            frame_size, 0)
        if n < 0:
            raise RuntimeError(f"opus_decode -> {n}")
        return out[: n * self.channels].reshape(n, self.channels)

    def final_range(self) -> int:
        fn = lib.opus_decoder_ctl
        fn.restype = ctypes.c_int
        out = ctypes.c_uint32(0)
        ret = fn(ctypes.c_void_p(self._st), ctypes.c_int(OPUS_GET_FINAL_RANGE),
                 ctypes.byref(out))
        if ret != 0:
            raise RuntimeError(f"opus_decoder_ctl(final_range) -> {ret}")
        return out.value

    def __del__(self, _destroy=None):
        destroy = getattr(lib, "opus_decoder_destroy", None) if lib else None
        if getattr(self, "_st", None) and destroy is not None:
            destroy(ctypes.c_void_p(self._st))
            self._st = None


# --- multistream (surround) bindings, for family-1 fixture generation ---
lib.opus_multistream_encoder_create.restype = ctypes.c_void_p
lib.opus_multistream_encoder_create.argtypes = [
    ctypes.c_int32, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ctypes.c_char_p, ctypes.c_int, ctypes.POINTER(ctypes.c_int)]
lib.opus_multistream_encode.restype = ctypes.c_int32
lib.opus_multistream_encode.argtypes = [
    ctypes.c_void_p, ctypes.POINTER(ctypes.c_int16), ctypes.c_int,
    ctypes.c_char_p, ctypes.c_int32]
lib.opus_multistream_encoder_destroy.argtypes = [ctypes.c_void_p]
lib.opus_multistream_decoder_create.restype = ctypes.c_void_p
lib.opus_multistream_decoder_create.argtypes = [
    ctypes.c_int32, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ctypes.c_char_p, ctypes.POINTER(ctypes.c_int)]
lib.opus_multistream_decode.restype = ctypes.c_int
lib.opus_multistream_decode.argtypes = [
    ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int32,
    ctypes.POINTER(ctypes.c_int16), ctypes.c_int, ctypes.c_int]
lib.opus_multistream_decoder_destroy.argtypes = [ctypes.c_void_p]


class MSEncoder:
    """opus_multistream_encoder with an explicit layout (family-1)."""

    def __init__(self, fs: int, channels: int, streams: int,
                 coupled: int, mapping: bytes,
                 application: int = OPUS_APPLICATION_AUDIO):
        err = ctypes.c_int(0)
        self._st = lib.opus_multistream_encoder_create(
            fs, channels, streams, coupled, bytes(mapping), application,
            ctypes.byref(err))
        if err.value != 0:
            raise RuntimeError(f"ms_encoder_create -> {err.value}")
        self.channels = channels

    def ctl_set(self, request: int, value: int) -> None:
        fn = lib.opus_multistream_encoder_ctl
        fn.restype = ctypes.c_int
        ret = fn(ctypes.c_void_p(self._st), ctypes.c_int(request),
                 ctypes.c_int32(value))
        if ret != 0:
            raise RuntimeError(f"ms_encoder_ctl({request},{value})->{ret}")

    def encode(self, pcm, frame_size: int) -> bytes:
        import numpy as np
        pcm = np.ascontiguousarray(pcm, dtype=np.int16)
        assert pcm.size == frame_size * self.channels
        out = ctypes.create_string_buffer(16000)
        n = lib.opus_multistream_encode(
            ctypes.c_void_p(self._st),
            pcm.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
            frame_size, out, 16000)
        if n < 0:
            raise RuntimeError(f"opus_multistream_encode -> {n}")
        return out.raw[:n]

    def __del__(self):
        destroy = getattr(lib, "opus_multistream_encoder_destroy", None) \
            if lib else None
        if getattr(self, "_st", None) and destroy is not None:
            destroy(ctypes.c_void_p(self._st))
            self._st = None


class MSDecoder:
    """libopus multistream decoder (independent cross-check oracle)."""

    def __init__(self, fs: int, channels: int, streams: int,
                 coupled: int, mapping: bytes):
        err = ctypes.c_int(0)
        self._st = lib.opus_multistream_decoder_create(
            fs, channels, streams, coupled, bytes(mapping),
            ctypes.byref(err))
        if err.value != 0:
            raise RuntimeError(f"ms_decoder_create -> {err.value}")
        self.channels = channels

    def decode(self, packet: bytes | None, frame_size: int = 5760):
        import numpy as np
        out = np.empty(frame_size * self.channels, dtype=np.int16)
        n = lib.opus_multistream_decode(
            ctypes.c_void_p(self._st),
            packet if packet is not None else None,
            len(packet) if packet is not None else 0,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
            frame_size, 0)
        if n < 0:
            raise RuntimeError(f"opus_multistream_decode -> {n}")
        return out[: n * self.channels].reshape(n, self.channels)

    def final_range(self) -> int:
        fn = lib.opus_multistream_decoder_ctl
        fn.restype = ctypes.c_int
        out = ctypes.c_uint32(0)
        ret = fn(ctypes.c_void_p(self._st),
                 ctypes.c_int(OPUS_GET_FINAL_RANGE), ctypes.byref(out))
        if ret != 0:
            raise RuntimeError(f"ms_decoder_ctl(final_range) -> {ret}")
        return out.value

    def __del__(self):
        destroy = getattr(lib, "opus_multistream_decoder_destroy", None) \
            if lib else None
        if getattr(self, "_st", None) and destroy is not None:
            destroy(ctypes.c_void_p(self._st))
            self._st = None
