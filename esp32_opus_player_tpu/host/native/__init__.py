"""ctypes binding for the native host entropy engine (libcelt_host.so).

Builds on first import if the shared library is missing (g++, ~2 s).
"""
from __future__ import annotations

import ctypes
import pathlib
import subprocess

import numpy as np

_DIR = pathlib.Path(__file__).resolve().parent
_LIB = _DIR / "libcelt_host.so"

_lib = None


class CeltHostState(ctypes.Structure):
    _fields_ = [
        ("oldBandE", ctypes.c_int16 * 42),
        ("oldLogE", ctypes.c_int16 * 42),
        ("oldLogE2", ctypes.c_int16 * 42),
        ("backgroundLogE", ctypes.c_int16 * 42),
        ("rng", ctypes.c_uint32),
        ("pf_period", ctypes.c_int32),
        ("pf_period_old", ctypes.c_int32),
        ("pf_gain", ctypes.c_int32),
        ("pf_gain_old", ctypes.c_int32),
        ("pf_tapset", ctypes.c_int32),
        ("pf_tapset_old", ctypes.c_int32),
        ("loss_count", ctypes.c_int32),
        ("error", ctypes.c_int32),
    ]


def load():
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB.exists():
        subprocess.run(["make", "-C", str(_DIR), "-s"], check=True)
    lib = ctypes.CDLL(str(_LIB))
    lib.celt_host_decode.restype = ctypes.c_int
    lib.celt_host_decode.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(CeltHostState),
        ctypes.POINTER(ctypes.c_int16), ctypes.POINTER(ctypes.c_int16),
        ctypes.POINTER(ctypes.c_int32)]
    lib.celt_host_decode_resume.restype = ctypes.c_int
    lib.celt_host_decode_resume.argtypes = \
        lib.celt_host_decode.argtypes + [ctypes.POINTER(ctypes.c_int32)]
    lib.celt_host_reset.argtypes = [ctypes.POINTER(CeltHostState)]
    _lib = lib
    return lib


class NativeCELTHost:
    """Per-stream native CELT symbol phase; drop-in producer of the same
    synth-inputs dict as CELTDecoder.decode_with_ec(defer_synthesis=True)."""

    def __init__(self, channels: int):
        self.lib = load()
        self.channels = channels
        self.stream_channels = channels
        self.start = 0
        self.end = 21
        self.disable_inv = 1 if channels == 1 else 0
        self.st = CeltHostState()
        self.lib.celt_host_reset(ctypes.byref(self.st))

    def reset_state(self):
        # match the reference's partial OPUS_RESET_STATE (src/celt.cpp:2489)
        self.st.rng = 0
        self.st.error = 0
        self.st.pf_period = self.st.pf_period_old = 0
        self.st.pf_gain = self.st.pf_gain_old = 0
        self.st.pf_tapset = self.st.pf_tapset_old = 0
        for i in range(84):
            pass
        for i in range(42):
            self.st.oldLogE[i] = -(28 << 10)
            self.st.oldLogE2[i] = -(28 << 10)

    def decode_symbol_phase(self, data: bytes, frame_size: int,
                            ec_state=None):
        """ec_state: RangeDecoder.export_state() to resume mid-packet
        (hybrid frames after the host SILK symbol phase)."""
        C = self.stream_channels
        N = frame_size
        X = np.zeros(C * N, dtype=np.int16)
        bandE = np.zeros(42, dtype=np.int16)
        params = np.zeros(18, dtype=np.int32)
        if ec_state is None:
            ret = self.lib.celt_host_decode(
                data, len(data), frame_size, self.channels, C, self.start,
                self.end, self.disable_inv, ctypes.byref(self.st),
                X.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
                bandE.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
                params.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        else:
            ec = (ctypes.c_int32 * 9)(*[int(v) - (1 << 32)
                                        if int(v) >= 1 << 31 else int(v)
                                        for v in ec_state])
            ret = self.lib.celt_host_decode_resume(
                data, len(data), frame_size, self.channels, C, self.start,
                self.end, self.disable_inv, ctypes.byref(self.st),
                X.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
                bandE.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
                params.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), ec)
        if ret != 0:
            raise ValueError(f"celt_host_decode failed: {ret}")
        return dict(
            X=X.astype(np.int64), bandE=bandE.astype(np.int64),
            start=self.start, end=int(params[15]), C=C, CC=self.channels,
            LM=int(params[2]), transient=bool(params[1]),
            silence=int(params[0]),
            comb1=tuple(int(v) for v in params[3:9]),
            comb2=tuple(int(v) for v in params[9:15]),
            tell=int(params[16]), rng=int(params[17]) & 0xFFFFFFFF,
        )
