"""Batched SILK decode: host symbol phase per stream, device synthesis
(LTP/LPC recurrences + polyphase resampler) over a streams axis.

Host per frame: range-decode indices/pulses, dequantize parameters
(gains/NLSF->LPC/pitch/LTP), expand the excitation (LCG signs), and emit
fixed-shape per-frame tensors. Device (ops/silk/jax_core.py): rewhitening
FIR, LTP+LPC recurrences, 8/12/16->48 kHz resampling. Device state per
stream: outBuf (LTP memory), sLPC, resampler state, sMid delay.

Covers mono 10/20/40/60 ms payloads, in-band FEC (LBRR), stereo packets
(silk_host_stereo_packet), and RFC packet-loss concealment
(silk_plc_host_params + NativePlcTracker); the native C engine in
host/native/ produces the same param dicts ~10-20x faster.
"""
from __future__ import annotations

import functools

import numpy as np

import jax.numpy as jnp

from ..host.range_decoder import RangeDecoder
from ..ops.silk import decode as sd
from ..ops.silk import macros as m
from ..ops.silk import jax_core as jc
from ..ops.silk.core import QUANT_LEVEL_ADJUST_Q10, _QUANT_OFFSETS
from .silk_decoder import SilkDecoder, DecoderControl, MAX_LPC_ORDER

I32 = np.int32


def host_exc(ch, pulses):
    """Excitation expansion (src/silk.cpp:1825-1836), host scalar."""
    offset_q10 = int(_QUANT_OFFSETS[ch.ind_signalType >> 1]
                     [ch.ind_quantOffsetType])
    rand_seed = ch.ind_Seed
    exc = [0] * ch.frame_length
    for i in range(ch.frame_length):
        rand_seed = m.silk_RAND(rand_seed)
        e = m.s32(pulses[i] << 14)
        if e > 0:
            e -= QUANT_LEVEL_ADJUST_Q10 << 4
        elif e < 0:
            e += QUANT_LEVEL_ADJUST_Q10 << 4
        e += offset_q10 << 4
        if rand_seed < 0:
            e = -e
        exc[i] = e
        rand_seed = m.ADD32_ovflw(rand_seed, pulses[i])
        ch.exc_Q14[i] = e
    return exc


def silk_host_frame(h: SilkDecoder, dec: RangeDecoder, fs_khz: int,
                    payload_ms: int):
    """Symbol phase of silk_Decode for one mono no-loss frame; returns
    the device-frame param dict and updates host-side state."""
    ch = h.channel_states[0]
    ch.nFramesDecoded = 0   # newPacketFlag: one packet per call here
    first = True
    if first:
        ms = payload_ms
        ch.nFramesPerPacket = {10: 1, 20: 1, 40: 2, 60: 3}[ms]
        ch.nb_subfr = 2 if ms == 10 else 4
        h._set_fs(0, fs_khz, 48000)
        for i in range(ch.nFramesPerPacket):
            ch.VAD_flags[i] = dec.dec_bit_logp(1)
        ch.LBRR_flag = dec.dec_bit_logp(1)
        ch.LBRR_flags = [0, 0, 0]
        if ch.LBRR_flag:
            if ch.nFramesPerPacket == 1:
                ch.LBRR_flags[0] = 1
            else:
                sym = dec.dec_icdf(
                    sd.LBRR_FLAGS_ICDF_PTR[ch.nFramesPerPacket - 2],
                    8) + 1
                for i in range(ch.nFramesPerPacket):
                    ch.LBRR_flags[i] = (sym >> i) & 1
        # skip LBRR payloads
        for i in range(ch.nFramesPerPacket):
            if ch.LBRR_flags[i]:
                cond = sd.CODE_CONDITIONALLY if (
                    i > 0 and ch.LBRR_flags[i - 1]) \
                    else sd.CODE_INDEPENDENTLY
                sd.decode_indices(dec, ch, i, 1, cond)
                sd.decode_pulses(dec, ch.ind_signalType,
                                 ch.ind_quantOffsetType,
                                 ch.frame_length)

    frame_index = ch.nFramesDecoded
    cond = sd.CODE_INDEPENDENTLY if frame_index <= 0 \
        else sd.CODE_CONDITIONALLY
    ctrl = DecoderControl()
    sd.decode_indices(dec, ch, frame_index, 0, cond)
    pulses = sd.decode_pulses(dec, ch.ind_signalType,
                              ch.ind_quantOffsetType, ch.frame_length)
    h._decode_parameters(0, ctrl, cond)
    exc = host_exc(ch, pulses)
    p = _assemble_params(ch, ctrl, exc)
    _finish_frame(ch, ctrl)
    p["rng"] = dec.rng & 0xFFFFFFFF   # OPUS_GET_FINAL_RANGE probe
    return p


def _assemble_params(ch, ctrl, exc):
    """Device-frame tensor assembly shared by the normal and FEC paths.

    Includes decode_core's voiced-PLC -> unvoiced transition smoothing
    (src/silk.cpp:1871): on the first good frame after concealment
    (lossCnt still set here — _finish_frame clears it afterwards), an
    unvoiced frame following a voiced concealment gets synthetic LTP
    (B = 0.25 center tap, lag = lagPrev) on subframes 0-1."""
    nb = ch.nb_subfr
    voiced = ch.ind_signalType == sd.TYPE_VOICED
    interp = ch.ind_NLSFInterpCoef_Q2 < 4
    p = dict(
        A=np.zeros((2, MAX_LPC_ORDER), dtype=I32),
        B=np.zeros((nb, 5), dtype=I32),
        gains=np.zeros(nb, dtype=I32),
        inv=np.zeros(nb, dtype=I32),
        lag=np.zeros(nb, dtype=I32),
        voiced=np.zeros(nb, dtype=bool),
        rewhiten=np.zeros(nb, dtype=bool),
        adj=np.zeros(nb, dtype=I32),
        match=np.zeros(nb, dtype=bool),
        exc=np.asarray(exc, dtype=I32),
    )
    for half in range(2):
        p["A"][half, :ch.LPC_order] = ctrl.PredCoef_Q12[half]
    for k in range(nb):
        p["B"][k] = ctrl.LTPCoef_Q14[k * 5:(k + 1) * 5]
        g = ctrl.Gains_Q16[k]
        p["gains"][k] = g
        inv = m.INVERSE32_varQ(g, 47)
        voiced_k = voiced
        lag_k = ctrl.pitchL[k]
        if ch.lossCnt and ch.prevSignalType == sd.TYPE_VOICED \
                and ch.ind_signalType != sd.TYPE_VOICED and k < 2:
            # voiced-PLC -> unvoiced transition (src/silk.cpp:1871)
            p["B"][k] = [0, 0, 4096, 0, 0]
            ctrl.LTPCoef_Q14[k * 5:(k + 1) * 5] = [0, 0, 4096, 0, 0]
            voiced_k = True
            lag_k = ch.lagPrev
            ctrl.pitchL[k] = ch.lagPrev
        p["voiced"][k] = voiced_k
        p["lag"][k] = lag_k if voiced_k else 15
        rw = voiced_k and (k == 0 or (k == 2 and interp))
        p["rewhiten"][k] = rw
        if rw and k == 0:
            inv = m.LSHIFT32(m.SMULWB(inv, ctrl.LTP_scale_Q14), 2)
        p["inv"][k] = inv
        if g != ch.prev_gain_Q16:
            p["adj"][k] = m.DIV32_varQ(ch.prev_gain_Q16, g, 16)
            p["match"][k] = False
        else:
            p["adj"][k] = 1 << 16
            p["match"][k] = True
        ch.prev_gain_Q16 = g
    return p


def _finish_frame(ch, ctrl):
    """Host state bookkeeping after a decoded (normal or LBRR) frame
    (src/silk.cpp:2013-2050). Also runs the CNG good-frame smoothing
    (silk_CNG :1342, no-loss branch — it never touches the synthesized
    samples, only host parameter state), so RFC concealment has live
    comfort-noise state when a loss hits."""
    from ..ops.silk import plc as sp
    sp.plc(ch, ctrl, None, 0, 0)   # update-only: no frame access
    ch.lossCnt = 0
    sp.cng(ch, ctrl, None, 0, 0)   # good-frame branch: host state only
    ch.prevSignalType = ch.ind_signalType
    ch.first_frame_after_reset = 0
    ch.lagPrev = ctrl.pitchL[ch.nb_subfr - 1]
    ch.nFramesDecoded += 1


class _TrackerCtrl:
    """DecoderControl-shaped view over native host-frame outputs, for
    silk_PLC_update / silk_CNG good-frame bookkeeping."""

    def __init__(self, p, order):
        # .tolist() converts in one C pass (python-int semantics for the
        # downstream wraparound math) — the per-element int() loop this
        # replaces dominated the rfc_plc host phase
        self.Gains_Q16 = np.asarray(p["gains"]).tolist()
        self.LTPCoef_Q14 = np.asarray(p["B"]).ravel().tolist()
        self.pitchL = np.asarray(p["lag"]).tolist()
        self.PredCoef_Q12 = [np.asarray(p["A"][0][:order]).tolist(),
                             np.asarray(p["A"][1][:order]).tolist()]
        self.LTP_scale_Q14 = int(p["ltp_scale"])


class NativePlcTracker:
    """PLC/CNG parameter state alongside a NativeSilkHost, backed by a
    C struct (host/native PlcTrackerState). The C engine decodes
    symbols; this tracker ingests its per-frame outputs to keep the
    concealment state (silk_PLC_update :2895, silk_CNG :1342 good
    branch) that the conceal prep needs — good-frame ingest (incl. the
    post-loss transition) and the conceal prep both run as single
    native calls (plc_trk_good_c / plc_trk_conceal_prep_c, ~us each vs
    ~30/600 us of scalar python). Field access delegates to the struct,
    so ops/silk/plc.py's scalar functions still operate on it (the
    bit-exactness oracle for the C port)."""

    _C_FIELDS = None     # set on first construction

    def __init__(self, fs_khz: int, frame_ms: int = 20):
        from ..host.native import PlcTrackerState, load, _bind_silk
        from ..ops.silk import plc as sp
        lib = load()
        _bind_silk(lib)
        if NativePlcTracker._C_FIELDS is None:
            NativePlcTracker._C_FIELDS = {
                n for n, _t in PlcTrackerState._fields_}
        object.__setattr__(self, "_lib", lib)
        object.__setattr__(self, "c", PlcTrackerState())
        c = self.c
        c.fs_kHz = fs_khz
        c.nb_subfr = 2 if frame_ms == 10 else 4
        c.subfr_length = 5 * fs_khz
        c.frame_length = frame_ms * fs_khz
        c.ltp_mem_length = 20 * fs_khz
        c.LPC_order = 16 if fs_khz == 16 else 10
        c.first_frame_after_reset = 1
        c.lagPrev = 100
        c.LastGainIndex = 10
        sp.cng_reset(self)
        sp.plc_reset(self)

    # ---- struct delegation (keeps ops/silk/plc.py duck-typing) -------
    def __getattr__(self, k):
        if NativePlcTracker._C_FIELDS and k in NativePlcTracker._C_FIELDS:
            return getattr(object.__getattribute__(self, "c"), k)
        raise AttributeError(k)

    def __setattr__(self, k, v):
        if NativePlcTracker._C_FIELDS and k in NativePlcTracker._C_FIELDS:
            cur = getattr(self.c, k)
            if isinstance(cur, int):
                setattr(self.c, k, int(v))
            else:
                cur[:len(v)] = [int(x) for x in v]
            return
        object.__setattr__(self, k, v)

    # ---- pickling (checkpoint.py stores trackers as blobs) -----------
    def __getstate__(self):
        return {"bytes": bytes(self.c)}

    def __setstate__(self, state):
        from ..host.native import PlcTrackerState, load, _bind_silk
        import ctypes
        lib = load()
        _bind_silk(lib)
        if NativePlcTracker._C_FIELDS is None:
            NativePlcTracker._C_FIELDS = {
                n for n, _t in PlcTrackerState._fields_}
        object.__setattr__(self, "_lib", lib)
        c = PlcTrackerState()
        blob = state["bytes"]
        if len(blob) != ctypes.sizeof(c):
            raise ValueError("PlcTrackerState layout changed since this "
                             "checkpoint was written")
        ctypes.memmove(ctypes.byref(c), blob, len(blob))
        object.__setattr__(self, "c", c)

    def good_frame(self, p, native_st=None) -> None:
        """Ingest one decoded (or FEC) frame's native outputs — ONE C
        call covering apply_plc_transition + silk_PLC_update + the CNG
        good branch (the transition mutates p's A/B/inv/lag/voiced/
        rewhiten in place, exactly like the python pair did)."""
        import ctypes
        I32P = ctypes.POINTER(ctypes.c_int32)

        def ptr(a):
            return a.ctypes.data_as(I32P)

        A = np.ascontiguousarray(p["A"], dtype=np.int32)
        B = np.ascontiguousarray(p["B"], dtype=np.int32)
        gains = np.ascontiguousarray(p["gains"], dtype=np.int32)
        inv = np.ascontiguousarray(p["inv"], dtype=np.int32)
        lag = np.ascontiguousarray(p["lag"], dtype=np.int32)
        exc = np.ascontiguousarray(p["exc"], dtype=np.int32)
        flags = np.zeros(12, dtype=np.int32)
        flags[0:4] = p["voiced"]
        flags[4:8] = p["rewhiten"]
        misc = np.zeros(24, dtype=np.int32)
        misc[0] = int(p["signal_type"])
        misc[3] = int(p["lag_prev"])
        misc[4] = int(p["ltp_scale"])
        misc[8:8 + len(p["nlsf"])] = p["nlsf"]
        self._lib.plc_trk_good_c(ctypes.byref(self.c), ptr(A), ptr(B),
                                 ptr(gains), ptr(inv), ptr(lag),
                                 ptr(flags), ptr(exc), ptr(misc))
        # write back anything the transition touched (copies were made
        # only if the dict's arrays weren't contiguous int32 already)
        for key, arr in (("A", A), ("B", B), ("gains", gains),
                         ("inv", inv), ("lag", lag)):
            if p[key] is not arr:
                p[key][...] = arr
        p["voiced"][...] = flags[0:4].astype(p["voiced"].dtype)
        p["rewhiten"][...] = flags[4:8].astype(p["rewhiten"].dtype)

    def conceal_prep(self):
        """Host half of one concealed frame as a single C call
        (silk_PLC_conceal :2973 + silk_CNG :1342 loss branch). Returns
        the device-kernel input dict silk_plc_host_params produces."""
        import ctypes
        I32P = ctypes.POINTER(ctypes.c_int32)
        nb = int(self.c.nb_subfr)
        fl = int(self.c.frame_length)
        rand_q12 = np.empty(fl, dtype=np.int32)
        A = np.empty(MAX_LPC_ORDER, dtype=np.int32)
        B4 = np.empty((nb, 5), dtype=np.int32)
        lag4 = np.empty(nb, dtype=np.int32)
        cng_exc = np.empty(fl, dtype=np.int32)
        cng_a = np.empty(MAX_LPC_ORDER, dtype=np.int32)
        sc = np.empty(4, dtype=np.int32)

        def ptr(a):
            return a.ctypes.data_as(I32P)

        self._lib.plc_trk_conceal_prep_c(
            ctypes.byref(self.c), ptr(rand_q12), ptr(A), ptr(B4),
            ptr(lag4), ptr(cng_exc), ptr(cng_a), ptr(sc))
        return dict(rand=rand_q12, A=A, B4=B4, lag4=lag4,
                    inv_gain=np.int32(sc[0]), prev_gain=np.int32(sc[1]),
                    cng_exc=cng_exc, cng_a=cng_a,
                    cng_gain=np.int32(sc[2]), cng_first=bool(sc[3]))


def apply_plc_transition(p, trk) -> None:
    """Post-loss adjustments the native engine can't know about, applied
    to its outputs on the first good/FEC frame after concealment (the
    python host does both inside the decode):
    - LPC bandwidth expansion after loss (silk_decode_parameters :858)
    - decode_core's voiced-PLC -> unvoiced transition (:1871).

    No-op for NativePlcTracker: its good_frame runs the transition
    inside the same C call."""
    from ..ops.silk import macros as m
    from ..ops.silk.nlsf import bwexpander
    if isinstance(trk, NativePlcTracker):
        return
    if not trk.lossCnt:
        return
    from .silk_decoder import BWE_AFTER_LOSS_Q16
    order = trk.LPC_order
    for half in range(2):
        a = [int(v) for v in p["A"][half][:order]]
        bwexpander(a, order, BWE_AFTER_LOSS_Q16)
        p["A"][half][:order] = a
    if not (trk.prevSignalType == sd.TYPE_VOICED
            and int(p["signal_type"]) != sd.TYPE_VOICED):
        return
    for k in range(2):
        p["B"][k] = [0, 0, 4096, 0, 0]
        p["voiced"][k] = True
        p["lag"][k] = trk.lagPrev
    p["rewhiten"][0] = True
    inv = m.INVERSE32_varQ(int(p["gains"][0]), 47)
    p["inv"][0] = m.LSHIFT32(m.SMULWB(inv, int(p["ltp_scale"])), 2)


def _nlsf2a_fast(nlsf_q15, order: int):
    """Native batched silk_NLSF2A when the C engine is loadable (~200x
    the scalar-python walk — the conceal prep's hottest call), python
    fallback otherwise. Returns (16,) int32 a_q12."""
    try:
        from ..host.native import nlsf2a_batch
        nl = np.zeros((1, MAX_LPC_ORDER), dtype=np.int32)
        nl[0, :len(nlsf_q15)] = nlsf_q15
        return nlsf2a_batch(nl, order)[0]
    except OSError:
        from ..ops.silk.nlsf import nlsf2a
        out = np.zeros(MAX_LPC_ORDER, dtype=I32)
        out[:order] = nlsf2a(nlsf_q15, order)
        return out


def _lpc_inv_gain_fast(a_q12, order: int):
    try:
        from ..host.native import lpc_inverse_pred_gain_batch
        a = np.zeros((1, MAX_LPC_ORDER), dtype=np.int32)
        a[0, :len(a_q12)] = a_q12
        return int(lpc_inverse_pred_gain_batch(a, order)[0])
    except OSError:
        from ..ops.silk.nlsf import lpc_inverse_pred_gain
        return lpc_inverse_pred_gain(a_q12, order)


_M32 = 0xFFFFFFFF


@functools.lru_cache(maxsize=8)
def _lcg_tables(n: int):
    """Powers/partial sums of the silk_RAND multiplier mod 2^32."""
    pw = np.empty(n + 1, np.uint64)
    sm = np.empty(n + 1, np.uint64)
    pw[0] = 1
    sm[0] = 0
    for j in range(n):
        pw[j + 1] = (pw[j] * np.uint64(m.RAND_MULTIPLIER)) \
            & np.uint64(_M32)
        sm[j + 1] = (sm[j] + pw[j]) & np.uint64(_M32)
    return pw, sm


def _lcg_seeds(seed0: int, n: int):
    """The seeds after 1..n silk_RAND steps (closed-form LCG walk:
    seed_k = a^k seed_0 + inc*(a^{k-1}+..+1) mod 2^32), as int32."""
    pw, sm = _lcg_tables(n)
    s0 = np.uint64(seed0 & _M32)
    seeds = (pw[1:] * s0 + np.uint64(m.RAND_INCREMENT) * sm[1:]) \
        & np.uint64(_M32)
    return seeds.astype(np.uint32).view(np.int32)


def _s32_np(x):
    return ((x & _M32) ^ 0x80000000) - 0x80000000


def _sum_sqr_shift_np(x, length: int):
    """silk_sum_sqr_shift (src/silk.cpp:3839), vectorized bit-exactly:
    pairwise int32-wrapping products, unsigned shift accumulation mod
    2^32 (addition of the shifted terms is associative mod 2^32)."""
    shft = 31 - m.CLZ32(length)
    sq = x * x                                   # <= 2^30 each
    pair = sq[0:length - 1:2] + sq[1:length:2]   # SMLABB_ovflw wrap...
    tail = sq[length - 1] if length % 2 else None

    def accumulate(sh):
        nrg = np.uint64(length if sh == shft else 0)
        nrg += ((pair.astype(np.uint64)) & np.uint64(_M32)) \
            .__rshift__(np.uint64(sh)).sum()
        if tail is not None:
            nrg += np.uint64(int(tail) & _M32) >> np.uint64(sh)
        return m.s32(int(nrg) & _M32)

    nrg = accumulate(shft)
    shft = max(0, shft + 3 - m.CLZ32(nrg))
    # second pass starts from zero with the final shift
    nrg2 = np.uint64(0)
    nrg2 += ((pair.astype(np.uint64)) & np.uint64(_M32)) \
        .__rshift__(np.uint64(shft)).sum()
    if tail is not None:
        nrg2 += np.uint64(int(tail) & _M32) >> np.uint64(shft)
    return m.s32(int(nrg2) & _M32), shft


def _plc_energy_np(ch, prev_gain_q10):
    """silk_PLC_energy (:2957) vectorized (exact SMULWW/SAT16 chain)."""
    sl = ch.subfr_length
    exc = np.asarray(ch.exc_Q14, dtype=np.int64)
    outs = []
    for k in range(2):
        seg = exc[(k + ch.nb_subfr - 2) * sl:
                  (k + ch.nb_subfr - 1) * sl]
        v = _s32_np((seg * int(prev_gain_q10[k])) >> 16) >> 8
        v = np.clip(v, -32768, 32767)
        outs.append(_sum_sqr_shift_np(v, sl))
    (e1, s1), (e2, s2) = outs
    return e1, s1, e2, s2


def _cng_exc_np(exc_buf, length: int, rand_seed: int):
    """silk_CNG_exc (:1305) vectorized via the closed-form seed walk."""
    exc_mask = 255            # CNG_BUF_MASK_MAX
    while exc_mask > length:
        exc_mask >>= 1
    seeds = _lcg_seeds(rand_seed, length)
    idx = (seeds >> 24) & exc_mask
    buf = np.asarray(exc_buf, dtype=I32)
    return buf[idx], m.s32(int(seeds[-1]))


def silk_plc_host_params(h, fs_khz: int, ch_idx: int = 0):
    """Host half of silk_PLC_conceal (:2973) for one lost 20 ms frame
    of one CHANNEL: the rand-seed walk, per-subframe LTP decay and pitch
    drift, bandwidth expansion of the previous LPC, and the CNG
    excitation/gain prep — everything sequential. Returns the
    device-kernel inputs for ops/silk/jax_plc.silk_plc_conceal_frame
    (+ cng_add) and mutates the host channel state exactly like a scalar
    concealed frame.

    h: a SilkDecoder (python-host pools) or a NativePlcTracker;
    ch_idx selects the mid/side channel state on a SilkDecoder."""
    from ..ops.silk import macros as m
    from ..ops.silk import plc as sp
    from ..ops.silk.nlsf import bwexpander, lpc_inverse_pred_gain, nlsf2a

    if isinstance(h, NativePlcTracker):
        # the whole prep is ONE native call on the struct-backed state
        return h.conceal_prep()
    ch = h.channel_states[ch_idx]
    ch.nFramesDecoded = 0
    ch.nFramesPerPacket = 1
    # nb_subfr follows the stream's payload (2 for 10 ms frames),
    # already configured by the caller's set_raw_params
    h._set_fs(ch_idx, fs_khz, 48000)
    nb = ch.nb_subfr
    subfr = ch.subfr_length
    order = ch.LPC_order

    # silk_PLC entry (:2871)
    if ch.fs_kHz != ch.plc_fs_kHz:
        sp.plc_reset(ch)
        ch.plc_fs_kHz = ch.fs_kHz
    # _decode_frame lost branch (:262)
    ch.ind_signalType = ch.prevSignalType

    prev_gain_q10 = [ch.plc_prevGain_Q16[0] >> 6,
                     ch.plc_prevGain_Q16[1] >> 6]
    if ch.first_frame_after_reset:
        ch.plc_prevLPC_Q12 = [0] * MAX_LPC_ORDER
    e1, s1, e2, s2 = _plc_energy_np(ch, prev_gain_q10)
    if (e1 >> s2) < (e2 >> s1):
        rand_off = max(0, (ch.plc_nb_subfr - 1) * ch.plc_subfr_length
                       - sp.RAND_BUF_SIZE)
    else:
        rand_off = max(0, ch.plc_nb_subfr * ch.plc_subfr_length
                       - sp.RAND_BUF_SIZE)

    B = list(ch.plc_LTPCoef_Q14)
    rand_scale_q14 = ch.plc_randScale_Q14
    harm_gain_q15 = sp.HARM_ATT_Q15[min(sp.NB_ATT - 1, ch.lossCnt)]
    if ch.prevSignalType == sd.TYPE_VOICED:
        rand_gain_q15 = sp.PLC_RAND_ATTENUATE_V_Q15[
            min(sp.NB_ATT - 1, ch.lossCnt)]
    else:
        rand_gain_q15 = sp.PLC_RAND_ATTENUATE_UV_Q15[
            min(sp.NB_ATT - 1, ch.lossCnt)]

    bwexpander(ch.plc_prevLPC_Q12, order, sp.BWE_COEF_Q16)
    A = list(ch.plc_prevLPC_Q12)

    if ch.lossCnt == 0:
        rand_scale_q14 = 1 << 14
        if ch.prevSignalType == sd.TYPE_VOICED:
            for i in range(5):
                rand_scale_q14 -= B[i]
            rand_scale_q14 = max(3277, rand_scale_q14)
            rand_scale_q14 = m.s16(
                m.SMULBB(rand_scale_q14, ch.plc_prevLTP_scale_Q14) >> 14)
        else:
            inv_gain_q30 = _lpc_inv_gain_fast(ch.plc_prevLPC_Q12, order)
            down_q30 = min((1 << 30) >> sp.LOG2_INV_LPC_GAIN_HIGH_THRES,
                           inv_gain_q30)
            down_q30 = max((1 << 30) >> sp.LOG2_INV_LPC_GAIN_LOW_THRES,
                           down_q30)
            down_q30 = m.LSHIFT32(down_q30,
                                  sp.LOG2_INV_LPC_GAIN_HIGH_THRES)
            rand_gain_q15 = m.SMULWB(down_q30, rand_gain_q15) >> 14

    seed = ch.plc_rand_seed
    lag = m.RSHIFT_ROUND(ch.plc_pitchL_Q8, 8)
    B4 = np.zeros((nb, 5), dtype=I32)
    lag4 = np.zeros(nb, dtype=I32)
    rand_q12 = np.zeros(nb * subfr, dtype=I32)
    exc_np = np.asarray(ch.exc_Q14, dtype=np.int64)
    for k in range(nb):
        B4[k] = B
        lag4[k] = lag
        # closed-form LCG walk + one vectorized gather replaces the
        # per-sample python seed loop (silk_PLC_conceal :3000)
        seeds = _lcg_seeds(seed, subfr)
        seed = m.s32(int(seeds[-1]))
        idx2 = (seeds >> 25) & sp.RAND_BUF_MASK
        rand_q12[k * subfr:(k + 1) * subfr] = \
            (exc_np[rand_off + idx2] * m.s16(rand_scale_q14)) >> 16
        B = [m.SMULBB(harm_gain_q15, b) >> 15 for b in B]
        if ch.ind_signalType != sd.TYPE_NO_VOICE_ACTIVITY:
            rand_scale_q14 = m.SMULBB(rand_scale_q14, rand_gain_q15) >> 15
        ch.plc_pitchL_Q8 = m.SMLAWB(ch.plc_pitchL_Q8, ch.plc_pitchL_Q8,
                                    sp.PITCH_DRIFT_FAC_Q16)
        ch.plc_pitchL_Q8 = min(
            ch.plc_pitchL_Q8,
            m.LSHIFT32(m.SMULBB(sp.MAX_PITCH_LAG_MS, ch.fs_kHz), 8))
        lag = m.RSHIFT_ROUND(ch.plc_pitchL_Q8, 8)

    inv_gain_q30 = min(m.INVERSE32_varQ(ch.plc_prevGain_Q16[1], 46),
                       m.INT32_MAX >> 1)
    ch.plc_rand_seed = seed
    ch.plc_randScale_Q14 = rand_scale_q14
    ch.plc_LTPCoef_Q14 = B               # decayed in place in the scalar
    ch.lagPrev = lag                     # ctrl.pitchL filled with lag

    # ---- CNG (silk_CNG :1342, lossCnt branch — host half) -------------
    if ch.fs_kHz != ch.cng_fs_kHz:
        sp.cng_reset(ch)
        ch.cng_fs_kHz = ch.fs_kHz
    first_loss = ch.lossCnt == 0
    gain_q16 = m.SMULWW(ch.plc_randScale_Q14, ch.plc_prevGain_Q16[1])
    if gain_q16 >= (1 << 21) or ch.cng_smth_Gain_Q16 > (1 << 23):
        gain_q16 = m.SMULTT(gain_q16, gain_q16)
        gain_q16 = m.SUB32(
            m.SMULTT(ch.cng_smth_Gain_Q16, ch.cng_smth_Gain_Q16),
            m.LSHIFT32(gain_q16, 5))
        gain_q16 = m.LSHIFT32(m.SQRT_APPROX(gain_q16), 16)
    else:
        gain_q16 = m.SMULWW(gain_q16, gain_q16)
        gain_q16 = m.SUB32(
            m.SMULWW(ch.cng_smth_Gain_Q16, ch.cng_smth_Gain_Q16),
            m.LSHIFT32(gain_q16, 5))
        gain_q16 = m.LSHIFT32(m.SQRT_APPROX(gain_q16), 8)
    gain_q10 = gain_q16 >> 6
    frame_len = ch.frame_length
    cng_exc, ch.cng_rand_seed = _cng_exc_np(
        ch.cng_exc_buf_Q14, frame_len, ch.cng_rand_seed)
    cng_a_q12 = _nlsf2a_fast(ch.cng_smth_NLSF_Q15, order)

    ch.lossCnt += 1                      # silk_PLC (:2875)
    ch.plc_last_frame_lost = 1           # glue bookkeeping (device energy)
    ch.LastGainIndex = 10                # silk_Decode on loss (:455) —
    #                                      un-clamps the gain after loss

    return dict(
        rand=rand_q12,
        A=np.asarray(A + [0] * (MAX_LPC_ORDER - order), dtype=I32),
        B4=B4, lag4=lag4,
        inv_gain=np.int32(inv_gain_q30),
        prev_gain=np.int32(prev_gain_q10[1]),
        cng_exc=cng_exc, cng_a=cng_a_q12, cng_gain=np.int32(gain_q10),
        cng_first=bool(first_loss),
    )


def silk_host_packet(h: SilkDecoder, dec: RangeDecoder, fs_khz: int,
                     payload_ms: int):
    """Symbol phase for one mono no-loss SILK packet of 1-3 20 ms frames
    (40/60 ms packets, silk_Decode :1481 with nFramesPerPacket 2/3):
    header VAD+LBRR flags once, LBRR payloads skipped, then each frame
    decoded with the right conditional coding. Returns a list of
    device-frame param dicts (one per 20 ms frame)."""
    ch = h.channel_states[0]
    ch.nFramesDecoded = 0
    n_frames = {10: 1, 20: 1, 40: 2, 60: 3}[payload_ms]
    ch.nFramesPerPacket = n_frames
    ch.nb_subfr = 2 if payload_ms == 10 else 4
    h._set_fs(0, fs_khz, 48000)
    for i in range(n_frames):
        ch.VAD_flags[i] = dec.dec_bit_logp(1)
    ch.LBRR_flag = dec.dec_bit_logp(1)
    ch.LBRR_flags = [0, 0, 0]
    if ch.LBRR_flag:
        if n_frames == 1:
            ch.LBRR_flags[0] = 1
        else:
            sym = dec.dec_icdf(
                sd.LBRR_FLAGS_ICDF_PTR[n_frames - 2], 8) + 1
            for i in range(n_frames):
                ch.LBRR_flags[i] = (sym >> i) & 1
    # skip LBRR payloads (normal decode path, src/silk.cpp:1590)
    for i in range(n_frames):
        if ch.LBRR_flags[i]:
            cond = sd.CODE_CONDITIONALLY if (
                i > 0 and ch.LBRR_flags[i - 1]) \
                else sd.CODE_INDEPENDENTLY
            sd.decode_indices(dec, ch, i, 1, cond)
            sd.decode_pulses(dec, ch.ind_signalType,
                             ch.ind_quantOffsetType, ch.frame_length)

    out = []
    for fidx in range(n_frames):
        cond = sd.CODE_INDEPENDENTLY if fidx == 0 \
            else sd.CODE_CONDITIONALLY
        ctrl = DecoderControl()
        sd.decode_indices(dec, ch, fidx, 0, cond)
        pulses = sd.decode_pulses(dec, ch.ind_signalType,
                                  ch.ind_quantOffsetType, ch.frame_length)
        h._decode_parameters(0, ctrl, cond)
        exc = host_exc(ch, pulses)
        p = _assemble_params(ch, ctrl, exc)
        _finish_frame(ch, ctrl)
        p["rng"] = dec.rng & 0xFFFFFFFF
        out.append(p)
    return out


def silk_host_stereo_packet(h: SilkDecoder, dec: RangeDecoder,
                            fs_khz: int, payload_ms: int = 20):
    """Symbol phase for one STEREO no-loss single-frame SILK packet
    (silk_Decode :1481 with nChannelsInternal=2; payload_ms 10 ->
    nb_subfr 2, 20 -> 4): per-channel VAD/LBRR headers, LBRR payload
    skip (with the stereo-pred symbols inside), stereo predictor +
    mid-only flag, then the mid frame and (when present) the side
    frame. Returns a dict with the device tensors — the MS->LR unmix
    and resampling run on device (ops/silk/jax_stereo.py). Caller owns
    set_raw_params(2,2,payload_ms,...)."""
    cs0, cs1 = h.channel_states[0], h.channel_states[1]
    cs0.nFramesDecoded = 0
    cs1.nFramesDecoded = 0
    if 2 > h.nChannelsInternal:          # mono->stereo transition (:289)
        cs1.reset()
    for n, ch in enumerate((cs0, cs1)):
        ch.nFramesPerPacket = 1
        ch.nb_subfr = 2 if payload_ms == 10 else 4
        h._set_fs(n, fs_khz, 48000)
    h.nChannelsAPI = 2
    h.nChannelsInternal = 2

    for ch in (cs0, cs1):
        ch.VAD_flags[0] = dec.dec_bit_logp(1)
        ch.LBRR_flag = dec.dec_bit_logp(1)
    for ch in (cs0, cs1):
        ch.LBRR_flags = [0, 0, 0]
        if ch.LBRR_flag:
            ch.LBRR_flags[0] = 1
    # skip LBRR payloads, stereo symbols included (:1590)
    for n, ch in enumerate((cs0, cs1)):
        if ch.LBRR_flags[0]:
            if n == 0:
                sd.stereo_decode_pred(dec)
                if cs1.LBRR_flags[0] == 0:
                    sd.stereo_decode_mid_only(dec)
            sd.decode_indices(dec, ch, 0, 1, sd.CODE_INDEPENDENTLY)
            sd.decode_pulses(dec, ch.ind_signalType, ch.ind_quantOffsetType,
                             ch.frame_length)

    ms_pred_q13 = sd.stereo_decode_pred(dec)
    if cs1.VAD_flags[0] == 0:
        dom = sd.stereo_decode_mid_only(dec)
    else:
        dom = 0
    side_reset = bool(dom == 0 and h.prev_decode_only_middle == 1)
    if side_reset:                       # (:378) side re-entry reset
        from .silk_decoder import MAX_FRAME_LENGTH
        cs1.outBuf = [0] * (MAX_FRAME_LENGTH + 2 * 80)
        cs1.sLPC_Q14_buf = [0] * MAX_LPC_ORDER
        cs1.lagPrev = 100
        cs1.LastGainIndex = 10
        cs1.prevSignalType = sd.TYPE_NO_VOICE_ACTIVITY
        cs1.first_frame_after_reset = 1
    has_side = dom == 0

    def one(n, ch):
        ctrl = DecoderControl()
        sd.decode_indices(dec, ch, 0, 0, sd.CODE_INDEPENDENTLY)
        pulses = sd.decode_pulses(dec, ch.ind_signalType,
                                  ch.ind_quantOffsetType, ch.frame_length)
        h._decode_parameters(n, ctrl, sd.CODE_INDEPENDENTLY)
        exc = host_exc(ch, pulses)
        p = _assemble_params(ch, ctrl, exc)
        _finish_frame(ch, ctrl)
        return p

    mid = one(0, cs0)
    side = one(1, cs1) if has_side else None
    if not has_side:
        cs1.nFramesDecoded += 1
    h.prev_decode_only_middle = dom
    return dict(mid=mid, side=side, pred=np.asarray(ms_pred_q13, dtype=I32),
                side_reset=side_reset, rng=dec.rng & 0xFFFFFFFF)


def silk_host_frame_fec(h: SilkDecoder, dec: RangeDecoder, fs_khz: int,
                        payload_ms: int):
    """In-band FEC symbol phase: decode this packet's LBRR copy of the
    previous (lost) frame (silk_Decode lostFlag=2, reference
    src/silk.cpp:1682). Returns the device-frame param dict, or None when
    the packet carries no LBRR for frame 0 (caller falls back to the loss
    path). State mutations match a scalar decode_fec call, so a subsequent
    normal decode of the SAME packet continues bit-exactly."""
    ch = h.channel_states[0]
    ch.nFramesDecoded = 0
    ch.nFramesPerPacket = {10: 1, 20: 1, 40: 2, 60: 3}[payload_ms]
    ch.nb_subfr = 2 if payload_ms == 10 else 4
    h._set_fs(0, fs_khz, 48000)
    for i in range(ch.nFramesPerPacket):
        ch.VAD_flags[i] = dec.dec_bit_logp(1)
    ch.LBRR_flag = dec.dec_bit_logp(1)
    ch.LBRR_flags = [0, 0, 0]
    if ch.LBRR_flag:
        if ch.nFramesPerPacket == 1:
            ch.LBRR_flags[0] = 1
        else:
            sym = dec.dec_icdf(
                sd.LBRR_FLAGS_ICDF_PTR[ch.nFramesPerPacket - 2], 8) + 1
            for i in range(ch.nFramesPerPacket):
                ch.LBRR_flags[i] = (sym >> i) & 1
    if not ch.LBRR_flags[0]:
        return None
    ctrl = DecoderControl()
    sd.decode_indices(dec, ch, 0, 1, sd.CODE_INDEPENDENTLY)
    pulses = sd.decode_pulses(dec, ch.ind_signalType,
                              ch.ind_quantOffsetType, ch.frame_length)
    h._decode_parameters(0, ctrl, sd.CODE_INDEPENDENTLY)
    exc = host_exc(ch, pulses)
    p = _assemble_params(ch, ctrl, exc)
    _finish_frame(ch, ctrl)
    p["rng"] = dec.rng & 0xFFFFFFFF   # OPUS_GET_FINAL_RANGE probe
    return p



class BatchedSilkDecoder:
    """Decode B mono SILK streams with batched device synthesis."""

    def __init__(self, n_streams: int, fs_khz: int = 16,
                 payload_ms: int = 20):
        self.n = n_streams
        self.fs_khz = fs_khz
        self.payload_ms = payload_ms
        self.hosts = [SilkDecoder() for _ in range(n_streams)]
        for h in self.hosts:
            h.set_raw_params(1, 1, payload_ms, fs_khz * 1000, 48000)
        self.nb_subfr = 4 if payload_ms >= 20 else 2
        self.frame = 5 * fs_khz * self.nb_subfr
        self.ltp_mem = 20 * fs_khz
        B = n_streams
        self.outBuf = jnp.zeros((B, self.ltp_mem + self.frame), dtype=I32)
        self.sLPC = jnp.zeros((B, MAX_LPC_ORDER), dtype=I32)
        self.sIIR = jnp.zeros((B, 6), dtype=I32)
        self.sFIR = jnp.zeros((B, 8), dtype=I32)
        self.delay_buf = jnp.zeros((B, fs_khz), dtype=I32)
        self.sMid = jnp.zeros((B, 2), dtype=I32)

    # ------------------------------------------------------------------
    def _host_frame(self, h: SilkDecoder, dec: RangeDecoder):
        return silk_host_frame(h, dec, self.fs_khz, self.payload_ms)

    # ------------------------------------------------------------------
    def decode_frames(self, packets):
        """packets: list of B SILK frames (range-coder payloads).
        Returns (B, frame*48//fs_khz) int16 PCM at 48 kHz."""
        B = self.n
        nb = self.nb_subfr
        params = []
        for h, pkt in zip(self.hosts, packets):
            dec = RangeDecoder(pkt)
            params.append(self._host_frame(h, dec))

        def stack(key):
            return jnp.asarray(np.stack([p[key] for p in params]))

        xq, sLPC = jc.silk_core_frame(
            self.outBuf, self.sLPC, stack("exc"), stack("A"), stack("B"),
            stack("gains"), stack("inv"), stack("lag"), stack("voiced"),
            stack("rewhiten"), stack("adj"), stack("match"),
            fs_khz=self.fs_khz, nb_subfr=nb,
            order=self.hosts[0].channel_states[0].LPC_order)
        self.sLPC = sLPC
        # outBuf history roll: keep last ltp_mem samples
        hist = jnp.concatenate(
            [self.outBuf[:, self.frame:self.ltp_mem], xq], axis=-1)
        self.outBuf = jnp.concatenate(
            [hist, jnp.zeros((B, self.frame), dtype=I32)], axis=-1)

        # 2-sample sMid buffering then resample (src/silk.cpp:1710-1736)
        resin = jnp.concatenate([self.sMid[:, 1:2], xq[:, :-1]], axis=-1)
        self.sMid = xq[:, self.frame - 2:self.frame]
        out48, self.sIIR, self.sFIR, self.delay_buf = jc.resample_to_48k(
            self.sIIR, self.sFIR, self.delay_buf, resin,
            fs_in_khz=self.fs_khz, in_len=self.frame)
        return np.asarray(out48).astype(np.int16)
