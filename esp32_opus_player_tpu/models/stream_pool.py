"""StreamPool: decode many concurrent Ogg/Opus streams (BASELINE config 4).

Per frame step:
  1. host: per-stream container pull + packet parse + symbol phase
     (native C++ engine for CELT, Python symbol walk for SILK) —
     embarrassingly parallel over host cores;
  2. group frames into static-shape device buckets — CELT by
     (LM, C, CC, transient), SILK by internal rate — padded to a
     power-of-two capacity (bounds XLA recompiles);
  3. device: gather per-stream state rows, run the jitted batched
     synthesis, scatter state back (duplicate pad indices write identical
     values, so the scatter is deterministic).

Packet loss (BASELINE config 5): step(lost=...) conceals the marked
streams' frames without leaving the batched path — SILK loss decodes the
normal frame over an empty bitstream (the reference's pruned-PLC
semantics), CELT loss is silence with state untouched, hybrid loss
advances SILK and mutes the frame (the reference's CELT stage errors).

Stream classification happens at init (every packet's TOC is scanned):
uniform CELT (any frame size/bandwidth in RFC mode, 20 ms in compat),
mono SILK 10/20/40/60 ms, stereo SILK 20 ms, and hybrid mono/stereo all
take batched paths (hybrid runs the host SILK symbol walk, hands the
shared range-coder state to the CELT engine, then mixes both batched
dense phases with the saturating sum); only mode-switching streams use
the scalar bit-exact decoder.
"""
from __future__ import annotations

import functools
import time

import numpy as np

import jax
import jax.numpy as jnp

from ..host import opusfile
from ..host.packet import Mode, parse_packet
from . import batch_celt
from .batch_celt import NB_EBANDS, celt_synth_step, celt_synth_step_dual
from .batch_silk import silk_host_frame
from .silk_decoder import MAX_LPC_ORDER
from ..ops.silk import jax_core as sjc
from ..ops.celt.jax_synthesis import SHORT_MDCT_SIZE, I32

_FS_OF_BW = {1101: 8, 1102: 12, 1103: 16, 1104: 16, 1105: 16}
# CELT end band per bandwidth (opus_decode_frame, src/opus_decoder.cpp:199)
_ENDBAND_OF_BW = {1101: 13, 1102: 17, 1103: 17, 1104: 19, 1105: 21}


def _pow2_cap(n: int) -> int:
    c = 1
    while c < n:
        c <<= 1
    return c


# ---------------------------------------------------------------------
# One jitted device call per bucket per step: the per-stream state
# gather, the synthesis, and the state scatter are fused into a single
# XLA program with the pool state DONATED (zero-copy in-place update).
# This matters doubly on a tunneled TPU where every dispatch pays RPC
# latency — round-1's launch sequence (gather ops + step + scatters as
# separate calls) cost ~35 ms/step at B=256; fused it is ~1 ms.

# One int16 staging row per stream: [idx_lo, idx_hi, tr, sec (14), pad,
# bandE (42), X (C*N)]. Every CELT sideband value fits int16 (end<=21,
# T<=1024, Q15 gains<=32767, tapset<=2), so the WHOLE per-step upload is
# a single device_put — on a tunneled TPU each transfer pays a fixed
# ~30 ms RPC latency, so 5 small uploads cost more than one 2 MB one.
_CELT_HDR = 18


def _celt_packed_frame(dm_all, pre_all, stg, *, LM: int, C: int, CC: int,
                       chunk: int, identity: bool, downsample: int):
    """One packed CELT frame over the pool state (trace-time body shared
    by the per-frame step and the K-frame superstep). stg:
    (cap, 18+42+C*N) int16. Returns (pcm int16, dm_all', pre_all').

    The per-row transient flag changes the iMDCT block structure (a
    static property of the compiled program), so BOTH variants run and
    each row selects its own — device FLOPs are ~free here; scarce are
    launches and transfers, and folding the flag into data keeps every
    step at ONE launch per bucket. X/bandE ship int16 (halves H2D
    bytes); pcm returns int16 (halves D2H bytes).

    identity=True: the bucket covers the whole pool in row order
    (jidx == arange), so the per-row state gather/scatter — a dynamic
    8.9 MB-each-way index operation — is skipped entirely (the host
    checks the index array before choosing this variant)."""
    cap = stg.shape[0]
    s32 = stg.astype(jnp.int32)
    tr = s32[:, 2].astype(bool)
    sec = s32[:, 3:17].T
    bandE = stg[:, _CELT_HDR:_CELT_HDR + 2 * NB_EBANDS].reshape(
        cap, 2, NB_EBANDS)
    N = SHORT_MDCT_SIZE << LM
    X = stg[:, _CELT_HDR + 2 * NB_EBANDS:].reshape(cap, C, N)
    start, end = sec[0], sec[1]
    comb1 = tuple(sec[2 + k] for k in range(6))
    comb2 = tuple(sec[8 + k] for k in range(6))
    if identity:
        pcm, dm2, pre2 = celt_synth_step_dual(
            dm_all, pre_all, X.astype(jnp.int32),
            bandE.astype(jnp.int32), start, end, comb1, comb2, tr,
            LM=LM, C=C, CC=CC, chunk=chunk, downsample=downsample)
        return pcm.astype(jnp.int16), dm2, pre2
    jidx = (s32[:, 0] & 0xFFFF) | (s32[:, 1] << 16)
    dm = dm_all[jidx]
    pre = pre_all[jidx]
    pcm, dm2, pre2 = celt_synth_step_dual(
        dm, pre, X.astype(jnp.int32), bandE.astype(jnp.int32),
        start, end, comb1, comb2, tr,
        LM=LM, C=C, CC=CC, chunk=chunk, downsample=downsample)
    return (pcm.astype(jnp.int16), dm_all.at[jidx].set(dm2),
            pre_all.at[jidx].set(pre2))


@functools.partial(jax.jit,
                   static_argnames=("LM", "C", "CC", "d2h_chunks",
                                    "chunk", "identity", "downsample"),
                   donate_argnums=(0, 1))
def _celt_pool_step_packed(dm_all, pre_all, stg, *, LM: int, C: int,
                           CC: int, d2h_chunks: int = 4,
                           chunk: int = 13, identity: bool = False,
                           downsample: int = 1):
    """Packed-staging step: stg (cap, 18+42+C*N) int16. Returns pcm
    split into d2h_chunks row-chunks — the tunnel moves ~1.5x more
    bytes/s with several concurrent D2H streams than with one large
    fetch."""
    cap = stg.shape[0]
    pcm, dm2, pre2 = _celt_packed_frame(
        dm_all, pre_all, stg, LM=LM, C=C, CC=CC, chunk=chunk,
        identity=identity, downsample=downsample)
    ck = cap // d2h_chunks
    return tuple(pcm[k * ck:(k + 1) * ck] for k in range(d2h_chunks)) \
        + ((pcm[d2h_chunks * ck:],) if d2h_chunks * ck < cap else ()) \
        + (dm2, pre2)


def _celt_packed_frame_T(dmT, pre, stg, *, LM: int, C: int, CC: int,
                         chunk: int, masked: bool, downsample: int,
                         interpret: bool = False):
    """Transposed-layout packed frame over the WHOLE pool (identity
    rows). stg (cap, W) int16 with the same packing as the row path;
    col 17 holds the per-row active flag when masked=True (inactive
    rows — exhausted or lost streams — keep their state bit-for-bit
    and their pcm is discarded by the host; reference CELT loss leaves
    state untouched, the pruned celt_decode_lost)."""
    from ..ops.celt.jax_synthesis_T import celt_synth_step_dual_T
    cap = stg.shape[0]
    s32 = stg.astype(jnp.int32)
    tr = s32[:, 2].astype(bool)
    sec = s32[:, 3:17].T
    bandE = s32[:, _CELT_HDR:_CELT_HDR + 2 * NB_EBANDS].reshape(
        cap, 2, NB_EBANDS)
    N = SHORT_MDCT_SIZE << LM
    X_T = stg[:, _CELT_HDR + 2 * NB_EBANDS:].astype(jnp.int32) \
        .reshape(cap, C, N).transpose(1, 2, 0)
    start, end = sec[0], sec[1]
    comb1 = tuple(sec[2 + k] for k in range(6))
    comb2 = tuple(sec[8 + k] for k in range(6))
    pcmT, dmT2, pre2 = celt_synth_step_dual_T(
        dmT, pre, X_T, bandE, start, end, comb1, comb2, tr,
        LM=LM, C=C, CC=CC, chunk=chunk, downsample=downsample,
        interpret=interpret)
    if masked:
        act = s32[:, 17] > 0
        dmT2 = jnp.where(act[None, None, :], dmT2, dmT)
        pre2 = jnp.where(act[:, None], pre2, pre)
    return pcmT.astype(jnp.int16), dmT2, pre2


@functools.partial(jax.jit,
                   static_argnames=("LM", "C", "CC", "d2h_chunks",
                                    "chunk", "masked", "downsample",
                                    "interpret"),
                   donate_argnums=(0, 1))
def _celt_pool_step_packed_T(dmT, pre, stg, *, LM: int, C: int, CC: int,
                             d2h_chunks: int = 4, chunk: int = 13,
                             masked: bool = False, downsample: int = 1,
                             interpret: bool = False):
    """Transposed packed step: dmT (CC, L, cap) int32 state. Returns
    pcmT (CC, Nd, cap) int16 split into d2h lane-chunks + new state."""
    cap = stg.shape[0]
    pcmT, dmT2, pre2 = _celt_packed_frame_T(
        dmT, pre, stg, LM=LM, C=C, CC=CC, chunk=chunk, masked=masked,
        downsample=downsample, interpret=interpret)
    ck = cap // d2h_chunks
    parts = tuple(pcmT[:, :, k * ck:(k + 1) * ck]
                  for k in range(d2h_chunks))
    if d2h_chunks * ck < cap:
        parts += (pcmT[:, :, d2h_chunks * ck:],)
    return parts + (dmT2, pre2)


@functools.partial(jax.jit,
                   static_argnames=("LM", "C", "CC", "chunk", "masked",
                                    "downsample", "interpret"),
                   donate_argnums=(0, 1))
def _celt_pool_superstep_T(dmT, pre, stgK, *, LM: int, C: int, CC: int,
                           chunk: int = 13, masked: bool = False,
                           downsample: int = 1,
                           interpret: bool = False):
    """K-frame transposed superstep: stgK (K, cap, W) int16 — K frames
    in ONE device program (lax.scan), ONE upload, ONE pcm fetch.
    Returns (pcmK (K, CC, Nd, cap) int16, dmT', pre')."""
    def body(carry, stg):
        dmT, pre = carry
        pcmT, dmT2, pre2 = _celt_packed_frame_T(
            dmT, pre, stg, LM=LM, C=C, CC=CC, chunk=chunk,
            masked=masked, downsample=downsample, interpret=interpret)
        return (dmT2, pre2), pcmT
    (dmT, pre), pcmK = jax.lax.scan(body, (dmT, pre), stgK)
    return pcmK, dmT, pre


@functools.partial(jax.jit,
                   static_argnames=("LM", "C", "CC", "chunk",
                                    "downsample", "interpret"),
                   donate_argnums=(0, 1, 2, 3))
def _celt_pool_superstep_T_lossy(dmT, pre, pitch, lpc, stgK, rowsK,
                                 firstK, *, LM: int, C: int, CC: int,
                                 chunk: int = 13, downsample: int = 1,
                                 interpret: bool = False):
    """K-frame transposed CELT superstep WITH in-window packet-loss
    concealment (VERDICT r04 #3): each scan frame first runs the
    masked decode body (lost rows carry active=0 in stg col 17, state
    kept), then runs the pitch-repeat conceal (ops/celt/jax_plc.py,
    the libopus celt_decode_lost the reference deleted —
    src/celt.cpp pruned dispatch, src/opus_decoder.cpp:154 NULL path)
    COMPACTLY on that frame's lost rows and drop-scatters the results
    into the frame's lanes. A lossy CELT workload therefore keeps the
    superstep's launch amortization instead of flushing the window
    around every conceal (the r04 celt_fb_10pct_loss_plc dispatch
    regression), and the conceal compute scales with the LOST slot
    count S, not the pool cap.

    pitch (cap,) int32 / lpc (cap, CC, 24) float32: the carried PLC
    fit state (libopus keeps them in decoder state across consecutive
    losses). rowsK (K, S) int32 — lost lane indices per frame, slot
    value == cap is a pad (gathers clamp, scatters DROP). firstK
    (K, S) bool — host-tracked loss_count==0 flags (the host stages
    windows in step order, so it knows each frame's conceal runs
    without device readback). Returns (pcmK, dmT', pre', pitch',
    lpc')."""
    # imported lazily but the module must already be loaded OUTSIDE any
    # trace (jax_plc builds jnp constants at import time; a first import
    # under tracing leaks them as tracers) — _celt_plc_group_ss
    # pre-imports it on the host path before this program is traced
    from ..ops.celt.jax_plc import celt_plc_core
    cap = dmT.shape[2]

    def body(carry, xs):
        dmT, pre, pitch, lpc = carry
        stg, rows, first = xs
        pcmT, dmT2, pre2 = _celt_packed_frame_T(
            dmT, pre, stg, LM=LM, C=C, CC=CC, chunk=chunk,
            masked=True, downsample=downsample, interpret=interpret)
        rg = jnp.minimum(rows, cap - 1)
        dmc = dmT2[:, :, rg].transpose(2, 0, 1)
        pcm_c, dm_c, pre_c, pitch_c, lpc_c = celt_plc_core(
            dmc, pre2[rg], pitch[rg], lpc[rg], first,
            CC=CC, downsample=downsample)
        dmT3 = dmT2.at[:, :, rows].set(dm_c.transpose(1, 2, 0))
        pre3 = pre2.at[rows].set(pre_c)
        pitch2 = pitch.at[rows].set(pitch_c)
        lpc2 = lpc.at[rows].set(lpc_c)
        pcmT2 = pcmT.at[:, :, rows].set(
            pcm_c.transpose(2, 1, 0).astype(pcmT.dtype))
        return (dmT3, pre3, pitch2, lpc2), pcmT2

    (dmT, pre, pitch, lpc), pcmK = jax.lax.scan(
        body, (dmT, pre, pitch, lpc), (stgK, rowsK, firstK))
    return pcmK, dmT, pre, pitch, lpc


def _silk_step_body(st, jidx, exc, A, B, iv, bools, glue, *,
                    fs: int, nb: int, order: int, frame: int,
                    has_glue: bool, out_khz: int = 48):
    """One fused mono-SILK device frame over a bucket (traced by both
    the per-frame step and the K-frame superstep).

    iv: (cap, 4, 4) int32 = [gains, inv, lag, adj];
    bools: (cap, 3, 4) bool = [voiced, rewhiten, match];
    glue: (cap,) bool first-good-frame-after-loss flags — the reference
    energy of the concealed frame lives ON DEVICE in st["conc_e"/
    "conc_s"] (scattered there by the conceal step), so gluing costs no
    host round-trip."""
    from ..ops.silk import jax_plc as jplc
    ltp = 20 * fs
    outBuf = st["outBuf"][jidx]
    xq, sLPC2 = sjc.silk_core_frame(
        outBuf[:, :ltp + frame], st["sLPC"][jidx], exc, A, B,
        iv[:, 0], iv[:, 1], iv[:, 2], bools[:, 0], bools[:, 1],
        iv[:, 3], bools[:, 2], fs_khz=fs, nb_subfr=nb, order=order)
    # outBuf rolls the RAW decoded signal; the audible output is
    # glue-smoothed on the first good frame after a concealment run
    # (silk_PLC_glue_frames :3138)
    xq_out = xq
    if has_glue:
        xq_out = jplc.glue_frames(xq, st["conc_e"][jidx],
                                  st["conc_s"][jidx], glue, frame=frame)
    hist = jnp.concatenate([outBuf[:, frame:ltp], xq], axis=-1)
    new_outbuf = jnp.concatenate(
        [hist, jnp.zeros((xq.shape[0], 20 * fs), dtype=I32)], axis=-1)
    sMid = st["sMid"][jidx]
    resin = jnp.concatenate([sMid[:, 1:2], xq_out[:, :-1]], axis=-1)
    out48, sIIR, sFIR, delay = sjc.resample_batch(
        st["sIIR"][jidx], st["sFIR"][jidx], st["delay"][jidx], resin,
        fs_in_khz=fs, fs_out_khz=out_khz, in_len=frame)
    st2 = dict(st)
    st2["outBuf"] = st["outBuf"].at[jidx].set(new_outbuf)
    st2["sLPC"] = st["sLPC"].at[jidx].set(sLPC2)
    st2["sMid"] = st["sMid"].at[jidx].set(xq_out[:, frame - 2:frame])
    st2["sIIR"] = st["sIIR"].at[jidx].set(sIIR)
    st2["sFIR"] = st["sFIR"].at[jidx].set(sFIR)
    st2["delay"] = st["delay"].at[jidx].set(delay)
    return out48.astype(jnp.int16), st2


@functools.partial(jax.jit,
                   static_argnames=("fs", "nb", "order", "frame",
                                    "has_glue", "out_khz"),
                   donate_argnums=(0,))
def _silk_pool_step(st, jidx, exc, A, B, iv, bools, glue, *,
                    fs: int, nb: int, order: int, frame: int,
                    has_glue: bool, out_khz: int = 48):
    """Per-frame jit wrapper of _silk_step_body (state donated)."""
    return _silk_step_body(st, jidx, exc, A, B, iv, bools, glue,
                           fs=fs, nb=nb, order=order, frame=frame,
                           has_glue=has_glue, out_khz=out_khz)


@functools.partial(jax.jit,
                   static_argnames=("fs", "nb", "order", "frame",
                                    "has_glue", "out_khz"),
                   donate_argnums=(0,))
def _silk_pool_superstep(st, jidxK, excK, AK, BK, ivK, boolsK, glueK,
                         actK, *, fs: int, nb: int, order: int,
                         frame: int, has_glue: bool, out_khz: int = 48):
    """K-frame mono-SILK superstep: K frames of staged symbol columns
    run as ONE device program (lax.scan over _silk_step_body, bucket
    state carried in the loop — the same launch-amortization move as
    _celt_pool_superstep_T). actK (K,) bool marks real frames; padded
    flush frames select the untouched state wholesale, so a partial
    window reuses the one compiled (K, cap, ...) shape as a no-op
    suffix. Returns (pcmK (K, cap, L_out) int16, st')."""
    def body(carry, xs):
        jidx, exc, A, B, iv, bools, glue, act = xs
        out, st2 = _silk_step_body(carry, jidx, exc, A, B, iv, bools,
                                   glue, fs=fs, nb=nb, order=order,
                                   frame=frame, has_glue=has_glue,
                                   out_khz=out_khz)
        st2 = {k: jnp.where(act, v, carry[k]) for k, v in st2.items()}
        return st2, out

    st, outs = jax.lax.scan(
        body, st, (jidxK, excK, AK, BK, ivK, boolsK, glueK, actK))
    return outs, st


@functools.partial(jax.jit,
                   static_argnames=("fs", "nb", "order", "frame",
                                    "out_khz"),
                   donate_argnums=(0,))
def _silk_plc_pool_step(st, jidx, rand, A, B4, lag4, inv_gain,
                        prev_gain, cng_exc, cng_a, cng_gain, first, *,
                        fs: int, nb: int, order: int, frame: int,
                        out_khz: int = 48):
    """One fused mono-SILK concealment frame over a bucket: conceal
    core + CNG add + glue-energy capture + resample, as a SINGLE
    compiled program with the bucket state donated (the previous
    expression as ~15 eager ops per launch dominated the loss-step host
    time). Semantics identical to the eager chain (silk_PLC conceal
    :2973, silk_CNG :1342, outBuf roll of the RAW signal, post-CNG
    audible frame + its glue reference energy)."""
    from ..ops.silk import jax_plc as jplc
    ltp = 20 * fs
    cap = rand.shape[0]
    xq, sLPC = jplc.silk_plc_conceal_frame(
        st["outBuf"][jidx][:, :ltp + frame], st["sLPC"][jidx],
        rand, A, B4, lag4, inv_gain, prev_gain,
        fs_khz=fs, nb_subfr=nb, order=order)
    hist = jnp.concatenate([st["outBuf"][jidx][:, frame:ltp], xq],
                           axis=-1)
    new_outbuf = jnp.concatenate(
        [hist, jnp.zeros((cap, 20 * fs), dtype=I32)], axis=-1)
    state0 = jnp.where(first[:, None], 0, st["cng"][jidx])
    xq_out, cng_state = jplc.cng_add(
        xq, cng_exc, cng_a, cng_gain, state0,
        jnp.ones(cap, dtype=bool), frame=frame, order=order)
    ce, cs = jplc.frame_energy(xq_out, frame=frame)
    sMid = st["sMid"][jidx]
    resin = jnp.concatenate([sMid[:, 1:2], xq_out[:, :-1]], axis=-1)
    out48, sIIR, sFIR, delay = sjc.resample_batch(
        st["sIIR"][jidx], st["sFIR"][jidx], st["delay"][jidx], resin,
        fs_in_khz=fs, fs_out_khz=out_khz, in_len=frame)
    st2 = dict(st)
    st2["outBuf"] = st["outBuf"].at[jidx].set(new_outbuf)
    st2["sLPC"] = st["sLPC"].at[jidx].set(sLPC)
    st2["cng"] = st["cng"].at[jidx].set(cng_state)
    st2["conc_e"] = st["conc_e"].at[jidx].set(ce)
    st2["conc_s"] = st["conc_s"].at[jidx].set(cs)
    st2["sMid"] = st["sMid"].at[jidx].set(xq_out[:, frame - 2:frame])
    st2["sIIR"] = st["sIIR"].at[jidx].set(sIIR)
    st2["sFIR"] = st["sFIR"].at[jidx].set(sFIR)
    st2["delay"] = st["delay"].at[jidx].set(delay)
    return out48.astype(jnp.int16), st2


def _silk_lossy_body(st, jidx, exc, A, B, iv, bools, glue, lost,
                     rand, cA, cB4, clag4, cg3, cng_exc, cng_a, cfirst,
                     *, fs: int, nb: int, order: int, frame: int,
                     out_khz: int = 48):
    """One fused mono-SILK frame where each row is EITHER decoded from
    staged symbols OR concealed (silk_PLC conceal + CNG) under the
    per-row `lost` mask. Both paths run masked so a lossy step can stay
    inside the K-frame superstep window instead of flushing it — the
    r02 loss-config bottleneck (every 10%-loss step used to force a
    window flush plus separate per-frame conceal launches). Decode
    semantics == _silk_step_body; conceal semantics ==
    _silk_plc_pool_step (conceal -> outBuf roll of the RAW signal ->
    CNG add -> glue-energy capture, src/silk.cpp:1974-2050).

    cg3: (cap, 3) int32 = [inv_gain_q30, prev_gain_q10_1, cng_gain].
    Rows not covered by either path this frame are pad rows duplicating
    a real row (same inputs -> same scattered value)."""
    from ..ops.silk import jax_plc as jplc
    ltp = 20 * fs
    outBuf = st["outBuf"][jidx]
    sLPC0 = st["sLPC"][jidx]
    xq_d, sLPC_d = sjc.silk_core_frame(
        outBuf[:, :ltp + frame], sLPC0, exc, A, B,
        iv[:, 0], iv[:, 1], iv[:, 2], bools[:, 0], bools[:, 1],
        iv[:, 3], bools[:, 2], fs_khz=fs, nb_subfr=nb, order=order)
    xq_c, sLPC_c = jplc.silk_plc_conceal_frame(
        outBuf[:, :ltp + frame], sLPC0, rand, cA, cB4, clag4,
        cg3[:, 0], cg3[:, 1], fs_khz=fs, nb_subfr=nb, order=order)
    lm = lost[:, None]
    xq = jnp.where(lm, xq_c, xq_d)        # RAW signal rolls into outBuf
    sLPC2 = jnp.where(lm, sLPC_c, sLPC_d)
    # audible decode rows: glue-smoothed on the first good frame after a
    # concealment run (glue flags are False on lost rows)
    xq_dg = jplc.glue_frames(xq_d, st["conc_e"][jidx],
                             st["conc_s"][jidx], glue, frame=frame)
    # audible conceal rows: post-CNG frame (also the glue ref energy)
    state0 = jnp.where((cfirst & lost)[:, None], 0, st["cng"][jidx])
    xq_cng, cng2 = jplc.cng_add(xq_c, cng_exc, cng_a, cg3[:, 2], state0,
                                lost, frame=frame, order=order)
    ce, cs = jplc.frame_energy(xq_cng, frame=frame)
    xq_out = jnp.where(lm, xq_cng, xq_dg)
    hist = jnp.concatenate([outBuf[:, frame:ltp], xq], axis=-1)
    new_outbuf = jnp.concatenate(
        [hist, jnp.zeros((xq.shape[0], 20 * fs), dtype=I32)], axis=-1)
    sMid = st["sMid"][jidx]
    resin = jnp.concatenate([sMid[:, 1:2], xq_out[:, :-1]], axis=-1)
    out48, sIIR, sFIR, delay = sjc.resample_batch(
        st["sIIR"][jidx], st["sFIR"][jidx], st["delay"][jidx], resin,
        fs_in_khz=fs, fs_out_khz=out_khz, in_len=frame)
    st2 = dict(st)
    st2["outBuf"] = st["outBuf"].at[jidx].set(new_outbuf)
    st2["sLPC"] = st["sLPC"].at[jidx].set(sLPC2)
    st2["cng"] = st["cng"].at[jidx].set(cng2)
    st2["conc_e"] = st["conc_e"].at[jidx].set(
        jnp.where(lost, ce, st["conc_e"][jidx]))
    st2["conc_s"] = st["conc_s"].at[jidx].set(
        jnp.where(lost, cs, st["conc_s"][jidx]))
    st2["sMid"] = st["sMid"].at[jidx].set(xq_out[:, frame - 2:frame])
    st2["sIIR"] = st["sIIR"].at[jidx].set(sIIR)
    st2["sFIR"] = st["sFIR"].at[jidx].set(sFIR)
    st2["delay"] = st["delay"].at[jidx].set(delay)
    return out48.astype(jnp.int16), st2


@functools.partial(jax.jit,
                   static_argnames=("fs", "nb", "order", "frame",
                                    "out_khz"),
                   donate_argnums=(0,))
def _silk_pool_superstep_lossy(st, jidxK, excK, AK, BK, ivK, boolsK,
                               glueK, lostK, randK, cAK, cB4K, clag4K,
                               cg3K, cngeK, cngaK, cfirstK, actK, *,
                               fs: int, nb: int, order: int, frame: int,
                               out_khz: int = 48):
    """K-frame mono-SILK superstep with per-row packet-loss concealment
    (lax.scan over _silk_lossy_body): K frames of staged symbols AND
    conceal preps run as ONE device program, so a lossy workload keeps
    the superstep's launch amortization — only frames whose window saw
    any loss pay the masked dual-path compute. actK (K,) bool marks real
    frames; padded flush frames keep the state wholesale."""
    def body(carry, xs):
        (jidx, exc, A, B, iv, bools, glue, lost, rand, cA, cB4, clag4,
         cg3, cnge, cnga, cfirst, act) = xs
        out, st2 = _silk_lossy_body(
            carry, jidx, exc, A, B, iv, bools, glue, lost, rand, cA,
            cB4, clag4, cg3, cnge, cnga, cfirst, fs=fs, nb=nb,
            order=order, frame=frame, out_khz=out_khz)
        st2 = {k: jnp.where(act, v, carry[k]) for k, v in st2.items()}
        return st2, out

    st, outs = jax.lax.scan(
        body, st, (jidxK, excK, AK, BK, ivK, boolsK, glueK, lostK,
                   randK, cAK, cB4K, clag4K, cg3K, cngeK, cngaK,
                   cfirstK, actK))
    return outs, st


def _dummy_conceal_cols(cap: int, frame: int, order: int):
    """All-zero SMALL conceal staging (per-row params) for frames/rows
    without loss (the lossy superstep computes both paths on every row
    and selects by mask; zeros are numerically safe: lag 0 reads recent
    in-buffer history, and no conceal op divides by a staged value).
    The two FRAME-SIZED conceal arrays (rand, cng_exc) are staged
    COMPACT — only lost rows' data crosses the host->device link, a
    device-side scatter (_expand_rows) densifies them — so they are
    not part of this tuple. Order: [A, B4, lag4, g3, cng_a, first]."""
    return (np.zeros((cap, order), dtype=np.int32),
            np.zeros((cap, 4, 5), dtype=np.int32),
            np.zeros((cap, 4), dtype=np.int32),
            np.zeros((cap, 3), dtype=np.int32),
            np.zeros((cap, order), dtype=np.int32),
            np.zeros(cap, dtype=bool))


def _stack_conceal_cols(preps, order: int):
    """Host conceal preps (batch_silk.silk_plc_host_params dicts) ->
    the SMALL per-row conceal columns (rows in list order), matching
    _dummy_conceal_cols. Per-subframe columns (B4, lag4) pad to 4 rows
    so 10 ms preps (nb_subfr=2) share the window shapes — the conceal
    kernels only read the first nb_subfr rows."""
    def sub4(key):
        a = np.stack([p[key] for p in preps]).astype(np.int32)
        if a.shape[1] < 4:
            pad = np.zeros((a.shape[0], 4 - a.shape[1]) + a.shape[2:],
                           dtype=np.int32)
            a = np.concatenate([a, pad], axis=1)
        return a

    g3 = np.stack([[int(p["inv_gain"]), int(p["prev_gain"]),
                    int(p["cng_gain"])] for p in preps]).astype(np.int32)
    return (np.stack([p["A"][:order] for p in preps]).astype(np.int32),
            sub4("B4"),
            sub4("lag4"),
            g3,
            np.stack([p["cng_a"][:order] for p in preps]
                     ).astype(np.int32),
            np.array([bool(p["cng_first"]) for p in preps]))


def _stack_conceal_frames(preps):
    """The frame-sized conceal inputs, COMPACT (one row per lost
    stream): (rand (m, frame), cng_exc (m, frame)) int32."""
    return (np.stack([p["rand"] for p in preps]).astype(np.int32),
            np.stack([p["cng_exc"] for p in preps]).astype(np.int32))


def _pad_compact(parts, cap: int, frame: int):
    """Per-frame compact conceal inputs (positions (m,), rand (m, F),
    cng_exc (m, F)) -> fixed-shape window arrays (rows (K, S),
    rand/cnge (K, S, F)) padded to the pow2 slot count S; pad slots
    use position `cap`, which the device scatter DROPS."""
    K = len(parts)
    S = max(1, _pow2_cap(max(p[0].shape[0] for p in parts) or 1))
    rows = np.full((K, S), cap, dtype=np.int32)
    rand = np.zeros((K, S, frame), dtype=np.int32)
    cnge = np.zeros((K, S, frame), dtype=np.int32)
    for k, (pos, r, c) in enumerate(parts):
        m = pos.shape[0]
        rows[k, :m] = pos
        rand[k, :m] = r
        cnge[k, :m] = c
    return rows, rand, cnge


@functools.partial(jax.jit, static_argnames=("cap",))
def _expand_rows(rows, vals, *, cap: int):
    """Densify compact per-frame conceal data on DEVICE: rows (K, S)
    frame-row positions (cap == out-of-range slots DROP, the scatter's
    OOB semantics), vals (K, S, F) -> (K, cap, F). Duplicate positions
    carry identical values, so the scatter is deterministic. This keeps
    the host->device link traffic at the LOST fraction instead of a
    dense (K, cap, F) upload per window."""
    K, S, F = vals.shape
    out = jnp.zeros((K, cap, F), vals.dtype)
    return out.at[jnp.arange(K, dtype=jnp.int32)[:, None], rows].set(
        vals)


def _silk2_step_body(st, jidx, m_exc, m_A, m_B, m_iv, m_bools,
                     s_exc, s_A, s_B, s_iv, s_bools, side_flags, pred,
                     glue, *, fs: int, order: int, has_glue: bool = False,
                     out_khz: int = 48, nb: int = 4):
    """One fused stereo-SILK device frame over a bucket (traced by both
    the per-frame step and the K-frame superstep): mid core, masked
    side core, MS->LR unmix, both channels resampled.
    nb: subframes per frame (2 = 10 ms payloads, 4 = 20 ms);
    side_flags: (2, cap) int32 = [has_side, side_reset];
    glue: (cap, 2) bool per-channel first-good-frame-after-loss flags —
    the concealed-frame reference energy lives in st["conc_e"/"conc_s"]
    (silk_PLC_glue_frames :3138, applied per channel before MS->LR like
    the scalar per-channel _decode_frame)."""
    from ..ops.silk.jax_stereo import ms_to_lr_batch
    from ..ops.silk import jax_plc as jplc
    frame = nb * 5 * fs
    ltp = 20 * fs
    cap = m_exc.shape[0]
    has_side = side_flags[0].astype(bool)
    reset = side_flags[1].astype(bool)

    ob0 = st["outBuf"][jidx][:, 0]
    ob1_old = st["outBuf"][jidx][:, 1]
    sl1_old = st["sLPC"][jidx][:, 1]
    ob1 = jnp.where(reset[:, None], 0, ob1_old)
    sl1 = jnp.where(reset[:, None], 0, sl1_old)
    # mid and side run as ONE 2*cap-row core call (rows independent):
    # one kernel invocation at double lane occupancy instead of two
    xq_both, sLPC_both = sjc.silk_core_frame(
        jnp.concatenate([ob0, ob1]),
        jnp.concatenate([st["sLPC"][jidx][:, 0], sl1]),
        jnp.concatenate([m_exc, s_exc]),
        jnp.concatenate([m_A, s_A]), jnp.concatenate([m_B, s_B]),
        jnp.concatenate([m_iv[:, 0], s_iv[:, 0]]),
        jnp.concatenate([m_iv[:, 1], s_iv[:, 1]]),
        jnp.concatenate([m_iv[:, 2], s_iv[:, 2]]),
        jnp.concatenate([m_bools[:, 0], s_bools[:, 0]]),
        jnp.concatenate([m_bools[:, 1], s_bools[:, 1]]),
        jnp.concatenate([m_iv[:, 3], s_iv[:, 3]]),
        jnp.concatenate([m_bools[:, 2], s_bools[:, 2]]),
        fs_khz=fs, nb_subfr=nb, order=order)
    xq_mid, xq_side = xq_both[:cap], xq_both[cap:]
    sLPC0, sLPC1 = sLPC_both[:cap], sLPC_both[cap:]
    new_ob0 = jnp.concatenate(
        [ob0[:, frame:ltp], xq_mid, jnp.zeros((cap, ltp), dtype=I32)],
        axis=-1)
    new_ob1 = jnp.where(
        has_side[:, None],
        jnp.concatenate([ob1[:, frame:ltp], xq_side,
                         jnp.zeros((cap, ltp), dtype=I32)], axis=-1),
        ob1_old)
    new_sl1 = jnp.where(has_side[:, None], sLPC1, sl1_old)
    xq_side = jnp.where(has_side[:, None], xq_side, 0)

    if has_glue:
        # outBuf rolls the RAW signal; the audible (MS->LR) signal is
        # glue-smoothed per channel on the first good frame after loss
        ce = st["conc_e"][jidx]
        cs = st["conc_s"][jidx]
        xq_mid = jplc.glue_frames(xq_mid, ce[:, 0], cs[:, 0], glue[:, 0],
                                  frame=frame)
        xq_side = jplc.glue_frames(xq_side, ce[:, 1], cs[:, 1],
                                   glue[:, 1], frame=frame)

    L, R, nm, ns = ms_to_lr_batch(
        st["sMid"][jidx], st["sSide"][jidx], st["pred_prev"][jidx],
        xq_mid, xq_side, pred, fs_khz=fs, frame_length=frame)
    resin = jnp.stack([L, R], axis=1).reshape(2 * cap, frame)
    W = sjc.sfir_width(fs, out_khz)
    out48, sIIR, sFIR, delay = sjc.resample_batch(
        st["sIIR"][jidx].reshape(2 * cap, 6),
        st["sFIR"][jidx].reshape(2 * cap, W),
        st["delay"][jidx].reshape(2 * cap, fs), resin,
        fs_in_khz=fs, fs_out_khz=out_khz, in_len=frame)

    st2 = dict(st)
    st2["outBuf"] = st["outBuf"].at[jidx].set(
        jnp.stack([new_ob0, new_ob1], axis=1))
    st2["sLPC"] = st["sLPC"].at[jidx].set(
        jnp.stack([sLPC0, new_sl1], axis=1))
    st2["sIIR"] = st["sIIR"].at[jidx].set(sIIR.reshape(cap, 2, 6))
    st2["sFIR"] = st["sFIR"].at[jidx].set(sFIR.reshape(cap, 2, W))
    st2["delay"] = st["delay"].at[jidx].set(delay.reshape(cap, 2, fs))
    st2["pred_prev"] = st["pred_prev"].at[jidx].set(pred)
    st2["sMid"] = st["sMid"].at[jidx].set(nm)
    st2["sSide"] = st["sSide"].at[jidx].set(ns)
    return out48.astype(jnp.int16).reshape(cap, 2, -1), st2


@functools.partial(jax.jit,
                   static_argnames=("fs", "order", "has_glue", "out_khz",
                                    "nb"),
                   donate_argnums=(0,))
def _silk2_pool_step(st, jidx, m_exc, m_A, m_B, m_iv, m_bools,
                     s_exc, s_A, s_B, s_iv, s_bools, side_flags, pred,
                     glue, *, fs: int, order: int, has_glue: bool = False,
                     out_khz: int = 48, nb: int = 4):
    """Per-frame jit wrapper of _silk2_step_body (state donated)."""
    return _silk2_step_body(st, jidx, m_exc, m_A, m_B, m_iv, m_bools,
                            s_exc, s_A, s_B, s_iv, s_bools, side_flags,
                            pred, glue, fs=fs, order=order,
                            has_glue=has_glue, out_khz=out_khz, nb=nb)


@functools.partial(jax.jit,
                   static_argnames=("fs", "order", "has_glue", "out_khz",
                                    "nb"),
                   donate_argnums=(0,))
def _silk2_pool_superstep(st, jidxK, m_excK, m_AK, m_BK, m_ivK, m_boolsK,
                          s_excK, s_AK, s_BK, s_ivK, s_boolsK,
                          side_flagsK, predK, glueK, actK, *, fs: int,
                          order: int, has_glue: bool = False,
                          out_khz: int = 48, nb: int = 4):
    """K-frame stereo-SILK superstep: K frames of staged mid/side symbol
    columns run as ONE device program (lax.scan over _silk2_step_body,
    bucket state carried in the loop — same launch-amortization move as
    the mono _silk_pool_superstep). actK (K,) bool marks real frames;
    padded flush frames select the untouched state wholesale. Returns
    (pcmK (K, cap, 2, L_out) int16, st')."""
    def body(carry, xs):
        (jidx, m_exc, m_A, m_B, m_iv, m_bools, s_exc, s_A, s_B, s_iv,
         s_bools, side_flags, pred, glue, act) = xs
        out, st2 = _silk2_step_body(
            carry, jidx, m_exc, m_A, m_B, m_iv, m_bools, s_exc, s_A,
            s_B, s_iv, s_bools, side_flags, pred, glue, fs=fs,
            order=order, has_glue=has_glue, out_khz=out_khz, nb=nb)
        st2 = {k: jnp.where(act, v, carry[k]) for k, v in st2.items()}
        return st2, out

    st, outs = jax.lax.scan(
        body, st, (jidxK, m_excK, m_AK, m_BK, m_ivK, m_boolsK, s_excK,
                   s_AK, s_BK, s_ivK, s_boolsK, side_flagsK, predK,
                   glueK, actK))
    return outs, st


def _silk2_lossy_body(st, jidx, m_exc, m_A, m_B, m_iv, m_bools,
                      s_exc, s_A, s_B, s_iv, s_bools, side_flags, pred,
                      glue, lost, conc, *, fs: int, order: int,
                      out_khz: int = 48, nb: int = 4):
    """One fused stereo-SILK frame where each row is EITHER decoded
    from staged mid/side symbols OR concealed per channel under the
    per-row `lost` mask — the stereo counterpart of _silk_lossy_body,
    so lossy steps stay inside the silk2 K-frame superstep window.
    Decode semantics == _silk2_step_body; conceal semantics ==
    _silk2_plc_pool_step (side concealed only when the previous frame
    had one; MS->LR keeps the PREVIOUS predictors via the staged
    per-row pred). conc: 17-tuple = 8 mid conceal cols + 8 side
    conceal cols + c_has_side."""
    from ..ops.silk import jax_plc as jplc
    from ..ops.silk.jax_stereo import ms_to_lr_batch
    (cm_rand, cm_A, cm_B4, cm_lag4, cm_g3, cm_cnge, cm_cnga, cm_first,
     cs_rand, cs_A, cs_B4, cs_lag4, cs_g3, cs_cnge, cs_cnga, cs_first,
     c_has_side) = conc
    frame = nb * 5 * fs
    ltp = 20 * fs
    cap = m_exc.shape[0]
    lostc = lost[:, None]

    # ---- decode path (== _silk2_step_body pre-MS->LR) ----------------
    has_side = side_flags[0].astype(bool)
    reset = side_flags[1].astype(bool)
    ob = st["outBuf"][jidx]
    sl = st["sLPC"][jidx]
    cng = st["cng"][jidx]
    ob0 = ob[:, 0]
    ob1_old = ob[:, 1]
    sl1_old = sl[:, 1]
    ob1 = jnp.where(reset[:, None], 0, ob1_old)
    sl1 = jnp.where(reset[:, None], 0, sl1_old)
    xq_both, sLPC_both = sjc.silk_core_frame(
        jnp.concatenate([ob0, ob1]),
        jnp.concatenate([sl[:, 0], sl1]),
        jnp.concatenate([m_exc, s_exc]),
        jnp.concatenate([m_A, s_A]), jnp.concatenate([m_B, s_B]),
        jnp.concatenate([m_iv[:, 0], s_iv[:, 0]]),
        jnp.concatenate([m_iv[:, 1], s_iv[:, 1]]),
        jnp.concatenate([m_iv[:, 2], s_iv[:, 2]]),
        jnp.concatenate([m_bools[:, 0], s_bools[:, 0]]),
        jnp.concatenate([m_bools[:, 1], s_bools[:, 1]]),
        jnp.concatenate([m_iv[:, 3], s_iv[:, 3]]),
        jnp.concatenate([m_bools[:, 2], s_bools[:, 2]]),
        fs_khz=fs, nb_subfr=nb, order=order)
    d_mid, d_side = xq_both[:cap], xq_both[cap:]
    d_sl0, d_sl1 = sLPC_both[:cap], sLPC_both[cap:]
    d_ob0 = jnp.concatenate(
        [ob0[:, frame:ltp], d_mid, jnp.zeros((cap, ltp), dtype=I32)],
        axis=-1)
    d_ob1 = jnp.where(
        has_side[:, None],
        jnp.concatenate([ob1[:, frame:ltp], d_side,
                         jnp.zeros((cap, ltp), dtype=I32)], axis=-1),
        ob1_old)
    d_sl1 = jnp.where(has_side[:, None], d_sl1, sl1_old)
    d_side = jnp.where(has_side[:, None], d_side, 0)
    ce_old = st["conc_e"][jidx]
    cs_old = st["conc_s"][jidx]
    d_mid_aud = jplc.glue_frames(d_mid, ce_old[:, 0], cs_old[:, 0],
                                 glue[:, 0], frame=frame)
    d_side_aud = jplc.glue_frames(d_side, ce_old[:, 1], cs_old[:, 1],
                                  glue[:, 1], frame=frame)

    # ---- conceal path (== _silk2_plc_pool_step pre-MS->LR) -----------
    def conceal(ch, rand, A, B4, lag4, g3, cexc, ca, first):
        xq, sl2 = jplc.silk_plc_conceal_frame(
            ob[:, ch, :ltp + frame], sl[:, ch], rand, A, B4,
            lag4, g3[:, 0], g3[:, 1], fs_khz=fs, nb_subfr=nb,
            order=order)
        hist = jnp.concatenate([ob[:, ch, frame:ltp], xq], axis=-1)
        new_ob = jnp.concatenate(
            [hist, jnp.zeros((cap, 20 * fs), dtype=I32)], axis=-1)
        state0 = jnp.where((first & lost)[:, None], 0, cng[:, ch])
        xq_out, cng2 = jplc.cng_add(
            xq, cexc, ca, g3[:, 2], state0, lost, frame=frame,
            order=order)
        ce, cs_ = jplc.frame_energy(xq_out, frame=frame)
        return xq_out, new_ob, sl2, cng2, ce, cs_

    m = conceal(0, cm_rand, cm_A, cm_B4, cm_lag4, cm_g3, cm_cnge,
                cm_cnga, cm_first)
    sd_ = conceal(1, cs_rand, cs_A, cs_B4, cs_lag4, cs_g3, cs_cnge,
                  cs_cnga, cs_first)
    hs1 = c_has_side[:, None]
    c_mid_aud = m[0]
    c_side_aud = jnp.where(hs1, sd_[0], 0)
    c_ob = jnp.stack([m[1], jnp.where(hs1, sd_[1], ob1_old)], axis=1)
    c_sl = jnp.stack([m[2], jnp.where(hs1, sd_[2], sl1_old)], axis=1)
    c_cng = jnp.stack([m[3], jnp.where(hs1, sd_[3], cng[:, 1])], axis=1)
    c_ce = jnp.stack([m[4], jnp.where(c_has_side, sd_[4],
                                      ce_old[:, 1])], axis=1)
    c_cs = jnp.stack([m[5], jnp.where(c_has_side, sd_[5],
                                      cs_old[:, 1])], axis=1)

    # ---- per-row select, then ONE MS->LR + resample ------------------
    xq_mid = jnp.where(lostc, c_mid_aud, d_mid_aud)
    xq_side = jnp.where(lostc, c_side_aud, d_side_aud)
    new_ob = jnp.where(lostc[:, :, None],
                       c_ob, jnp.stack([d_ob0, d_ob1], axis=1))
    new_sl = jnp.where(lostc[:, :, None],
                       c_sl, jnp.stack([d_sl0, d_sl1], axis=1))
    new_cng = jnp.where(lostc[:, :, None], c_cng, cng)
    new_ce = jnp.where(lostc, c_ce, ce_old)
    new_cs = jnp.where(lostc, c_cs, cs_old)

    L, R, nm, ns = ms_to_lr_batch(
        st["sMid"][jidx], st["sSide"][jidx], st["pred_prev"][jidx],
        xq_mid, xq_side, pred, fs_khz=fs, frame_length=frame)
    resin = jnp.stack([L, R], axis=1).reshape(2 * cap, frame)
    W = sjc.sfir_width(fs, out_khz)
    out48, sIIR, sFIR, delay = sjc.resample_batch(
        st["sIIR"][jidx].reshape(2 * cap, 6),
        st["sFIR"][jidx].reshape(2 * cap, W),
        st["delay"][jidx].reshape(2 * cap, fs), resin,
        fs_in_khz=fs, fs_out_khz=out_khz, in_len=frame)

    st2 = dict(st)
    st2["outBuf"] = st["outBuf"].at[jidx].set(new_ob)
    st2["sLPC"] = st["sLPC"].at[jidx].set(new_sl)
    st2["cng"] = st["cng"].at[jidx].set(new_cng)
    st2["conc_e"] = st["conc_e"].at[jidx].set(new_ce)
    st2["conc_s"] = st["conc_s"].at[jidx].set(new_cs)
    st2["sIIR"] = st["sIIR"].at[jidx].set(sIIR.reshape(cap, 2, 6))
    st2["sFIR"] = st["sFIR"].at[jidx].set(sFIR.reshape(cap, 2, W))
    st2["delay"] = st["delay"].at[jidx].set(delay.reshape(cap, 2, fs))
    st2["pred_prev"] = st["pred_prev"].at[jidx].set(pred)
    st2["sMid"] = st["sMid"].at[jidx].set(nm)
    st2["sSide"] = st["sSide"].at[jidx].set(ns)
    return out48.astype(jnp.int16).reshape(cap, 2, -1), st2


@functools.partial(jax.jit, static_argnames=("fs", "order", "out_khz",
                                             "nb"),
                   donate_argnums=(0,))
def _silk2_pool_superstep_lossy(st, jidxK, m_excK, m_AK, m_BK, m_ivK,
                                m_boolsK, s_excK, s_AK, s_BK, s_ivK,
                                s_boolsK, side_flagsK, predK, glueK,
                                lostK, concK, actK, *, fs: int,
                                order: int, out_khz: int = 48,
                                nb: int = 4):
    """K-frame stereo-SILK superstep with per-row loss concealment
    (lax.scan over _silk2_lossy_body) — the stereo counterpart of
    _silk_pool_superstep_lossy."""
    def body(carry, xs):
        (jidx, m_exc, m_A, m_B, m_iv, m_bools, s_exc, s_A, s_B, s_iv,
         s_bools, side_flags, pred, glue, lost, conc, act) = xs
        out, st2 = _silk2_lossy_body(
            carry, jidx, m_exc, m_A, m_B, m_iv, m_bools, s_exc, s_A,
            s_B, s_iv, s_bools, side_flags, pred, glue, lost, conc,
            fs=fs, order=order, out_khz=out_khz, nb=nb)
        st2 = {k: jnp.where(act, v, carry[k]) for k, v in st2.items()}
        return st2, out

    st, outs = jax.lax.scan(
        body, st, (jidxK, m_excK, m_AK, m_BK, m_ivK, m_boolsK, s_excK,
                   s_AK, s_BK, s_ivK, s_boolsK, side_flagsK, predK,
                   glueK, lostK, concK, actK))
    return outs, st


@functools.partial(jax.jit, static_argnames=("fs", "order", "out_khz",
                                             "nb"),
                   donate_argnums=(0,))
def _silk2_plc_pool_step(st, jidx, m_rand, m_A, m_B4, m_lag4, m_g,
                         m_cng_exc, m_cng_a, m_first,
                         s_rand, s_A, s_B4, s_lag4, s_g,
                         s_cng_exc, s_cng_a, s_first,
                         has_side, pred, *, fs: int, order: int,
                         out_khz: int = 48, nb: int = 4):
    """Fused stereo concealment: silk_PLC conceal + CNG per channel
    (side masked like the scalar has_side policy), MS->LR with the
    PREVIOUS predictors, both channels resampled — the batched stereo
    loss path (silk_Decode lostFlag=1 with nChannelsInternal=2,
    reference src/silk.cpp:1481/2973/1342).

    m_g/s_g: (cap, 3) int32 = [inv_gain, prev_gain, cng_gain]."""
    from ..ops.silk import jax_plc as jplc
    from ..ops.silk.jax_stereo import ms_to_lr_batch
    frame = nb * 5 * fs
    ltp = 20 * fs
    cap = m_rand.shape[0]
    ob = st["outBuf"][jidx]
    sl = st["sLPC"][jidx]
    cng = st["cng"][jidx]

    def conceal(ch, rand, A, B4, lag4, g3, cexc, ca, first):
        xq, sl2 = jplc.silk_plc_conceal_frame(
            ob[:, ch, :ltp + frame], sl[:, ch], rand, A[:, :order], B4,
            lag4, g3[:, 0], g3[:, 1], fs_khz=fs, nb_subfr=nb, order=order)
        hist = jnp.concatenate([ob[:, ch, frame:ltp], xq], axis=-1)
        new_ob = jnp.concatenate(
            [hist, jnp.zeros((cap, 20 * fs), dtype=I32)], axis=-1)
        state0 = jnp.where(first[:, None], 0, cng[:, ch])
        xq_out, cng2 = jplc.cng_add(
            xq, cexc, ca[:, :order], g3[:, 2], state0,
            jnp.ones(cap, dtype=bool), frame=frame, order=order)
        ce, cs_ = jplc.frame_energy(xq_out, frame=frame)
        return xq_out, new_ob, sl2, cng2, ce, cs_

    m = conceal(0, m_rand, m_A, m_B4, m_lag4, m_g, m_cng_exc, m_cng_a,
                m_first)
    sd_ = conceal(1, s_rand, s_A, s_B4, s_lag4, s_g, s_cng_exc, s_cng_a,
                  s_first)
    hs1 = has_side[:, None]
    xq_mid = m[0]
    xq_side = jnp.where(hs1, sd_[0], 0)
    new_ob = jnp.stack([m[1], jnp.where(hs1, sd_[1], ob[:, 1])], axis=1)
    new_sl = jnp.stack([m[2], jnp.where(hs1, sd_[2], sl[:, 1])], axis=1)
    new_cng = jnp.stack([m[3], jnp.where(hs1, sd_[3], cng[:, 1])], axis=1)
    old_ce, old_cs = st["conc_e"][jidx], st["conc_s"][jidx]
    new_ce = jnp.stack([m[4], jnp.where(has_side, sd_[4], old_ce[:, 1])],
                       axis=1)
    new_cs = jnp.stack([m[5], jnp.where(has_side, sd_[5], old_cs[:, 1])],
                       axis=1)

    L, R, nm, ns = ms_to_lr_batch(
        st["sMid"][jidx], st["sSide"][jidx], st["pred_prev"][jidx],
        xq_mid, xq_side, pred, fs_khz=fs, frame_length=frame)
    resin = jnp.stack([L, R], axis=1).reshape(2 * cap, frame)
    W = sjc.sfir_width(fs, out_khz)
    out48, sIIR, sFIR, delay = sjc.resample_batch(
        st["sIIR"][jidx].reshape(2 * cap, 6),
        st["sFIR"][jidx].reshape(2 * cap, W),
        st["delay"][jidx].reshape(2 * cap, fs), resin,
        fs_in_khz=fs, fs_out_khz=out_khz, in_len=frame)

    st2 = dict(st)
    st2["outBuf"] = st["outBuf"].at[jidx].set(new_ob)
    st2["sLPC"] = st["sLPC"].at[jidx].set(new_sl)
    st2["cng"] = st["cng"].at[jidx].set(new_cng)
    st2["conc_e"] = st["conc_e"].at[jidx].set(new_ce)
    st2["conc_s"] = st["conc_s"].at[jidx].set(new_cs)
    st2["sIIR"] = st["sIIR"].at[jidx].set(sIIR.reshape(cap, 2, 6))
    st2["sFIR"] = st["sFIR"].at[jidx].set(sFIR.reshape(cap, 2, W))
    st2["delay"] = st["delay"].at[jidx].set(delay.reshape(cap, 2, fs))
    st2["pred_prev"] = st["pred_prev"].at[jidx].set(pred)
    st2["sMid"] = st["sMid"].at[jidx].set(nm)
    st2["sSide"] = st["sSide"].at[jidx].set(ns)
    return out48.astype(jnp.int16).reshape(cap, 2, -1), st2


@functools.partial(jax.jit,
                   static_argnames=("LM", "C", "CC", "chunk", "fs",
                                    "order", "has_glue", "out_khz",
                                    "downsample", "nb"),
                   donate_argnums=(0, 1, 2))
def _hybrid2_pool_superstep(dm_all, pre_all, sst, cstgK, jidxK,
                            m_excK, m_AK, m_BK, m_ivK, m_boolsK,
                            s_excK, s_AK, s_BK, s_ivK, s_boolsK,
                            side_flagsK, predK, glueK, permK, actK, *,
                            LM: int, C: int, CC: int, chunk: int,
                            fs: int, order: int, has_glue: bool,
                            out_khz: int, downsample: int, nb: int = 4):
    """K-frame STEREO-HYBRID superstep: per frame the stereo-SILK core
    (mid+side+MS->LR+resample), the packed CELT synthesis, and the
    saturating SILK+CELT mix (src/opus_decoder.cpp:272) all run inside
    ONE lax.scan device program — one upload, one dispatch, one fetch
    of HALF the unmixed bytes per K frames. nb_subfr 4 = 20 ms frames
    (LM 3), 2 = 10 ms (LM 2). permK maps each CELT staging row to its
    SILK bucket row. actK masks padded flush frames (state kept
    bit-for-bit). Returns (mixedK (K, cap, N, CC) int16, dm', pre',
    silk_st')."""
    def body(carry, xs):
        dm, pre, st = carry
        (cstg, jidx, m_exc, m_A, m_B, m_iv, m_bools, s_exc, s_A, s_B,
         s_iv, s_bools, side_flags, pred, glue, perm, act) = xs
        out48, st2 = _silk2_step_body(
            st, jidx, m_exc, m_A, m_B, m_iv, m_bools, s_exc, s_A, s_B,
            s_iv, s_bools, side_flags, pred, glue, fs=fs, order=order,
            has_glue=has_glue, out_khz=out_khz, nb=nb)
        pcm_c, dm2, pre2 = _celt_packed_frame(
            dm, pre, cstg, LM=LM, C=C, CC=CC, chunk=chunk,
            identity=False, downsample=downsample)
        s = jnp.take(out48, perm, axis=0)       # (cap_c, 2, L)
        mixed = jnp.clip(pcm_c.astype(jnp.int32) + s.astype(jnp.int32),
                         -32768, 32767).astype(jnp.int16)
        mixed = jnp.transpose(mixed, (0, 2, 1))
        st2 = {k: jnp.where(act, v, st[k]) for k, v in st2.items()}
        dm2 = jnp.where(act, dm2, dm)
        pre2 = jnp.where(act, pre2, pre)
        return (dm2, pre2, st2), mixed

    (dm, pre, sst), outs = jax.lax.scan(
        body, (dm_all, pre_all, sst),
        (cstgK, jidxK, m_excK, m_AK, m_BK, m_ivK, m_boolsK, s_excK,
         s_AK, s_BK, s_ivK, s_boolsK, side_flagsK, predK, glueK, permK,
         actK))
    return outs, dm, pre, sst


@functools.partial(jax.jit,
                   static_argnames=("LM", "C", "CC", "chunk", "fs",
                                    "nb", "order", "has_glue",
                                    "out_khz", "downsample"),
                   donate_argnums=(0, 1, 2))
def _hybrid1_pool_superstep(dm_all, pre_all, sst, cstgK, jidxK, excK,
                            AK, BK, ivK, boolsK, glueK, permK, actK, *,
                            LM: int, C: int, CC: int, chunk: int,
                            fs: int, nb: int, order: int,
                            has_glue: bool, out_khz: int,
                            downsample: int):
    """K-frame MONO-HYBRID superstep: the mono-SILK core, the packed
    CELT synthesis, and the saturating mix fused into ONE lax.scan
    device program (the stereo variant is _hybrid2_pool_superstep).
    nb_subfr 4 = 20 ms frames (LM 3), 2 = 10 ms (LM 2). Returns
    (mixedK (K, cap, N, CC) int16, dm', pre', silk_st')."""
    frame = nb * 5 * fs

    def body(carry, xs):
        dm, pre, st = carry
        cstg, jidx, exc, A, B, iv, bools, glue, perm, act = xs
        out48, st2 = _silk_step_body(
            st, jidx, exc, A, B, iv, bools, glue, fs=fs, nb=nb,
            order=order, frame=frame, has_glue=has_glue,
            out_khz=out_khz)
        pcm_c, dm2, pre2 = _celt_packed_frame(
            dm, pre, cstg, LM=LM, C=C, CC=CC, chunk=chunk,
            identity=False, downsample=downsample)
        s = jnp.take(out48, perm, axis=0)[:, None, :]   # (cap_c, 1, L)
        mixed = jnp.clip(pcm_c.astype(jnp.int32) + s.astype(jnp.int32),
                         -32768, 32767).astype(jnp.int16)
        mixed = jnp.transpose(mixed, (0, 2, 1))
        st2 = {k: jnp.where(act, v, st[k]) for k, v in st2.items()}
        dm2 = jnp.where(act, dm2, dm)
        pre2 = jnp.where(act, pre2, pre)
        return (dm2, pre2, st2), mixed

    (dm, pre, sst), outs = jax.lax.scan(
        body, (dm_all, pre_all, sst),
        (cstgK, jidxK, excK, AK, BK, ivK, boolsK, glueK, permK, actK))
    return outs, dm, pre, sst


@jax.jit
def _hybrid_mix_step(cparts, silk, perm):
    """Saturating SILK+CELT hybrid mix ON DEVICE for one uniform-hybrid
    bucket (the reference mixes on the host CPU per sample,
    src/opus_decoder.cpp:272). cparts: tuple of CELT pcm chunks whose
    concatenation is (cap, CC, N); silk: (cap, L) mono or (cap, 2, L)
    stereo rows in silk-group order; perm: (n,) silk row for each celt
    row. Returns (n, N, CC) int16 — mixed PCM, directly consumable by
    an on-chip stage or fetched as HALF the unmixed bytes."""
    celt = cparts[0] if len(cparts) == 1 \
        else jnp.concatenate(cparts, axis=0)
    s = jnp.take(silk, perm, axis=0)
    if s.ndim == 2:
        s = s[:, None, :]    # mono SILK broadcasts over CELT channels
    m = jnp.clip(celt[:perm.shape[0]].astype(jnp.int32)
                 + s.astype(jnp.int32), -32768, 32767).astype(jnp.int16)
    return jnp.transpose(m, (0, 2, 1))


# --- on-chip consumer layout normalizers: tiny jitted relayouts that
# present every launch family's PCM as (rows, T, CC) for a downstream
# device stage (models/consumer.py) -------------------------------------
@jax.jit
def _rows_celt(parts):
    """Packed CELT chunks (cap, CC, N) -> (cap, N, CC)."""
    a = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)
    return jnp.transpose(a.astype(jnp.int16), (0, 2, 1))


@jax.jit
def _rows_celt_T(parts):
    """Transposed-path lane chunks (CC, Nd, cap) -> (cap, Nd, CC)."""
    a = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)
    return jnp.transpose(a, (2, 1, 0))


@jax.jit
def _rows_silk(a):
    """Mono SILK (cap, L) -> (cap, L, 1)."""
    return a[:, :, None]


@jax.jit
def _rows_silk2(a):
    """Stereo SILK (cap, 2, L) -> (cap, L, 2)."""
    return jnp.transpose(a, (0, 2, 1))


class _SSBatch:
    """One dispatched (or to-be-dispatched) K-frame superstep. Frames
    buffered into it hold `frame(j)` handles; `result()` on a handle
    fetches the whole K-frame PCM block once and serves per-frame
    views out of the cached host copy."""

    __slots__ = ("pool", "fut", "_np")

    def __init__(self, pool):
        self.pool = pool
        self.fut = None      # set at dispatch: device (K, CC, Nd, cap)
        self._np = None

    def frame(self, j):
        return _SSFrame(self, j)

    def device(self):
        """The whole K-frame PCM block as a DEVICE array (resolves the
        dispatch-thread future but does not fetch) — the on-chip
        consumer path slices per-frame views out of it in HBM."""
        if self.fut is None:         # accessed before K frames ran
            self.pool._ss_flush()
        if hasattr(self.fut, "result"):
            self.fut = self.fut.result()
        return self.fut

    def host(self):
        if self._np is None:
            self._np = np.asarray(self.device())
        return self._np


class _SSFrame:
    __slots__ = ("batch", "j")

    def __init__(self, batch, j):
        self.batch = batch
        self.j = j

    def result(self):
        return (self.batch.host()[self.j],)


class StreamPool:
    def __init__(self, sources, channels: int = 1, native: bool = True,
                 compat_ref: bool = True, host_threads: int = 0,
                 fixed_buckets: bool = False, rfc_plc: bool = False,
                 output: str = "host", device_keep: int | None = None,
                 out_fs: int = 48000, superstep_k: int = 1,
                 ms_batch: bool = True):
        """sources: list of paths/bytes of Ogg/Opus streams (or
        pre-parsed OggOpusStream objects).

        ms_batch: batch single-link family-1 surround sources by
        lifting their elementary streams into internal sub-pools (one
        stereo pool for the coupled streams, one mono pool for the
        rest) and interleaving at egress per the mapping table — each
        elementary stream becomes an ordinary batched pool row instead
        of a scalar OpusMSDecoder walk (reference decodes surround one
        stream at a time inside opus_multistream_decode_native,
        src/opus_decoder.cpp:826-931). False keeps the scalar MS path.

        out_fs: output sample rate (48000/24000/16000/12000/8000) for
        any pool — CELT decimates on device, SILK resamples the
        internal rate straight to out_fs (batched reference bank);
        for CELT the deemphasis stage decimates on device
        exactly like the reference's downsample factor
        (src/celt.cpp:1988-2055, resampling_factor :817), cutting the
        PCM-egress bytes by the same factor. SILK/hybrid pools target
        the 48 kHz API rate (their resampler bank is 48k-out).

        output: "host" streams every frame's PCM back to host memory
        (the reference player's I2S-egress analog). "device" leaves the
        PCM in HBM for on-chip consumers (feature pipelines, vocoder/ASR
        stages on the same chip) — the host<->device link then carries
        only the compact symbol tensors; fetch on demand with drain().
        device_keep bounds the retained steps in "device" mode (oldest
        PCM is dropped once a downstream consumer would have taken it);
        None keeps everything until drain().

        rfc_plc=True (RFC mode only) enables REAL packet-loss concealment
        on the batched SILK/hybrid paths (silk_PLC conceal + CNG + glue,
        reference src/silk.cpp:2871-3200) — host prepares the sequential
        concealment parameters, the device runs the conceal kernel
        (ops/silk/jax_plc.py). Works with both symbol engines: native
        pools keep the C symbol phase and mirror the PLC/CNG parameter
        state in a per-stream tracker fed from its outputs.

        fixed_buckets=True pads every device bucket to its pool-lifetime
        capacity (pow2 of the number of streams that can ever hit it)
        instead of the current frame's count — the per-step split between
        transient/non-transient CELT buckets then never changes a traced
        shape, so steady-state serving never recompiles (at the cost of
        launching full-capacity kernels; the device phase is ~1000x ahead
        of the host phase, so the waste is invisible end to end)."""
        self.streams = [
            s if isinstance(s, opusfile.OggOpusStream)
            else opusfile.parse_stream(
                s if isinstance(s, (bytes, bytearray))
                else open(s, "rb").read())
            for s in sources]
        self.n = len(self.streams)
        self.channels = channels
        self.native = native
        self.compat_ref = compat_ref
        self.fixed_buckets = fixed_buckets
        if rfc_plc and compat_ref:
            raise ValueError("rfc_plc requires compat_ref=False")
        self.rfc_plc = rfc_plc
        if output not in ("host", "device"):
            raise ValueError("output must be 'host' or 'device'")
        self.output = output
        self.device_keep = device_keep
        self._dev_out: list = []
        self._consumer = None
        if out_fs not in (48000, 24000, 16000, 12000, 8000):
            raise ValueError(f"unsupported out_fs {out_fs}")
        self.downsample = 48000 // out_fs
        self._out_khz = out_fs // 1000
        # per-stream packet cursor as an ARRAY: the fast path gathers
        # and bulk-advances it without a per-stream python loop
        self.positions = np.zeros(self.n, dtype=np.int64)
        self.pcm_out = [[] for _ in range(self.n)]
        self.state = batch_celt.make_state(self.n, channels)
        self.silk_buckets: dict[int, dict] = {}
        self.silk2_buckets: dict[int, dict] = {}
        self._stats = dict(steps=0, frames=0, bytes_in=0, samples_out=0,
                           frames_celt=0, frames_silk=0, frames_hybrid=0,
                           frames_scalar=0, frames_lost=0, frames_fec=0,
                           buckets={})
        # per-phase host wall time inside step() (SURVEY §5 tracing):
        # host_symbol = entropy/symbol phase, dispatch = grouping +
        # device enqueues, materialize = pipeline retirement (includes
        # any device wait in host-output mode)
        self._phase_s = dict(host_symbol=0.0, dispatch=0.0,
                             materialize=0.0)
        self._pool = None
        if host_threads > 1:
            from concurrent.futures import ThreadPoolExecutor
            self._pool = ThreadPoolExecutor(host_threads)

        # batched multistream: lift each single-link family-1 source's
        # elementary streams into internal sub-pools (stereo rows for
        # coupled streams, mono rows for the rest); the parent row only
        # interleaves at egress (_assemble_ms)
        self._ms_parents: dict[int, list] = {}
        self._ms_subs: dict[str, "StreamPool"] = {}
        if ms_batch:
            specs: dict[str, list] = {"c": [], "m": []}
            for i, s in enumerate(self.streams):
                h = s.head
                if h is None or (h.stream_count == 1
                                 and h.channel_count <= 2) \
                        or s.n_links > 1:
                    continue
                refs = []
                for ks in opusfile.split_multistream(s):
                    key = "c" if ks.head.channel_count == 2 else "m"
                    refs.append((key, len(specs[key])))
                    specs[key].append(ks)
                self._ms_parents[i] = refs
            for key, sl in specs.items():
                if sl:
                    self._ms_subs[key] = StreamPool(
                        sl, channels=2 if key == "c" else 1,
                        native=native, compat_ref=compat_ref,
                        host_threads=host_threads,
                        fixed_buckets=fixed_buckets, rfc_plc=rfc_plc,
                        out_fs=out_fs, superstep_k=superstep_k)

        # classify each stream once
        self.path = []
        self._scalar_link = [0] * self.n
        self._ms_decs: dict[int, object] = {}
        for i, s in enumerate(self.streams):
            head = s.head
            if i in self._ms_parents:
                # batched surround: decode happens in the sub-pools;
                # this row only tracks the packet cursor + interleaves
                self.path.append(("msb",))
                continue
            if head is not None and (head.stream_count > 1
                                     or head.channel_count > 2):
                # family-1 surround / multi-stream source: decode through
                # the multistream layer like the reference's opusfile
                # always does (src/opusfile.cpp:1238) — classifying from
                # the first TOC byte would silently decode the composite
                # packet as one elementary stream (garbage)
                self.path.append(("ms",))
                continue
            if s.n_links > 1:
                # chained streams need decoder resets at link boundaries
                # (src/opusfile.cpp:835-1133) — scalar path handles that
                self.path.append(("scalar",))
                continue
            kinds = set()
            fss = set()
            bws = set()
            # scan EVERY packet's TOC: sampling a prefix misclassifies
            # streams that switch mode/bandwidth later (cheap — one byte
            # per packet)
            for j in s.jobs:
                p0 = j.data[0]
                mode = Mode.CELT_ONLY if p0 & 0x80 else (
                    Mode.HYBRID if (p0 & 0x60) == 0x60 else Mode.SILK_ONLY)
                from ..host.packet import (get_samples_per_frame,
                                           get_nb_frames, get_bandwidth,
                                           get_nb_channels)
                kinds.add((mode, get_samples_per_frame(p0),
                           get_nb_frames(j.data), get_nb_channels(p0)))
                bw = int(get_bandwidth(p0))
                fss.add(_FS_OF_BW.get(bw, 16))
                bws.add(bw)
            # compat mode reproduces the reference's end-band-ignored
            # quirk (src/celt.cpp:2199) by pinning end=21; RFC mode sets
            # the real end band per bandwidth — the engines honor it, so
            # batching only needs the stream's bandwidth to be uniform
            fb_only_ok = compat_ref or len(bws) == 1
            endband = 21 if compat_ref else \
                _ENDBAND_OF_BW.get(next(iter(bws)), 21)
            if len(kinds) == 1:
                mode, spf, nfr, sch = next(iter(kinds))
                # compat mode is 20 ms-only (audiosize hard-coded 960);
                # RFC mode batches every CELT frame size (LM 0-3 — the
                # device synthesis is LM-generic)
                celt_spf_ok = spf == 960 if compat_ref \
                    else spf in (120, 240, 480, 960)
                if mode == Mode.CELT_ONLY and celt_spf_ok and nfr == 1 \
                        and fb_only_ok:
                    self.path.append(("celt", spf, endband))
                    continue
                # SILK: compat mode is 20 ms-only (the reference hard-
                # codes audiosize 960, src/opus_decoder.cpp:161 — longer
                # payloads mis-decode, kept scalar for garbage parity);
                # RFC mode batches 20/40/60 ms payloads (1-3 internal
                # frames) and code-3 multi-frame packets.
                silk_ok = (spf == 960 and nfr == 1) if compat_ref else (
                    spf in (480, 960, 1920, 2880) and spf * nfr <= 5760)
                if mode == Mode.SILK_ONLY and silk_ok and sch == 1 \
                        and channels == 1 and len(fss) == 1:
                    # frame_ms: duration of one DEVICE frame (10 for
                    # nb_subfr=2 payloads, else 20); dfp: device frames
                    # per packet
                    frame_ms = 10 if spf == 480 else 20
                    dfp = nfr * max(1, spf // 960)
                    self.path.append(("silk", next(iter(fss)), dfp,
                                      spf // 48, frame_ms))
                    continue
                # stereo SILK: compat mode stays 20 ms-only (audiosize
                # 960 hard-coded); RFC mode batches 10/20/40/60 ms
                # payloads and code-3 multi-frame packets via the native
                # engine (silk_host_stereo_packet_c — python symbol
                # fallback keeps multi-frame stereo scalar). 10 ms
                # payloads are single-frame (nb_subfr=2) only.
                silk2_ok = (spf == 960 and nfr == 1) if compat_ref \
                    else (spf in (480, 960) and nfr == 1) \
                    if not self.native else (
                    (spf in (960, 1920, 2880) and spf * nfr <= 5760)
                    or (spf == 480 and nfr == 1))
                if mode == Mode.SILK_ONLY and silk2_ok \
                        and sch == 2 and channels == 2 and len(fss) == 1:
                    self.path.append(("silk2", next(iter(fss)),
                                      nfr * max(1, spf // 960),
                                      spf // 48,
                                      10 if spf == 480 else 20))
                    continue
                # hybrid batches 20 ms (spf 960) and, in RFC mode, 10 ms
                # (spf 480) packets — RFC 6716 hybrid's two legal frame
                # sizes; compat mode keeps 10 ms scalar (the reference
                # hard-codes audiosize 960, src/opus_decoder.cpp:161 —
                # short payloads mis-decode, kept scalar for garbage
                # parity like short SILK). The path tuple carries the
                # device frame duration.
                hyb_spf_ok = spf == 960 if compat_ref \
                    else spf in (480, 960)
                if mode == Mode.HYBRID and hyb_spf_ok and nfr == 1 \
                        and sch == 1 and channels == 1 and fb_only_ok:
                    self.path.append(("hybrid", endband,
                                      10 if spf == 480 else 20))
                    continue
                if mode == Mode.HYBRID and hyb_spf_ok and nfr == 1 \
                        and sch == 2 and channels == 2 and fb_only_ok:
                    self.path.append(("hybrid2", endband,
                                      10 if spf == 480 else 20))
                    continue
            self.path.append(("scalar",))

        # heterogeneous superstep: a MIXED-kind pool would forfeit the
        # K-frame superstep entirely (every gate below requires one
        # uniform kind). Instead, lift each batchable kind's streams
        # into an internal uniform sub-pool — the _ms_subs move applied
        # to kinds — so every kind runs its own K-frame superstep;
        # only genuinely scalar rows (chained links, true multistream
        # composites) stay in the parent. The realistic farm shape
        # (CELT music + SILK voice + hybrid in one population) then
        # pays zero scalar-path frames. Applies when superstep_k > 1
        # and fixed_buckets (the serving configuration); uniform pools
        # keep the direct in-pool fast path.
        self._kind_subs: dict[str, "StreamPool"] = {}
        self._kind_ref: dict[int, tuple] = {}
        self._kind_idx: dict[str, np.ndarray] = {}
        batchable = ("celt", "silk", "silk2", "hybrid", "hybrid2")
        kinds_here = {p[0] for p in self.path if p[0] in batchable}
        uniform = len(kinds_here) == 1 and all(
            p[0] in batchable for p in self.path)
        if superstep_k > 1 and fixed_buckets and kinds_here \
                and not uniform:
            kgroups: dict[str, list] = {}
            for i, p in enumerate(self.path):
                if p[0] in batchable:
                    kgroups.setdefault(p[0], []).append(i)
            for key in sorted(kgroups):
                idxs = kgroups[key]
                self._kind_subs[key] = StreamPool(
                    [self.streams[i] for i in idxs],
                    channels=channels, native=native,
                    compat_ref=compat_ref, host_threads=host_threads,
                    fixed_buckets=fixed_buckets, rfc_plc=rfc_plc,
                    output=output, device_keep=device_keep,
                    out_fs=out_fs, superstep_k=superstep_k,
                    ms_batch=ms_batch)
                self._kind_idx[key] = np.asarray(idxs, dtype=np.int64)
                for slot, i in enumerate(idxs):
                    self._kind_ref[i] = (key, slot)
                    self.path[i] = ("sub", key, slot)

        # out_fs < 48000 is supported on every batched path: CELT pools
        # decimate on device (resampling_factor semantics, celt.cpp:817
        # with the anti-alias spectral bound), SILK pools resample the
        # internal rate straight to out_fs via the batched reference
        # bank (resample_batch: up2/IIR-FIR/down-FIR, silk.cpp:3590),
        # hybrid rows mix the two at out_fs like opus_decode_frame at a
        # lower API rate. Scalar-fallback rows decode at fs=out_fs.

        # transposed-layout fast mode: uniform CELT pools on TPU carry
        # decode_mem TRANSPOSED (CC, L, n) and run the fully transposed
        # synthesis (ops/celt/jax_synthesis_T.py) — no relayouts around
        # the Pallas FFT, comb postfilter as an in-VMEM per-lane delay
        # kernel instead of lane gathers (8-100x faster device step)
        import os as _os
        self._t_mode = ((jax.default_backend() == "tpu"
                         or _os.environ.get("OTPU_T_MODE") == "1")
                        and self.n > 0
                        and all(p[0] == "celt" for p in self.path))
        self._t_interp = jax.default_backend() != "tpu"
        # single dispatch thread: device calls (which block per-dispatch
        # on a tunneled device) run off the main thread so the next
        # step's host phase overlaps them; calls stay serialized (state
        # chains step to step)
        self._dev_exec = None
        if self._t_mode and not self._t_interp:
            from concurrent.futures import ThreadPoolExecutor
            self._dev_exec = ThreadPoolExecutor(1)
        if self._t_mode:
            from ..ops.celt.jax_synthesis import (DECODE_BUFFER_SIZE,
                                                  OVERLAP)
            self.state = {
                "decode_mem": jnp.zeros(
                    (channels, DECODE_BUFFER_SIZE + OVERLAP, self.n),
                    dtype=I32),
                "preemph": jnp.zeros((self.n, channels), dtype=I32),
            }
        # K-frame superstep (transposed pools only): buffer K frames of
        # staging and run them as ONE device program (lax.scan inside
        # _celt_pool_superstep_T) — one upload, one dispatch, one fetch
        # per K frames, amortizing the per-dispatch RPC/client cost K x
        # at the price of K frames of added latency. Uniform mono-SILK
        # pools superstep too (lax.scan over _silk_step_body); other
        # mixes fall back to per-frame dispatch.
        silk_ss_ok = (fixed_buckets and bool(self.path)
                      and (all(p[0] == "silk" for p in self.path)
                           or all(p[0] == "silk2" for p in self.path)))
        # uniform hybrid pools superstep too: SILK core + CELT synthesis
        # + device mix fused into one K-frame program (stereo and mono)
        hyb_ss_ok = (fixed_buckets and bool(self.path)
                     and all(p[0] == "hybrid2" for p in self.path))
        hyb1_ss_ok = (fixed_buckets and bool(self.path)
                      and all(p[0] == "hybrid" for p in self.path))
        self._ss_k = max(1, int(superstep_k)) \
            if (self._t_mode or silk_ss_ok or hyb_ss_ok or hyb1_ss_ok) \
            else 1
        self._ss_silk = self._ss_k > 1 and silk_ss_ok
        self._ss_hyb = self._ss_k > 1 and hyb_ss_ok      # stereo
        self._ss_hyb1 = self._ss_k > 1 and hyb1_ss_ok    # mono
        # mono-SILK superstep pools keep LOSSY steps inside the window:
        # conceal rows join the staged frame under a per-row mask
        # (_silk_plc_group_ss) instead of flushing it
        self._ss_silk1 = (self._ss_k > 1 and fixed_buckets
                          and bool(self.path)
                          and all(p[0] == "silk" for p in self.path))
        self._ss_silk2 = (self._ss_k > 1 and fixed_buckets
                          and bool(self.path)
                          and all(p[0] == "silk2" for p in self.path))
        self._ss_buf: dict[tuple, list] = {}
        # (frame_index, step_seq) of the good-row staging each window
        # key buffered THIS step — the conceal merge point
        self._ss_mark: dict[tuple, tuple] = {}
        self._step_seq = 0
        if (self._ss_silk or self._ss_hyb or self._ss_hyb1) \
                and self._dev_exec is None \
                and jax.default_backend() == "tpu":
            from concurrent.futures import ThreadPoolExecutor
            self._dev_exec = ThreadPoolExecutor(1)

        # batched CELT PLC (rfc_plc pools): pitch + LPC fit carried on
        # device across consecutive losses (libopus celt_decode_lost
        # state, restored — the reference deleted it); loss runs are
        # tracked host-side as "was this row concealed last step"
        self._plc_prev_lost: set = set()
        # celt_decode_lost bookkeeping mirrors (libopus keeps these in
        # decoder state): conceals since the last good frame per row,
        # and the skip_plc flag (set at the first good decode after a
        # loss run, cleared at the second — celt_decode_with_ec's
        # `st->skip_plc = st->loss_count != 0` entry semantics)
        self._plc_loss_cnt: dict[int, int] = {}
        self._plc_skip: set = set()
        if self.rfc_plc and any(p[0] == "celt" for p in self.path):
            self.state["plc_pitch"] = jnp.zeros((self.n,), I32)
            self.state["plc_lpc"] = jnp.zeros(
                (self.n, channels, 24), jnp.float32)

        # rfc_plc + native: PLC/CNG parameter state mirrors fed from the
        # native outputs (batch_silk.NativePlcTracker)
        self._plc_trk: dict[int, object] = {}
        self._plc_trk2: dict[tuple, object] = {}   # (stream, channel)
        self._last_pred: dict[int, np.ndarray] = {}
        self._silk2_hosts: dict[int, object] = {}
        # per-stream OPUS_GET_FINAL_RANGE after the last decoded packet
        # (SILK-only streams: the range coder lives per frame, so the
        # host phase exports rng explicitly)
        self._last_rng: dict[int, int] = {}
        # deferred-materialization queue: device launches from step t are
        # fetched at the END of step t+pipeline_depth, so the host symbol
        # phases of the next `depth` steps overlap the device execution
        # of step t (real pipeline overlap, SURVEY §2.7 frame pipeline
        # parallelism). Depth > 1 also hides the per-step RPC latency of
        # a tunneled/remote TPU: by the time a result is fetched, its
        # chain has long completed in the background.
        self._pending: list = []
        # superstep mode dispatches only every K frames, so retirement
        # must lag at least K steps behind or _materialize would block
        # on a not-yet-dispatched window
        self.pipeline_depth = max(2, self._ss_k)
        self._groups: list = []
        # ms/msb/sub rows decode elsewhere (OpusMSDecoder / sub-pools):
        # no per-row host engines or scalar decoders in the parent
        is_ms = [p[0] in ("ms", "msb", "sub") for p in self.path]
        if native:
            from ..host.native import NativeCELTHost, NativeSilkHost
            self.celt_hosts: list = [None] * self.n
            self.silk_hosts: list = [None] * self.n
            self._build_groups()
            for i in range(self.n):
                if is_ms[i]:
                    continue
                if self.celt_hosts[i] is None:
                    self.celt_hosts[i] = NativeCELTHost(channels)
                if self.silk_hosts[i] is None:
                    self.silk_hosts[i] = NativeSilkHost()
        else:
            from .celt_decoder import CELTDecoder
            self.celt_hosts = [None if is_ms[i] else
                               CELTDecoder(channels, compat_ref=compat_ref)
                               for i in range(self.n)]
            self.silk_hosts = None
        from .opus_decoder import OpusDecoder
        # ms rows decode through their OpusMSDecoder (no 1/2-channel
        # scalar decoder exists for >2ch)
        self.scalar = [None if is_ms[i] else
                       OpusDecoder(channels, fs=out_fs,
                                   compat_ref=compat_ref)
                       for i in range(self.n)]

        # pool-lifetime bucket capacities (pow2 of the number of streams
        # that can ever hit each bucket); used always by warmup(), and as
        # the launch size too when fixed_buckets=True
        n_celt = sum(1 for p in self.path
                     if p[0] in ("celt", "hybrid", "hybrid2"))
        self._cap_celt = _pow2_cap(max(n_celt, 1))
        self._cap_silk = {}
        for fs in {p[1] for p in self.path if p[0] == "silk"} | {16}:
            cnt = sum(1 for p in self.path
                      if (p[0] == "silk" and p[1] == fs)
                      or (p[0] == "hybrid" and fs == 16))
            if cnt:
                self._cap_silk[fs] = _pow2_cap(cnt)
        self._cap_silk2 = {}
        for fs in {p[1] for p in self.path if p[0] == "silk2"} | {16}:
            cnt = sum(1 for p in self.path
                      if (p[0] == "silk2" and p[1] == fs)
                      or (p[0] == "hybrid2" and fs == 16))
            if cnt:
                self._cap_silk2[fs] = _pow2_cap(cnt)

    # ---------------------------------------------------------- groups
    def _build_groups(self):
        """Group same-kind native streams for the batched C++ symbol
        phase (models/host_groups.py): one library call per group per
        step instead of one ctypes call per stream per frame. Per-stream
        host objects alias rows of the group state buffers, so the
        per-stream fallback paths (loss, FEC, PLC) and checkpointing
        stay coherent with the batch calls."""
        from . import host_groups as hg
        by_key: dict[tuple, list[int]] = {}
        for i, p in enumerate(self.path):
            k = p[0]
            if k == "celt":
                by_key.setdefault(("celt", p[1]), []).append(i)
            elif k == "hybrid":
                by_key.setdefault(("hybrid", p[2]), []).append(i)
            elif k == "silk":
                fs, dfp, payload_ms = p[1], p[2], p[3]
                nfr = dfp // max(1, (payload_ms * 48) // 960)
                # code-3 multi-frame packets stay generic; rfc_plc pools
                # batch 20 ms payloads (the tracker post-pass mirrors
                # apply_plc_transition + good_frame over the group rows)
                if nfr == 1 and (not self.rfc_plc or payload_ms == 20):
                    by_key.setdefault(("silk", fs, payload_ms),
                                      []).append(i)
            elif k == "silk2" and not self.rfc_plc and p[2] == 1:
                # multi-frame stereo packets stay on the generic path
                # (the batched group decoder is single-frame-only)
                by_key.setdefault(("silk2", p[1], p[4]), []).append(i)
            elif k == "hybrid2" and not self.rfc_plc:
                by_key.setdefault(("hybrid2", p[2]), []).append(i)
        for key, idxs in sorted(by_key.items()):
            jls = [self.streams[i].jobs for i in idxs]
            if key[0] == "celt":
                g = hg.CeltGroup(idxs, jls, key[1], self.channels, 0,
                                 [self.path[i][2] for i in idxs])
                for r, i in enumerate(idxs):
                    self.celt_hosts[i] = g.hosts[r]
                self._groups.append(("celt", g))
            elif key[0] == "silk":
                g = hg.SilkGroup(idxs, jls, key[1], key[2])
                for r, i in enumerate(idxs):
                    self.silk_hosts[i] = g.hosts[r]
                self._groups.append(("silk", g))
            elif key[0] == "hybrid":
                frame_ms = key[1]
                sg = hg.SilkGroup(idxs, jls, 16, frame_ms, hybrid=True)
                cg = hg.CeltGroup(idxs, jls, frame_ms * 48,
                                  self.channels, 17,
                                  [self.path[i][1] for i in idxs])
                for r, i in enumerate(idxs):
                    self.silk_hosts[i] = sg.hosts[r]
                    self.celt_hosts[i] = cg.hosts[r]
                self._groups.append(("hybrid", sg, cg))
            elif key[0] == "silk2":
                g = hg.SilkStereoGroup(idxs, jls, key[1],
                                       frame_ms=key[2])
                for r, i in enumerate(idxs):
                    self._silk2_hosts[i] = g.hosts[r]
                self._groups.append(("silk2", g))
            elif key[0] == "hybrid2":
                frame_ms = key[1]
                sg = hg.SilkStereoGroup(idxs, jls, 16, hybrid=True,
                                        frame_ms=frame_ms)
                cg = hg.CeltGroup(idxs, jls, frame_ms * 48,
                                  self.channels, 17,
                                  [self.path[i][1] for i in idxs])
                for r, i in enumerate(idxs):
                    self._silk2_hosts[i] = sg.hosts[r]
                    self.celt_hosts[i] = cg.hosts[r]
                self._groups.append(("hybrid2", sg, cg))

    _LM_OF_SPF = {120: 0, 240: 1, 480: 2, 960: 3}

    def _fast_step(self, lost, pend, handled) -> int:
        """Batched host symbol phase over all groups; emits device
        launches into pend. Returns the number of frames decoded.
        Streams NOT handled here (lost this step, exhausted, ungrouped)
        fall through to the per-stream generic path."""
        n_fast = 0
        lost_mask = None
        if lost:
            lost_mask = np.zeros(self.n, dtype=bool)
            lost_mask[list(lost)] = True
        for entry in self._groups:
            kind, g = entry[0], entry[1]
            idxs = np.asarray(g.idxs)
            pos = self.positions[idxs]
            active = pos < g.table.n_packets
            if lost_mask is not None:
                active &= ~lost_mask[idxs]
            if not active.any():
                continue
            ok = g.decode(pos, active)
            if kind == "hybrid" or kind == "hybrid2":
                cg = entry[2]
                cg.decode(pos, ok, ec_in=g.ec)
            sel = np.nonzero(ok)[0]
            if sel.size == 0:
                continue
            # emit device launches
            if kind == "celt":
                self._emit_celt_fast(g, sel, pend)
            elif kind == "silk":
                if self.rfc_plc:
                    self._rfc_silk_post(g, sel)
                self._emit_silk_fast(g, sel, pend)
            elif kind == "hybrid":
                if self.rfc_plc:
                    self._rfc_silk_post(g, sel)
                self._emit_silk_fast(g, sel, pend)
                self._emit_celt_fast(entry[2], sel, pend)
                pend["hybrid"].update(g.idxs[r] for r in sel)
            elif kind == "silk2":
                self._emit_silk2_fast(g, sel, pend)
            elif kind == "hybrid2":
                self._emit_silk2_fast(g, sel, pend)
                self._emit_celt_fast(entry[2], sel, pend)
                pend["hybrid"].update(g.idxs[r] for r in sel)
            # bookkeeping (vectorized over the decoded rows)
            self._stats["bytes_in"] += int(
                g.table.pkt_bytes[sel, pos[sel]].sum())
            skind = {"celt": "celt", "silk": "silk", "silk2": "silk",
                     "hybrid": "hybrid", "hybrid2": "hybrid"}[kind]
            self._stats[f"frames_{skind}"] += int(sel.size)
            isel = idxs[sel].tolist()
            if kind == "silk":
                rngs = g.ec[sel, 6] if g.nfr == 1 \
                    else g.buf.misc[sel, -1, 6]
                self._last_rng.update(zip(
                    isel,
                    (rngs.astype(np.int64) & 0xFFFFFFFF).tolist()))
            elif kind == "silk2":
                self._last_rng.update(zip(
                    isel,
                    (g.ec[sel, 6].astype(np.int64)
                     & 0xFFFFFFFF).tolist()))
            disc = g.table.disc[sel, pos[sel]]
            trim = g.table.trim[sel, pos[sel]]
            self.positions[idxs[sel]] = pos[sel] + 1
            pend["meta"].update(
                zip(isel, zip(disc.tolist(), trim.tolist())))
            handled.update(isel)
            n_fast += int(sel.size)
        return n_fast

    def _emit_celt_fast(self, g, sel, pend):
        """Assemble one device bucket from a CeltGroup's contiguous
        outputs with vectorized gathers (transient is per-row data)."""
        params = g.params
        N, C = g.spf, g.C
        LM = self._LM_OF_SPF[N]
        sidx = [g.idxs[r] for r in sel]
        X = g.X[sel].reshape(-1, C, N)                 # int16, device upcasts
        bandE = g.bandE[sel].reshape(-1, 2, NB_EBANDS)
        dev = self._celt_launch(
            sidx, X, bandE, g.start[sel].copy(), params[sel, 15].copy(),
            params[sel, 3:9].T.copy(), params[sel, 9:15].T.copy(), LM, C,
            params[sel, 1].astype(bool))
        pend["celt"].append((dev, sidx))

    def _emit_silk_fast(self, g, sel, pend):
        sidx = [g.idxs[r] for r in sel]
        frame_ms = g.payload_ms if g.payload_ms <= 20 else 20
        for j in range(g.nfr):
            cols = g.buf.cols(j, g.nfr, g.frame_len)
            cols = {k: v[sel] for k, v in cols.items()}
            glue = self._glue_arrays(sidx) \
                if self.rfc_plc and j == 0 else None
            dev = self._silk_launch(sidx, cols, g.fs, frame_ms,
                                    glue=glue, nfr_label=g.nfr)
            pend["silk"].append((dev, sidx))

    def _rfc_silk_post(self, g, sel):
        """rfc_plc bookkeeping over a SilkGroup's freshly decoded rows:
        the post-loss output transitions (LPC bandwidth expansion,
        voiced->unvoiced PLC handoff — apply_plc_transition writes
        straight into the group buffers) and the concealment-state
        mirror (NativePlcTracker.good_frame), exactly what the generic
        per-stream path does in _host_one."""
        import ctypes
        from ..host.native import PlcTrackerState, load, _bind_silk
        b = g.buf
        fs = g.fs
        frame_ms = g.payload_ms if g.payload_ms <= 20 else 20
        trks = [self._plc_tracker(int(g.idxs[r]), fs, frame_ms)
                for r in sel]
        n = len(trks)
        lib = load()
        _bind_silk(lib)
        arr = (ctypes.POINTER(PlcTrackerState) * n)(
            *[ctypes.pointer(t.c) for t in trks])
        rows = np.ascontiguousarray(sel, dtype=np.int32)
        I32P = ctypes.POINTER(ctypes.c_int32)

        def ptr(a):
            return a.ctypes.data_as(I32P)

        # ONE native call walks every decoded row: post-loss transition
        # (mutating the group buffers in place) + tracker ingest
        lib.plc_trk_good_batch_c(
            arr, ptr(rows), n, ptr(b.A), ptr(b.B), ptr(b.gains),
            ptr(b.inv), ptr(b.lag), ptr(b.flags), ptr(b.exc),
            ptr(b.misc), b.exc.shape[1])

    def _emit_silk2_fast(self, g, sel, pend):
        sidx = [g.idxs[r] for r in sel]
        mid = {k: v[sel] for k, v in g.mid.cols().items()}
        side = {k: v[sel] for k, v in g.side.cols().items()}
        info = g.info[sel]
        dev = self._silk2_launch(sidx, mid, side,
                                 info[:, 0].astype(bool),
                                 info[:, 1].astype(bool),
                                 info[:, 3:5].astype(np.int32), g.fs,
                                 nb=g.frame_ms // 5)
        pend["silk2"].append((dev, sidx))

    # ------------------------------------------------------------------
    def _silk2_bucket(self, fs: int) -> dict:
        """Device state for batched STEREO silk streams: per-channel core
        + resampler state, plus the stereo unmix state (pred pair and the
        2-sample mid/side histories)."""
        if fs not in self.silk2_buckets:
            B = self.n
            frame = 20 * fs
            ltp = 20 * fs
            self.silk2_buckets[fs] = dict(
                outBuf=jnp.zeros((B, 2, ltp + frame), dtype=I32),
                sLPC=jnp.zeros((B, 2, MAX_LPC_ORDER), dtype=I32),
                cng=jnp.zeros((B, 2, MAX_LPC_ORDER), dtype=I32),
                conc_e=jnp.zeros((B, 2), dtype=I32),
                conc_s=jnp.zeros((B, 2), dtype=I32),
                sIIR=jnp.zeros((B, 2, 6), dtype=I32),
                sFIR=jnp.zeros((B, 2, sjc.sfir_width(fs, self._out_khz)),
                               dtype=I32),
                delay=jnp.zeros((B, 2, fs), dtype=I32),
                pred_prev=jnp.zeros((B, 2), dtype=I32),
                sMid=jnp.zeros((B, 2), dtype=I32),
                sSide=jnp.zeros((B, 2), dtype=I32),
            )
        return self.silk2_buckets[fs]

    @staticmethod
    def _dummy_silk_params(fs: int, frame_ms: int = 20,
                           ncol: int = 4) -> dict:
        """Harmless core inputs for masked (no-side) rows — outputs and
        state of these rows are discarded. ncol = per-subframe column
        width of the group's real params (the native engine always
        emits 4-wide buffers; the python symbol walk emits nb-wide),
        so dummy rows stack against either; exc follows frame_ms."""
        nb = ncol
        return dict(
            A=np.zeros((2, MAX_LPC_ORDER), dtype=np.int32),
            B=np.zeros((nb, 5), dtype=np.int32),
            gains=np.full(nb, 1 << 16, dtype=np.int32),
            inv=np.full(nb, 1 << 15, dtype=np.int32),
            lag=np.full(nb, 2 * fs, dtype=np.int32),
            voiced=np.zeros(nb, dtype=bool),
            rewhiten=np.zeros(nb, dtype=bool),
            match=np.ones(nb, dtype=bool),
            adj=np.full(nb, 1 << 16, dtype=np.int32),
            exc=np.zeros(frame_ms * fs, dtype=np.int32),
        )

    def _silk_bucket(self, fs: int) -> dict:
        if fs not in self.silk_buckets:
            B = self.n
            frame = 20 * fs
            ltp = 20 * fs
            self.silk_buckets[fs] = dict(
                outBuf=jnp.zeros((B, ltp + frame), dtype=I32),
                sLPC=jnp.zeros((B, MAX_LPC_ORDER), dtype=I32),
                cng=jnp.zeros((B, MAX_LPC_ORDER), dtype=I32),
                conc_e=jnp.zeros(B, dtype=I32),
                conc_s=jnp.zeros(B, dtype=I32),
                sIIR=jnp.zeros((B, 6), dtype=I32),
                sFIR=jnp.zeros((B, sjc.sfir_width(fs, self._out_khz)),
                               dtype=I32),
                delay=jnp.zeros((B, fs), dtype=I32),
                sMid=jnp.zeros((B, 2), dtype=I32),
            )
        return self.silk_buckets[fs]

    def _silk2_host(self, i: int):
        if i not in self._silk2_hosts:
            from ..host.native import NativeSilkStereoHost
            self._silk2_hosts[i] = NativeSilkStereoHost()
        return self._silk2_hosts[i]

    def _plc_tracker(self, i: int, fs: int, frame_ms: int = 20):
        if i not in self._plc_trk:
            from .batch_silk import NativePlcTracker
            self._plc_trk[i] = NativePlcTracker(fs, frame_ms)
        return self._plc_trk[i]

    def _plc_tracker2(self, i: int, ch: int, fs: int,
                      frame_ms: int = 20):
        key = (i, ch)
        if key not in self._plc_trk2:
            from .batch_silk import NativePlcTracker
            self._plc_trk2[key] = NativePlcTracker(fs, frame_ms)
        return self._plc_trk2[key]

    def _track_stereo_good(self, i: int, sp, fs: int,
                           frame_ms: int = 20):
        """rfc_plc stereo bookkeeping on a good frame: remember the
        stereo predictors (a later loss reuses them, silk_Decode's
        lost branch keeps sStereo.pred), apply the post-loss transitions
        to the native outputs, and feed the per-channel concealment
        trackers (python pools keep this state inside the SilkDecoder
        channel states)."""
        from .batch_silk import apply_plc_transition
        self._last_pred[i] = np.asarray(sp["pred"], dtype=np.int32)
        if not self.native:
            return
        if sp["side_reset"] and (i, 1) in self._plc_trk2:
            # side re-entry partial reset (silk_Decode :378): ONLY the
            # channel-state half (lagPrev/LastGainIndex/prevSignalType/
            # first_frame_after_reset; outBuf+sLPC zero on device) — the
            # PLC/CNG structs keep their smoothed history
            trk = self._plc_trk2[(i, 1)]
            trk.lagPrev = 100
            trk.LastGainIndex = 10
            trk.prevSignalType = 0
            trk.first_frame_after_reset = 1
        host = self._silk2_host(i)
        for ch, key in ((0, "mid"), (1, "side")):
            pch = sp[key]
            if pch is None:
                continue
            trk = self._plc_tracker2(i, ch, fs, frame_ms)
            apply_plc_transition(pch, trk)
            trk.good_frame(pch, host.st[ch])

    def _ms_decoder(self, i: int, link: int):
        """Per-stream OpusMSDecoder for family-1 surround rows, recreated
        at chain-link boundaries (op_make_decode_ready, opusfile.cpp:671).
        """
        if i not in self._ms_decs or link != self._scalar_link[i]:
            from .ms_decoder import OpusMSDecoder
            heads = self.streams[i].link_heads or [self.streams[i].head]
            head = heads[min(link, len(heads) - 1)]
            self._ms_decs[i] = OpusMSDecoder(
                head.channel_count, head.stream_count, head.coupled_count,
                head.mapping, compat_ref=self.compat_ref)
            self._scalar_link[i] = link
        return self._ms_decs[i]

    def _host_one(self, i: int, lost: bool = False, use_fec: bool = False):
        s = self.streams[i]
        if self.path[i][0] in ("msb", "sub"):
            # batched-multistream parent / kind-lifted row: its packets
            # were consumed by the sub-pool fan-out in step()
            return None
        if self.positions[i] >= len(s.jobs):
            return None
        job = s.jobs[self.positions[i]]
        self.positions[i] += 1
        kind = self.path[i][0]
        if kind == "ms":
            dec = self._ms_decoder(i, job.link)
            pcm = dec.decode(None if lost else job.data)
            return ("scalar", i, pcm, job)
        if lost:
            return self._host_one_lost(i, kind, job, use_fec)
        if kind == "celt":
            parsed = parse_packet(job.data)
            spf = self.path[i][1]
            host = self.celt_hosts[i]
            host.end = self.path[i][2]
            if self.native:
                si = host.decode_symbol_phase(parsed.frames[0], spf)
            else:
                from ..host.range_decoder import RangeDecoder
                si = host.decode_with_ec(RangeDecoder(parsed.frames[0]),
                                         None, spf, defer_synthesis=True)
            return ("celt", i, si, job)
        if kind == "silk":
            # each parsed frame is its own SILK payload (code-3 packets
            # carry several); a 40/60 ms payload holds 2/3 internal
            # frames — every one becomes a device frame
            parsed = parse_packet(job.data)
            fs, payload_ms = self.path[i][1], self.path[i][3]
            frame_ms = self.path[i][4]
            plist = []
            for fr in parsed.frames:
                if self.silk_hosts is not None:
                    sub = self.silk_hosts[i].packet(fr, fs, payload_ms)
                    if self.rfc_plc:
                        from .batch_silk import apply_plc_transition
                        trk = self._plc_tracker(i, fs, frame_ms)
                        for p in sub:
                            apply_plc_transition(p, trk)
                            trk.good_frame(p, self.silk_hosts[i].st)
                    plist += sub
                else:
                    from ..host.range_decoder import RangeDecoder
                    from .batch_silk import silk_host_packet
                    silk = self.scalar[i]._get_silk()
                    silk.set_raw_params(1, 1, payload_ms, fs * 1000, 48000)
                    plist += silk_host_packet(silk, RangeDecoder(fr),
                                              fs, payload_ms)
            return ("silk", i, (fs, frame_ms, plist), job)
        if kind == "silk2":
            # stereo SILK symbol phase (native C engine or SilkDecoder-
            # backed python), device MS->LR unmix; 40/60 ms payloads and
            # code-3 multi-frame packets emit one param dict per 20 ms
            # internal frame (nfr sequential launches of the SAME
            # compiled device core, silk_Decode :1481 frame loop)
            parsed = parse_packet(job.data)
            fs, pms = self.path[i][1], self.path[i][3]
            frame_ms = self.path[i][4]
            if self.native:
                host = self._silk2_host(i)
                if self.path[i][2] == 1:
                    sps = [host.packet(parsed.frames[0], fs,
                                       payload_ms=frame_ms)]
                else:
                    sps = []
                    for fr in parsed.frames:
                        sps += host.packet_multi(fr, fs, pms)
            else:
                from ..host.range_decoder import RangeDecoder
                from .batch_silk import silk_host_stereo_packet
                silk = self.scalar[i]._get_silk()
                silk.set_raw_params(2, 2, frame_ms, fs * 1000, 48000)
                sps = [silk_host_stereo_packet(
                    silk, RangeDecoder(parsed.frames[0]), fs, frame_ms)]
            if self.rfc_plc:
                for sp in sps:
                    self._track_stereo_good(i, sp, fs,
                                            frame_ms=frame_ms)
            return ("silk2", i, (fs, frame_ms, sps), job)
        if kind == "hybrid2":
            # stereo hybrid (BASELINE config 3): stereo SILK symbol
            # phase, then the CELT engine resumes the same coder state
            parsed = parse_packet(job.data)
            frame = parsed.frames[0]
            frame_ms = self.path[i][2]
            N = frame_ms * 48
            host = self.celt_hosts[i]
            host.start = 17
            host.end = self.path[i][1]
            if self.native:
                sp = self._silk2_host(i).packet(frame, 16, hybrid=True,
                                                payload_ms=frame_ms)
                csi = host.decode_symbol_phase(
                    frame, N, ec_state=sp["ec_state"])
            else:
                from ..host.range_decoder import RangeDecoder
                from .batch_silk import silk_host_stereo_packet
                silk = self.scalar[i]._get_silk()
                silk.set_raw_params(2, 2, frame_ms, 16000, 48000)
                dec = RangeDecoder(frame)
                sp = silk_host_stereo_packet(silk, dec, 16, frame_ms)
                if dec.tell() + 37 <= 8 * len(frame):
                    dec.dec_bit_logp(12)  # redundancy flag
                csi = host.decode_with_ec(dec, None, N,
                                          defer_synthesis=True)
            if self.rfc_plc:
                self._track_stereo_good(i, sp, 16, frame_ms=frame_ms)
            return ("hybrid2", i, (sp, csi), job)
        if kind == "hybrid":
            # shared range coder: SILK symbols first, then the CELT engine
            # resumes the same coder state (start band 17)
            parsed = parse_packet(job.data)
            frame = parsed.frames[0]
            frame_ms = self.path[i][2]
            N = frame_ms * 48
            host = self.celt_hosts[i]
            host.start = 17
            host.end = self.path[i][1]
            if self.silk_hosts is not None:
                sp = self.silk_hosts[i].frame(frame, 16, frame_ms,
                                              hybrid=True)
                if self.rfc_plc:
                    from .batch_silk import apply_plc_transition
                    trk = self._plc_tracker(i, 16, frame_ms)
                    apply_plc_transition(sp, trk)
                    trk.good_frame(sp, self.silk_hosts[i].st)
                csi = host.decode_symbol_phase(frame, N,
                                               ec_state=sp["ec_state"])
            else:
                # python path: the live RangeDecoder carries straight
                # from the SILK symbol walk into the CELT one
                from ..host.range_decoder import RangeDecoder
                silk = self.scalar[i]._get_silk()
                silk.set_raw_params(1, 1, frame_ms, 16000, 48000)
                dec = RangeDecoder(frame)
                sp = silk_host_frame(silk, dec, 16, frame_ms)
                if dec.tell() + 37 <= 8 * len(frame):
                    dec.dec_bit_logp(12)  # redundancy flag
                if self.native:
                    # python silk host (rfc_plc) + native CELT engine:
                    # hand over the live coder state
                    csi = host.decode_symbol_phase(
                        frame, N, ec_state=dec.export_state())
                else:
                    csi = host.decode_with_ec(dec, None, N,
                                              defer_synthesis=True)
            return ("hybrid", i, (sp, csi), job)
        if job.link != self._scalar_link[i]:
            # chain boundary: fresh decoder for the new link
            from .opus_decoder import OpusDecoder
            self.scalar[i] = OpusDecoder(self.channels,
                                         fs=self._out_khz * 1000,
                                         compat_ref=self.compat_ref)
            self._scalar_link[i] = job.link
        pcm = self.scalar[i].decode(job.data)
        return ("scalar", i, pcm, job)

    def _host_one_lost(self, i: int, kind: str, job, use_fec: bool = False):
        """Packet i was lost in transit. compat semantics per path
        (mirrors OpusDecoder._decode_plc, src/opus_decoder.cpp:294):
        SILK decodes the normal frame path over an EMPTY bitstream;
        CELT loss is silence with decoder state untouched; hybrid loss
        advances the SILK state over the empty bitstream, then the CELT
        stage errors (reference storage check, src/celt.cpp:2226) — the
        pool substitutes silence for the error return.

        use_fec: reconstruct the lost frame from the NEXT packet's in-band
        SILK LBRR instead (silk_Decode lostFlag=2) when it carries one —
        same state evolution as a scalar decode_fec + decode sequence."""
        if use_fec and kind in ("silk", "hybrid") \
                and (kind == "hybrid" or self.path[i][2] == 1) \
                and self.positions[i] < len(self.streams[i].jobs):
            # single-device-frame payloads only (10 or 20 ms — a 10 ms
            # packet carries ONE LBRR flag + one nb_subfr=2 LBRR copy,
            # silk.cpp:1565 with nFramesPerPacket=1); lost 40/60 ms
            # packets would need per-internal-frame LBRR reassembly
            fs = self.path[i][1] if kind == "silk" else 16
            frame_ms = self.path[i][4] if kind == "silk" \
                else self.path[i][2]
            nxt = parse_packet(
                self.streams[i].jobs[self.positions[i]].data).frames[0]
            if self.silk_hosts is not None:
                params = self.silk_hosts[i].fec_frame(nxt, fs, frame_ms)
                if params is not None and self.rfc_plc:
                    from .batch_silk import apply_plc_transition
                    trk = self._plc_tracker(i, fs, frame_ms)
                    apply_plc_transition(params, trk)
                    trk.good_frame(params, self.silk_hosts[i].st)
            else:
                from ..host.range_decoder import RangeDecoder
                from .batch_silk import silk_host_frame_fec
                silk = self.scalar[i]._get_silk()
                silk.set_raw_params(1, 1, frame_ms, fs * 1000, 48000)
                params = silk_host_frame_fec(silk, RangeDecoder(nxt),
                                             fs, frame_ms)
            if params is not None:
                # FEC output is SILK-only for hybrid too (the redundant
                # frame carries no CELT layer) — not muted, not mixed
                return ("silk_fec", i, (fs, frame_ms, [params]), job)
            # no usable LBRR: fall through to the loss path
        if use_fec and kind in ("silk2", "hybrid2") and self.native \
                and (kind == "hybrid2" or self.path[i][2] == 1) \
                and self.positions[i] < len(self.streams[i].jobs):
            # stereo in-band FEC: per-channel LBRR copies from the NEXT
            # packet (silk_Decode lostFlag=2 with nChannelsInternal=2,
            # src/silk.cpp:1565-1616); packets without usable stereo
            # LBRR (or needing a mixed LBRR+conceal frame) fall through
            # to concealment
            fs = self.path[i][1] if kind == "silk2" else 16
            frame_ms = self.path[i][4] if kind == "silk2" \
                else self.path[i][2]
            nxt = parse_packet(
                self.streams[i].jobs[self.positions[i]].data).frames[0]
            sp = self._silk2_host(i).fec_packet(nxt, fs,
                                                payload_ms=frame_ms)
            if sp is not None:
                if self.rfc_plc:
                    self._track_stereo_good(i, sp, fs,
                                            frame_ms=frame_ms)
                return ("silk2_fec", i, (fs, frame_ms, [sp]), job)
        if not self.compat_ref and kind != "scalar":
            # RFC loss: with rfc_plc, EVERY batched kind conceals —
            # including CELT, whose PLC the reference deleted (libopus
            # celt_decode_lost semantics restored: the pitch-repeat
            # branch as a device kernel, ops/celt/jax_plc.py; the
            # noise branch — long bursts, post-recovery skip_plc, and
            # the hybrid high band — as host-fabricated staging through
            # the NORMAL decode bucket, _celt_noise_si); without
            # rfc_plc CELT loss stays silence with state untouched
            if kind == "celt":
                if self.rfc_plc:
                    cnt = self._plc_loss_cnt.get(i, 0)
                    spf = self.path[i][1]
                    if cnt >= 5 or i in self._plc_skip or spf != 960:
                        si = self._celt_noise_si(
                            i, 0, self.path[i][2], spf,
                            self._LM_OF_SPF[spf])
                        self._plc_loss_cnt[i] = cnt + 1
                        return ("celt_noise", i, si, job)
                    self._plc_loss_cnt[i] = cnt + 1
                    return ("celt_plc", i, None, job)
                return ("celt_lost", i, None, job)
            if self.rfc_plc and kind in ("hybrid", "silk"):
                # one conceal per internal frame; a lost 40/60 ms packet
                # conceals 2/3 frames with deepening lossCnt, exactly
                # like the scalar while-loop in _decode_plc; 10 ms
                # streams conceal one nb_subfr=2 frame
                fs = self.path[i][1] if kind == "silk" else 16
                dfp = self.path[i][2] if kind == "silk" else 1
                frame_ms = self.path[i][4] if kind == "silk" \
                    else self.path[i][2]
                from .batch_silk import silk_plc_host_params
                preps = []
                for _ in range(dfp):
                    if self.silk_hosts is not None:
                        trk = self._plc_tracker(i, fs, frame_ms)
                        preps.append(silk_plc_host_params(trk, fs))
                    else:
                        silk = self.scalar[i]._get_silk()
                        silk.set_raw_params(1, 1, frame_ms * dfp,
                                            fs * 1000, 48000)
                        preps.append(silk_plc_host_params(silk, fs))
                if self.silk_hosts is not None:
                    # silk_Decode on loss (:455) in the native struct too
                    self.silk_hosts[i].st.LastGainIndex = 10
                if kind == "hybrid":
                    # hybrid loss also conceals the CELT high band:
                    # libopus celt_decode_lost with start=17 takes the
                    # NOISE branch (start != 0), summed SAT16 with the
                    # SILK conceal like a decoded hybrid frame
                    # (src/opus_decoder.cpp:272 mix anchor)
                    cnt = self._plc_loss_cnt.get(i, 0)
                    N = frame_ms * 48
                    csi = self._celt_noise_si(i, 17, self.path[i][1], N,
                                              self._LM_OF_SPF[N])
                    self._plc_loss_cnt[i] = cnt + 1
                    return ("hyb_plc", i,
                            ((fs, frame_ms, preps), csi), job)
                return ("silk_plc", i, (fs, frame_ms, preps), job)
            if self.rfc_plc and kind in ("silk2", "hybrid2"):
                # stereo loss: conceal mid always, side only when the
                # previous frame had one (has_side = !prev_decode_only_
                # middle, silk_Decode :390); MS->LR keeps the previous
                # predictors; all internal channels un-clamp their gain
                from .batch_silk import silk_plc_host_params
                fs = self.path[i][1] if kind == "silk2" else 16
                dfp = self.path[i][2] if kind == "silk2" else 1
                frame_ms = self.path[i][4] if kind == "silk2" \
                    else self.path[i][2]
                preps = []
                if self.native:
                    host = self._silk2_host(i)
                    prev_dom = host.prev_dom
                    for _ in range(dfp):
                        m_prep = silk_plc_host_params(
                            self._plc_tracker2(i, 0, fs, frame_ms), fs)
                        s_prep = None if prev_dom else \
                            silk_plc_host_params(
                                self._plc_tracker2(i, 1, fs, frame_ms),
                                fs)
                        preps.append((m_prep, s_prep))
                    for st_ in host.st:
                        st_.LastGainIndex = 10
                else:
                    silk = self.scalar[i]._get_silk()
                    silk.set_raw_params(2, 2, frame_ms, fs * 1000,
                                        48000)
                    prev_dom = silk.prev_decode_only_middle
                    for _ in range(dfp):
                        m_prep = silk_plc_host_params(silk, fs, 0)
                        s_prep = None if prev_dom else \
                            silk_plc_host_params(silk, fs, 1)
                        preps.append((m_prep, s_prep))
                    for ch in range(2):
                        silk.channel_states[ch].LastGainIndex = 10
                pred = self._last_pred.get(
                    i, np.zeros(2, dtype=np.int32))
                if kind == "hybrid2":
                    # stereo hybrid loss: CELT high-band noise conceal
                    # (start=17) summed with the stereo SILK conceal
                    cnt = self._plc_loss_cnt.get(i, 0)
                    N = frame_ms * 48
                    csi = self._celt_noise_si(i, 17, self.path[i][1], N,
                                              self._LM_OF_SPF[N])
                    self._plc_loss_cnt[i] = cnt + 1
                    return ("hyb2_plc", i,
                            ((fs, frame_ms, preps, pred), csi), job)
                return ("silk2_plc", i, (fs, frame_ms, preps, pred),
                        job)
            raise NotImplementedError(
                "RFC-mode batched loss needs rfc_plc=True; with it every "
                "batched kind (mono 10/20/40/60 ms SILK/hybrid, stereo "
                "SILK/hybrid, CELT) conceals on the batched path")
        if kind == "celt":
            return ("celt_lost", i, None, job)
        if kind == "silk":
            # a lost packet decodes as ONE empty 20 ms frame regardless of
            # the stream's packet duration (the reference hard-codes
            # audiosize 960 in the NULL path, src/opus_decoder.cpp:161)
            fs = self.path[i][1]
            if self.silk_hosts is not None:
                params = self.silk_hosts[i].frame(b"", fs)
            else:
                from ..host.range_decoder import RangeDecoder
                silk = self.scalar[i]._get_silk()
                silk.set_raw_params(1, 1, 20, fs * 1000, 48000)
                params = silk_host_frame(silk, RangeDecoder(b""), fs, 20)
            return ("silk", i, (fs, 20, [params]), job)
        if kind in ("silk2", "hybrid2"):
            # stereo loss: the normal stereo frame path over an empty
            # bitstream, exactly like the scalar compat path (hybrid2
            # additionally mutes — its CELT stage errors)
            fs = self.path[i][1] if kind == "silk2" else 16
            if self.native:
                sp = self._silk2_host(i).packet(b"", fs)
            else:
                from ..host.range_decoder import RangeDecoder
                from .batch_silk import silk_host_stereo_packet
                silk = self.scalar[i]._get_silk()
                silk.set_raw_params(2, 2, 20, fs * 1000, 48000)
                sp = silk_host_stereo_packet(silk, RangeDecoder(b""), fs)
            if kind == "silk2":
                # compat mode keeps silk2 at 20 ms/packet, so loss is
                # always a single empty-bitstream frame
                return ("silk2", i, (fs, 20, [sp]), job)
            return ("silk2_mute", i, (16, 20, sp), job)
        if kind == "hybrid":
            if self.silk_hosts is not None:
                sp = self.silk_hosts[i].frame(b"", 16, hybrid=True)
            else:
                from ..host.range_decoder import RangeDecoder
                silk = self.scalar[i]._get_silk()
                silk.set_raw_params(1, 1, 20, 16000, 48000)
                sp = silk_host_frame(silk, RangeDecoder(b""), 16, 20)
            return ("silk_mute", i, (16, [sp]), job)
        try:
            pcm = self.scalar[i].decode(None)
        except ValueError:
            pcm = np.zeros((960, self.channels), dtype=np.int16)
        return ("scalar", i, pcm, job)

    def step(self, lost=None, fec=None) -> bool:
        """Decode one frame on every active stream. Returns False when all
        streams are exhausted. lost: optional set of stream indices whose
        next packet was lost in transit (BASELINE config 5 — the packet is
        consumed from the source but concealed, not decoded). fec: subset
        of lost for which the NEXT packet's in-band SILK LBRR should
        reconstruct the lost frame when present.

        Pipelined: device launches from this step are materialized at the
        end of the NEXT step, so step t+1's host symbol phase overlaps
        step t's device execution. drain()/run()/save_checkpoint flush."""
        _t0 = time.perf_counter()
        self._step_seq += 1
        lost = set(lost or ())
        fec = set(fec or ())
        sub_work = False
        if self._ms_subs:
            # fan the step out to the elementary-stream sub-pools: a
            # lost composite packet loses EVERY elementary packet in it
            # (the reference conceals every sub-decoder,
            # src/opus_decoder.cpp:858-868); FEC likewise per stream
            sub_lost = {k: set() for k in self._ms_subs}
            sub_fec = {k: set() for k in self._ms_subs}
            for i, refs in self._ms_parents.items():
                if self.positions[i] < len(self.streams[i].jobs):
                    self.positions[i] += 1
                for key, row in refs:
                    if i in lost:
                        sub_lost[key].add(row)
                    if i in fec:
                        sub_fec[key].add(row)
            for key, sp in self._ms_subs.items():
                sub_work = sp.step(sub_lost[key], sub_fec[key]) \
                    or sub_work
        if self._kind_subs:
            # heterogeneous pool: each kind's streams decode in their
            # uniform sub-pool (each with its own K-frame superstep);
            # the parent mirrors their packet cursors so run()/farm
            # loss schedules keep reading parent.positions
            klost = {k: set() for k in self._kind_subs}
            kfec = {k: set() for k in self._kind_subs}
            for g in lost:
                ref = self._kind_ref.get(g)
                if ref is not None:
                    klost[ref[0]].add(ref[1])
            for g in fec:
                ref = self._kind_ref.get(g)
                if ref is not None:
                    kfec[ref[0]].add(ref[1])
            for key, sp in self._kind_subs.items():
                sub_work = sp.step(klost[key], kfec[key]) or sub_work
                self.positions[self._kind_idx[key]] = sp.positions
        pend = dict(celt=[], silk=[], silk2=[], mute=set(), hybrid=set(),
                    meta={}, direct=[], mix=[])
        handled: set = set()
        n_fast = self._fast_step(lost, pend, handled) if self._groups \
            else 0
        if len(handled) == self.n:
            rest = []
        else:
            rmask = np.ones(self.n, dtype=bool)
            if handled:
                rmask[list(handled)] = False
            for idxs in self._kind_idx.values():
                rmask[idxs] = False      # lifted rows: sub-pools decode
            rest = np.nonzero(rmask)[0].tolist()
        if self._pool is not None:
            results = list(self._pool.map(
                lambda i: self._host_one(i, i in lost, i in fec), rest))
        else:
            results = [self._host_one(i, i in lost, i in fec)
                       for i in rest]
        results = [r for r in results if r is not None]
        _t1 = time.perf_counter()
        self._phase_s["host_symbol"] += _t1 - _t0
        if not results and n_fast == 0:
            self._flush()
            return sub_work
        self._stats["steps"] += 1
        self._stats["frames"] += len(results) + n_fast
        _kind_of = {"celt_lost": "celt", "celt_plc": "celt",
                    "celt_noise": "celt", "silk_mute": "hybrid",
                    "silk2": "silk", "silk2_mute": "hybrid",
                    "hybrid2": "hybrid", "silk_plc": "silk",
                    "silk2_plc": "silk", "hyb_plc": "hybrid",
                    "hyb2_plc": "hybrid"}
        for kind, i, _p, job in results:
            if i in lost:
                self._stats["frames_lost"] += 1
            else:
                self._stats["bytes_in"] += len(job.data)
            if kind in ("silk_fec", "silk2_fec"):
                self._stats["frames_fec"] += 1
                base = {"silk2": "silk", "hybrid2": "hybrid"}.get(
                    self.path[i][0], self.path[i][0])
                self._stats[f"frames_{base}"] += 1
            else:
                self._stats[f"frames_{_kind_of.get(kind, kind)}"] += 1

        if self.rfc_plc and self._plc_loss_cnt:
            # celt_decode_with_ec entry semantics per good decode:
            # skip_plc = (loss_count != 0), then loss_count = 0; skip
            # clears at the SECOND consecutive good frame. Only rows
            # that have concealed since their last good decode (dict
            # members) need the update.
            good = handled.union(
                i for kind, i, _p, _job in results
                if kind in ("celt", "hybrid", "hybrid2"))
            for i in list(self._plc_loss_cnt):
                if i in lost or i not in good:
                    continue
                if self._plc_loss_cnt[i]:
                    self._plc_skip.add(i)
                    self._plc_loss_cnt[i] = 0
                else:
                    self._plc_skip.discard(i)
                    del self._plc_loss_cnt[i]

        celt_groups: dict[tuple, list] = {}
        silk_groups: dict[tuple, list] = {}
        silk2_groups: dict[int, list] = {}
        plc_groups: dict[int, list] = {}
        plc2_groups: dict[int, list] = {}
        plcc_rows: list = []            # lost CELT rows to conceal
        for kind, i, payload, job in results:
            pend["meta"][i] = (job.discard_front, job.trim_end)
            if kind == "scalar":
                pend["direct"].append((i, payload))
            elif kind == "celt_lost":
                # CELT loss: silence, state untouched (mirrors the scalar
                # compat path — _decode_plc skips CELT entirely)
                z = np.zeros((960 // self.downsample, self.channels),
                             dtype=np.int16)
                pend["direct"].append((i, z))
            elif kind == "celt_plc":
                # rfc_plc: real pitch-repeat concealment on device
                plcc_rows.append(i)
            elif kind == "celt_noise":
                # noise-branch conceal: host-fabricated staging through
                # the normal decode bucket (rides superstep windows too)
                key = (payload["LM"], payload["C"], self.channels)
                celt_groups.setdefault(key, []).append((i, payload))
            elif kind == "hyb_plc":
                # hybrid loss: SILK conceal + CELT high-band noise
                # conceal, SAT16-mixed at routing like a decoded frame
                (fs, frame_ms, preps), csi = payload
                pend["hybrid"].add(i)
                plc_groups.setdefault((fs, frame_ms, len(preps)),
                                      []).append((i, preps))
                key = (csi["LM"], csi["C"], self.channels)
                celt_groups.setdefault(key, []).append((i, csi))
            elif kind == "hyb2_plc":
                (fs, frame_ms, preps, pred), csi = payload
                pend["hybrid"].add(i)
                plc2_groups.setdefault((fs, len(preps), frame_ms),
                                       []).append((i, (preps, pred)))
                key = (csi["LM"], csi["C"], self.channels)
                celt_groups.setdefault(key, []).append((i, csi))
            elif kind == "silk_mute":
                # hybrid loss: SILK state advances over the empty
                # bitstream, output is silence (CELT stage errors)
                pend["mute"].add(i)
                fs, plist = payload
                silk_groups.setdefault((fs, 20, len(plist)), []).append(
                    (i, plist))
            elif kind in ("silk", "silk_fec"):
                fs, frame_ms, plist = payload
                if plist and plist[-1].get("rng") is not None:
                    self._last_rng[i] = plist[-1]["rng"]
                silk_groups.setdefault((fs, frame_ms, len(plist)),
                                       []).append((i, plist))
            elif kind == "silk_plc":
                fs, frame_ms, preps = payload
                plc_groups.setdefault((fs, frame_ms, len(preps)),
                                      []).append((i, preps))
            elif kind == "silk2_plc":
                fs, frame_ms, preps, pred = payload
                plc2_groups.setdefault((fs, len(preps), frame_ms),
                                       []).append((i, (preps, pred)))
            elif kind in ("silk2", "silk2_fec"):
                fs, frame_ms, sps = payload
                if kind == "silk2" and sps[-1].get("rng") is not None:
                    self._last_rng[i] = sps[-1]["rng"]
                silk2_groups.setdefault((fs, len(sps), frame_ms),
                                        []).append((i, sps))
            elif kind == "silk2_mute":
                pend["mute"].add(i)
                fs, frame_ms, sp = payload
                silk2_groups.setdefault((fs, 1, frame_ms),
                                        []).append((i, [sp]))
            elif kind == "hybrid2":
                sp, csi = payload
                pend["hybrid"].add(i)
                silk2_groups.setdefault((16, 1, self.path[i][2]),
                                        []).append((i, [sp]))
                key = (csi["LM"], csi["C"], self.channels)
                celt_groups.setdefault(key, []).append((i, csi))
            elif kind == "hybrid":
                sp, csi = payload
                pend["hybrid"].add(i)
                silk_groups.setdefault((16, self.path[i][2], 1),
                                       []).append((i, [sp]))
                key = (csi["LM"], csi["C"], self.channels)
                celt_groups.setdefault(key, []).append((i, csi))
            else:
                key = (payload["LM"], payload["C"], self.channels)
                celt_groups.setdefault(key, []).append((i, payload))
        for (LM, C, CC), items in celt_groups.items():
            self._celt_group(items, LM, C, CC, pend)
        for (fs, frame_ms, nfr), items in silk_groups.items():
            self._silk_group(items, fs, nfr, frame_ms, pend)
        for (fs, nfr, frame_ms), items in silk2_groups.items():
            self._silk2_group(items, fs, nfr, pend, frame_ms)
        if self._ss_silk1 and self.rfc_plc and plc_groups:
            # mono-SILK superstep pools: single-frame conceals join the
            # window as masked rows (no flush); multi-frame conceals
            # (lost 40/60 ms packets) keep the flush path below
            for k in [k for k in plc_groups if k[2] == 1]:
                fs_, frame_ms_, _one = k
                self._silk_plc_group_ss(plc_groups.pop(k), fs_,
                                        frame_ms_, pend)
        if self._ss_silk2 and self.rfc_plc and plc2_groups:
            # stereo pools likewise (single-frame stereo conceals)
            for k in [k for k in plc2_groups if k[1] == 1]:
                self._silk2_plc_group_ss(plc2_groups.pop(k), k[0], pend,
                                         frame_ms=k[2])
        if (self._ss_silk or self._ss_hyb or self._ss_hyb1) \
                and (plc_groups or plc2_groups):
            # conceal steps read/write the bucket state directly, so any
            # buffered superstep frames must execute first (partial
            # windows pad as no-ops; the state stays exact). The PLC
            # launch below runs on THIS thread, so join the dispatch
            # thread: its run() closures reassign silk_buckets[fs]
            # (donated-state chain) and must finish first.
            self._ss_flush()
            if self._dev_exec is not None:
                self._dev_exec.submit(lambda: None).result()
        if plcc_rows:
            if self._t_mode and self._ss_k > 1 \
                    and all(p[1] == 960 for p in self.path):
                # (uniform 20 ms pools only: a mixed-LM pool would put
                # the conceal frame in a different window than the
                # step's decode staging, breaking state order)
                # 20 ms transposed superstep pools: the conceal rides
                # the K-frame window as compact in-window rows
                # (_celt_pool_superstep_T_lossy) — no flush
                self._celt_plc_group_ss(plcc_rows, pend)
            else:
                # CELT conceal reads/writes decode_mem directly: flush
                # any buffered T-mode superstep window first (partial
                # windows pad as no-ops) and join the dispatch thread
                # whose closures reassign self.state
                if self._t_mode and self._ss_k > 1:
                    self._ss_flush()
                if self._dev_exec is not None:
                    self._dev_exec.submit(lambda: None).result()
                self._celt_plc_group(plcc_rows, pend)
        self._plc_prev_lost = set(plcc_rows)
        for (fs, frame_ms, nfr), items in plc_groups.items():
            self._silk_plc_group(items, fs, nfr, frame_ms, pend)
        for (fs, dfp, frame_ms), items in plc2_groups.items():
            self._silk2_plc_group(items, fs, dfp, pend, frame_ms)
        if self._ss_hyb or self._ss_hyb1:
            self._hyb_collect(pend)
        else:
            self._fuse_hybrid_mix(pend)
        # start the D2H copies NOW (async): they stream back in the
        # background while the next steps' host phases run, so the
        # materialize `depth` steps later finds the data already on host
        if self.output == "host":
            for key in ("celt", "silk", "silk2", "mix"):
                for dev, _sidx in pend[key]:
                    for part in (dev if isinstance(dev, tuple)
                                 else (dev,)):
                        try:
                            part.copy_to_host_async()
                        except AttributeError:
                            pass
        # pipeline: fetch the step from `depth` steps ago while the last
        # `depth` steps' kernels execute asynchronously in the background
        self._pending.append(pend)
        _t2 = time.perf_counter()
        self._phase_s["dispatch"] += _t2 - _t1
        while len(self._pending) > self.pipeline_depth:
            self._materialize(self._pending.pop(0))
        self._phase_s["materialize"] += time.perf_counter() - _t2
        return True

    def _hyb_collect(self, pend):
        """Hybrid-superstep collection point (end of step): a PURE
        uniform stereo-hybrid step (one deferred CELT staging + one
        deferred SILK staging covering exactly pend['hybrid'], no
        mutes) buffers into the K-frame window and retires as a device-
        mixed _SSFrame; any other step (loss/FEC/mixed) flushes the
        window first — state order — then dispatches its deferred
        stagings per-frame and keeps the generic mix."""
        stereo = self._ss_hyb
        skey = "silk2" if stereo else "silk"
        smark = "hdef_s" if stereo else "hdef_s1"
        cdef = [r for r, e in enumerate(pend["celt"])
                if isinstance(e[0], tuple) and e[0]
                and e[0][0] == "hdef_c"]
        sdef = [r for r, e in enumerate(pend[skey])
                if isinstance(e[0], tuple) and e[0]
                and e[0][0] == smark]
        hyb = pend["hybrid"]
        pure = (len(pend["celt"]) == 1 and len(cdef) == 1
                and len(pend[skey]) == 1 and len(sdef) == 1
                and not pend["silk2" if skey == "silk" else "silk"]
                and not pend["mute"] and hyb
                and set(pend["celt"][0][1]) == hyb
                and set(pend[skey][0][1]) == hyb)
        if not pure:
            for wkey in [k for k in self._ss_buf
                         if k[0] in ("hyb1", "hyb2")]:
                self._ss_dispatch(wkey)
            for r in cdef:
                (_m, stg, ok62, identity, LM, C), sidx = pend["celt"][r]
                chunk = 62 if ok62 else 13
                dev = self._celt_dispatch_packed(stg, LM, C, chunk,
                                                 identity)
                pend["celt"][r] = (dev, sidx)
            for r in sdef:
                e0, sidx = pend[skey][r]
                if stereo:
                    (_m, cols, fs, nb) = e0
                    dev = self._silk2_dispatch_frame(
                        cols, fs, has_glue=self.rfc_plc, nb=nb)
                else:
                    (_m, cols, fs, frame_ms) = e0
                    nb = 2 if frame_ms == 10 else 4
                    dev = self._silk_dispatch_frame(
                        cols, fs, nb, frame_ms * fs,
                        has_glue=self.rfc_plc)
                pend[skey][r] = (dev, sidx)
            self._fuse_hybrid_mix(pend)
            return
        (_mc, cstg, ok62, _ident, LM_, _C), csidx = pend["celt"][0]
        if stereo:
            (_ms, scols, _fs, _nb), ssidx = pend[skey][0]
            wkey = ("hyb2", LM_)   # 10 ms (LM 2) and 20 ms (LM 3)
        else:
            (_ms, scols, _fs, _fms), ssidx = pend[skey][0]
            wkey = ("hyb1", LM_)   # 10 ms (LM 2) and 20 ms (LM 3)
            # windows are distinct compiled programs
        pos = {i: r for r, i in enumerate(ssidx)}
        perm = np.zeros(cstg.shape[0], dtype=np.int32)
        perm[:len(csidx)] = [pos[i] for i in csidx]
        perm[len(csidx):] = perm[0]     # pad rows: output discarded
        if wkey not in self._ss_buf:
            self._ss_buf[wkey] = (_SSBatch(self), [])
        batch, stgs = self._ss_buf[wkey]
        h = batch.frame(len(stgs))
        stgs.append((cstg,) + scols + (perm, np.asarray(ok62)))
        pend["celt"] = []
        pend[skey] = []
        pend["hybrid"] = set()
        pend["mix"] = [(h, csidx)]
        if len(stgs) >= self._ss_k:
            self._ss_dispatch(wkey)

    def _ss_dispatch_hyb2(self, batch, stgs, LM: int = 3):
        """Run one buffered K-frame stereo-hybrid superstep as a single
        device program (_hybrid2_pool_superstep). LM 3 = 20 ms frames
        (nb_subfr 4), LM 2 = 10 ms (nb_subfr 2). Partial windows pad
        with inactive frames; the comb chunk compiles to 62 only when
        every frame in the window allows it (13 is always safe)."""
        K = self._ss_k
        n_real = len(stgs)
        act = np.zeros(K, dtype=bool)
        act[:n_real] = True
        ok62 = all(bool(s[-1]) for s in stgs)
        while len(stgs) < K:
            stgs = stgs + [tuple(np.zeros_like(a) for a in stgs[0])]
        chunk = 62 if ok62 and jax.default_backend() == "tpu" else 13
        nb = 4 if LM == 3 else 2
        bk = ("hyb2", LM, self._ss_k, stgs[0][0].shape[0])
        self._stats["buckets"][bk] = self._stats["buckets"].get(bk, 0) + 1

        def run():
            # column stacking (tens of MB of memcpy per window) runs on
            # the dispatch thread so it overlaps the next steps' host
            # symbol phases — it used to burn ~1.3 ms/frame of the main
            # thread's dispatch phase at B=256 stereo (BENCH_r05pre
            # hybrid_fb_stereo_ss8 postmortem)
            cols = [np.stack(parts) for parts in zip(*stgs)][:-1]
            mixedK, dm, pre, st2 = _hybrid2_pool_superstep(
                self.state["decode_mem"], self.state["preemph"],
                self._silk2_bucket(16),
                *jax.device_put(list(cols)),
                jax.device_put(act), LM=LM, C=2, CC=self.channels,
                chunk=chunk, fs=16, order=16, has_glue=self.rfc_plc,
                out_khz=self._out_khz, downsample=self.downsample,
                nb=nb)
            self.state["decode_mem"] = dm
            self.state["preemph"] = pre
            self.silk2_buckets[16] = st2
            if self.output == "host":
                try:
                    mixedK.copy_to_host_async()
                except AttributeError:
                    pass
            return mixedK

        batch.fut = self._dev_exec.submit(run) \
            if self._dev_exec is not None else run()

    def _ss_dispatch_hyb1(self, batch, stgs, LM: int = 3):
        """Run one buffered K-frame MONO-hybrid superstep as a single
        device program (_hybrid1_pool_superstep). LM 3 = 20 ms frames
        (nb_subfr 4), LM 2 = 10 ms (nb_subfr 2)."""
        K = self._ss_k
        act = np.zeros(K, dtype=bool)
        act[:len(stgs)] = True
        ok62 = all(bool(s[-1]) for s in stgs)
        while len(stgs) < K:
            stgs = stgs + [tuple(np.zeros_like(a) for a in stgs[0])]
        chunk = 62 if ok62 and jax.default_backend() == "tpu" else 13
        nb = 4 if LM == 3 else 2
        bk = ("hyb1", LM, self._ss_k, stgs[0][0].shape[0])
        self._stats["buckets"][bk] = self._stats["buckets"].get(bk, 0) + 1

        def run():
            # stacking on the dispatch thread (see _ss_dispatch_hyb2)
            cols = [np.stack(parts) for parts in zip(*stgs)][:-1]
            mixedK, dm, pre, st2 = _hybrid1_pool_superstep(
                self.state["decode_mem"], self.state["preemph"],
                self._silk_bucket(16),
                *jax.device_put(list(cols)),
                jax.device_put(act), LM=LM, C=1, CC=self.channels,
                chunk=chunk, fs=16, nb=nb, order=16,
                has_glue=self.rfc_plc, out_khz=self._out_khz,
                downsample=self.downsample)
            self.state["decode_mem"] = dm
            self.state["preemph"] = pre
            self.silk_buckets[16] = st2
            if self.output == "host":
                try:
                    mixedK.copy_to_host_async()
                except AttributeError:
                    pass
            return mixedK

        batch.fut = self._dev_exec.submit(run) \
            if self._dev_exec is not None else run()

    def _fuse_hybrid_mix(self, pend):
        """Uniform-hybrid step: replace the per-stream host SILK+CELT
        mix with ONE device gather+clip program (_hybrid_mix_step).
        Applies when every decoded row this step is hybrid (the serving
        shape for a hybrid farm): exactly one CELT bucket and one SILK
        bucket covering pend['hybrid'] and no mutes. Loss/FEC/mixed
        steps keep the generic host mix (src/opus_decoder.cpp:272)."""
        hyb = pend["hybrid"]
        if not hyb or pend["mute"] or self._t_mode \
                or len(pend["celt"]) != 1 \
                or len(pend["silk"]) + len(pend["silk2"]) != 1:
            return
        cdev, csidx = pend["celt"][0]
        sdev, ssidx = (pend["silk"] or pend["silk2"])[0]
        if hasattr(cdev, "result") or hasattr(sdev, "result"):
            return    # dispatch-thread futures / superstep handles
        if set(csidx) != hyb or set(ssidx) != hyb:
            return
        pos = {i: r for r, i in enumerate(ssidx)}
        perm = np.asarray([pos[i] for i in csidx], dtype=np.int32)
        cparts = cdev if isinstance(cdev, tuple) else (cdev,)
        mixed = _hybrid_mix_step(cparts, sdev, jnp.asarray(perm))
        pend["celt"] = []
        pend["silk"] = []
        pend["silk2"] = []
        pend["hybrid"] = set()
        # APPEND: pend['mix'] may already hold concealed-CELT PCM from
        # _celt_plc_group this step (mixed celt+hybrid pool where every
        # CELT row was lost and every hybrid row decoded) — overwriting
        # would silently drop those concealed frames
        pend["mix"].append((mixed, csidx))

    def _flush(self):
        """Materialize all pending device launches (pipeline drain)."""
        if self._ss_buf:
            self._ss_flush()
        pends, self._pending = self._pending, []
        for p in pends:
            self._materialize(p)

    def _materialize(self, pend):
        """Retire one step's device launches: fetch + route (host
        output), feed an attached on-chip consumer (device output +
        consumer), or hand the PCM to the on-device consumer window
        (device output — kept until drain(), bounded by device_keep)."""
        if self.output == "device":
            if self._consumer is not None:
                self._feed_consumer(pend)
                return
            self._dev_out.append(pend)
            if self.device_keep is not None:
                while len(self._dev_out) > self.device_keep:
                    self._dev_out.pop(0)   # consumed downstream on-chip
            return
        self._route(pend)

    def attach_consumer(self, consumer):
        """Feed every decoded frame block to `consumer` ON DEVICE
        (models/consumer.py::OnChipConsumer): the decoder's PCM never
        crosses the host link; the downstream jitted stage (vocoder /
        feature front-end / ASR encoder on the same chip) runs straight
        off HBM. Requires output='device'. Superstep pools feed the
        consumer per-frame VIEWS sliced out of the K-frame block in
        HBM (_feed_consumer's _SSFrame branch; tests/test_consumer.py
        covers K>1)."""
        if self.output != "device":
            raise ValueError("attach_consumer requires output='device'")
        if self._kind_subs:
            raise ValueError(
                "attach_consumer is per-kind on heterogeneous pools: "
                "attach to pool._kind_subs[kind] (each sub-pool is a "
                "uniform StreamPool)")
        self._consumer = consumer

    def _feed_consumer(self, pend):
        """Normalize one retired step's device launches to (rows, T,
        CC) blocks and hand them to the attached consumer. Hybrid
        steps arrive pre-mixed (pend['mix']); an UNfused hybrid step
        (loss/FEC in a hybrid pool) would double-feed its rows, so it
        falls back to the host mix and re-uploads — correct, just not
        link-free, and only on conceal steps."""
        cons = self._consumer
        meta = pend["meta"]

        def trims(sidx):
            return [meta[i] for i in sidx]

        if pend["hybrid"] or pend["mute"]:
            saved, self.output = self.output, "host"
            outs = {i: len(self.pcm_out[i]) for i in pend["meta"]}
            try:
                self._route(pend)
            finally:
                self.output = saved
            for i, k in outs.items():
                new = self.pcm_out[i][k:]
                del self.pcm_out[i][k:]
                for pcm in new:
                    blk = np.ascontiguousarray(pcm[None])
                    cons._feed(jax.device_put(blk), [i],
                               trims=[(0, 0)])
            return
        for dev, sidx in pend["mix"]:
            if isinstance(dev, _SSFrame):
                dev = dev.batch.device()[dev.j]  # (cap, N, CC) in HBM
            cons._feed(dev, sidx, trims=trims(sidx))
        for dev, sidx in pend["celt"]:
            if isinstance(dev, _SSFrame):
                # superstep window: slice this frame's (CC, Nd, cap)
                # view out of the K-frame block IN HBM — no fetch
                blk = dev.batch.device()[dev.j]
                cons._feed(_rows_celt_T((blk,)), sidx,
                           rows=np.asarray(sidx, dtype=np.int64),
                           trims=trims(sidx))
            elif self._t_mode:
                if hasattr(dev, "result"):
                    dev = dev.result()
                cons._feed(_rows_celt_T(tuple(dev)), sidx,
                           rows=np.asarray(sidx, dtype=np.int64),
                           trims=trims(sidx))
            else:
                parts = dev if isinstance(dev, tuple) else (dev,)
                cons._feed(_rows_celt(parts), sidx,
                           rows=np.arange(len(sidx)), trims=trims(sidx))
        for dev, sidx in pend["silk"]:
            if isinstance(dev, _SSFrame):
                dev = dev.batch.device()[dev.j]     # (cap, L) in HBM
            cons._feed(_rows_silk(dev), sidx,
                       rows=np.arange(len(sidx)), trims=trims(sidx))
        for dev, sidx in pend["silk2"]:
            if isinstance(dev, _SSFrame):
                dev = dev.batch.device()[dev.j]     # (cap, 2, L) in HBM
            cons._feed(_rows_silk2(dev), sidx,
                       rows=np.arange(len(sidx)), trims=trims(sidx))
        for i, pcm in pend["direct"]:
            blk = np.ascontiguousarray(pcm[None])
            cons._feed(jax.device_put(blk), [i], trims=trims([i]))

    def _route(self, pend):
        """Fetch one step's device launches and route PCM per stream
        (hybrid saturating mix, mutes, pre-skip/end-trim)."""
        celt_pcm: dict[int, np.ndarray] = {}
        silk_pcm: dict[int, np.ndarray] = {}
        for dev, sidx in pend["celt"]:
            if self._t_mode:
                if hasattr(dev, "result"):
                    dev = dev.result()     # dispatch-thread future
                # transposed identity step: (CC, Nd, cap) lane-chunks;
                # stream i's PCM is lane column i
                arr = np.concatenate([np.asarray(p) for p in dev],
                                     axis=2)
                for i in sidx:
                    celt_pcm[i] = arr[:, :, i].T
                continue
            if isinstance(dev, tuple):   # packed step: concurrent chunks
                arr = np.concatenate([np.asarray(p) for p in dev])
            else:
                arr = np.asarray(dev).astype(np.int16, copy=False)
            for r, i in enumerate(sidx):
                celt_pcm[i] = arr[r].T
        parts: dict[int, list] = {}
        for dev, sidx in pend["silk"]:
            if hasattr(dev, "result"):      # superstep frame handle
                dev = dev.result()[0]
            arr = np.asarray(dev).astype(np.int16, copy=False)
            for r, i in enumerate(sidx):
                parts.setdefault(i, []).append(arr[r])
        for i, ps in parts.items():
            silk_pcm[i] = (ps[0] if len(ps) == 1
                           else np.concatenate(ps))[:, None]
        parts2: dict[int, list] = {}
        for dev, sidx in pend["silk2"]:
            if hasattr(dev, "result"):      # superstep frame handle
                dev = dev.result()[0]
            arr = np.asarray(dev).astype(np.int16, copy=False)
            for r, i in enumerate(sidx):
                parts2.setdefault(i, []).append(arr[r].T)
        for i, ps in parts2.items():
            # 40/60 ms stereo payloads arrive as nfr sequential 20 ms
            # launches of the same bucket; concatenate along time
            silk_pcm[i] = ps[0] if len(ps) == 1 else np.concatenate(ps)
        meta = pend["meta"]
        for dev, sidx in pend["mix"]:
            # device-mixed hybrid PCM: (n, N, CC) rows, ready to route
            if hasattr(dev, "result"):      # superstep frame handle
                dev = dev.result()[0]
            arr = np.asarray(dev)
            for r, i in enumerate(sidx):
                lo, te = meta[i]
                self.pcm_out[i].append(self._trim(arr[r], lo, te))
        for i in set(celt_pcm) | set(silk_pcm):
            lo, te = meta[i]
            if i in pend["mute"]:
                self.pcm_out[i].append(self._trim(
                    np.zeros_like(silk_pcm[i]), lo, te))
            elif i in pend["hybrid"]:
                # saturating SILK+CELT mix (src/opus_decoder.cpp:272)
                mixed = np.clip(celt_pcm[i].astype(np.int32)
                                + silk_pcm[i].astype(np.int32),
                                -32768, 32767).astype(np.int16)
                self.pcm_out[i].append(self._trim(mixed, lo, te))
            elif i in celt_pcm:
                self.pcm_out[i].append(self._trim(celt_pcm[i], lo, te))
            else:
                self.pcm_out[i].append(self._trim(silk_pcm[i], lo, te))
        for i, pcm in pend["direct"]:
            lo, te = meta[i]
            self.pcm_out[i].append(self._trim(pcm, lo, te))

    def _trim(self, pcm, lo: int, te: int):
        d = self.downsample
        if d > 1:
            # pcm holds 48k-indices {0, d, 2d, ...} of the frame; keep
            # those >= lo and < N48 - te (same index set the reference's
            # decimated decode at Fs=48k/d yields)
            n48 = pcm.shape[0] * d
            lo = -(-lo // d)
            te = pcm.shape[0] - (-(-(n48 - te) // d))
        hi = pcm.shape[0] - te
        out = pcm[lo:max(hi, lo)]
        self._stats["samples_out"] += out.shape[0]
        return out

    # ------------------------------------------------------------------
    def _celt_group(self, items, LM, C, CC, pend):
        """Generic adapter: per-stream synth-input dicts -> columnar
        arrays -> _celt_launch. (The fast path builds the columns
        directly from the batch engine's contiguous outputs.)"""
        N = SHORT_MDCT_SIZE << LM
        n = len(items)
        sidx = [it[0] for it in items]
        transient = np.array([bool(it[1]["transient"]) for it in items])
        X = np.zeros((n, C, N), dtype=np.int16)
        bandE = np.zeros((n, 2, NB_EBANDS), dtype=np.int16)
        start = np.zeros(n, dtype=np.int32)
        end = np.zeros(n, dtype=np.int32)
        comb1 = np.zeros((6, n), dtype=np.int32)
        comb2 = np.zeros((6, n), dtype=np.int32)
        for b, (_i, si) in enumerate(items):
            X[b] = np.asarray(si["X"][:C * N],
                              dtype=np.int16).reshape(C, N)
            bandE[b] = np.asarray(si["bandE"],
                                  dtype=np.int16).reshape(2, NB_EBANDS)
            start[b] = si["start"]
            end[b] = si["end"]
            comb1[:, b] = si["comb1"]
            comb2[:, b] = si["comb2"]
        dev = self._celt_launch(sidx, X, bandE, start, end, comb1, comb2,
                                LM, C, transient)
        pend["celt"].append((dev, sidx))

    def _celt_plc_group(self, rows, pend):
        """Batched CELT pitch-repeat concealment (rfc_plc pools): one
        device bucket over the lost rows (ops/celt/jax_plc.py — the
        libopus celt_decode_lost semantics the reference deleted).
        Gathers the rows' decode_mem/preemph (either layout), conceals,
        scatters state back, and routes the concealed PCM via
        pend['mix'] (row-major (cap, Nd, CC), layout-independent)."""
        from ..ops.celt.jax_plc import celt_plc_bucket
        n = len(rows)
        CC = self.channels
        # COMPACT bucket (pow2 of the lost count, not the pool cap):
        # the conceal kernel is the heaviest per-row program in the
        # pool (pitch xcorr + Levinson-24 + order-24 IIR scan), so
        # padding it to the full fixed_buckets capacity wasted ~cap/n x
        # compute on every lossy step; pow2 occupancy keeps the compile
        # count logarithmic. The in-window superstep conceal
        # (_celt_pool_superstep_T_lossy) sizes its slot count the same
        # way, so the two paths run the SAME batch shape (and thus
        # bit-identical float reductions) whenever a frame's lost set
        # matches — the conceal is float32, spec'd by SNR vs libopus
        # (test_celt_plc.py), and its low bits legitimately vary with
        # batch shape.
        cap = _pow2_cap(n)
        bk = ("celt_plc", CC, cap)
        self._stats["buckets"][bk] = self._stats["buckets"].get(bk, 0) + 1
        pad = cap - n
        idxs = np.asarray(list(rows) + [rows[0]] * pad, dtype=np.int32)
        first0 = [i not in self._plc_prev_lost for i in rows]
        # pad rows duplicate row 0 ENTIRELY (index, first flag, active)
        # so their computed update is identical to row 0's and the
        # duplicate-index scatter stays deterministic — an inactive pad
        # row would scatter the PRE-conceal state back over row 0
        first = np.array(first0 + [first0[0]] * pad)
        active = np.ones(cap, dtype=bool)
        jidx = jnp.asarray(idxs)
        if self._t_mode:
            dm = self.state["decode_mem"][:, :, jidx].transpose(2, 0, 1)
        else:
            dm = self.state["decode_mem"][jidx]
        pre = self.state["preemph"][jidx]
        pitch = self.state["plc_pitch"][jidx]
        lpc = self.state["plc_lpc"][jidx]
        pcm, dm2, pre2, pitch2, lpc2 = celt_plc_bucket(
            dm, pre, pitch, jnp.asarray(lpc),
            jnp.asarray(first), jnp.asarray(active),
            CC=CC, downsample=self.downsample)
        if self._t_mode:
            self.state["decode_mem"] = self.state["decode_mem"] \
                .at[:, :, jidx].set(dm2.transpose(1, 2, 0))
        else:
            self.state["decode_mem"] = self.state["decode_mem"] \
                .at[jidx].set(dm2)
        self.state["preemph"] = self.state["preemph"].at[jidx].set(pre2)
        self.state["plc_pitch"] = self.state["plc_pitch"] \
            .at[jidx].set(pitch2)
        self.state["plc_lpc"] = self.state["plc_lpc"].at[jidx].set(lpc2)
        pend["mix"].append((pcm, list(rows)))

    def _celt_plc_group_ss(self, rows, pend):
        """Superstep-resident CELT concealment (transposed 20 ms CELT
        pools, VERDICT r04 #3): lost rows JOIN the K-frame window as
        compact conceal entries instead of flushing it — the window
        keeps filling and ONE lossy device program
        (_celt_pool_superstep_T_lossy) serves K frames, concealing each
        frame's lost lanes in place. The T-mode staging is full-pool
        identity (every row owns its lane), so unlike the SILK variant
        there are no pad-row gymnastics: the step's staged frame
        already carries the lost rows as inactive lanes; this method
        just records which lanes to conceal (and their host-tracked
        loss_count==0 flags) on that frame's window entry. An all-lost
        step staged nothing yet — it becomes its own all-inactive
        window frame."""
        from ..ops.celt import jax_plc as _jplc  # noqa: F401 (see
        # _celt_pool_superstep_T_lossy: module-level jnp constants must
        # materialize outside the trace)
        key = (3, 2 if self.channels == 2 else 1)
        ent = self._ss_buf.get(key)
        mark = self._ss_mark.get(key)
        rows_np = np.asarray(sorted(rows), dtype=np.int32)
        first = np.array([i not in self._plc_prev_lost
                          for i in rows_np])
        if ent is not None and ent[1] and mark is not None \
                and mark == (len(ent[1]) - 1, self._step_seq):
            # this step staged a good-row frame: conceal rides it
            batch, stgs = ent
            j = len(stgs) - 1
            stgs[j][1] = rows_np
            stgs[j][2] = first
        else:
            # all rows lost this step (or the window just dispatched):
            # the conceal becomes its own all-inactive window frame
            C = key[1]
            W = _CELT_HDR + 2 * NB_EBANDS + C * 960
            if ent is None:
                self._ss_buf[key] = ent = (_SSBatch(self), [])
            batch, stgs = ent
            j = len(stgs)
            stgs.append([np.zeros((self.n, W), dtype=np.int16),
                         rows_np, first])
        h = batch.frame(j)
        # concealed lanes route exactly like decoded lanes: the window
        # program wrote their PCM into the same frame block
        pend["celt"].append((h, rows_np.tolist()))
        if len(stgs) >= self._ss_k:
            self._ss_dispatch(key)

    def _celt_noise_si(self, i, start, end, N, LM):
        """libopus celt_decode_lost NOISE branch (loss_count >= 5,
        post-recovery skip_plc, or the hybrid high band start != 0):
        decay the host's oldBandE toward backgroundLogE, fill bands
        start..effEnd with renormalised LCG noise, and return a
        synth-inputs dict that flows through the NORMAL decode bucket
        (zero-gain comb = the branch's missing postfilter) — so the
        device conceal IS the ordinary integer synthesis path, bit-
        exact vs the scalar CELTDecoder.decode_lost noise branch. The
        reference deleted celt_decode_lost entirely; the anchor for
        this state layout is its decoder struct src/celt.h:150-171.
        Mutates the host engine state (oldBandE, rng) exactly like
        libopus does; works on both engines (native CeltHostState and
        the python CELTDecoder share field names)."""
        from ..ops.celt.math import celt_lcg_rand
        from ..ops.celt.pvq import renormalise_vector
        from ..ops.tables.celt_tables import eband5ms
        host = self.celt_hosts[i]
        st = host.st if self.native else host
        CC = self.channels
        C = CC          # the noise branch synthesizes C=CC channels
        cnt = self._plc_loss_cnt.get(i, 0)
        decay = 1536 if cnt == 0 else 512     # 1.5 / 0.5 dB, Q10
        for c in range(CC):
            base = c * NB_EBANDS
            for b in range(start, end):
                st.oldBandE[base + b] = max(
                    int(st.backgroundLogE[base + b]),
                    int(st.oldBandE[base + b]) - decay)
        effEnd = max(start, min(end, NB_EBANDS))
        seed = int(st.rng) & 0xFFFFFFFF
        X = np.zeros(C * N, dtype=np.int64)
        for c in range(C):
            for b in range(start, effEnd):
                boffs = N * c + (int(eband5ms[b]) << LM)
                blen = (int(eband5ms[b + 1]) - int(eband5ms[b])) << LM
                for j in range(blen):
                    seed = celt_lcg_rand(seed)
                    v = seed - (1 << 32) if seed >= (1 << 31) else seed
                    X[boffs + j] = v >> 20
                renormalise_vector(X[boffs:boffs + blen], blen, 32767)
        st.rng = seed
        bandE = np.array([int(st.oldBandE[j])
                          for j in range(2 * NB_EBANDS)], dtype=np.int64)
        return dict(X=X, bandE=bandE, start=start, end=effEnd, C=C,
                    CC=CC, LM=LM, transient=False, silence=0,
                    comb1=(15, 15, 0, 0, 0, 0),
                    comb2=(15, 15, 0, 0, 0, 0))

    def _celt_launch(self, sidx, X, bandE, start, end, comb1, comb2,
                     LM, C, transient):
        """Dispatch one batched CELT synthesis bucket; returns the device
        pcm array (cap, CC, N) — materialized `pipeline_depth` steps
        later. transient: (n,) bool per-row."""
        n = len(sidx)
        CC = self.channels
        if self._t_mode:
            return self._celt_launch_T(sidx, X, bandE, start, end,
                                       comb1, comb2, LM, C, transient)
        cap = self._cap_celt if self.fixed_buckets else _pow2_cap(n)
        bk = ("celt", LM, C, CC, cap)
        self._stats["buckets"][bk] = self._stats["buckets"].get(bk, 0) + 1
        pad = cap - n
        N = SHORT_MDCT_SIZE << LM
        idxs = np.asarray(list(sidx) + [sidx[0]] * pad, dtype=np.int32)
        sec = np.concatenate([start[None], end[None], comb1, comb2],
                             axis=0).astype(np.int32)
        # ONE packed int16 staging upload per bucket per step (header +
        # bandE + X): each transfer on a tunneled TPU pays a fixed RPC
        # latency, so five small uploads cost more than one big one.
        stg = np.empty((cap, _CELT_HDR + 2 * NB_EBANDS + C * N),
                       dtype=np.int16)
        stg[:n, 0] = (idxs[:n] & 0xFFFF).astype(np.uint16).view(np.int16)
        stg[:n, 1] = (idxs[:n] >> 16).astype(np.int16)
        stg[:n, 2] = np.asarray(transient, dtype=np.int16)
        stg[:n, 3:17] = sec.T.astype(np.int16)
        stg[:n, 17] = 0
        stg[:n, _CELT_HDR:_CELT_HDR + 2 * NB_EBANDS] = \
            bandE.reshape(n, 2 * NB_EBANDS)
        stg[:n, _CELT_HDR + 2 * NB_EBANDS:] = X.reshape(n, C * N)
        if pad:
            # pad rows duplicate row 0 entirely (same inputs AND same
            # state row), so the duplicate-index scatter writes identical
            # values and stays deterministic
            stg[n:] = stg[0]
        # feedback-safe comb chunk: the scan may leap min(T)-2 samples
        # per iteration; two static sizes only (both precompiled by
        # warmup, so per-frame flapping never recompiles). Off-TPU the
        # small-chunk variant alone is fine — one compile per bucket
        # matters more than ~15% step time there (CPU CI).
        if jax.default_backend() == "tpu":
            minT = int(np.minimum(np.maximum(sec[2:4], 15),
                                  np.maximum(sec[8:10], 15)).min())
            chunk = 62 if minT - 2 >= 62 else 13
        else:
            chunk = 13
        identity = (pad == 0 and cap == self.state["decode_mem"].shape[0]
                    and np.array_equal(idxs, np.arange(cap)))
        if LM in (2, 3) and ((self._ss_hyb and C == 2)
                             or (self._ss_hyb1 and C == 1)):
            # hybrid superstep: defer — _hyb_collect pairs this staging
            # with the step's SILK staging into the K-frame window (or
            # dispatches it per-frame on impure loss/FEC steps); mono
            # AND stereo windows exist per LM (10 ms hybrid = LM 2)
            return ("hdef_c", stg, chunk == 62, identity, LM, C)
        return self._celt_dispatch_packed(stg, LM, C, chunk, identity)

    def _celt_dispatch_packed(self, stg, LM, C, chunk, identity):
        outs = _celt_pool_step_packed(
            self.state["decode_mem"], self.state["preemph"],
            jnp.asarray(stg), LM=LM, C=C, CC=self.channels, chunk=chunk,
            identity=identity, downsample=self.downsample)
        self.state["decode_mem"] = outs[-2]
        self.state["preemph"] = outs[-1]
        return outs[:-2]

    def _stage_celt_T(self, sidx, X, bandE, start, end, comb1, comb2,
                      C, N, transient):
        """Full-pool staging for the transposed path: active rows get
        their data, inactive rows (exhausted/lost streams) are
        neutralized and flagged so the step keeps their state
        bit-for-bit. Returns (stg, masked)."""
        cap = self.n
        stg = np.zeros((cap, _CELT_HDR + 2 * NB_EBANDS + C * N),
                       dtype=np.int16)
        rows = np.asarray(sidx, dtype=np.int64)
        sec = np.concatenate([start[None], end[None], comb1, comb2],
                             axis=0).astype(np.int32)
        stg[rows, 2] = np.asarray(transient, dtype=np.int16)
        stg[rows, 3:17] = sec.T.astype(np.int16)
        stg[rows, 17] = 1
        stg[rows, _CELT_HDR:_CELT_HDR + 2 * NB_EBANDS] = \
            bandE.reshape(len(rows), 2 * NB_EBANDS)
        stg[rows, _CELT_HDR + 2 * NB_EBANDS:] = X.reshape(len(rows),
                                                          C * N)
        return stg, len(rows) < cap

    def _celt_launch_T(self, sidx, X, bandE, start, end, comb1, comb2,
                       LM, C, transient):
        """Transposed-path dispatch: ONE full-pool identity step (no
        gather/scatter ever — inactive rows are masked on device)."""
        CC = self.channels
        N = SHORT_MDCT_SIZE << LM
        bk = ("celtT", LM, C, CC, self.n)
        self._stats["buckets"][bk] = self._stats["buckets"].get(bk, 0) + 1
        stg, masked = self._stage_celt_T(sidx, X, bandE, start, end,
                                         comb1, comb2, C, N, transient)
        if self._ss_k > 1:
            # superstep mode: buffer this frame's staging; dispatch ONE
            # K-frame program when the buffer fills (or at flush).
            # Entries are [stg, conc_rows|None, first|None] —
            # _celt_plc_group_ss amends this step's entry with compact
            # in-window conceal rows on a lossy step.
            key = (LM, C)
            if key not in self._ss_buf:
                self._ss_buf[key] = (_SSBatch(self), [])
            batch, stgs = self._ss_buf[key]
            h = batch.frame(len(stgs))
            stgs.append([stg, None, None])
            self._ss_mark[key] = (len(stgs) - 1, self._step_seq)
            if len(stgs) >= self._ss_k:
                self._ss_dispatch(key)
            return h

        def run():
            # device_put is ASYNC: the 2-4 MB staging upload streams in
            # the background; on a tunneled device every dispatch then
            # BLOCKS in synchronized mode, which is why this runs on
            # the dedicated dispatch thread — the main thread's next
            # host symbol phase (GIL-free C++) overlaps the blocked RPC
            # (SURVEY §2.7 frame pipeline parallelism, measurable:
            # e2e < host + device + link sum)
            outs = _celt_pool_step_packed_T(
                self.state["decode_mem"], self.state["preemph"],
                jax.device_put(stg), LM=LM, C=C, CC=CC, chunk=13,
                masked=masked, downsample=self.downsample,
                interpret=self._t_interp)
            self.state["decode_mem"] = outs[-2]
            self.state["preemph"] = outs[-1]
            if self.output == "host":
                # start the D2H copies here (the main thread's async
                # kick in step() can't see futures' parts)
                for part in outs[:-2]:
                    try:
                        part.copy_to_host_async()
                    except AttributeError:
                        pass
            return outs[:-2]

        if self._dev_exec is not None:
            return self._dev_exec.submit(run)
        return run()

    def _ss_dispatch(self, key):
        """Run one buffered K-frame superstep as a single device
        program. A partial buffer (pipeline drain mid-window) is padded
        with all-inactive frames so the ONE compiled (K, cap, W) shape
        serves every dispatch; masked rows keep their state bit-for-bit
        so pad frames are no-ops."""
        batch, stgs = self._ss_buf.pop(key)
        if key[0] == "silk":
            return self._ss_dispatch_silk(key, batch, stgs)
        if key[0] == "silk2":
            return self._ss_dispatch_silk2(key, batch, stgs)
        if key[0] == "hyb2":
            return self._ss_dispatch_hyb2(batch, stgs,
                                          key[1] if len(key) > 1 else 3)
        if key[0] == "hyb1":
            return self._ss_dispatch_hyb1(batch, stgs,
                                          key[1] if len(key) > 1 else 3)
        if len(stgs) < self._ss_k:
            pad = [np.zeros_like(stgs[0][0]), None, None]
            stgs = stgs + [pad] * (self._ss_k - len(stgs))
        LM, C = key
        lossy = any(s[1] is not None for s in stgs)
        if lossy:
            # in-window conceal: compact lost-lane indices per frame,
            # padded to one pow2 slot count S for the whole window
            # (sentinel self.n: gathers clamp, scatters drop)
            K = self._ss_k
            S = _pow2_cap(max(len(s[1]) for s in stgs
                              if s[1] is not None))
            rowsK = np.full((K, S), self.n, dtype=np.int32)
            firstK = np.zeros((K, S), dtype=bool)
            for k, s in enumerate(stgs):
                if s[1] is not None:
                    m = len(s[1])
                    rowsK[k, :m] = s[1]
                    firstK[k, :m] = s[2]
            bk = ("celtT_plc_ss", LM, C, self.n, S)
            self._stats["buckets"][bk] = \
                self._stats["buckets"].get(bk, 0) + 1

        def run():
            # stacking on the dispatch thread (see _ss_dispatch_hyb2)
            stgK = np.stack([s[0] for s in stgs])
            if lossy:
                pcmK, dm, pre, pit, lpc = _celt_pool_superstep_T_lossy(
                    self.state["decode_mem"], self.state["preemph"],
                    self.state["plc_pitch"], self.state["plc_lpc"],
                    jax.device_put(stgK), jnp.asarray(rowsK),
                    jnp.asarray(firstK), LM=LM, C=C, CC=self.channels,
                    chunk=13, downsample=self.downsample,
                    interpret=self._t_interp)
                self.state["plc_pitch"] = pit
                self.state["plc_lpc"] = lpc
            else:
                pcmK, dm, pre = _celt_pool_superstep_T(
                    self.state["decode_mem"], self.state["preemph"],
                    jax.device_put(stgK), LM=LM, C=C, CC=self.channels,
                    chunk=13, masked=True, downsample=self.downsample,
                    interpret=self._t_interp)
            self.state["decode_mem"] = dm
            self.state["preemph"] = pre
            if self.output == "host":
                try:
                    pcmK.copy_to_host_async()
                except AttributeError:
                    pass
            return pcmK

        batch.fut = self._dev_exec.submit(run) \
            if self._dev_exec is not None else run()

    def _ss_dispatch_silk(self, key, batch, stgs):
        """Run one buffered K-frame SILK superstep as a single device
        program. Partial windows pad with inactive frames (actK False ->
        the scan body selects the untouched state wholesale), so ONE
        compiled (K, cap, ...) shape serves every dispatch. Windows
        holding any conceal rows (lossy steps, _silk_plc_group_ss) run
        the dual-path program (_silk_pool_superstep_lossy); clean
        windows keep the cheaper decode-only program."""
        _, fs, frame_ms = key
        K = self._ss_k
        act = np.zeros(K, dtype=bool)
        act[:len(stgs)] = True
        nb = 2 if frame_ms == 10 else 4
        frame = frame_ms * fs
        order = 16 if fs == 16 else 10
        lossy = any(s[1] is not None for s in stgs)
        cap = stgs[0][0][0].shape[0]
        while len(stgs) < K:
            stgs = stgs + [[tuple(np.zeros_like(a) for a in stgs[0][0]),
                            None, None]]

        if lossy:
            empty = [_dummy_conceal_cols(cap, frame, order),
                     np.zeros((0,), dtype=np.int32),
                     np.zeros((0, frame), dtype=np.int32),
                     np.zeros((0, frame), dtype=np.int32)]
            for s in stgs:
                if s[1] is None:
                    s[1] = empty
                    s[2] = np.zeros(cap, dtype=bool)

            def run():
                # column stacking on the dispatch thread — overlaps the
                # next steps' host phases (see _ss_dispatch_hyb2)
                idxK, excK, AK, BK, ivK, boolsK, glueK = [
                    np.stack(parts)
                    for parts in zip(*(s[0] for s in stgs))]
                smallsK = [np.stack(parts)
                           for parts in zip(*(s[1][0] for s in stgs))]
                lostK = np.stack([s[2] for s in stgs])
                # frame-sized conceal inputs stay COMPACT on the link:
                # pad each frame's lost rows to the window's pow2 slot
                # count (position `cap` slots drop in the device
                # scatter)
                rowsK, randK, cngeK = _pad_compact(
                    [s[1][1:] for s in stgs], cap, frame)
                rand_d = _expand_rows(jax.device_put(rowsK),
                                      jax.device_put(randK), cap=cap)
                cnge_d = _expand_rows(jax.device_put(rowsK),
                                      jax.device_put(cngeK), cap=cap)
                cA, cB4, clag4, cg3, cnga, cfirst = (
                    jax.device_put(list(smallsK)))
                pcmK, st2 = _silk_pool_superstep_lossy(
                    self._silk_bucket(fs), jax.device_put(idxK),
                    jax.device_put(excK), jax.device_put(AK),
                    jax.device_put(BK), jax.device_put(ivK),
                    jax.device_put(boolsK), jax.device_put(glueK),
                    jax.device_put(lostK),
                    rand_d, cA, cB4, clag4, cg3, cnge_d, cnga, cfirst,
                    jax.device_put(act), fs=fs, nb=nb, order=order,
                    frame=frame, out_khz=self._out_khz)
                self.silk_buckets[fs] = st2
                if self.output == "host":
                    try:
                        pcmK.copy_to_host_async()
                    except AttributeError:
                        pass
                return pcmK

            batch.fut = self._dev_exec.submit(run) \
                if self._dev_exec is not None else run()
            return

        def run():
            # stacking on the dispatch thread (see _ss_dispatch_hyb2)
            idxK, excK, AK, BK, ivK, boolsK, glueK = [
                np.stack(parts) for parts in zip(*(s[0] for s in stgs))]
            pcmK, st2 = _silk_pool_superstep(
                self._silk_bucket(fs), jax.device_put(idxK),
                jax.device_put(excK), jax.device_put(AK),
                jax.device_put(BK), jax.device_put(ivK),
                jax.device_put(boolsK), jax.device_put(glueK),
                jax.device_put(act), fs=fs, nb=nb, order=order,
                frame=frame, has_glue=self.rfc_plc,
                out_khz=self._out_khz)
            self.silk_buckets[fs] = st2
            if self.output == "host":
                try:
                    pcmK.copy_to_host_async()
                except AttributeError:
                    pass
            return pcmK

        batch.fut = self._dev_exec.submit(run) \
            if self._dev_exec is not None else run()

    def _ss_dispatch_silk2(self, key, batch, stgs):
        """Run one buffered K-frame stereo-SILK superstep as a single
        device program. Partial windows pad with inactive frames like
        the mono dispatch; windows holding conceal rows run the
        dual-path program (_silk2_pool_superstep_lossy)."""
        _, fs, nb = key
        K = self._ss_k
        act = np.zeros(K, dtype=bool)
        act[:len(stgs)] = True
        order = 16 if fs == 16 else 10
        frame = nb * 5 * fs
        lossy = any(s[1] is not None for s in stgs)
        cap = stgs[0][0][0].shape[0]
        while len(stgs) < K:
            stgs = stgs + [[tuple(np.zeros_like(a) for a in stgs[0][0]),
                            None, None]]
        cols = [np.stack(parts) for parts in zip(*(s[0] for s in stgs))]

        if lossy:
            for s in stgs:
                if s[1] is None:
                    s[1] = [_dummy_conceal_cols(cap, frame, order),
                            _dummy_conceal_cols(cap, frame, order),
                            np.zeros(cap, dtype=bool),
                            np.zeros((0,), dtype=np.int32),
                            np.zeros((0, frame), dtype=np.int32),
                            np.zeros((0, frame), dtype=np.int32),
                            np.zeros((0, frame), dtype=np.int32),
                            np.zeros((0, frame), dtype=np.int32)]
                    s[2] = np.zeros(cap, dtype=bool)
            sm_mK = [np.stack(parts)
                     for parts in zip(*(s[1][0] for s in stgs))]
            sm_sK = [np.stack(parts)
                     for parts in zip(*(s[1][1] for s in stgs))]
            hsK = np.stack([s[1][2] for s in stgs])
            lostK = np.stack([s[2] for s in stgs])
            rowsK, m_randK, m_cngeK = _pad_compact(
                [(s[1][3], s[1][4], s[1][5]) for s in stgs], cap, frame)
            _, s_randK, s_cngeK = _pad_compact(
                [(s[1][3], s[1][6], s[1][7]) for s in stgs], cap, frame)

            def run():
                rows_d = jax.device_put(rowsK)
                dense = [_expand_rows(rows_d, jax.device_put(v),
                                      cap=cap)
                         for v in (m_randK, m_cngeK, s_randK, s_cngeK)]
                m_sm = jax.device_put(list(sm_mK))
                s_sm = jax.device_put(list(sm_sK))
                concK = (dense[0], m_sm[0], m_sm[1], m_sm[2], m_sm[3],
                         dense[1], m_sm[4], m_sm[5],
                         dense[2], s_sm[0], s_sm[1], s_sm[2], s_sm[3],
                         dense[3], s_sm[4], s_sm[5],
                         jax.device_put(hsK))
                pcmK, st2 = _silk2_pool_superstep_lossy(
                    self._silk2_bucket(fs),
                    *jax.device_put(list(cols)),
                    jax.device_put(lostK), concK,
                    jax.device_put(act), fs=fs, order=order,
                    out_khz=self._out_khz, nb=nb)
                self.silk2_buckets[fs] = st2
                if self.output == "host":
                    try:
                        pcmK.copy_to_host_async()
                    except AttributeError:
                        pass
                return pcmK

            batch.fut = self._dev_exec.submit(run) \
                if self._dev_exec is not None else run()
            return

        def run():
            pcmK, st2 = _silk2_pool_superstep(
                self._silk2_bucket(fs),
                *jax.device_put(list(cols)),
                jax.device_put(act), fs=fs, order=order,
                has_glue=self.rfc_plc, out_khz=self._out_khz, nb=nb)
            self.silk2_buckets[fs] = st2
            if self.output == "host":
                try:
                    pcmK.copy_to_host_async()
                except AttributeError:
                    pass
            return pcmK

        batch.fut = self._dev_exec.submit(run) \
            if self._dev_exec is not None else run()

    def _ss_flush(self):
        """Dispatch every partially-filled superstep buffer."""
        for key in list(self._ss_buf):
            self._ss_dispatch(key)

    # ------------------------------------------------------------------
    _SILK_KEYS = ("exc", "A", "B", "gains", "inv", "lag", "voiced",
                  "rewhiten", "adj", "match")

    def _silk_group(self, items, fs: int, nfr: int = 1,
                    frame_ms: int = 20, pend=None):
        """Generic adapter: items = (stream_idx, [per-device-frame
        params] * nfr). Multi-frame packets (40/60 ms) run nfr sequential
        launches of the SAME compiled core — state scatters back between
        subframes, so no new shapes are traced."""
        sidx = [it[0] for it in items]
        for j in range(nfr):
            cols = {key: np.stack([it[1][j][key] for it in items])
                    for key in self._SILK_KEYS}
            glue = self._glue_arrays(sidx) \
                if self.rfc_plc and j == 0 else None
            dev = self._silk_launch(sidx, cols, fs, frame_ms, glue=glue,
                                    nfr_label=nfr)
            pend["silk"].append((dev, sidx))

    def _silk_launch(self, sidx, cols, fs: int, frame_ms: int = 20,
                     glue=None, nfr_label: int = 1):
        """Dispatch one batched SILK device frame (core synthesis +
        resample); returns the device 48 kHz pcm (cap, L48). frame_ms=10
        selects the nb_subfr=2 core; bucket state arrays are sized for
        20 ms and shorter frames use a leading slice."""
        st = self._silk_bucket(fs)
        nb = 2 if frame_ms == 10 else 4
        frame = frame_ms * fs
        n = len(sidx)
        cap = self._cap_silk[fs] if self.fixed_buckets else _pow2_cap(n)
        bk = ("silk", fs, frame_ms, nfr_label, cap)
        self._stats["buckets"][bk] = self._stats["buckets"].get(bk, 0) + 1
        pad = cap - n
        idxs = np.asarray(list(sidx) + [sidx[0]] * pad, dtype=np.int32)
        order = 16 if fs == 16 else 10

        def padded(v):
            return np.concatenate([v, np.repeat(v[:1], pad, 0)]) if pad \
                else v

        exc = padded(cols["exc"])
        A = padded(cols["A"])
        B = padded(cols["B"])
        iv = padded(np.stack([cols["gains"], cols["inv"], cols["lag"],
                              cols["adj"]], axis=1).astype(np.int32))
        bools = padded(np.stack([cols["voiced"], cols["rewhiten"],
                                 cols["match"]], axis=1).astype(bool))
        if glue is not None:
            garr = np.concatenate([glue, np.zeros(pad, dtype=bool)]) \
                if pad else glue
        else:
            garr = np.zeros(cap, dtype=bool)
        if self._ss_hyb1 and fs == 16 and frame_ms in (10, 20):
            # hybrid superstep: defer — paired with the CELT staging by
            # _hyb_collect at the end of this step
            return ("hdef_s1", (idxs, exc, A, B, iv, bools, garr), fs,
                    frame_ms)
        if self._ss_silk:
            # superstep mode: buffer this frame's columns; ONE K-frame
            # device program per bucket when the window fills (or at
            # flush). has_glue is compiled in statically (rfc_plc).
            # Staging entries are [cols7, conceal_cols|None, lost|None]
            # lists — _silk_plc_group_ss amends this step's entry with
            # masked conceal rows on a lossy step.
            key = ("silk", fs, frame_ms)
            if key not in self._ss_buf:
                self._ss_buf[key] = (_SSBatch(self), [])
            batch, stgs = self._ss_buf[key]
            h = batch.frame(len(stgs))
            stgs.append([(idxs, exc, A, B, iv, bools, garr), None, None])
            self._ss_mark[key] = (len(stgs) - 1, self._step_seq)
            if len(stgs) >= self._ss_k:
                self._ss_dispatch(key)
            return h
        return self._silk_dispatch_frame(
            (idxs, exc, A, B, iv, bools, garr), fs, nb, frame,
            has_glue=glue is not None)

    def _silk_dispatch_frame(self, cols, fs, nb, frame, has_glue):
        order = 16 if fs == 16 else 10
        out48, st2 = _silk_pool_step(
            self._silk_bucket(fs), *jax.device_put(list(cols)),
            fs=fs, nb=nb, order=order, frame=frame,
            has_glue=has_glue, out_khz=self._out_khz)
        self.silk_buckets[fs] = st2
        return out48

    def _glue_arrays(self, sidx):
        """First good frame after a concealment run: per-row flags for
        the device glue kernel (the concealed frame's reference energy is
        already on device in the bucket's conc_e/conc_s state). Returns
        None when no stream in the bucket needs gluing."""
        n = len(sidx)
        flags = np.zeros(n, dtype=bool)
        for b, i in enumerate(sidx):
            if self.silk_hosts is not None:
                ch = self._plc_trk.get(i)
                if ch is None:
                    continue
            else:
                silk = self.scalar[i].silk
                if silk is None:
                    continue
                ch = silk.channel_states[0]
            if getattr(ch, "plc_last_frame_lost", 0):
                flags[b] = True
                ch.plc_last_frame_lost = 0
        if not flags.any():
            return None
        return flags

    def _silk_plc_group_ss(self, items, fs: int, frame_ms: int, pend):
        """Superstep-resident RFC concealment (mono-SILK pools,
        single-frame payloads): lost rows JOIN the K-frame window as
        masked rows instead of flushing it. Rows of one step are
        disjoint, so when this step already staged a good-row frame for
        the bucket the conceal rows take over its pad rows (one shared
        window frame per step); an all-lost step becomes its own window
        frame. Either way the window keeps filling and one lossy device
        program (_silk_pool_superstep_lossy) serves K frames."""
        key = ("silk", fs, frame_ms)
        frame = frame_ms * fs
        order = 16 if fs == 16 else 10
        cap = self._cap_silk[fs]
        sidx = [it[0] for it in items]
        n = len(sidx)
        preps = [it[1][0] for it in items]
        smalls = _stack_conceal_cols(preps, order)
        randc, cngec = _stack_conceal_frames(preps)
        bk = ("silk_plc_ss", fs, frame_ms, cap)
        self._stats["buckets"][bk] = self._stats["buckets"].get(bk, 0) + 1

        ent = self._ss_buf.get(key)
        mark = self._ss_mark.get(key)
        if ent is not None and ent[1] and mark is not None \
                and mark == (len(ent[1]) - 1, self._step_seq):
            # this step staged a good-row frame: place the conceal rows
            # on its pad rows (pad rows beyond them keep duplicating
            # row 0, a good row — consistent duplicate scatters)
            batch, stgs = ent
            j = len(stgs) - 1
            cols7, conc0, lost0 = stgs[j]
            idxs = cols7[0]
            slist = None
            for dev, sl in pend["silk"]:
                if isinstance(dev, _SSFrame) and dev.batch is batch \
                        and dev.j == j:
                    slist = sl
                    break
            n_good = len(slist)
            assert n_good + n <= cap
            rows = slice(n_good, n_good + n)
            idxs[rows] = sidx
            if conc0 is None:
                conc0 = [_dummy_conceal_cols(cap, frame, order),
                         np.zeros((0,), dtype=np.int32),
                         np.zeros((0, frame), dtype=np.int32),
                         np.zeros((0, frame), dtype=np.int32)]
                lost0 = np.zeros(cap, dtype=bool)
            for dst, src in zip(conc0[0], smalls):
                dst[rows] = src
            conc0[1] = np.concatenate(
                [conc0[1], np.arange(n_good, n_good + n,
                                     dtype=np.int32)])
            conc0[2] = np.concatenate([conc0[2], randc])
            conc0[3] = np.concatenate([conc0[3], cngec])
            lost0[rows] = True
            # lost rows keep row 0's (good) decode columns — valid
            # numerics, output discarded by the mask; their glue flags
            # stay False
            for a in cols7[1:]:
                a[rows] = a[:1]
            stgs[j] = [cols7, conc0, lost0]
            slist.extend(sidx)
            return
        # no good-row frame this step (all streams lost, or the window
        # just dispatched): the conceal becomes its own window frame.
        # Pad rows point at an out-of-range state row (self.n): their
        # gathers clamp to real data and their state scatters DROP, so
        # pads need no input consistency at all.
        if ent is None:
            self._ss_buf[key] = ent = (_SSBatch(self), [])
        batch, stgs = ent
        pad = cap - n
        idxs = np.asarray(sidx + [self.n] * pad, dtype=np.int32)

        def padded(v):
            return np.concatenate(
                [v, np.zeros((pad,) + v.shape[1:], v.dtype)]) if pad \
                else v

        cols7 = (idxs,
                 np.zeros((cap, frame), dtype=np.int32),            # exc
                 np.zeros((cap, 2, MAX_LPC_ORDER), dtype=np.int32),  # A
                 np.zeros((cap, 4, 5), dtype=np.int32),             # B
                 np.zeros((cap, 4, 4), dtype=np.int32),             # iv
                 np.zeros((cap, 3, 4), dtype=bool),                 # bools
                 np.zeros(cap, dtype=bool))                         # glue
        conc0 = [tuple(padded(c) for c in smalls),
                 np.arange(n, dtype=np.int32), randc, cngec]
        lost0 = np.concatenate(
            [np.ones(n, dtype=bool), np.zeros(pad, dtype=bool)])
        h = batch.frame(len(stgs))
        stgs.append([cols7, conc0, lost0])
        pend["silk"].append((h, sidx))
        if len(stgs) >= self._ss_k:
            self._ss_dispatch(key)

    def _silk_plc_group(self, items, fs: int, nfr: int = 1,
                        frame_ms: int = 20, pend=None):
        """Batched RFC concealment (silk_PLC conceal + CNG): host-prepped
        params -> device conceal kernel; outBuf rolls the RAW concealed
        signal, the audible output (and the glue reference energy) is the
        post-CNG frame — matching _decode_frame's conceal/outBuf/CNG/glue
        order (src/silk.cpp:1974-2050). items carry nfr sequential
        conceal preps (a lost 40/60 ms packet conceals 2/3 internal
        frames with deepening lossCnt)."""
        nb = 2 if frame_ms == 10 else 4
        frame = frame_ms * fs
        n = len(items)
        sidx = [it[0] for it in items]
        cap = self._cap_silk[fs] if self.fixed_buckets else _pow2_cap(n)
        bk = ("silk_plc", fs, frame_ms, nfr, cap)
        self._stats["buckets"][bk] = self._stats["buckets"].get(bk, 0) + 1
        idxs = np.array(sidx + [sidx[0]] * (cap - n), dtype=np.int32)
        jidx = jnp.asarray(idxs)
        order = 16 if fs == 16 else 10
        for j in range(nfr):
            def stack(key):
                rows = [(items[b][1] if b < n else items[0][1])[j][key]
                        for b in range(cap)]
                return jnp.asarray(np.stack(rows))

            first = np.array(
                [bool((items[b][1] if b < n else items[0][1])
                      [j]["cng_first"]) for b in range(cap)])
            out48, st2 = _silk_plc_pool_step(
                self._silk_bucket(fs), jidx, stack("rand"),
                stack("A")[:, :order], stack("B4"), stack("lag4"),
                stack("inv_gain"), stack("prev_gain"),
                stack("cng_exc"), stack("cng_a")[:, :order],
                stack("cng_gain"), jnp.asarray(first),
                fs=fs, nb=nb, order=order, frame=frame,
                out_khz=self._out_khz)
            self.silk_buckets[fs] = st2
            pend["silk"].append((out48, sidx))

    def _silk2_plc_group_ss(self, items, fs: int, pend,
                            frame_ms: int = 20):
        """Superstep-resident stereo RFC concealment: lost rows join
        the silk2 K-frame window as masked rows (the stereo counterpart
        of _silk_plc_group_ss). items: (stream_idx, ([(m_prep,
        s_prep|None)], prev_pred)). Side conceals only when the
        previous frame had one (c_has_side); MS->LR keeps the previous
        predictors via the staged per-row pred."""
        key = ("silk2", fs, frame_ms // 5)
        frame = frame_ms * fs
        order = 16 if fs == 16 else 10
        cap = self._cap_silk2[fs]
        sidx = [it[0] for it in items]
        n = len(sidx)
        zero_prep = dict(
            rand=np.zeros(frame, dtype=np.int32),
            A=np.zeros(MAX_LPC_ORDER, dtype=np.int32),
            B4=np.zeros((4, 5), dtype=np.int32),
            lag4=np.zeros(4, dtype=np.int32),
            inv_gain=0, prev_gain=0, cng_gain=0,
            cng_exc=np.zeros(frame, dtype=np.int32),
            cng_a=np.zeros(MAX_LPC_ORDER, dtype=np.int32),
            cng_first=True)
        m_preps = [it[1][0][0][0] for it in items]
        s_preps = [it[1][0][0][1] for it in items]
        has_side = np.array([sp is not None for sp in s_preps])
        s_full = [sp if sp is not None else zero_prep for sp in s_preps]
        sm_m = _stack_conceal_cols(m_preps, order)
        sm_s = _stack_conceal_cols(s_full, order)
        m_randc, m_cngec = _stack_conceal_frames(m_preps)
        s_randc, s_cngec = _stack_conceal_frames(s_full)
        pred = np.stack([np.asarray(it[1][1], dtype=np.int32)
                         for it in items])
        bk = ("silk2_plc_ss", fs, cap)
        self._stats["buckets"][bk] = self._stats["buckets"].get(bk, 0) + 1

        ent = self._ss_buf.get(key)
        mark = self._ss_mark.get(key)
        if ent is not None and ent[1] and mark is not None \
                and mark == (len(ent[1]) - 1, self._step_seq):
            batch, stgs = ent
            j = len(stgs) - 1
            cols14, conc0, lost0 = stgs[j]
            idxs = cols14[0]
            slist = None
            for dev, sl in pend["silk2"]:
                if isinstance(dev, _SSFrame) and dev.batch is batch \
                        and dev.j == j:
                    slist = sl
                    break
            n_good = len(slist)
            assert n_good + n <= cap
            rows = slice(n_good, n_good + n)
            idxs[rows] = sidx
            if conc0 is None:
                conc0 = [_dummy_conceal_cols(cap, frame, order),
                         _dummy_conceal_cols(cap, frame, order),
                         np.zeros(cap, dtype=bool),
                         np.zeros((0,), dtype=np.int32),
                         np.zeros((0, frame), dtype=np.int32),
                         np.zeros((0, frame), dtype=np.int32),
                         np.zeros((0, frame), dtype=np.int32),
                         np.zeros((0, frame), dtype=np.int32)]
                lost0 = np.zeros(cap, dtype=bool)
            for dst, src in zip(conc0[0], sm_m):
                dst[rows] = src
            for dst, src in zip(conc0[1], sm_s):
                dst[rows] = src
            conc0[2][rows] = has_side
            conc0[3] = np.concatenate(
                [conc0[3], np.arange(n_good, n_good + n,
                                     dtype=np.int32)])
            for ci, arr in ((4, m_randc), (5, m_cngec),
                            (6, s_randc), (7, s_cngec)):
                conc0[ci] = np.concatenate([conc0[ci], arr])
            lost0[rows] = True
            # lost rows: decode cols dup row 0 (valid numerics, masked
            # away); flags2 is (2, cap); pred rows carry the PREVIOUS
            # predictors; glue stays False
            for a in cols14[1:11]:
                a[rows] = a[:1]
            cols14[11][:, rows] = cols14[11][:, :1]
            cols14[12][rows] = pred
            cols14[13][rows] = False
            stgs[j] = [cols14, conc0, lost0]
            slist.extend(sidx)
            return
        # conceal-only window frame (every stream lost this step, or
        # the window just dispatched). Pad rows point at the
        # out-of-range state row self.n: gathers clamp, scatters DROP,
        # so pads need no input consistency.
        if ent is None:
            self._ss_buf[key] = ent = (_SSBatch(self), [])
        batch, stgs = ent
        pad = cap - n
        idxs = np.asarray(sidx + [self.n] * pad, dtype=np.int32)

        def padded(v):
            return np.concatenate(
                [v, np.zeros((pad,) + v.shape[1:], v.dtype)]) if pad \
                else v

        def zc(*s, dt=np.int32):
            return np.zeros(s, dtype=dt)

        zdec = (zc(cap, frame), zc(cap, 2, MAX_LPC_ORDER),
                zc(cap, 4, 5), zc(cap, 4, 4), zc(cap, 3, 4, dt=bool))
        cols14 = (idxs,) + zdec \
            + tuple(np.copy(a) for a in zdec) \
            + (zc(2, cap), padded(pred), zc(cap, 2, dt=bool))
        conc0 = [tuple(padded(c) for c in sm_m),
                 tuple(padded(c) for c in sm_s),
                 padded(has_side),
                 np.arange(n, dtype=np.int32),
                 m_randc, m_cngec, s_randc, s_cngec]
        lost0 = np.concatenate(
            [np.ones(n, dtype=bool), np.zeros(pad, dtype=bool)])
        h = batch.frame(len(stgs))
        stgs.append([cols14, conc0, lost0])
        pend["silk2"].append((h, sidx))
        if len(stgs) >= self._ss_k:
            self._ss_dispatch(key)

    def _silk2_plc_group(self, items, fs: int, dfp: int, pend,
                         frame_ms: int = 20):
        """Batched stereo concealment: per-channel host preps -> the
        fused conceal/CNG/MS->LR/resample step, one launch per
        concealed frame (dfp launches for 40/60 ms payloads, deepening
        lossCnt carried by the host trackers; frame_ms=10 conceals one
        nb_subfr=2 frame). items: (stream_idx,
        ([(mid_prep, side_prep_or_None)] * dfp, prev_pred))."""
        for f in range(dfp):
            self._silk2_plc_frame(
                [(i, (preps[f][0], preps[f][1], pred))
                 for i, (preps, pred) in items], fs, pend, frame_ms)

    def _silk2_plc_frame(self, items, fs: int, pend,
                         frame_ms: int = 20):
        n = len(items)
        sidx = [it[0] for it in items]
        cap = self._cap_silk2[fs] if self.fixed_buckets else _pow2_cap(n)
        bk = ("silk2_plc", fs, frame_ms, cap)
        self._stats["buckets"][bk] = self._stats["buckets"].get(bk, 0) + 1
        pad = cap - n
        idxs = np.asarray(sidx + [sidx[0]] * pad, dtype=np.int32)
        order = 16 if fs == 16 else 10
        frame = frame_ms * fs
        dummy = dict(rand=np.zeros(frame, dtype=np.int32),
                     A=np.zeros(MAX_LPC_ORDER, dtype=np.int32),
                     B4=np.zeros((4, 5), dtype=np.int32),
                     lag4=np.full(4, 2 * fs, dtype=np.int32),
                     inv_gain=np.int32(1), prev_gain=np.int32(1),
                     cng_exc=np.zeros(frame, dtype=np.int32),
                     cng_a=np.zeros(MAX_LPC_ORDER, dtype=np.int32),
                     cng_gain=np.int32(0), cng_first=True)

        def prep_of(b, ch):
            it = items[b if b < n else 0][1]
            p = it[0] if ch == 0 else it[1]
            return p if p is not None else dummy

        def cols(ch):
            ps = [prep_of(b, ch) for b in range(cap)]
            g3 = np.stack([[int(p["inv_gain"]), int(p["prev_gain"]),
                            int(p["cng_gain"])] for p in ps]
                          ).astype(np.int32)
            return (jnp.asarray(np.stack([p["rand"] for p in ps])),
                    jnp.asarray(np.stack([p["A"] for p in ps])),
                    jnp.asarray(np.stack([p["B4"] for p in ps])),
                    jnp.asarray(np.stack([p["lag4"] for p in ps])),
                    jnp.asarray(g3),
                    jnp.asarray(np.stack([p["cng_exc"] for p in ps])),
                    jnp.asarray(np.stack([p["cng_a"] for p in ps])),
                    jnp.asarray(np.array([bool(p["cng_first"])
                                          for p in ps])))

        has_side = np.array(
            [(items[b if b < n else 0][1][1] is not None)
             for b in range(cap)])
        pred = np.stack([np.asarray(items[b if b < n else 0][1][2],
                                    dtype=np.int32) for b in range(cap)])
        st = self._silk2_bucket(fs)
        out48, st2 = _silk2_plc_pool_step(
            st, jnp.asarray(idxs), *cols(0), *cols(1),
            jnp.asarray(has_side), jnp.asarray(pred), fs=fs, order=order,
            out_khz=self._out_khz, nb=frame_ms // 5)
        self.silk2_buckets[fs] = st2
        pend["silk2"].append((out48, sidx))

    def _silk2_group(self, items, fs: int, nfr: int, pend,
                     frame_ms: int = 20):
        """Generic adapter: stereo per-stream param-dict lists (one dict
        per internal frame) -> columnar mid/side arrays ->
        _silk2_launch, one launch per internal frame (nfr sequential
        launches of the SAME compiled core for 40/60 ms payloads,
        silk_Decode :1481 frame loop; frame_ms=10 payloads are
        single-frame nb_subfr=2). Glue crossfades apply only to the
        first frame after a concealment run."""
        sidx = [it[0] for it in items]
        ncol = np.asarray(items[0][1][0]["mid"]["B"]).shape[0]
        dummy = self._dummy_silk_params(fs, frame_ms, ncol)
        glue = self._glue_arrays2(sidx) if self.rfc_plc else None
        for f in range(nfr):
            frames = [(i, sps[f]) for i, sps in items]
            mid = {key: np.stack([np.asarray(it[1]["mid"][key])
                                  for it in frames])
                   for key in self._SILK_KEYS}
            side = {key: np.stack(
                [np.asarray((it[1]["side"] or dummy)[key])
                 for it in frames]) for key in self._SILK_KEYS}
            has_side = np.array([it[1]["side"] is not None
                                 for it in frames])
            reset = np.array([bool(it[1]["side_reset"])
                              for it in frames])
            pred = np.stack([np.asarray(it[1]["pred"], dtype=np.int32)
                             for it in frames])
            dev = self._silk2_launch(sidx, mid, side, has_side, reset,
                                     pred, fs,
                                     glue=glue if f == 0 else None,
                                     nb=frame_ms // 5)
            pend["silk2"].append((dev, sidx))

    def _glue_arrays2(self, sidx):
        """Per-channel glue flags for stereo streams (first good frame
        after a concealment run). Returns (n, 2) bool or None."""
        n = len(sidx)
        flags = np.zeros((n, 2), dtype=bool)
        for b, i in enumerate(sidx):
            for ch in range(2):
                if self.native:
                    t = self._plc_trk2.get((i, ch))
                    if t is None:
                        continue
                else:
                    silk = self.scalar[i].silk
                    if silk is None:
                        continue
                    t = silk.channel_states[ch]
                if getattr(t, "plc_last_frame_lost", 0):
                    flags[b, ch] = True
                    t.plc_last_frame_lost = 0
        if not flags.any():
            return None
        return flags

    def _silk2_launch(self, sidx, mid, side, has_side, reset, pred,
                      fs: int, glue=None, nb: int = 4):
        """Batched stereo SILK: mid core launch for all rows, side core
        launch masked per row (no-side rows keep state and contribute a
        zero side frame, mirroring silk_Decode :397-415), device MS->LR
        unmix, then both channels through the batched resampler. nb:
        subframes per frame (2 = 10 ms payloads). Returns the device
        pcm (cap, 2, L_out)."""
        st = self._silk2_bucket(fs)
        n = len(sidx)
        cap = self._cap_silk2[fs] if self.fixed_buckets else _pow2_cap(n)
        bk = ("silk2", fs, nb, cap)
        self._stats["buckets"][bk] = self._stats["buckets"].get(bk, 0) + 1
        pad = cap - n
        idxs = np.asarray(list(sidx) + [sidx[0]] * pad, dtype=np.int32)
        order = 16 if fs == 16 else 10

        def padded(v):
            return np.concatenate([v, np.repeat(v[:1], pad, 0)]) if pad \
                else v

        def pack(d):
            return (padded(d["exc"]), padded(d["A"]), padded(d["B"]),
                    padded(np.stack([d["gains"], d["inv"], d["lag"],
                                     d["adj"]], axis=1).astype(np.int32)),
                    padded(np.stack([d["voiced"], d["rewhiten"],
                                     d["match"]], axis=1).astype(bool)))

        flags2 = padded(np.stack([has_side, reset],
                                 axis=1).astype(np.int32)).T.copy()
        garr = padded(glue) if glue is not None \
            else np.zeros((cap, 2), dtype=bool)
        if self._ss_hyb and fs == 16:
            # hybrid superstep: defer — paired with the CELT staging by
            # _hyb_collect at the end of this step
            cols = (idxs,) + pack(mid) + pack(side) \
                + (flags2, padded(pred.astype(np.int32)), garr)
            return ("hdef_s", cols, fs, nb)
        if self._ss_silk:
            # superstep mode: buffer this frame's columns; ONE K-frame
            # device program per bucket when the window fills (or at
            # flush). has_glue compiles in statically (rfc_plc) — an
            # all-False glue row is an exact passthrough. Entries are
            # [cols14, conceal|None, lost|None] — _silk2_plc_group_ss
            # amends this step's entry with masked conceal rows.
            key = ("silk2", fs, nb)
            if key not in self._ss_buf:
                self._ss_buf[key] = (_SSBatch(self), [])
            batch, stgs = self._ss_buf[key]
            h = batch.frame(len(stgs))
            stgs.append([(idxs,) + pack(mid) + pack(side)
                         + (flags2, padded(pred.astype(np.int32)), garr),
                         None, None])
            self._ss_mark[key] = (len(stgs) - 1, self._step_seq)
            if len(stgs) >= self._ss_k:
                self._ss_dispatch(key)
            return h
        cols = (idxs,) + pack(mid) + pack(side) \
            + (flags2, padded(pred.astype(np.int32)), garr)
        return self._silk2_dispatch_frame(cols, fs,
                                          has_glue=glue is not None,
                                          nb=nb)

    def _silk2_dispatch_frame(self, cols, fs: int, has_glue: bool,
                              nb: int = 4):
        order = 16 if fs == 16 else 10
        out48, st2 = _silk2_pool_step(
            self._silk2_bucket(fs), *jax.device_put(list(cols)),
            fs=fs, order=order, has_glue=has_glue,
            out_khz=self._out_khz, nb=nb)
        self.silk2_buckets[fs] = st2
        return out48

    def warmup(self):
        """Pre-compile the device buckets this pool will hit (both CELT
        transient variants + each SILK rate at full capacity), so the
        first real frames run at steady-state speed."""
        for sp in self._ms_subs.values():
            sp.warmup()
        for sp in self._kind_subs.values():
            sp.warmup()
        if self._t_mode:
            from ..ops.celt.jax_synthesis import (DECODE_BUFFER_SIZE,
                                                  OVERLAP)
            C = 2 if self.channels == 2 else 1
            cap = self.n
            stg = np.zeros((cap, _CELT_HDR + 2 * NB_EBANDS + C * 960),
                           dtype=np.int16)
            stg[:, 4] = 21
            stg[:, 17] = 1
            if self._ss_k > 1:
                # superstep mode compiles ONLY the K-frame program
                dmT = jnp.zeros((self.channels,
                                 DECODE_BUFFER_SIZE + OVERLAP, cap), I32)
                pre = jnp.zeros((cap, self.channels), I32)
                stgK = np.broadcast_to(
                    stg, (self._ss_k,) + stg.shape).copy()
                pcmK, dmT, pre = _celt_pool_superstep_T(
                    dmT, pre, jnp.asarray(stgK), LM=3, C=C,
                    CC=self.channels, chunk=13, masked=True,
                    downsample=self.downsample,
                    interpret=self._t_interp)
                if self.output == "host":
                    np.asarray(pcmK)
                return
            for masked in (False, True):
                dmT = jnp.zeros((self.channels,
                                 DECODE_BUFFER_SIZE + OVERLAP, cap), I32)
                pre = jnp.zeros((cap, self.channels), I32)
                outs = _celt_pool_step_packed_T(
                    dmT, pre, jnp.asarray(stg), LM=3, C=C,
                    CC=self.channels, chunk=13, masked=masked,
                    downsample=self.downsample,
                    interpret=self._t_interp)
            if self.output == "host":
                for p in outs[:-2]:
                    np.asarray(p)
            return
        if any(p[0] in ("celt", "hybrid", "hybrid2") for p in self.path):
            cap = self._cap_celt
            from . import batch_celt as bc
            C = 2 if self.channels == 2 else 1
            stg = np.zeros((cap, _CELT_HDR + 2 * NB_EBANDS + C * 960),
                           dtype=np.int16)
            stg[:, 0] = np.arange(cap, dtype=np.int16)
            stg[:, 4] = 21   # end band
            ident = cap == self.state["decode_mem"].shape[0]
            # compile BOTH packed variants (identity and gather/scatter):
            # a padded or reordered bucket mid-stream selects the
            # non-identity program, which would otherwise stall on a
            # fresh compile — the exact hiccup warmup exists to prevent
            variants = (True, False) if ident else (False,)
            for chunk in (13, 62):   # both comb-chunk variants
                for idv in variants:
                    st = bc.make_state(cap, self.channels)
                    outs = _celt_pool_step_packed(
                        st["decode_mem"], st["preemph"], jnp.asarray(stg),
                        LM=3, C=C, CC=self.channels, chunk=chunk,
                        identity=idv, downsample=self.downsample)
            if self.output == "host":
                for p in outs[:-2]:
                    np.asarray(p)   # prime the int16 D2H path too
        for fs, cap in self._cap_silk.items():
            st = self._silk_bucket(fs)
            frame = 20 * fs
            order = 16 if fs == 16 else 10
            if self._ss_silk:
                # superstep pools compile ONLY the K-frame program
                K = self._ss_k
                pcmK, st2 = _silk_pool_superstep(
                    st, jnp.zeros((K, cap), dtype=I32),
                    jnp.zeros((K, cap, frame), dtype=I32),
                    jnp.zeros((K, cap, 2, MAX_LPC_ORDER), dtype=I32),
                    jnp.zeros((K, cap, 4, 5), dtype=I32),
                    jnp.zeros((K, cap, 4, 4), dtype=I32),
                    jnp.zeros((K, cap, 3, 4), dtype=bool),
                    jnp.zeros((K, cap), dtype=bool),
                    jnp.zeros(K, dtype=bool),
                    fs=fs, nb=4, order=order, frame=frame,
                    has_glue=self.rfc_plc, out_khz=self._out_khz)
                self.silk_buckets[fs] = st2
                if self.output == "host":
                    np.asarray(pcmK)
                if self._ss_silk1 and self.rfc_plc:
                    # also pre-compile the lossy (decode|conceal) window
                    # program the first lost packet would otherwise
                    # stall on

                    def z(*s, dt=I32):
                        return jnp.zeros(s, dtype=dt)

                    pcmK, st3 = _silk_pool_superstep_lossy(
                        self.silk_buckets[fs], z(K, cap),
                        z(K, cap, frame),
                        z(K, cap, 2, MAX_LPC_ORDER), z(K, cap, 4, 5),
                        z(K, cap, 4, 4), z(K, cap, 3, 4, dt=bool),
                        z(K, cap, dt=bool), z(K, cap, dt=bool),
                        z(K, cap, frame), z(K, cap, order),
                        z(K, cap, 4, 5), z(K, cap, 4), z(K, cap, 3),
                        z(K, cap, frame), z(K, cap, order),
                        z(K, cap, dt=bool), z(K, dt=bool),
                        fs=fs, nb=4, order=order, frame=frame,
                        out_khz=self._out_khz)
                    self.silk_buckets[fs] = st3
                    if self.output == "host":
                        np.asarray(pcmK)
                continue
            zl = jnp.zeros((cap, frame), dtype=I32)
            sjc.silk_core_frame(
                st["outBuf"][:cap], st["sLPC"][:cap], zl,
                jnp.zeros((cap, 2, MAX_LPC_ORDER), dtype=I32),
                jnp.zeros((cap, 4, 5), dtype=I32),
                jnp.full((cap, 4), 65536, dtype=I32),
                jnp.full((cap, 4), 1, dtype=I32),
                jnp.full((cap, 4), 2 * fs, dtype=I32),
                jnp.zeros((cap, 4), dtype=bool),
                jnp.zeros((cap, 4), dtype=bool),
                jnp.full((cap, 4), 65536, dtype=I32),
                jnp.ones((cap, 4), dtype=bool),
                fs_khz=fs, nb_subfr=4, order=order)
            sjc.resample_batch(st["sIIR"][:cap], st["sFIR"][:cap],
                               st["delay"][:cap], zl, fs_in_khz=fs,
                               fs_out_khz=self._out_khz, in_len=frame)
        if self._ss_silk:
            s2_fms = sorted({p[4] for p in self.path
                             if p[0] == "silk2"}) or [20]
            for fs, cap in self._cap_silk2.items():
                # stereo superstep pools compile ONLY the K-frame program
                st = self._silk2_bucket(fs)
                order = 16 if fs == 16 else 10
                K = self._ss_k

                def z(*s, dt=I32):
                    return jnp.zeros(s, dtype=dt)

                for fms in s2_fms:
                    frame = fms * fs
                    nb = fms // 5
                    pcmK, st2 = _silk2_pool_superstep(
                        self._silk2_bucket(fs), z(K, cap),
                        z(K, cap, frame), z(K, cap, 2, MAX_LPC_ORDER),
                        z(K, cap, 4, 5), z(K, cap, 4, 4),
                        z(K, cap, 3, 4, dt=bool),
                        z(K, cap, frame), z(K, cap, 2, MAX_LPC_ORDER),
                        z(K, cap, 4, 5), z(K, cap, 4, 4),
                        z(K, cap, 3, 4, dt=bool),
                        z(K, 2, cap), z(K, cap, 2), z(K, cap, 2, dt=bool),
                        z(K, dt=bool), fs=fs, order=order,
                        has_glue=self.rfc_plc, out_khz=self._out_khz,
                        nb=nb)
                    self.silk2_buckets[fs] = st2
                    if self.output == "host":
                        np.asarray(pcmK)
                    if self._ss_silk2 and self.rfc_plc:
                        # pre-compile the stereo lossy window program too
                        conc = (z(K, cap, frame), z(K, cap, order),
                                z(K, cap, 4, 5), z(K, cap, 4),
                                z(K, cap, 3), z(K, cap, frame),
                                z(K, cap, order), z(K, cap, dt=bool)) * 2 \
                            + (z(K, cap, dt=bool),)
                        pcmK, st3 = _silk2_pool_superstep_lossy(
                            self.silk2_buckets[fs], z(K, cap),
                            z(K, cap, frame), z(K, cap, 2, MAX_LPC_ORDER),
                            z(K, cap, 4, 5), z(K, cap, 4, 4),
                            z(K, cap, 3, 4, dt=bool),
                            z(K, cap, frame), z(K, cap, 2, MAX_LPC_ORDER),
                            z(K, cap, 4, 5), z(K, cap, 4, 4),
                            z(K, cap, 3, 4, dt=bool),
                            z(K, 2, cap), z(K, cap, 2),
                            z(K, cap, 2, dt=bool), z(K, cap, dt=bool),
                            conc, z(K, dt=bool), fs=fs, order=order,
                            out_khz=self._out_khz, nb=nb)
                        self.silk2_buckets[fs] = st3
                        if self.output == "host":
                            np.asarray(pcmK)
        if self._ss_hyb1:
            # mono-hybrid superstep: compile the K-frame fused program
            # for each frame duration the pool carries (20 ms -> LM 3 /
            # nb 4; 10 ms -> LM 2 / nb 2)
            K = self._ss_k
            cap_c = self._cap_celt
            cap_s = self._cap_silk[16]

            def z1(*s, dt=I32):
                return jnp.zeros(s, dtype=dt)

            for frame_ms in sorted({p[2] for p in self.path
                                    if p[0] == "hybrid"}):
                LM = 3 if frame_ms == 20 else 2
                nb = 4 if frame_ms == 20 else 2
                W1 = _CELT_HDR + 2 * NB_EBANDS + frame_ms * 48
                frame = frame_ms * 16
                mixedK, dm, pre, st2 = _hybrid1_pool_superstep(
                    self.state["decode_mem"], self.state["preemph"],
                    self._silk_bucket(16),
                    jnp.zeros((K, cap_c, W1), dtype=jnp.int16),
                    z1(K, cap_s), z1(K, cap_s, frame),
                    z1(K, cap_s, 2, MAX_LPC_ORDER), z1(K, cap_s, 4, 5),
                    z1(K, cap_s, 4, 4), z1(K, cap_s, 3, 4, dt=bool),
                    z1(K, cap_s, dt=bool), z1(K, cap_c), z1(K, dt=bool),
                    LM=LM, C=1, CC=self.channels, chunk=13, fs=16,
                    nb=nb, order=16, has_glue=self.rfc_plc,
                    out_khz=self._out_khz, downsample=self.downsample)
                self.state["decode_mem"] = dm
                self.state["preemph"] = pre
                self.silk_buckets[16] = st2
                if self.output == "host":
                    np.asarray(mixedK)
        if self._ss_hyb:
            # stereo-hybrid superstep pools compile ONLY the K-frame
            # fused SILK+CELT+mix program (chunk=13, the always-safe
            # comb variant; the 62 variant compiles on first use), one
            # per frame duration the pool carries (20 ms -> LM 3 / nb 4;
            # 10 ms -> LM 2 / nb 2)
            K = self._ss_k
            cap_c = self._cap_celt
            cap_s = self._cap_silk2[16]

            def z(*s, dt=I32):
                return jnp.zeros(s, dtype=dt)

            for frame_ms in sorted({p[2] for p in self.path
                                    if p[0] == "hybrid2"}):
                LM = 3 if frame_ms == 20 else 2
                nb = frame_ms // 5
                W = _CELT_HDR + 2 * NB_EBANDS + 2 * frame_ms * 48
                frame = frame_ms * 16
                mixedK, dm, pre, st2 = _hybrid2_pool_superstep(
                    self.state["decode_mem"], self.state["preemph"],
                    self._silk2_bucket(16),
                    jnp.zeros((K, cap_c, W), dtype=jnp.int16),
                    z(K, cap_s), z(K, cap_s, frame),
                    z(K, cap_s, 2, MAX_LPC_ORDER), z(K, cap_s, 4, 5),
                    z(K, cap_s, 4, 4), z(K, cap_s, 3, 4, dt=bool),
                    z(K, cap_s, frame), z(K, cap_s, 2, MAX_LPC_ORDER),
                    z(K, cap_s, 4, 5), z(K, cap_s, 4, 4),
                    z(K, cap_s, 3, 4, dt=bool),
                    z(K, 2, cap_s), z(K, cap_s, 2),
                    z(K, cap_s, 2, dt=bool),
                    z(K, cap_c), z(K, dt=bool),
                    LM=LM, C=2, CC=self.channels, chunk=13, fs=16,
                    order=16, has_glue=self.rfc_plc,
                    out_khz=self._out_khz, downsample=self.downsample,
                    nb=nb)
                self.state["decode_mem"] = dm
                self.state["preemph"] = pre
                self.silk2_buckets[16] = st2
                if self.output == "host":
                    np.asarray(mixedK)

    def final_ranges(self):
        """Per-stream range-coder state after the last decoded packet — the
        OPUS_GET_FINAL_RANGE conformance probe (reference
        src/opus_decoder.cpp:375), exported for stream-health monitoring."""
        out = []
        krng = {key: sp.final_ranges()
                for key, sp in self._kind_subs.items()}
        for i in range(self.n):
            kind = self.path[i][0]
            if kind == "sub":
                out.append(krng[self.path[i][1]][self.path[i][2]])
            elif kind == "scalar":
                out.append(self.scalar[i].final_range)
            elif kind == "ms":
                d = self._ms_decs.get(i)
                out.append(d.final_range if d is not None else None)
            elif kind == "msb":
                # multistream final range = XOR of the elementary
                # decoders' ranges (opus_multistream_decoder_ctl,
                # src/opus_decoder.cpp:956-975)
                sub_rng = {k: sp.final_ranges()
                           for k, sp in self._ms_subs.items()}
                r = 0
                for key, row in self._ms_parents[i]:
                    v = sub_rng[key][row]
                    if v is None:
                        r = None
                        break
                    r ^= v
                out.append(r)
            elif kind in ("celt", "hybrid", "hybrid2"):
                h = self.celt_hosts[i]
                r = int(h.st.rng) if self.native else int(h.rng)
                out.append(r & 0xFFFFFFFF)
            else:   # silk, silk2: exported by the host symbol phase
                out.append(self._last_rng.get(i))
        return out

    def stats(self) -> dict:
        """Decode statistics: frame/byte/sample counters per path kind plus
        a (bucket-key -> launches) histogram of the device buckets hit —
        the observability surface for a farm deployment (the reference has
        only per-frame serial logging, src/main.cpp)."""
        self._flush()
        active = sum(1 for i in range(self.n)
                     if self.positions[i] < len(self.streams[i].jobs))
        out = dict(self._stats, buckets=dict(self._stats["buckets"]),
                   phase_s=dict(self._phase_s),
                   streams=self.n, active_streams=active)
        if self._kind_subs:
            # heterogeneous pool: the lifted rows' work happened in the
            # kind sub-pools — merge their counters so the parent's
            # stats describe the whole population
            out["kind_subs"] = {}
            for key, sp in self._kind_subs.items():
                sub = sp.stats()
                # NOT samples_out: _assemble_subs already adds drained
                # sub-pool samples to the parent counter, so merging the
                # sub-pools' own count would double it (r04 advice)
                for k in ("frames", "bytes_in",
                          "frames_celt", "frames_silk", "frames_hybrid",
                          "frames_scalar", "frames_lost", "frames_fec"):
                    out[k] += sub[k]
                for bk, v in sub["buckets"].items():
                    out["buckets"][bk] = out["buckets"].get(bk, 0) + v
                for ph, v in sub["phase_s"].items():
                    out["phase_s"][ph] += v
                out["kind_subs"][key] = dict(
                    streams=sp.n, superstep_k=sp._ss_k,
                    frames=sub["frames"],
                    frames_scalar=sub["frames_scalar"])
        return out

    def sync(self):
        """Block until every dispatched device step has executed (the
        state pytrees chain step-to-step, so readiness of the newest
        state proves the whole pipeline ran). Used to bound timing
        windows in device-output mode, where nothing else blocks."""
        self._flush()
        import jax
        if self._dev_exec is not None:
            # join the dispatch thread: its queue drains in order, so a
            # barrier task proves every submitted step executed
            self._dev_exec.submit(
                lambda: jax.block_until_ready(
                    self.state["decode_mem"])).result()
        jax.block_until_ready(self.state["decode_mem"])
        for st in list(self.silk_buckets.values()) \
                + list(self.silk2_buckets.values()):
            jax.block_until_ready(st["outBuf"])
        for sp in self._ms_subs.values():
            sp.sync()
        for sp in self._kind_subs.values():
            sp.sync()

    def _assemble_subs(self):
        """Pull each kind-lifted row's PCM from its sub-pool into the
        parent row (heterogeneous superstep pools; see __init__)."""
        if not self._kind_subs:
            return
        sub_pcm = {key: sp.drain() for key, sp in self._kind_subs.items()}
        for i, (key, slot) in self._kind_ref.items():
            a = sub_pcm[key][slot]
            if a.shape[0]:
                self.pcm_out[i].append(a)
                self._stats["samples_out"] += a.shape[0]

    def _assemble_ms(self):
        """Interleave the elementary-stream sub-pools' PCM into each
        batched-multistream parent row per its channel-mapping table
        (RFC 7845 §5.1.1 semantics — channel c reads decoded-channel
        mapping[c], where coupled stream k contributes channels 2k/2k+1
        and mono stream j contributes channel 2*coupled + (j - coupled);
        the reference does the same per-sample in
        opus_copy_channel_out_short, src/opus_decoder.cpp:886-902)."""
        if not self._ms_subs:
            return
        sub_pcm = {key: sp.drain() for key, sp in self._ms_subs.items()}
        for i, refs in self._ms_parents.items():
            head = self.streams[i].head
            chans = [sub_pcm[key][row] for key, row in refs]
            n = chans[0].shape[0]
            if n == 0:
                continue
            cc = head.coupled_count
            out = np.zeros((n, head.channel_count), dtype=np.int16)
            for c in range(head.channel_count):
                m = head.mapping[c]
                if m == 255:
                    continue            # silent channel
                if m < 2 * cc:
                    out[:, c] = chans[m >> 1][:, m & 1]
                else:
                    out[:, c] = chans[cc + (m - 2 * cc)][:, 0]
            self.pcm_out[i].append(out)
            self._stats["samples_out"] += n

    def drain(self):
        """Return the PCM decoded since the last drain (list of
        (n_i, channels) int16 per stream) and clear the buffers — the
        serving-style consumption API (bounded memory on endless streams)."""
        self._flush()
        if self._dev_out:
            held, self._dev_out = self._dev_out, []
            for pend in held:
                self._route(pend)
        self._assemble_ms()
        self._assemble_subs()
        out = [np.concatenate(p) if p else
               np.zeros((0, self.channels), dtype=np.int16)
               for p in self.pcm_out]
        self.pcm_out = [[] for _ in range(self.n)]
        return out

    def save_checkpoint(self, path: str) -> None:
        """Snapshot the complete decode state (device pytrees, native host
        structs, scalar decoders, cursors) for preemptible-safe resume."""
        self.sync()     # flush + join the dispatch thread before reading
        from ..utils import checkpoint
        checkpoint.save(self, path)

    def load_checkpoint(self, path: str) -> None:
        """Restore a snapshot taken by save_checkpoint onto this pool
        (must be constructed over the same sources)."""
        from ..utils import checkpoint
        checkpoint.load(self, path)

    def run(self, loss=None, fec=False):
        """Decode everything; returns a list of (n_i, channels) int16.
        loss: optional callable (stream_idx, packet_idx) -> bool marking
        packets lost in transit (concealed, not decoded). fec=True
        reconstructs lost SILK/hybrid frames from the next packet's
        in-band LBRR when that packet arrived (was not itself lost)."""
        while True:
            lost = set()
            fec_set = set()
            if loss is not None:
                for i in range(self.n):
                    k = self.positions[i]
                    if k >= len(self.streams[i].jobs) or not loss(i, k):
                        continue
                    lost.add(i)
                    if fec and k + 1 < len(self.streams[i].jobs) \
                            and not loss(i, k + 1):
                        fec_set.add(i)
            if not self.step(lost, fec_set):
                break
        return self.collected()

    def collected(self):
        """PCM accumulated so far per stream (without clearing): flush
        the pipeline, fetch device-held output, and assemble
        multistream/kind-lifted sub-pool rows into their parents."""
        self._flush()
        if self._dev_out:   # device-output mode: fetch everything held
            held, self._dev_out = self._dev_out, []
            for pend in held:
                self._route(pend)
        self._assemble_ms()
        self._assemble_subs()
        return [np.concatenate(p) if p else
                np.zeros((0, self.channels), dtype=np.int16)
                for p in self.pcm_out]
