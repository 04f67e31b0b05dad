"""Variable-cutoff low-pass transition filter + analysis filterbank +
sigmoid — the last remaining SILK DSP utilities of the reference source
surface (reference src/silk.cpp:1226-1301 silk_LP_interpolate_filter_taps /
silk_LP_variable_cutoff, :483-558 silk_biquad_alt_stride1/2, :447-479
silk_ana_filt_bank_1, :3715-3736 silk_sigm_Q15).

These functions are DEAD CODE on the reference's decode path — zero call
sites reachable from silk_Decode (they served the encoder's bandwidth-
switching smoother upstream). They are provided here as standalone,
bit-exact ops so the component inventory is complete: a user porting
code that called them (e.g. an encoder-side bandwidth switcher) finds
the same math. Each has a scalar reference form (exact Python ints, the
golden model) and, where batching makes sense on TPU, a jitted batched
form (streams on the leading axis, lax.scan over time — the recurrence
axis is serial per stream, exactly like the resampler allpass chains).

Golden-tested against the compiled reference silk.cpp itself
(tests/oracle builds ref_dsp.so; tests/test_lp_cutoff.py compares)."""
from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from . import macros as m
from .jax_core import rshift_round, sat16, smulwb

I32 = jnp.int32

# silk.h:332-337 — TRANSITION_TIME_MS 5120, MAX_FRAME_LENGTH_MS 20
TRANSITION_NB = 3
TRANSITION_NA = 2
TRANSITION_INT_NUM = 5
TRANSITION_FRAMES = 5120 // 20          # 256
TRANSITION_INT_STEPS = TRANSITION_FRAMES // (TRANSITION_INT_NUM - 1)  # 64

# silk.cpp:93-97 — elliptic filter interpolation points
TRANSITION_LP_B_Q28 = np.array(
    [[250767114, 501534038, 250767114],
     [209867381, 419732057, 209867381],
     [170987846, 341967853, 170987846],
     [131531482, 263046905, 131531482],
     [89306658, 178584282, 89306658]], dtype=np.int64)
TRANSITION_LP_A_Q28 = np.array(
    [[506393414, 239854379],
     [411067935, 169683996],
     [306733530, 116694253],
     [185807084, 77959395],
     [35497197, 57401098]], dtype=np.int64)

# silk.cpp:34-35 — first-order allpass coefficients (Q15-ish)
A_FB1_20 = 5394 << 1
A_FB1_21 = -24290

# silk.cpp:376-380 — sigmoid LUTs
SIGM_LUT_SLOPE_Q10 = (237, 153, 73, 30, 12, 7)
SIGM_LUT_POS_Q15 = (16384, 23955, 28861, 31213, 32178, 32548)
SIGM_LUT_NEG_Q15 = (16384, 8812, 3906, 1554, 589, 219)


def sigm_q15(in_q5: int) -> int:
    """silk_sigm_Q15 (silk.cpp:3715): LUT+interp logistic sigmoid."""
    in_q5 = int(in_q5)
    if in_q5 < 0:
        in_q5 = -in_q5
        if in_q5 >= 6 * 32:
            return 0
        ind = in_q5 >> 5
        return SIGM_LUT_NEG_Q15[ind] - m.SMULBB(SIGM_LUT_SLOPE_Q10[ind],
                                                in_q5 & 0x1F)
    if in_q5 >= 6 * 32:
        return 32767
    ind = in_q5 >> 5
    return SIGM_LUT_POS_Q15[ind] + m.SMULBB(SIGM_LUT_SLOPE_Q10[ind],
                                            in_q5 & 0x1F)


def interpolate_filter_taps(ind: int, fac_q16: int):
    """silk_LP_interpolate_filter_taps (silk.cpp:1226): piece-wise
    linear interpolation between the elliptic-filter anchor points.
    Returns (B_Q28[3], A_Q28[2]) as Python-int lists."""
    B_T, A_T = TRANSITION_LP_B_Q28, TRANSITION_LP_A_Q28
    if ind < TRANSITION_INT_NUM - 1:
        if fac_q16 > 0:
            if fac_q16 < 32768:
                B = [m.SMLAWB(int(B_T[ind][i]),
                              int(B_T[ind + 1][i] - B_T[ind][i]), fac_q16)
                     for i in range(TRANSITION_NB)]
                A = [m.SMLAWB(int(A_T[ind][i]),
                              int(A_T[ind + 1][i] - A_T[ind][i]), fac_q16)
                     for i in range(TRANSITION_NA)]
            else:
                B = [m.SMLAWB(int(B_T[ind + 1][i]),
                              int(B_T[ind + 1][i] - B_T[ind][i]),
                              fac_q16 - (1 << 16))
                     for i in range(TRANSITION_NB)]
                A = [m.SMLAWB(int(A_T[ind + 1][i]),
                              int(A_T[ind + 1][i] - A_T[ind][i]),
                              fac_q16 - (1 << 16))
                     for i in range(TRANSITION_NA)]
            return B, A
        return list(map(int, B_T[ind])), list(map(int, A_T[ind]))
    return (list(map(int, B_T[TRANSITION_INT_NUM - 1])),
            list(map(int, A_T[TRANSITION_INT_NUM - 1])))


def biquad_alt_stride1(x, B_Q28, A_Q28, S):
    """silk_biquad_alt_stride1 (silk.cpp:483): second-order ARMA in
    direct form II transposed, split-precision AR taps. Scalar-exact
    reference form: x int16 array, S 2-element int32 list (mutated).
    Returns the filtered int16 array."""
    a0u, a0l = m.s32(-A_Q28[0]) >> 14, m.s32(-A_Q28[0]) & 0x3FFF
    a1u, a1l = m.s32(-A_Q28[1]) >> 14, m.s32(-A_Q28[1]) & 0x3FFF
    out = np.zeros(len(x), dtype=np.int16)
    for k in range(len(x)):
        inval = int(x[k])
        out32_q14 = m.LSHIFT32(m.SMLAWB(S[0], B_Q28[0], inval), 2)
        s0 = m.ADD32(S[1], m.RSHIFT_ROUND(m.SMULWB(out32_q14, a0l), 14))
        s0 = m.SMLAWB(s0, out32_q14, a0u)
        S[0] = m.SMLAWB(s0, B_Q28[1], inval)
        s1 = m.RSHIFT_ROUND(m.SMULWB(out32_q14, a1l), 14)
        s1 = m.SMLAWB(s1, out32_q14, a1u)
        S[1] = m.SMLAWB(s1, B_Q28[2], inval)
        out[k] = m.SAT16(m.s32(out32_q14 + (1 << 14) - 1) >> 14)
    return out


def biquad_alt_stride2(x, B_Q28, A_Q28, S):
    """silk_biquad_alt_stride2 (silk.cpp:518): interleaved-stereo
    variant (state [4], two channels per step). x: (N, 2) int16;
    S: 4-element int32 list (mutated). Returns (N, 2) int16."""
    out = np.zeros_like(x, dtype=np.int16)
    Sc = [[S[0], S[2]], [S[1], S[3]]]
    for ch in range(2):
        Sch = [Sc[0][ch], Sc[1][ch]]
        out[:, ch] = biquad_alt_stride1(x[:, ch], B_Q28, A_Q28, Sch)
        Sc[0][ch], Sc[1][ch] = Sch
    S[0], S[2] = Sc[0]
    S[1], S[3] = Sc[1]
    return out


def ana_filt_bank_1(x, S):
    """silk_ana_filt_bank_1 (silk.cpp:447): first-order allpass
    analysis split into low/high half-bands (Q10 internal). x int16
    array of even length, S 2-element int32 list (mutated). Returns
    (outL, outH) int16 arrays of length N//2."""
    n2 = len(x) // 2
    outL = np.zeros(n2, dtype=np.int16)
    outH = np.zeros(n2, dtype=np.int16)
    for k in range(n2):
        in32 = m.LSHIFT32(int(x[2 * k]), 10)
        Y = m.SUB32(in32, S[0])
        X = m.SMLAWB(Y, Y, A_FB1_21)
        out1 = m.ADD32(S[0], X)
        S[0] = m.ADD32(in32, X)
        in32 = m.LSHIFT32(int(x[2 * k + 1]), 10)
        Y = m.SUB32(in32, S[1])
        X = m.SMULWB(Y, A_FB1_20)
        out2 = m.ADD32(S[1], X)
        S[1] = m.ADD32(in32, X)
        outL[k] = m.SAT16(m.RSHIFT_ROUND(m.ADD32(out2, out1), 11))
        outH[k] = m.SAT16(m.RSHIFT_ROUND(m.SUB32(out2, out1), 11))
    return outL, outH


@dataclass
class LPState:
    """silk_LP_state (silk.h:630): the transition filter's carried
    state. mode > 0 switches the cutoff up, < 0 down, 0 = bypass."""
    in_lp_state: list = field(default_factory=lambda: [0, 0])
    transition_frame_no: int = 0
    mode: int = 0
    saved_fs_khz: int = 0


def lp_variable_cutoff(st: LPState, frame):
    """silk_LP_variable_cutoff (silk.cpp:1269): per-frame coefficient
    interpolation along the transition schedule + in-place ARMA filter.
    frame: int16 array. Returns the filtered frame (st mutated)."""
    assert 0 <= st.transition_frame_no <= TRANSITION_FRAMES
    if st.mode == 0:
        return np.asarray(frame, dtype=np.int16)
    fac_q16 = m.LSHIFT32(TRANSITION_FRAMES - st.transition_frame_no,
                         16 - 6)
    ind = fac_q16 >> 16
    fac_q16 -= ind << 16
    assert 0 <= ind < TRANSITION_INT_NUM
    B, A = interpolate_filter_taps(ind, fac_q16)
    st.transition_frame_no = max(
        0, min(st.transition_frame_no + st.mode, TRANSITION_FRAMES))
    return biquad_alt_stride1(frame, B, A, st.in_lp_state)


# ---------------------------------------------------------------------------
# batched TPU forms (streams on the leading axis, lax.scan over time)
# ---------------------------------------------------------------------------

@jax.jit
def biquad_alt_batch(x, B_Q28, A_Q28, S):
    """Batched biquad_alt_stride1: x (B, N) int32-valued int16 range,
    B_Q28 (B, 3) / A_Q28 (B, 2) per-row taps, S (B, 2) carried state.
    Returns (out (B, N) int16-range int32, S'). Bit-exact vs the
    scalar form per row."""
    a0 = -A_Q28[:, 0]
    a1 = -A_Q28[:, 1]
    a0u, a0l = a0 >> 14, a0 & 0x3FFF
    a1u, a1l = a1 >> 14, a1 & 0x3FFF
    b0, b1, b2 = B_Q28[:, 0], B_Q28[:, 1], B_Q28[:, 2]

    def step(S, xk):
        out32 = (S[:, 0] + smulwb(b0, xk)) << 2
        s0 = S[:, 1] + rshift_round(smulwb(out32, a0l), 14)
        s0 = s0 + smulwb(out32, a0u) + smulwb(b1, xk)
        s1 = rshift_round(smulwb(out32, a1l), 14)
        s1 = s1 + smulwb(out32, a1u) + smulwb(b2, xk)
        y = sat16((out32 + (1 << 14) - 1) >> 14)
        return jnp.stack([s0, s1], axis=1), y

    S, ys = jax.lax.scan(step, S.astype(I32), x.T.astype(I32))
    return ys.T, S


@jax.jit
def ana_filt_bank_1_batch(x, S):
    """Batched ana_filt_bank_1: x (B, N) int16-range int32 (N even),
    S (B, 2) carried Q10 state. Returns (outL, outH, S') with
    (B, N//2) half-band outputs. Bit-exact vs the scalar form."""
    Bn = x.shape[0]
    pairs = x.reshape(Bn, -1, 2).transpose(1, 0, 2).astype(I32)

    def step(S, pk):
        in32 = pk[:, 0] << 10
        Y = in32 - S[:, 0]
        X = Y + smulwb(Y, jnp.int32(A_FB1_21))
        out1 = S[:, 0] + X
        s0 = in32 + X
        in32 = pk[:, 1] << 10
        Y = in32 - S[:, 1]
        X = smulwb(Y, jnp.int32(A_FB1_20))
        out2 = S[:, 1] + X
        s1 = in32 + X
        lo = sat16(rshift_round(out2 + out1, 11))
        hi = sat16(rshift_round(out2 - out1, 11))
        return jnp.stack([s0, s1], axis=1), (lo, hi)

    S, (loT, hiT) = jax.lax.scan(step, S.astype(I32), pairs)
    return loT.T, hiT.T, S
