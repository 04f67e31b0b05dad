"""Golden tests for the LP variable-cutoff transition filter, the
analysis filterbank, the alt biquads and the LUT sigmoid
(ops/silk/lp_cutoff.py) against the COMPILED reference silk.cpp
(tests/oracle/build/ref_dsp.so — the unmodified reference source built
as a shared object; these utilities are dead code on its decode path,
reference src/silk.cpp:1226-1301,:447-558,:3715)."""
import ctypes
import pathlib
import subprocess

import numpy as np
import pytest

from esp32_opus_player_tpu.ops.silk import lp_cutoff as lp

ORACLE_DIR = pathlib.Path(__file__).parent / "oracle"
SO = ORACLE_DIR / "build" / "ref_dsp.so"

# g++ Itanium-mangled names of the reference's (C++-linkage) symbols
SYM_SIGM = "_Z13silk_sigm_Q15i"
SYM_ANA = "_Z20silk_ana_filt_bank_1PKsPiPsS2_i"
SYM_LP = "_Z23silk_LP_variable_cutoffP13silk_LP_statePsi"
SYM_BQ1 = "_Z23silk_biquad_alt_stride1PKsPKiS2_PiPsi"
SYM_BQ2 = "_Z25silk_biquad_alt_stride2_cPKsPKiS2_PiPsi"

I16P = ctypes.POINTER(ctypes.c_int16)
I32P = ctypes.POINTER(ctypes.c_int32)


class RefLPState(ctypes.Structure):
    _fields_ = [("In_LP_State", ctypes.c_int32 * 2),
                ("transition_frame_no", ctypes.c_int32),
                ("mode", ctypes.c_int32),
                ("saved_fs_kHz", ctypes.c_int32)]


@pytest.fixture(scope="module")
def ref():
    if not SO.exists():
        subprocess.run(["make", str(SO.relative_to(ORACLE_DIR))],
                       cwd=ORACLE_DIR, check=True)
    lib = ctypes.CDLL(str(SO))
    getattr(lib, SYM_SIGM).restype = ctypes.c_int32
    getattr(lib, SYM_SIGM).argtypes = [ctypes.c_int32]
    getattr(lib, SYM_ANA).restype = None
    getattr(lib, SYM_ANA).argtypes = [I16P, I32P, I16P, I16P,
                                      ctypes.c_int32]
    getattr(lib, SYM_LP).restype = None
    getattr(lib, SYM_LP).argtypes = [ctypes.POINTER(RefLPState), I16P,
                                     ctypes.c_int32]
    getattr(lib, SYM_BQ1).restype = None
    getattr(lib, SYM_BQ1).argtypes = [I16P, I32P, I32P, I32P, I16P,
                                      ctypes.c_int32]
    getattr(lib, SYM_BQ2).restype = None
    getattr(lib, SYM_BQ2).argtypes = [I16P, I32P, I32P, I32P, I16P,
                                      ctypes.c_int32]
    return lib


def _p16(a):
    return a.ctypes.data_as(I16P)


def _p32(a):
    return a.ctypes.data_as(I32P)


def test_sigm_q15_exhaustive(ref):
    f = getattr(ref, SYM_SIGM)
    for q5 in range(-260, 261):
        assert lp.sigm_q15(q5) == f(q5), q5


def test_ana_filt_bank_1_golden(ref):
    rng = np.random.default_rng(7)
    f = getattr(ref, SYM_ANA)
    S_ref = np.zeros(2, dtype=np.int32)
    S_my = [0, 0]
    S_b = np.zeros((1, 2), dtype=np.int32)
    import jax.numpy as jnp
    Sb = jnp.asarray(S_b)
    for _ in range(6):   # carried state across calls
        x = rng.integers(-32768, 32768, 160, dtype=np.int16)
        lo = np.zeros(80, dtype=np.int16)
        hi = np.zeros(80, dtype=np.int16)
        f(_p16(x), _p32(S_ref), _p16(lo), _p16(hi), 160)
        myL, myH = lp.ana_filt_bank_1(x, S_my)
        assert np.array_equal(myL, lo) and np.array_equal(myH, hi)
        bL, bH, Sb = lp.ana_filt_bank_1_batch(
            jnp.asarray(x[None].astype(np.int32)), Sb)
        assert np.array_equal(np.asarray(bL)[0], lo.astype(np.int32))
        assert np.array_equal(np.asarray(bH)[0], hi.astype(np.int32))
    assert S_my == list(S_ref)
    assert np.array_equal(np.asarray(Sb)[0], S_ref)


@pytest.mark.parametrize("ind,fac", [(0, 0), (0, 20000), (1, 40000),
                                     (2, 65535), (3, 1), (4, 0)])
def test_biquad_alt_golden(ref, ind, fac):
    rng = np.random.default_rng(ind * 100 + 1)
    B, A = lp.interpolate_filter_taps(ind, fac)
    Ba = np.asarray(B, dtype=np.int32)
    Aa = np.asarray(A, dtype=np.int32)
    f1 = getattr(ref, SYM_BQ1)
    x = rng.integers(-32768, 32768, 240, dtype=np.int16)
    S_ref = np.zeros(2, dtype=np.int32)
    out_ref = np.zeros(240, dtype=np.int16)
    f1(_p16(x), _p32(Ba), _p32(Aa), _p32(S_ref), _p16(out_ref), 240)
    S_my = [0, 0]
    mine = lp.biquad_alt_stride1(x, B, A, S_my)
    assert np.array_equal(mine, out_ref) and S_my == list(S_ref)
    # batched jax form
    import jax.numpy as jnp
    yb, Sb = lp.biquad_alt_batch(
        jnp.asarray(x[None].astype(np.int32)),
        jnp.asarray(Ba[None]), jnp.asarray(Aa[None]),
        jnp.zeros((1, 2), dtype=jnp.int32))
    assert np.array_equal(np.asarray(yb)[0], out_ref.astype(np.int32))
    assert np.array_equal(np.asarray(Sb)[0], S_ref)
    # stride-2 (interleaved stereo)
    f2 = getattr(ref, SYM_BQ2)
    x2 = rng.integers(-32768, 32768, (120, 2), dtype=np.int16)
    x2c = np.ascontiguousarray(x2.reshape(-1))
    S4_ref = np.zeros(4, dtype=np.int32)
    out2_ref = np.zeros(240, dtype=np.int16)
    f2(_p16(x2c), _p32(Ba), _p32(Aa), _p32(S4_ref), _p16(out2_ref), 120)
    S4_my = [0, 0, 0, 0]
    mine2 = lp.biquad_alt_stride2(x2, B, A, S4_my)
    assert np.array_equal(mine2.reshape(-1), out2_ref)
    assert S4_my == list(S4_ref)


@pytest.mark.parametrize("mode", [1, -1])
def test_lp_variable_cutoff_golden(ref, mode):
    """Full transition run (the encoder's bandwidth smoother schedule):
    state carried across frames, coefficients walked along the
    interpolation index each call."""
    rng = np.random.default_rng(42 + mode)
    f = getattr(ref, SYM_LP)
    st_ref = RefLPState()
    st_ref.mode = mode
    st_ref.transition_frame_no = 0 if mode > 0 else lp.TRANSITION_FRAMES
    st_my = lp.LPState(mode=mode,
                       transition_frame_no=st_ref.transition_frame_no)
    for _ in range(40):
        x = rng.integers(-32768, 32768, 320, dtype=np.int16)
        buf = x.copy()
        f(ctypes.byref(st_ref), _p16(buf), 320)
        mine = lp.lp_variable_cutoff(st_my, x)
        assert np.array_equal(mine, buf)
        assert st_my.transition_frame_no == st_ref.transition_frame_no
        assert st_my.in_lp_state == list(st_ref.In_LP_State)
    # bypass mode: identity
    st0 = lp.LPState(mode=0)
    x = rng.integers(-32768, 32768, 320, dtype=np.int16)
    assert np.array_equal(lp.lp_variable_cutoff(st0, x), x)
