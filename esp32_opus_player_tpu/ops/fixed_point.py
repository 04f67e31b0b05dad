"""Bit-exact fixed-point primitives shared by host (scalar) and device code.

Semantics mirror the reference macro layer (reference src/celt.h:252-430,
src/silk.h:50-156) including its quirks:
  * MULT16_32_Q16 wraps the 16x32 product to int32 BEFORE the >>16
    (reference src/celt.h:256 casts before shifting) — this deviates from
    upstream libopus and is reproduced faithfully.
  * MULT16_32_Q15 shifts the full 48-bit product, then truncates to int32.
  * silk_SMULWB/SMLAWB round toward -inf (arithmetic shift of the product).

Two call styles:
  - Python-int scalar ops (suffix-free functions) used by the sequential host
    symbol walk; values are plain ints, wrapped explicitly.
  - Array ops work on numpy or jax.numpy int32 arrays (module-agnostic: all
    operators used behave identically in both), used by the dense DSP path.
    TPUs have no int64, so 16x32 and 32x32 products are computed via hi/lo
    decomposition that is exact for the value ranges the codec produces.
"""
from __future__ import annotations

_M32 = 0xFFFFFFFF
_M16 = 0xFFFF


def s32(x: int) -> int:
    """Wrap a Python int to signed 32-bit (two's complement)."""
    x &= _M32
    return x - 0x100000000 if x & 0x80000000 else x


def s16(x: int) -> int:
    x &= _M16
    return x - 0x10000 if x & 0x8000 else x


def u32(x: int) -> int:
    return x & _M32


# ---------------------------------------------------------------------------
# scalar (Python int) ops — host symbol-walk path
# ---------------------------------------------------------------------------

def SAT16(x: int) -> int:
    return 32767 if x > 32767 else (-32768 if x < -32768 else x)


def MULT16_16(a: int, b: int) -> int:
    return s32(s16(a) * s16(b))


def MULT16_16_16(a: int, b: int) -> int:
    # reference keeps this as a plain product in int space (src/celt.h:337)
    return s16(a) * s16(b)


def MULT16_16_Q15(a: int, b: int) -> int:
    return MULT16_16(a, b) >> 15


def MULT16_16_Q14(a: int, b: int) -> int:
    return MULT16_16(a, b) >> 14


def MULT16_16_P15(a: int, b: int) -> int:
    return s32(16384 + MULT16_16(a, b)) >> 15


def MULT16_32_Q15(a: int, b: int) -> int:
    """((int64)a*b) >> 15, truncated to int32 (src/celt.h:263)."""
    return s32((s16(a) * s32(b)) >> 15)


def MULT16_32_Q16(a: int, b: int) -> int:
    """(int32)(a*b) >> 16 — product wraps to int32 FIRST (src/celt.h:256)."""
    return s32(s16(a) * s32(b)) >> 16


def MULT32_32_Q31(a: int, b: int) -> int:
    return s32((s32(a) * s32(b)) >> 31)


def MAC16_16(c: int, a: int, b: int) -> int:
    return ADD32(c, MULT16_16(a, b))


def MAC16_32_Q15(c: int, a: int, b: int) -> int:
    # c + a*(b>>15) + ((a*(b&0x7fff))>>15), all in wrapping int32
    # (src/celt.h:348)
    b = s32(b)
    return ADD32(c, ADD32(MULT16_16(a, b >> 15),
                          MULT16_16(a, b & 0x7FFF) >> 15))


def MAC16_32_Q16(c: int, a: int, b: int) -> int:
    b = s32(b)
    return ADD32(c, ADD32(MULT16_16(a, b >> 16),
                          (s16(a) * (b & 0xFFFF)) >> 16))


def ADD32(a: int, b: int) -> int:
    return s32(s32(a) + s32(b))


def SUB32(a: int, b: int) -> int:
    return s32(s32(a) - s32(b))


def ADD16(a: int, b: int) -> int:
    return s16(s16(a) + s16(b))


def SUB16(a: int, b: int) -> int:
    return s16(a) - s16(b)


def SHL16(a: int, shift: int) -> int:
    return s16((a & _M16) << shift)


def SHL32(a: int, shift: int) -> int:
    return s32((a & _M32) << shift)


def SHR16(a: int, shift: int) -> int:
    return s16(a) >> shift


def SHR32(a: int, shift: int) -> int:
    return s32(a) >> shift


def PSHR32(a: int, shift: int) -> int:
    return SHR32(ADD32(a, 1 << shift >> 1), shift)


def VSHR32(a: int, shift: int) -> int:
    return SHR32(a, shift) if shift > 0 else SHL32(a, -shift)


def ROUND16(x: int, a: int) -> int:
    return s16(PSHR32(x, a))


def SATURATE(x: int, a: int) -> int:
    return a if x > a else (-a if x < -a else x)


def ADD32_ovflw(a: int, b: int) -> int:
    return s32((u32(a) + u32(b)))


def SUB32_ovflw(a: int, b: int) -> int:
    return s32((u32(a) - u32(b)))


def NEG32_ovflw(a: int) -> int:
    return s32(0x100000000 - u32(a))


def FRAC_MUL16(a: int, b: int) -> int:
    return (16384 + s16(a) * s16(b)) >> 15


def EC_ILOG(x: int) -> int:
    return x.bit_length()


def celt_udiv(n: int, d: int) -> int:
    assert d > 0
    return u32(n) // u32(d)


def celt_sudiv(n: int, d: int) -> int:
    assert d > 0
    # C int division truncates toward zero
    q = abs(n) // d
    return -q if n < 0 else q


def QCONST16(x: float, bits: int) -> int:
    return int(0.5 + x * (1 << bits))


def QCONST32(x: float, bits: int) -> int:
    return int(0.5 + x * (1 << bits))


# ---------------------------------------------------------------------------
# array ops — numpy / jax.numpy int32 arrays (dense device path)
# ---------------------------------------------------------------------------
# These rely only on operators with identical semantics in numpy and
# jax.numpy on int32: wrapping +,-,*, arithmetic >>, logical &,|,^, <<.

def arr_sat16(x):
    return x.clip(-32768, 32767)


def arr_mult16_32_q15(a, b):
    """Exact ((int64)a16*b32)>>15 using hi/lo split, int32-only.

    a must be int16-range; exact because a*(b>>15) stays within int32 for
    all in-spec codec data, and wrapping beyond that matches the C cast.
    """
    lo = b & 0x7FFF
    hi = b >> 15
    return a * hi + ((a * lo) >> 15)


def arr_mult16_32_q16(a, b):
    """Reference MULT16_32_Q16: product wrapped to int32, THEN >>16."""
    return (a * b) >> 16


def arr_mac16_32_q15(c, a, b):
    return c + a * (b >> 15) + ((a * (b & 0x7FFF)) >> 15)


def arr_mult16_16(a, b):
    return a * b


def arr_mult16_16_q15(a, b):
    return (a * b) >> 15


def arr_mult16_16_p15(a, b):
    return (16384 + a * b) >> 15


def arr_mult32_32_q31(a, b):
    """Exact ((int64)a*b)>>31 (mod 2^32) via hi/lo split on int32 arrays.

    a = ah*2^16 + al, b = bh*2^16 + bl (ah,bh signed, al,bl in [0,2^16)):
      (a*b)>>31 = 2*ah*bh + floor((m1 + m2)/2^15)
    with m1 = ah*bl (|m1| < 2^31) and m2 = al*bh + bits[16:32) of al*bl
    (no int32 overflow in either), and the floored sum computed carry-safely.
    """
    al = a & 0xFFFF
    ah = a >> 16
    bl = b & 0xFFFF
    bh = b >> 16
    low = al * bl                      # wraps; only bits [16:32) needed
    m1 = ah * bl
    m2 = al * bh + ((low >> 16) & 0xFFFF)
    carry = ((m1 & 0x7FFF) + (m2 & 0x7FFF)) >> 15
    return (ah * bh << 1) + (m1 >> 15) + (m2 >> 15) + carry


def arr_pshr32(x, shift):
    return (x + (1 << shift >> 1)) >> shift


def arr_vshr32(x, shift):
    return (x >> shift) if shift > 0 else (x << -shift)
