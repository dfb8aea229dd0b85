"""Packed 16-byte splat record (4 x u32) carried through the sort.

The TPU analogue of the reference's 20-byte ``Splat`` wire struct
(/root/reference/src/pointcloud.rs:352-358: 4xf16 eigenvectors, 2xf16 pos,
4xf16 color).  Ours stores the *conic* form the tile rasterizer consumes:

  w0: center x | center y           (u16 fixed point, 1/scale px resolution)
  w1: a=0.5*conic_xx (e5m12u, 17b) | low 15 bits of c=0.5*conic_yy (e5m12u)
  w2: high 2 bits of c | rho16 (fixed-point correlation; b is REBUILT as
      rho * 2 sqrt(a*c)) | opacity (12-bit sqrt code)
  w3: color r g b                   (RGB9E5 shared-exponent, bias 15)

The measured reason this format exists: XLA row-gather on TPU runs at
~5 ms per million rows, while ``lax.sort`` carries extra u32 operands at
~0.65 ms per million each (in-frame) — so the record rides through the sort
instead of being gathered afterwards, and every dropped word is ~2 ms of
frame time at bonsai scale.

The conic codec was f16 through round 3 (parity with the reference's f16
eigenvectors, preprocess.wgsl:264-268); round 4's full-scale PSNR
attribution showed f16 conic rounding capped the whole pipeline at ~53 dB
vs the oracle at bonsai scale, so the same 64 bits are re-cut as
e5m12 (see the codec section below) — strictly MORE precise than both our
old format and the reference's.  Color uses RGB9E5 (9-bit mantissas,
shared 5-bit exponent): clamped-positive SH colors fit its [0, 65408]
range and its worst-case error (~0.2% of the max channel) sits well
inside the 0.5 dB PSNR budget vs the reference's f16.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np
from jax import lax


def f32_to_f16_bits(x: jnp.ndarray) -> jnp.ndarray:
    """f32 -> u32 containing the f16 bit pattern in the low 16 bits.

    Pure 32-bit integer round-to-nearest-even (bit-identical to an f16
    astype for finite inputs; values > 65504 clamp to the f16 max rather
    than rounding to inf — none of our packed quantities approach it).
    Implemented without 16-bit vector types because Mosaic (Pallas TPU) has
    no f32<->f16 vector casts; this exact path runs in BOTH the XLA
    preprocess and the fused frontend kernel, keeping them bit-identical.
    """
    xb = lax.bitcast_convert_type(x.astype(jnp.float32), jnp.uint32)
    sign = (xb >> np.uint32(16)) & np.uint32(0x8000)
    xa = jnp.minimum(jnp.abs(x), 65504.0)
    bits = lax.bitcast_convert_type(xa.astype(jnp.float32), jnp.uint32)
    e = (bits >> np.uint32(23)).astype(jnp.int32)  # biased f32 exponent
    m = bits & np.uint32(0x7FFFFF)

    # normal f16 (e >= 113): drop 13 mantissa bits with RTNE; the rounding
    # increment carries into the exponent correctly (f16 layout is monotone)
    base = (
        ((e - 112).astype(jnp.uint32) << np.uint32(10)) | (m >> np.uint32(13))
    )
    r = m & np.uint32(0x1FFF)
    inc_n = (r > 0x1000) | ((r == 0x1000) & (((m >> np.uint32(13)) & 1) == 1))
    half_norm = base + inc_n.astype(jnp.uint32)

    # subnormal f16 (103 <= e <= 112): value = round(xa * 2^24) * 2^-24
    mf = m | np.uint32(0x800000)
    s = jnp.clip(126 - e, 1, 31).astype(jnp.uint32)
    kept = mf >> s
    rbit = (mf >> (s - np.uint32(1))) & 1
    low_mask = (jnp.ones_like(mf) << (s - np.uint32(1))) - np.uint32(1)
    sticky = (mf & low_mask) != 0
    inc_s = (rbit == 1) & (sticky | ((kept & 1) == 1))
    half_sub = kept + inc_s.astype(jnp.uint32)

    # e == 102 (value in [2^-25, 2^-24)) still rounds up to the smallest
    # subnormal when above the 2^-25 tie, so the subnormal branch includes it
    half = jnp.where(
        e >= 113, half_norm, jnp.where(e >= 102, half_sub, jnp.uint32(0))
    )
    return sign | half


def f16_bits_to_f32(bits: jnp.ndarray) -> jnp.ndarray:
    """u32 low 16 bits (f16 pattern) -> f32 (exact, incl. subnormals);
    32-bit integer math only (see f32_to_f16_bits)."""
    h = bits & np.uint32(0xFFFF)
    sign_mask = jnp.where((h & np.uint32(0x8000)) != 0, -1.0, 1.0)
    exp = (h >> np.uint32(10)) & np.uint32(0x1F)
    man = (h & np.uint32(0x3FF)).astype(jnp.int32)
    f32_bits = ((h & np.uint32(0x8000)) << np.uint32(16)) | (
        ((exp + np.uint32(112)) << np.uint32(23))
        | (man.astype(jnp.uint32) << np.uint32(13))
    )
    normal = lax.bitcast_convert_type(f32_bits, jnp.float32)
    sub = sign_mask * man.astype(jnp.float32) * np.float32(5.9604645e-8)
    return jnp.where(exp == 0, sub, normal)


def pack2xf16(lo: jnp.ndarray, hi: jnp.ndarray) -> jnp.ndarray:
    return f32_to_f16_bits(lo) | (f32_to_f16_bits(hi) << 16)


def unpack2xf16(w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    return f16_bits_to_f32(w), f16_bits_to_f32(w >> 16)


# ---- e5m12 minifloat (the conic codec, round 4) ----
#
# The full-scale PSNR attribution (scripts + /tmp harness, 2026-08-20)
# showed the f16 conic rounding IS the record's quality ceiling: a
# record-quantized oracle with ONLY the conic at f16 lands at 53.15 dB on
# the bonsai-scale bench scene — within 0.4 dB of the whole pipeline's
# 52.78 — while center/rgb9e5/opacity each sit above 67 dB.  The conic
# diagonal entries are non-negative (PSD), so their f16 SIGN bits are
# wasted, and opacity doesn't need 16 bits: re-cutting w1|w2 as
#   a: e5m12 unsigned (17 bits) | b: sign + e5m12 (18) | c: e5m12 (17)
#   | opacity: 12-bit sqrt-domain code
# spends the same 64 bits with 4x finer conic mantissas (+12 dB on the
# dominant term).  Same exponent structure as f16 (bias 15), so the
# CONIC_SCALE pre-scale argument is unchanged.  All integer math (Mosaic
# has no f16 vector casts, and there is no hardware e5m12 anyway).

E5M12_MAX = np.float32(65528.0)  # (2 - 2^-12) * 2^15 — largest exp-field-30
# value, so the RTNE encode below never carries into exponent field 31


def f32_to_e5m12_bits(x: jnp.ndarray) -> jnp.ndarray:
    """|x| -> u32 with the UNSIGNED e5m12 pattern (17 value bits) in the
    low bits; exact RTNE like f32_to_f16_bits (M=12 variant: normal
    threshold e>=113 is bias-determined and unchanged; subnormal shift
    s = 136 - 12 - e; round-to-zero below e = 112 - 12).

    The codec needs no directed-rounding variant: PSD-ness of the decoded
    conic comes from the rho16 off-diagonal derivation (the decoder
    rebuilds B from the DECODED diagonal with |rho| < 1 strictly — see
    pack_record), not from any rounding discipline on a/c."""
    xa = jnp.minimum(jnp.abs(x), E5M12_MAX)
    bits = lax.bitcast_convert_type(xa.astype(jnp.float32), jnp.uint32)
    e = (bits >> np.uint32(23)).astype(jnp.int32)
    m = bits & np.uint32(0x7FFFFF)

    base = (
        ((e - 112).astype(jnp.uint32) << np.uint32(12)) | (m >> np.uint32(11))
    )
    r = m & np.uint32(0x7FF)
    inc_n = (r > 0x400) | ((r == 0x400) & (((m >> np.uint32(11)) & 1) == 1))
    norm = base + inc_n.astype(jnp.uint32)

    mf = m | np.uint32(0x800000)
    s = jnp.clip(124 - e, 1, 31).astype(jnp.uint32)
    kept = mf >> s
    rbit = (mf >> (s - np.uint32(1))) & 1
    low_mask = (jnp.ones_like(mf) << (s - np.uint32(1))) - np.uint32(1)
    sticky = (mf & low_mask) != 0
    inc_s = (rbit == 1) & (sticky | ((kept & 1) == 1))
    sub = kept + inc_s.astype(jnp.uint32)

    return jnp.where(
        e >= 113, norm, jnp.where(e >= 100, sub, jnp.uint32(0))
    )


def e5m12_bits_to_f32(bits: jnp.ndarray) -> jnp.ndarray:
    """u32 low 17 bits (unsigned e5m12) -> f32 (exact, incl. subnormals)."""
    h = bits & np.uint32(0x1FFFF)
    exp = (h >> np.uint32(12)) & np.uint32(0x1F)
    man = (h & np.uint32(0xFFF)).astype(jnp.int32)
    f32_bits = ((exp + np.uint32(112)) << np.uint32(23)) | (
        man.astype(jnp.uint32) << np.uint32(11)
    )
    normal = lax.bitcast_convert_type(f32_bits, jnp.float32)
    # subnormal value = man * 2^-26
    sub = man.astype(jnp.float32) * np.float32(1.4901161e-8)
    return jnp.where(exp == 0, sub, normal)


# 12-bit sqrt-domain opacity code: u = round(4095 * sqrt(op)), op = (u/4095)^2.
# Relative step at op ~ 1 is 2 * 2^-12 ~ 0.05% (f16-grade); at small op the
# absolute error shrinks quadratically, far below the contribution itself.
OP12_SCALE = np.float32(4095.0)
INV_OP12_SCALE = np.float32(1.0 / 4095.0)


def f32_to_op12_bits(op: jnp.ndarray) -> jnp.ndarray:
    u = jnp.round(jnp.sqrt(jnp.clip(op, 0.0, 1.0)) * OP12_SCALE)
    return u.astype(jnp.int32).astype(jnp.uint32)


def op12_bits_to_f32(bits: jnp.ndarray) -> jnp.ndarray:
    s = (bits & np.uint32(0xFFF)).astype(jnp.int32).astype(jnp.float32)
    s = s * INV_OP12_SCALE
    return s * s


def pack2xu16(lo: jnp.ndarray, hi: jnp.ndarray) -> jnp.ndarray:
    return (lo.astype(jnp.uint32) & 0xFFFF) | ((hi.astype(jnp.uint32) & 0xFFFF) << 16)


def unpack2xu16(w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    return w & jnp.uint32(0xFFFF), w >> 16


class CenterQuant(NamedTuple):
    """Static fixed-point parameters for the u16 splat-center encoding."""

    margin: float
    scale_x: float  # quantized = (px + margin) * scale
    scale_y: float

    @classmethod
    def for_viewport(cls, width: int, height: int) -> "CenterQuant":
        # Splat centers can sit off-screen: the reference culls at |ndc| <=
        # 1.2 |w| (preprocess.wgsl:189-192), i.e. up to 0.1*size outside, plus
        # slack for the screen-space extent.
        margin = 0.125 * max(width, height) + 64.0
        return cls(
            margin=margin,
            scale_x=65535.0 / (width + 2.0 * margin),
            scale_y=65535.0 / (height + 2.0 * margin),
        )


def pack_center(px: jnp.ndarray, py: jnp.ndarray, q: CenterQuant) -> jnp.ndarray:
    # f32 -> i32 -> u32: Mosaic has no direct f32->u32 cast (values are
    # clipped non-negative, so the i32 hop is exact)
    qx = jnp.clip(jnp.round((px + q.margin) * q.scale_x), 0, 65535).astype(jnp.int32).astype(jnp.uint32)
    qy = jnp.clip(jnp.round((py + q.margin) * q.scale_y), 0, 65535).astype(jnp.int32).astype(jnp.uint32)
    return pack2xu16(qx, qy)


def unpack_center(w0: jnp.ndarray, q: CenterQuant) -> Tuple[jnp.ndarray, jnp.ndarray]:
    qx, qy = unpack2xu16(w0)
    px = qx.astype(jnp.float32) / q.scale_x - q.margin
    py = qy.astype(jnp.float32) / q.scale_y - q.margin
    return px, py


# RGB9E5 (shared-exponent HDR color): 9-bit mantissas, 5-bit exponent,
# bias 15.  Encodes non-negative values in [0, 65408].
RGB9E5_BIAS = 15
RGB9E5_MANT_BITS = 9
RGB9E5_MAX = 65408.0  # (511/512) * 2^(31-15)


def pack_rgb9e5(r: jnp.ndarray, g: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pack three non-negative f32 channels -> one u32 (r | g<<9 | b<<18 | e<<27)."""
    r = jnp.clip(r, 0.0, RGB9E5_MAX)
    g = jnp.clip(g, 0.0, RGB9E5_MAX)
    b = jnp.clip(b, 0.0, RGB9E5_MAX)
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    # floor(log2(maxc)) from the f32 exponent field (maxc > 0)
    bits = lax.bitcast_convert_type(jnp.maximum(maxc, 1e-30), jnp.uint32)
    floor_log2 = (bits >> 23).astype(jnp.int32) - 127
    exp_shared = jnp.clip(floor_log2 + RGB9E5_BIAS + 1, 0, 31)
    # scale = 2^(exp_shared - BIAS - MANT_BITS); biased f32 exponent is
    # exp_shared - 24 + 127 = exp_shared + 103 (always in (0, 255))
    scale = lax.bitcast_convert_type(
        ((exp_shared + 103) << 23).astype(jnp.uint32), jnp.float32
    )
    inv = 1.0 / scale
    # via i32: Mosaic has no direct f32->u32 cast (clipped non-negative)
    mr = jnp.clip(jnp.round(r * inv), 0, 511).astype(jnp.int32).astype(jnp.uint32)
    mg = jnp.clip(jnp.round(g * inv), 0, 511).astype(jnp.int32).astype(jnp.uint32)
    mb = jnp.clip(jnp.round(b * inv), 0, 511).astype(jnp.int32).astype(jnp.uint32)
    return mr | (mg << 9) | (mb << 18) | (exp_shared.astype(jnp.uint32) << 27)


def unpack_rgb9e5(w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """u32 -> three f32 channels (exact inverse of the encode scale)."""
    e = (w >> 27).astype(jnp.int32)
    scale = lax.bitcast_convert_type(((e + 103) << 23).astype(jnp.uint32), jnp.float32)
    r = (w & jnp.uint32(0x1FF)).astype(jnp.float32) * scale
    g = ((w >> 9) & jnp.uint32(0x1FF)).astype(jnp.float32) * scale
    b = ((w >> 18) & jnp.uint32(0x1FF)).astype(jnp.float32) * scale
    return r, g, b


# Power-of-two pre-scale applied to the conic halves/b before the f16
# encode (decode divides it back out — EXACT in f32, no precision cost).
# Why: f16 subnormals have a FIXED 2^-24 step, so a giant splat's conic
# (half_a ~ 1/(2*sigma_px^2), subnormal once sigma ≳ 90 px) carried up to
# ~6% relative error — measured as faint streak errors along big
# anisotropic splats at bench scale (round 4).  Scaling by 2^10 moves the
# subnormal onset to sigma ~ 2900 px while the top end stays far below
# f16 max (conic <= 1/l2 <= 10 from the 0.1 eigenvalue clamp -> scaled
# b <= 10240 << 65504).
CONIC_SCALE = 1024.0
INV_CONIC_SCALE = 1.0 / CONIC_SCALE


# Correlation code for the off-diagonal: the record stores rho = B / (2
# sqrt(ha*hc)) as 16-bit FIXED point instead of B itself.  Two reasons,
# both measured at bench scale (round 4):
#  1. PSD by construction: the decoder rebuilds B = rho * 2 sqrt(A'C') from
#     the DECODED diagonal, and |rho| <= 1 - 2^-15 strictly, so the
#     quadratic form can never go indefinite (independently-rounded a,b,c
#     let alpha explode into the 0.99 clamp along diagonal needles).
#  2. No cancellation: with B rounded independently, the ridge width of an
#     anisotropic splat depends on disc = 4*ha*hc - B^2, whose RELATIVE
#     error blows up by 1/(1-rho^2) — e5m12's 1.2e-4 became multi-percent
#     ridge errors on needles and held the full-scale PSNR at ~57 dB.
#     Deriving B from the decoded diagonal makes disc = 4 A'C'(1 - rho^2)
#     with every term near-exact (rho fixed-point half-step 1.5e-5).
RHO_SCALE = np.float32(65535.0)
# decode multiplier keeps |rho| < 1 STRICTLY (u = 0 / 65535 map to +-1
# minus one part in 2^15 -> disc >= ~2^-14 * 4 A'C' > 0)
RHO_DECODE = np.float32((1.0 - 2.0 ** -15))


def f32_to_rho16_bits(rho: jnp.ndarray) -> jnp.ndarray:
    u = jnp.round((jnp.clip(rho, -1.0, 1.0) + 1.0) * (0.5 * RHO_SCALE))
    return u.astype(jnp.int32).astype(jnp.uint32)


def rho16_bits_to_f32(bits: jnp.ndarray) -> jnp.ndarray:
    u = (bits & np.uint32(0xFFFF)).astype(jnp.int32).astype(jnp.float32)
    return (u * np.float32(2.0 / 65535.0) - 1.0) * RHO_DECODE


def pack_record(px, py, half_a, b, half_c, opacity, rgb, q: CenterQuant):
    """-> tuple of 4 (N,) uint32 payload words; rgb = 3 (N,) channel arrays.

    w1|w2 field layout:
      w1 = A[0:17] | C_low15[17:32]
      w2 = C_high2[0:2] | RHO16[2:18] | OP12[18:30]
    A/C = unsigned e5m12 of the CONIC_SCALE-pre-scaled halves, RHO16 the
    fixed-point correlation (see above), OP12 the sqrt-domain opacity."""
    w0 = pack_center(px, py, q)
    A = f32_to_e5m12_bits(half_a * CONIC_SCALE)
    C = f32_to_e5m12_bits(half_c * CONIC_SCALE)
    a_dec = e5m12_bits_to_f32(A)
    c_dec = e5m12_bits_to_f32(C)
    # rho against the DECODED diagonal so the reconstructed B is closest
    denom = 2.0 * jnp.sqrt(a_dec * c_dec) * INV_CONIC_SCALE
    rho = b / jnp.maximum(denom, np.float32(1e-30))
    RHO = f32_to_rho16_bits(rho)
    OP = f32_to_op12_bits(opacity)
    w1 = A | ((C & np.uint32(0x7FFF)) << np.uint32(17))
    w2 = (
        (C >> np.uint32(15))
        | (RHO << np.uint32(2))
        | (OP << np.uint32(18))
    )
    w3 = pack_rgb9e5(rgb[0], rgb[1], rgb[2])
    return w0, w1, w2, w3


def unpack_record(w0, w1, w2, w3, q: CenterQuant):
    """-> (px, py, half_a, b, half_c, opacity, r, g, b_col)."""
    px, py = unpack_center(w0, q)
    A = w1 & np.uint32(0x1FFFF)
    C = (w1 >> np.uint32(17)) | ((w2 & np.uint32(0x3)) << np.uint32(15))
    half_a = e5m12_bits_to_f32(A) * INV_CONIC_SCALE
    half_c = e5m12_bits_to_f32(C) * INV_CONIC_SCALE
    rho = rho16_bits_to_f32(w2 >> np.uint32(2))
    bb = rho * 2.0 * jnp.sqrt(half_a * half_c)
    opacity = op12_bits_to_f32(w2 >> np.uint32(18))
    r, g, b_col = unpack_rgb9e5(w3)
    return px, py, half_a, bb, half_c, opacity, r, g, b_col
