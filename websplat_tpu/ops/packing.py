"""Packed 20-byte splat record (5 x u32) carried through the sort.

The TPU analogue of the reference's 20-byte ``Splat`` wire struct
(/root/reference/src/pointcloud.rs:352-358: 4xf16 eigenvectors, 2xf16 pos,
4xf16 color).  Ours stores the *conic* form the tile rasterizer consumes:

  w0: center x | center y           (u16 fixed point, 1/scale px resolution)
  w1: 0.5*conic_xx | conic_xy       (f16)
  w2: 0.5*conic_yy | opacity        (f16)
  w3: color r | color g             (f16)
  w4: color b | flags/spare         (f16)

The measured reason this format exists: XLA row-gather on TPU runs at
~5 ms per million rows, while ``lax.sort`` carries extra u32 operands at
~0.45 ms per million each — so the record rides through the sort instead of
being gathered afterwards.

f16 quantization of the conic/color is deliberate parity with the reference,
which packs the eigenvectors and color as f16 (preprocess.wgsl:264-268).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp
from jax import lax


def f32_to_f16_bits(x: jnp.ndarray) -> jnp.ndarray:
    """f32 -> u32 containing the f16 bit pattern in the low 16 bits."""
    h = x.astype(jnp.float16)
    return lax.bitcast_convert_type(h, jnp.uint16).astype(jnp.uint32)


def f16_bits_to_f32(bits: jnp.ndarray) -> jnp.ndarray:
    """u32 low 16 bits (f16 pattern) -> f32."""
    u16 = (bits & jnp.uint32(0xFFFF)).astype(jnp.uint16)
    return lax.bitcast_convert_type(u16, jnp.float16).astype(jnp.float32)


def pack2xf16(lo: jnp.ndarray, hi: jnp.ndarray) -> jnp.ndarray:
    return f32_to_f16_bits(lo) | (f32_to_f16_bits(hi) << 16)


def unpack2xf16(w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    return f16_bits_to_f32(w), f16_bits_to_f32(w >> 16)


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
    qx = jnp.clip(jnp.round((px + q.margin) * q.scale_x), 0, 65535).astype(jnp.uint32)
    qy = jnp.clip(jnp.round((py + q.margin) * q.scale_y), 0, 65535).astype(jnp.uint32)
    return pack2xu16(qx, qy)


def unpack_center(w0: jnp.ndarray, q: CenterQuant) -> Tuple[jnp.ndarray, jnp.ndarray]:
    qx, qy = unpack2xu16(w0)
    px = qx.astype(jnp.float32) / q.scale_x - q.margin
    py = qy.astype(jnp.float32) / q.scale_y - q.margin
    return px, py


def pack_record(px, py, half_a, b, half_c, opacity, rgb, q: CenterQuant):
    """-> tuple of 5 (N,) uint32 payload words."""
    w0 = pack_center(px, py, q)
    w1 = pack2xf16(half_a, b)
    w2 = pack2xf16(half_c, opacity)
    w3 = pack2xf16(rgb[:, 0], rgb[:, 1])
    w4 = pack2xf16(rgb[:, 2], jnp.zeros_like(px))
    return w0, w1, w2, w3, w4


def unpack_record(w0, w1, w2, w3, w4, q: CenterQuant):
    """-> (px, py, half_a, b, half_c, opacity, r, g, b_col)."""
    px, py = unpack_center(w0, q)
    half_a, bb = unpack2xf16(w1)
    half_c, opacity = unpack2xf16(w2)
    r, g = unpack2xf16(w3)
    b_col, _ = unpack2xf16(w4)
    return px, py, half_a, bb, half_c, opacity, r, g, b_col
