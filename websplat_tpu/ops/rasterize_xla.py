"""XLA (non-Pallas) tile rasterizer — reference fallback & CPU test path.

Consumes the same sorted packed instances + tile ranges as the Pallas kernel
and produces identical images (up to float association), so tests can verify
the Pallas kernel against it on any backend.  It pads every tile's instance
list to a static ``xla_max_per_tile`` and evaluates the front-to-back
transmittance compositing in closed form (exclusive cumprod), which is
mathematically identical to the reference's back-to-front premultiplied
``over`` blend (/root/reference/src/shaders/gaussian.wgsl:59-67 with blend
state renderer.rs:65-79).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from websplat_tpu.config import CUTOFF, RasterConfig
from websplat_tpu.ops import packing


def blend_weights(alpha: jnp.ndarray, axis: int = 0, eps: float = 0.0):
    """Front-to-back weights: w_i = alpha_i * prod_{j<i} (1 - alpha_j).

    Returns (weights, final_transmittance).
    """
    one_minus = 1.0 - alpha
    trans_incl = jnp.cumprod(one_minus, axis=axis)
    # exclusive cumprod via shift (not division) for exactness
    trans_excl = jnp.concatenate(
        [
            jnp.ones_like(jnp.take(trans_incl, jnp.array([0]), axis=axis)),
            jnp.take(trans_incl, jnp.arange(alpha.shape[axis] - 1), axis=axis),
        ],
        axis=axis,
    )
    return alpha * trans_excl, jnp.take(trans_incl, jnp.array([-1]), axis=axis)


def splat_alpha(px_c, py_c, half_a, b, half_c, opacity, pix_x, pix_y):
    """Gaussian falloff at pixel centers.

    b_frag = min(0.99, exp(-a) * opacity), discard a > 2*CUTOFF
    (gaussian.wgsl:59-67), where a = 0.5 d^T conic d in pixel units — the
    quadratic form equivalent of the reference's eigen-space interpolation
    (gaussian.wgsl:47-53: |p|^2 with offset = 2 [v1 v2] p).
    """
    dx = pix_x - px_c
    dy = pix_y - py_c
    a = half_a * dx * dx + b * dx * dy + half_c * dy * dy
    # mask-first, with the comparison rejecting NaN/inf `a`: sentinel lanes
    # may carry uninitialized payload bits (non-PSD/NaN conics) and
    # min(0.99, NaN) would poison the blend
    return jnp.where(
        (a < 2.0 * CUTOFF) & (opacity > 0.0),
        jnp.minimum(0.99, jnp.exp(-a) * opacity),
        0.0,
    )


def rasterize_xla(
    sorted_payload,
    ranges: jnp.ndarray,
    background: jnp.ndarray,
    *,
    width: int,
    height: int,
    config: RasterConfig,
):
    """-> (H, W, 3) f32 image."""
    tw, th = config.tile_w, config.tile_h
    tx_tiles, ty_tiles = config.tiles_for(width, height)
    num_tiles = tx_tiles * ty_tiles
    kmax = config.xla_max_per_tile
    cq = packing.CenterQuant.for_viewport(width, height)
    w0, w1, w2, w3 = sorted_payload
    m = w0.shape[0]

    # pixel centers for one tile (tw*th,)
    ty_ix = jnp.arange(tw * th) // tw
    tx_ix = jnp.arange(tw * th) % tw

    def tile_image(t):
        start = ranges[t]
        count = jnp.minimum(ranges[t + 1] - start, kmax)
        idx = jnp.minimum(start + jnp.arange(kmax), m - 1)
        valid = jnp.arange(kmax) < count
        px_c, py_c, ha, bb, hc, op, r, g, b_col = packing.unpack_record(
            w0[idx], w1[idx], w2[idx], w3[idx], cq
        )
        tile_x = (t % tx_tiles) * tw
        tile_y = (t // tx_tiles) * th
        pix_x = (tile_x + tx_ix).astype(jnp.float32) + 0.5  # (P,)
        pix_y = (tile_y + ty_ix).astype(jnp.float32) + 0.5
        alpha = splat_alpha(
            px_c[:, None], py_c[:, None], ha[:, None], bb[:, None], hc[:, None], op[:, None],
            pix_x[None, :], pix_y[None, :],
        )  # (K, P)
        alpha = jnp.where(valid[:, None], alpha, 0.0)
        weights, t_final = blend_weights(alpha, axis=0)
        # zero (not just zero-weight) invalid colors: NaN rgb bits from
        # uninitialized sentinel payloads would poison the weighted sum
        rgb = jnp.stack([r, g, b_col], axis=-1)  # (K, 3)
        rgb = jnp.where(valid[:, None], rgb, 0.0)
        # HIGHEST precision: TPU f32 dots default to bf16 MXU passes, which
        # visibly banding-quantizes heavily-overdrawn accumulations.
        img = jnp.einsum("kp,kc->pc", weights, rgb, precision=jax.lax.Precision.HIGHEST)
        img = img + t_final[0][:, None] * background[None, :]
        return img  # (P, 3)

    tiles = jax.vmap(tile_image)(jnp.arange(num_tiles))  # (T, P, 3)
    img = tiles.reshape(ty_tiles, tx_tiles, th, tw, 3)
    img = img.transpose(0, 2, 1, 3, 4).reshape(ty_tiles * th, tx_tiles * tw, 3)
    return img[:height, :width, :]
