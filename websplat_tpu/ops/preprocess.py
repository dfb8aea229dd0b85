"""Preprocess: 3D Gaussians -> packed 2D screen-splat tile instances.

The TPU-native replacement for preprocess.wgsl / preprocess_compressed.wgsl
(/root/reference/src/shaders/preprocess.wgsl:163-280): one fused, vectorized
XLA elementwise pass over all N Gaussians that performs

  clipping-box cull (wgsl :177-179), view/proj transform (:181-184),
  frustum-cull with 1.2*w bounds (:189-192), walltime grow-in animation
  (:196-203), EWA projection of the 3D covariance to a 2D screen conic
  (:204-223), optional Mip-Splatting opacity correction (:226-236),
  kernel-size dilation (:238-240), closed-form 2x2 eigen-decomposition with
  the plain/compressed clamp divergence (:242-251 vs
  preprocess_compressed.wgsl:293-302), SH color evaluation (:114-154)

and then, instead of the reference's atomic stream-compaction + GPU radix
sort (:262-279), emits a *static-shaped* instance table: ``tile_slots``
(tile_id | depth)-keyed slots per splat with invalid slots keyed 0xFFFFFFFF,
to be compacted and depth-ordered by one stable sort (TPUs have no global
atomics; sorting invalid keys to the end mirrors the reference radix sort's
own padding convention, radix_sort.wgsl:79).

Covariance math note: the reference computes the 2D covariance in the
y-flipped NDC frame and rasterizes quads; we need it in pixel frame
(x right, y down).  ndc->pixel flips y, so only the off-diagonal changes
sign: cov_pix = diag(1,-1) @ cov_ndc @ diag(1,-1).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax.numpy as jnp
import numpy as np
from jax import lax

from websplat_tpu.config import CUTOFF, RasterConfig
from websplat_tpu.ops import packing
from websplat_tpu.ops.sh import eval_sh


class DeviceCloud(NamedTuple):
    """Device-resident Gaussian cloud (the reference's GPU-side PointCloud,
    /root/reference/src/pointcloud.rs:99-170).

    COLUMN-major layout: every per-splat attribute is a contiguous (N,) row,
    so the elementwise preprocess reads whole rows instead of extracting
    strided columns from (N, k) arrays (each such extraction is a TPU
    relayout pass; the 48 SH coefficient columns alone were ~half the
    preprocess time in the row-major layout).  The one-time transpose
    happens at upload (renderer.upload_cloud)."""

    xyz: jnp.ndarray  # (3, N) f32
    cov: jnp.ndarray  # (6, N) f32 (decoded from f16 wire format)
    opacity: jnp.ndarray  # (N,) f32
    sh: jnp.ndarray  # (24, N) u32: f16 coefficient pairs, flat index
    # k = 3*coef + channel; k=2p low half of row p, k=2p+1 high half
    # Optional single-DMA-stream relayout of the 34 rows above for the fused
    # frontend (ops/frontend_pallas.py:build_fat_stream): per grid step, the
    # 34 per-splat attribute blocks interleave into ONE contiguous u32 block,
    # cutting the kernel's input pipeline from 34 DMA streams to 1 (TPU-
    # measured ~0.5 ms/frame at bonsai scale).  Built once at upload; None
    # falls back to the 34-stream path (per-frame dequantized clouds, shards).
    fat: Optional[jnp.ndarray] = None  # (n_steps * 34 * 16384,) u32 or None


class CompressedDeviceCloud(NamedTuple):
    """Device-resident COMPRESSED cloud: int8/index streams + codebooks, the
    TPU analogue of the reference keeping quantized data on the GPU
    (preprocess_compressed.wgsl:137-171,216-242; npz.rs:134-154).  Expanded
    to a DeviceCloud per frame by renderer.decompress_cloud (in-jit XLA
    gathers: TPU vector units have no per-lane VMEM gather, so codebook
    indirection belongs in XLA, not the Pallas frontend)."""

    xyz: jnp.ndarray  # (3, N) f32
    opacity_q: jnp.ndarray  # (N,) i8
    opacity_scale: jnp.ndarray  # scalar f32
    opacity_zp: jnp.ndarray  # scalar f32
    scale_factor_q: Optional[jnp.ndarray]  # (N,) i8 or None
    sf_scale: jnp.ndarray  # scalar f32
    sf_zp: jnp.ndarray  # scalar f32
    covars: jnp.ndarray  # (6, C) f32 codebook
    geom_idx: jnp.ndarray  # (N,) i32
    sh_cb: jnp.ndarray  # (24, C_sh) u32 packed f16 pairs (DeviceCloud.sh layout)
    sh_idx: jnp.ndarray  # (N,) i32


class CameraParams(NamedTuple):
    """Device camera block (renderer.rs:290-343); proj includes the y-flip."""

    view: jnp.ndarray  # (4, 4)
    view_inv: jnp.ndarray  # (4, 4)
    proj: jnp.ndarray  # (4, 4)
    viewport: jnp.ndarray  # (2,) (w, h) float
    focal: jnp.ndarray  # (2,)


class DeviceSettings(NamedTuple):
    """Traced per-frame settings (renderer.rs:602-618 uniform block)."""

    clipping_box_min: jnp.ndarray  # (3,)
    clipping_box_max: jnp.ndarray  # (3,)
    gaussian_scaling: jnp.ndarray  # scalar
    max_sh_deg: jnp.ndarray  # scalar int
    mip_splatting: jnp.ndarray  # scalar bool
    kernel_size: jnp.ndarray  # scalar
    walltime: jnp.ndarray  # scalar
    scene_extend: jnp.ndarray  # scalar
    scene_center: jnp.ndarray  # (3,)


class PreprocessOut(NamedTuple):
    keys: jnp.ndarray  # (M_pad,) uint32 sort keys (tile << depth_bits | depth)
    payload: Tuple[jnp.ndarray, ...]  # 4 x (M_pad,) uint32 packed records
    num_visible: jnp.ndarray  # scalar int32 — reference's num_visible_points
    # (renderer.rs:170-189)
    num_clamped: jnp.ndarray  # scalar int32 — splats whose tile rect exceeded
    # the slot budget (coverage loss diagnostic; no reference counterpart)
    clamped_words: Optional[Tuple[jnp.ndarray, ...]] = None  # 6 x
    # (overflow_capacity,) u32: compacted (rect4, w0..w3, depth_q) rows of
    # clamped splats (rect4 == 0xFFFFFFFF sentinel tail) for the overflow
    # pass; None unless requested


class PreprocessPacked(NamedTuple):
    """Per-SPLAT outputs for the fused emission+compaction kernel
    (ops/emit_compact_pallas.py): no N*slots instance stream is materialized.
    All arrays are (N_pad,) u32, padded to the kernel's step multiple with
    rect=0 (empty slot mask)."""

    depth_q: jnp.ndarray  # quantized depth (low depth_bits)
    rect: jnp.ndarray  # tx0 | ty0<<7 | w_t<<14 | slot_mask<<18
    words: Tuple[jnp.ndarray, ...]  # 4 x packed record words
    num_visible: jnp.ndarray
    num_clamped: jnp.ndarray


def _smoothstep01(x):
    t = jnp.clip(x, 0.0, 1.0)
    return t * t * (3.0 - 2.0 * t)


def core_math(
    pos,  # (x, y, z) per-splat arrays (any shape)
    cov6,  # 6 per-splat arrays, upper-triangle [xx, xy, xz, yy, yz, zz]
    opacity_in,  # per-splat array
    sh_rows,  # indexable of 24 u32 rows (f16 pairs; see eval_sh)
    view,  # 4x4 nested tuple of scalars
    proj,  # 4x4 nested tuple of scalars
    cam_pos,  # (x, y, z) scalars (view_inv translation)
    focal,  # (fx, fy) scalars
    st,  # dict of scalar settings: cb_min/cb_max/center (3-tuples),
    # gaussian_scaling, kernel, walltime, extend, mip (bool-ish), max_sh_deg
    *,
    width: int,
    height: int,
    config: RasterConfig,
    compressed: bool,
):
    """The whole per-splat preprocess math, SHAPE-AGNOSTIC: runs on (N,)
    arrays in the XLA path and on (ROWS, 128) register blocks inside the
    fused Pallas frontend kernel (single source of truth for the reference
    semantics; every stage cited to preprocess.wgsl in the body).

    Camera/settings enter as PLAIN SCALARS (nested tuples / dict) because
    the kernel reads them from SMEM; callers with pytree inputs extract
    scalars first.  Returns a dict of per-splat arrays + the `reaches`
    closure used by the slot walk."""
    ts_x, ts_y = config.tile_w, config.tile_h
    tx_tiles, ty_tiles = config.tiles_for(width, height)
    _, depth_bits = config.key_bits(width, height)
    cq = packing.CenterQuant.for_viewport(width, height)
    x_w, y_w, z_w = pos

    # --- clipping box cull (preprocess.wgsl:177-179) ---
    cb_min, cb_max = st["cb_min"], st["cb_max"]
    inside = (
        (x_w >= cb_min[0]) & (x_w <= cb_max[0])
        & (y_w >= cb_min[1]) & (y_w <= cb_max[1])
        & (z_w >= cb_min[2]) & (z_w <= cb_max[2])
    )

    # --- transforms (preprocess.wgsl:181-184) ---
    # Written as explicit per-component arithmetic, NOT matmuls: K=3 dots gain
    # nothing from the MXU, and TPU f32 matmuls default to bf16 MXU passes
    # whose ~5e-3 relative error shifts splat centers by ~0.5 px (measured).
    # Elementwise keeps full f32 on the VPU.
    def affine3(m, v0, v1, v2):
        return tuple(
            m[i][0] * v0 + m[i][1] * v1 + m[i][2] * v2 + m[i][3] for i in range(3)
        )

    cam_x, cam_y, cam_z = affine3(view, x_w, y_w, z_w)
    clip_x, clip_y, clip_z = affine3(proj, cam_x, cam_y, cam_z)
    clip_w = proj[3][0] * cam_x + proj[3][1] * cam_y + proj[3][2] * cam_z + proj[3][3]
    bounds = 1.2 * clip_w
    z_ndc = clip_z / clip_w

    # --- frustum cull (preprocess.wgsl:189-192; compressed uses strict <,>
    #     at preprocess_compressed.wgsl:231 — identical for floats except
    #     exact 0/1, which we fold into the same test) ---
    visible = (
        (z_ndc > 0.0)
        & (z_ndc < 1.0)
        & (clip_x >= -bounds)
        & (clip_x <= bounds)
        & (clip_y >= -bounds)
        & (clip_y <= bounds)
        & inside
    )

    # --- walltime grow-in animation (preprocess.wgsl:196-203) ---
    ctr = st["center"]
    dcx, dcy, dcz = x_w - ctr[0], y_w - ctr[1], z_w - ctr[2]
    dd = 5.0 * jnp.sqrt(dcx * dcx + dcy * dcy + dcz * dcz) / st["extend"]
    scale_mod = jnp.where(st["walltime"] > dd, _smoothstep01(st["walltime"] - dd), 0.0)
    scaling = st["gaussian_scaling"] * scale_mod

    # --- EWA projection (preprocess.wgsl:204-223), explicit components ---
    sc2 = scaling * scaling
    s0, s1, s2, s3, s4, s5 = (c * sc2 for c in cov6)
    fx, fy = focal
    inv_z = 1.0 / cam_z
    # 2x3 EWA Jacobian rows (transposed column layout of preprocess.wgsl:209-219)
    j00, j02 = fx * inv_z, -fx * cam_x * inv_z * inv_z
    j11, j12 = -fy * inv_z, fy * cam_y * inv_z * inv_z
    # t = J2 @ V3 rows a, b  (t[r,c] = sum_k j2[r,k] * view[k,c])
    v = view
    a0 = j00 * v[0][0] + j02 * v[2][0]
    a1 = j00 * v[0][1] + j02 * v[2][1]
    a2 = j00 * v[0][2] + j02 * v[2][2]
    b0 = j11 * v[1][0] + j12 * v[2][0]
    b1 = j11 * v[1][1] + j12 * v[2][1]
    b2 = j11 * v[1][2] + j12 * v[2][2]
    # cov2d = t @ Vrk @ t^T with Vrk symmetric from upper-6 [xx,xy,xz,yy,yz,zz]
    sa0 = s0 * a0 + s1 * a1 + s2 * a2
    sa1 = s1 * a0 + s3 * a1 + s4 * a2
    sa2 = s2 * a0 + s4 * a1 + s5 * a2
    sb0 = s0 * b0 + s1 * b1 + s2 * b2
    sb1 = s1 * b0 + s3 * b1 + s4 * b2
    sb2 = s2 * b0 + s4 * b1 + s5 * b2
    cxx = a0 * sa0 + a1 * sa1 + a2 * sa2
    cxy = b0 * sa0 + b1 * sa1 + b2 * sa2
    cyy = b0 * sb0 + b1 * sb1 + b2 * sb2

    # --- mip splatting opacity correction (preprocess.wgsl:226-236) ---
    opacity = opacity_in
    kernel = st["kernel"]
    det0 = jnp.maximum(1e-6, cxx * cyy - cxy * cxy)
    det1 = jnp.maximum(1e-6, (cxx + kernel) * (cyy + kernel) - cxy * cxy)
    coef = jnp.sqrt(det0 / (det1 + 1e-6) + 1e-6)
    coef = jnp.where((det0 <= 1e-6) | (det1 <= 1e-6), 0.0, coef)
    opacity = jnp.where(st["mip"], opacity * coef, opacity)

    # --- dilation + eigen decomposition (preprocess.wgsl:238-251) ---
    # pixel frame: flip off-diagonal sign (see module docstring)
    diag1 = cxx + kernel
    diag2 = cyy + kernel
    off = -cxy
    mid = 0.5 * (diag1 + diag2)
    radius = jnp.sqrt(jnp.square((diag1 - diag2) / 2.0) + jnp.square(off))
    if compressed:
        # preprocess_compressed.wgsl:296-297
        r_c = jnp.maximum(radius, 0.1)
        lambda1 = mid + r_c
        lambda2 = mid - r_c
    else:
        # preprocess.wgsl:245-246
        lambda1 = mid + radius
        lambda2 = jnp.maximum(mid - radius, 0.1)
    # Degenerate lambda2 <= 0 produces NaN quads in the reference (invisible);
    # here the splat is culled explicitly.
    visible = visible & (lambda2 > 0.0)

    ev0, ev1 = off, lambda1 - diag1
    ev_norm = jnp.sqrt(ev0 * ev0 + ev1 * ev1)
    nz = ev_norm > 1e-20
    inv_n = 1.0 / jnp.maximum(ev_norm, 1e-30)
    e1x = jnp.where(nz, ev0 * inv_n, 1.0)
    e1y = jnp.where(nz, ev1 * inv_n, 0.0)

    # conic = inv(Sigma') where Sigma' = l1 e1 e1^T + l2 e2 e2^T, e2 = perp(e1)
    inv_l1 = 1.0 / lambda1
    inv_l2 = 1.0 / lambda2
    conic_a = e1x * e1x * inv_l1 + e1y * e1y * inv_l2
    conic_b = e1x * e1y * (inv_l1 - inv_l2)
    conic_c = e1y * e1y * inv_l1 + e1x * e1x * inv_l2

    # --- alpha-aware bound level (config.alpha_threshold) ---
    # a_max is the largest quadratic-form value a = ha dx^2 + hb dxdy + hc dy^2
    # at which alpha = opacity * exp(-a) still reaches the threshold:
    # a_max = min(2*CUTOFF, log(opacity / thr)).  Tiles whose minimum a over
    # the pixel box exceeds a_max contribute < thr everywhere and are not
    # emitted; the rasterizer's own discard stays at the reference 2*CUTOFF.
    thr = float(config.alpha_threshold)
    if thr > 0.0:
        a_max = jnp.minimum(
            2.0 * CUTOFF, jnp.log(jnp.maximum(opacity, 1e-30) * (1.0 / thr))
        )
        visible = visible & (opacity > thr)
    else:
        a_max = jnp.full_like(opacity, 2.0 * CUTOFF)

    # ellipse AABB semi-extents of {d : a(d) <= a_max} (= the reference's
    # fixed 2*CUTOFF box when alpha_threshold is disabled)
    sig_xx = lambda1 * e1x * e1x + lambda2 * e1y * e1y
    sig_yy = lambda1 * e1y * e1y + lambda2 * e1x * e1x
    a_max_pos = jnp.maximum(a_max, 0.0)
    ext_x = jnp.sqrt(2.0 * a_max_pos * jnp.maximum(sig_xx, 0.0))
    ext_y = jnp.sqrt(2.0 * a_max_pos * jnp.maximum(sig_yy, 0.0))

    # --- screen position (WGPU viewport transform of the flipped NDC) ---
    ndc_x = clip_x / clip_w
    ndc_y = clip_y / clip_w
    px = (ndc_x + 1.0) * 0.5 * width
    py = (1.0 - ndc_y) * 0.5 * height

    # --- SH color (preprocess.wgsl:255-260) ---
    dvx, dvy, dvz = x_w - cam_pos[0], y_w - cam_pos[1], z_w - cam_pos[2]
    inv_dn = 1.0 / jnp.maximum(
        jnp.sqrt(dvx * dvx + dvy * dvy + dvz * dvz), 1e-12
    )
    rgb_r, rgb_g, rgb_b = eval_sh(
        sh_rows, dvx * inv_dn, dvy * inv_dn, dvz * inv_dn, st["max_sh_deg"]
    )
    rgb_r = jnp.maximum(0.0, rgb_r)
    rgb_g = jnp.maximum(0.0, rgb_g)
    rgb_b = jnp.maximum(0.0, rgb_b)

    # --- depth key: f32 bit trick.  clip z >= 0 for visible splats, and the
    # bit patterns of non-negative floats are order-isomorphic to their
    # values, so the top depth_bits of the bits sort front-to-back.  (The
    # reference sorts bitcast(zfar - z) ascending = back-to-front and blends
    # in reverse; front-to-back transmittance blending is equivalent,
    # preprocess.wgsl:270-273.) ---
    z_clip_bits = lax.bitcast_convert_type(jnp.maximum(clip_z, 0.0), jnp.uint32)
    depth_q = z_clip_bits >> np.uint32(32 - depth_bits)

    # --- tile rect ---
    rx0 = jnp.floor((px - ext_x) / ts_x)
    rx1 = jnp.floor((px + ext_x) / ts_x)
    ry0 = jnp.floor((py - ext_y) / ts_y)
    ry1 = jnp.floor((py + ext_y) / ts_y)
    on_screen = (rx1 >= 0) & (rx0 < tx_tiles) & (ry1 >= 0) & (ry0 < ty_tiles)
    visible = visible & on_screen
    tx0 = jnp.clip(rx0, 0, tx_tiles - 1).astype(jnp.int32)
    tx1 = jnp.clip(rx1, 0, tx_tiles - 1).astype(jnp.int32)
    ty0 = jnp.clip(ry0, 0, ty_tiles - 1).astype(jnp.int32)
    ty1 = jnp.clip(ry1, 0, ty_tiles - 1).astype(jnp.int32)

    w_t = jnp.maximum(tx1 - tx0 + 1, 1)
    h_t = jnp.maximum(ty1 - ty0 + 1, 1)
    n_rect = w_t * h_t

    # --- packed record (shared by all slots of a splat) ---
    half_a = 0.5 * conic_a
    half_c = 0.5 * conic_c
    w0, w1, w2, w3 = packing.pack_record(
        px, py, half_a, conic_b, half_c, opacity, (rgb_r, rgb_g, rgb_b), cq
    )

    # Tight culling: a slot is only emitted if the splat's cutoff ellipse
    # actually reaches its tile — the exact minimum of the convex quadratic
    # a(d) = ha dx^2 + hb dx dy + hc dy^2 over the tile's pixel-center box
    # (unconstrained minimum if the center is inside, else the best of the
    # four clamped edge minimizers).  The reference has no equivalent (its
    # hardware quads cover the full AABB and fragments discard), so this
    # only removes zero-contribution instances.
    def rect_min_a(x0, x1, y0, y1):
        inside_r = (x0 <= 0.0) & (0.0 <= x1) & (y0 <= 0.0) & (0.0 <= y1)

        def edge_x(e):
            dy_s = jnp.clip(-conic_b * e / jnp.maximum(2.0 * half_c, 1e-20), y0, y1)
            return half_a * e * e + conic_b * e * dy_s + half_c * dy_s * dy_s

        def edge_y(e):
            dx_s = jnp.clip(-conic_b * e / jnp.maximum(2.0 * half_a, 1e-20), x0, x1)
            return half_a * dx_s * dx_s + conic_b * dx_s * e + half_c * e * e

        best = jnp.minimum(
            jnp.minimum(edge_x(x0), edge_x(x1)), jnp.minimum(edge_y(y0), edge_y(y1))
        )
        return jnp.where(inside_r, 0.0, best)

    def reaches(tx, ty):
        """ellipse-reaches-tile test for tile coords (tx, ty)."""
        bx0 = tx.astype(jnp.float32) * ts_x + 0.5 - px
        bx1 = bx0 + (ts_x - 1)
        by0 = ty.astype(jnp.float32) * ts_y + 0.5 - py
        by1 = by0 + (ts_y - 1)
        return rect_min_a(bx0, bx1, by0, by1) <= a_max

    # center tile of the rect (for the clamped-splat center-out walk):
    # INTEGER midpoint of the UNCLAMPED rect (= the splat's true center tile
    # for the symmetric-extent rect), clamped into the visible rect.  Not
    # floor(px/ts) — float rounding can differ between the XLA and Mosaic
    # compilations of the same math at tile boundaries, and the two frontends
    # must emit identical instance sets; rx0/rx1 are the exact floats tx0/tx1
    # derive from, so no new rounding class.  Using the CLAMPED midpoint here
    # shifted the walk center off the true center tile for splats cut by the
    # viewport edge, and the slot budget then dropped the center tile itself
    # (peak luminance lost, found via the two-splat e2e probe).
    lim = jnp.float32(1 << 20)
    urx0 = jnp.clip(rx0, -lim, lim).astype(jnp.int32)
    urx1 = jnp.clip(rx1, -lim, lim).astype(jnp.int32)
    ury0 = jnp.clip(ry0, -lim, lim).astype(jnp.int32)
    ury1 = jnp.clip(ry1, -lim, lim).astype(jnp.int32)
    ct_x = jnp.clip(urx0 + (urx1 - urx0) // 2, tx0, tx1)
    ct_y = jnp.clip(ury0 + (ury1 - ury0) // 2, ty0, ty1)

    return dict(
        visible=visible,
        depth_q=depth_q,
        words=(w0, w1, w2, w3),
        tx0=tx0,
        ty0=ty0,
        tx1=tx1,
        ty1=ty1,
        ct_x=ct_x,
        ct_y=ct_y,
        w_t=w_t,
        h_t=h_t,
        n_rect=n_rect,
        reaches=reaches,
        # raw per-splat values needed to rebuild `reaches` on a gathered
        # subset (overflow_emit's giant-splat grid stage)
        reach_raw=(px, py, half_a, conic_b, half_c, a_max),
    )


# Center-out candidate offset sequences for CLAMPED splats (n_rect > slots):
# the slot budget then keeps the highest-contribution tiles around the splat
# center and drops only the periphery.  (A row-major walk drops entire
# bottom rows: measured 25 -> 31 dB PSNR vs the oracle on a dense scene
# from this ordering change alone at slots=6.)  Three shape classes so
# elongated rects don't waste budget on out-of-rect candidates.


def _spiral(x_weight: float, n: int = 64):
    offs = [
        (dx, dy) for dx in range(-7, 8) for dy in range(-7, 8)
    ]
    offs.sort(key=lambda o: (o[0] * o[0] * x_weight + o[1] * o[1] / x_weight,
                             abs(o[0]) + abs(o[1]), o[1], o[0]))
    return offs[:n]


_SEQ_SQUARE = _spiral(1.0)
_SEQ_WIDE = _spiral(0.25)  # prefer x offsets (wide rects)
_SEQ_TALL = [(y, x) for (x, y) in _SEQ_WIDE]
MAX_SLOT_SEQ = len(_SEQ_SQUARE)


def iter_slots(d, slots: int, tx_tiles: int, center_out: bool = True):
    """Yield (j, slot_ok, tile) over the slot walk of `d` (= core_math
    output).

    Splats whose rect fits the budget (n_rect <= slots) take the EXACT
    row-major walk — every rect tile is enumerated, carried as incremental
    (dx, dy) instead of dy = j // w_t (integer division by a per-lane vector
    is unavailable inside Mosaic kernels).  CLAMPED splats instead take a
    center-out candidate sequence classified by rect shape; out-of-rect
    candidates waste budget only for them, and they are dropping tiles
    either way — this chooses WHICH tiles drop by contribution."""
    if center_out and slots > len(_SEQ_SQUARE):
        raise ValueError(f"tile_slots > {len(_SEQ_SQUARE)} not supported")
    dx = jnp.zeros_like(d["tx0"])
    dy = jnp.zeros_like(d["tx0"])
    # center_out=False keeps the pure row-major walk for ALL splats: the
    # standalone emit_compact kernel reconstructs tiles row-major from the
    # packed rect word, so the packed-emission path must match it (that
    # fallback serves >127-tile viewports / >8-slot budgets only)
    big = (d["n_rect"] > slots) if center_out else jnp.zeros_like(d["visible"])
    wide = d["w_t"] >= 2 * d["h_t"]
    tall = d["h_t"] >= 2 * d["w_t"]
    for j in range(slots):
        # row-major candidate (exact for small rects)
        rm_tx = d["tx0"] + dx
        rm_ty = d["ty0"] + dy
        rm_ok = (j < d["n_rect"]) & (dy < d["h_t"])
        # center-out candidate (clamped splats)
        ox = jnp.where(
            wide, _SEQ_WIDE[j][0], jnp.where(tall, _SEQ_TALL[j][0], _SEQ_SQUARE[j][0])
        )
        oy = jnp.where(
            wide, _SEQ_WIDE[j][1], jnp.where(tall, _SEQ_TALL[j][1], _SEQ_SQUARE[j][1])
        )
        co_tx = d["ct_x"] + ox
        co_ty = d["ct_y"] + oy
        co_ok = (
            (co_tx >= d["tx0"]) & (co_tx <= d["tx1"])
            & (co_ty >= d["ty0"]) & (co_ty <= d["ty1"])
        )
        tx = jnp.where(big, co_tx, rm_tx)
        ty = jnp.where(big, co_ty, rm_ty)
        tile = ty * tx_tiles + tx
        # boolean algebra, not where-on-bools (Mosaic: unsupported i1 select)
        cand_ok = (big & co_ok) | (~big & rm_ok)
        slot_ok = d["visible"] & cand_ok & d["reaches"](tx, ty)
        yield j, slot_ok, tile
        if j + 1 < slots:
            wrap = dx + 1 >= d["w_t"]
            dx = jnp.where(wrap, 0, dx + 1)
            dy = dy + wrap.astype(jnp.int32)


def scalars_from_pytrees(camera: CameraParams, settings: DeviceSettings):
    """Extract the plain-scalar camera/settings form core_math consumes."""
    view = tuple(tuple(camera.view[i, j] for j in range(4)) for i in range(4))
    proj = tuple(tuple(camera.proj[i, j] for j in range(4)) for i in range(4))
    cam_pos = tuple(camera.view_inv[i, 3] for i in range(3))
    focal = (camera.focal[0], camera.focal[1])
    st = dict(
        cb_min=tuple(settings.clipping_box_min[i] for i in range(3)),
        cb_max=tuple(settings.clipping_box_max[i] for i in range(3)),
        center=tuple(settings.scene_center[i] for i in range(3)),
        gaussian_scaling=settings.gaussian_scaling,
        kernel=settings.kernel_size,
        walltime=settings.walltime,
        extend=settings.scene_extend,
        mip=settings.mip_splatting,
        max_sh_deg=settings.max_sh_deg,
    )
    return view, proj, cam_pos, focal, st


def preprocess(
    cloud: DeviceCloud,
    camera: CameraParams,
    settings: DeviceSettings,
    *,
    width: int,
    height: int,
    config: RasterConfig,
    compressed: bool = False,
    emit: str = "slots",
    overflow_capacity: int = 0,
):
    """emit="slots": materialized (M_pad,) slot-instance stream (PreprocessOut,
    feeds lax.sort directly or the standalone compactor).  emit="packed":
    per-splat words for the fused emission+compaction kernel
    (PreprocessPacked).

    overflow_capacity > 0 (slots emit only) switches the walk to pure
    row-major — so the overflow pass's ranks [tile_slots, overflow_slots)
    complement the main pass exactly — and returns ``clamped_words``: the
    first overflow_capacity visible splats with n_rect > tile_slots as
    compacted 6-word rows (rect4, w0..w3, depth_q; rect4 == 0xFFFFFFFF
    sentinel tail), mirroring the fused frontend's cid stream."""
    n = cloud.opacity.shape[0]
    tx_tiles, ty_tiles = config.tiles_for(width, height)
    tile_bits, depth_bits = config.key_bits(width, height)

    view, proj, cam_pos, focal, st = scalars_from_pytrees(camera, settings)
    d = core_math(
        (cloud.xyz[0], cloud.xyz[1], cloud.xyz[2]),
        tuple(cloud.cov[i] for i in range(6)),
        cloud.opacity,
        cloud.sh,
        view, proj, cam_pos, focal, st,
        width=width, height=height, config=config, compressed=compressed,
    )
    visible = d["visible"]
    depth_q = d["depth_q"]
    w0, w1, w2, w3 = d["words"]
    tx0, ty0, w_t, h_t, n_rect = d["tx0"], d["ty0"], d["w_t"], d["h_t"], d["n_rect"]

    invalid_key = jnp.uint32(0xFFFFFFFF)
    slots = config.tile_slots
    keys_slots = []
    mask = jnp.zeros((n,), jnp.uint32)
    for j, slot_ok, tile in iter_slots(
        d, slots, tx_tiles,
        center_out=(emit != "packed") and overflow_capacity == 0,
    ):
        if emit == "packed":
            mask = mask | (slot_ok.astype(jnp.uint32) << np.uint32(j))
            continue
        key = jnp.where(
            slot_ok,
            (tile.astype(jnp.uint32) << np.uint32(depth_bits)) | depth_q,
            invalid_key,
        )
        keys_slots.append(key)

    if emit == "packed":
        from websplat_tpu.ops.emit_compact_pallas import (
            MASK_SHIFT,
            SPLATS,
            TX0_BITS,
            TY0_BITS,
        )

        rect_word = (
            tx0.astype(jnp.uint32)
            | (ty0.astype(jnp.uint32) << np.uint32(TX0_BITS))
            | (jnp.minimum(w_t, 15).astype(jnp.uint32)
               << np.uint32(TX0_BITS + TY0_BITS))
            | (mask << np.uint32(MASK_SHIFT))
        )
        n_pad = -(-n // SPLATS) * SPLATS
        pad = n_pad - n

        def padded(x):
            return jnp.concatenate([x, jnp.zeros((pad,), x.dtype)]) if pad else x

        return PreprocessPacked(
            depth_q=padded(depth_q),
            rect=padded(rect_word),
            words=tuple(padded(w) for w in (w0, w1, w2, w3)),
            num_visible=jnp.sum(visible.astype(jnp.int32)),
            num_clamped=jnp.sum((visible & (n_rect > slots)).astype(jnp.int32)),
        )

    # Slot-MAJOR emission: (slots, N) -> flat.  Order is irrelevant (the
    # stable sort re-orders everything; equal-key collisions are different
    # splats in the same tile at the same quantized depth, whose relative
    # order the reference leaves to GPU scheduling anyway).  Layout matters:
    # a (N, slots) interleave reshaped flat forces a tiled->linear relayout
    # scatter in XLA (~10 ms at bonsai scale); (slots, N) -> flat is a plain
    # row concatenation.
    keys = jnp.stack(keys_slots, axis=0).reshape(-1)  # (slots*N,)
    payload = tuple(
        jnp.broadcast_to(w[None, :], (slots, n)).reshape(-1) for w in (w0, w1, w2, w3)
    )

    # pad to a chunk multiple PLUS one extra chunk: a tile's last DMA starts
    # anywhere inside its span and always reads a full chunk, so the tail
    # needs chunk_size sentinel slots of headroom
    m = n * slots
    m_pad = (-(-m // config.chunk_size) + 1) * config.chunk_size
    pad = m_pad - m
    keys = jnp.concatenate([keys, jnp.full((pad,), invalid_key, jnp.uint32)])
    payload = tuple(jnp.concatenate([w, jnp.zeros((pad,), jnp.uint32)]) for w in payload)

    clamped_words = None
    if overflow_capacity > 0:
        if tx_tiles > 256 or ty_tiles > 256:
            raise ValueError(
                "overflow pass supports <=256 tiles per axis (rect4 packing);"
                " disable overflow_capacity or enlarge tiles"
            )
        # 6-word clamped-splat stream, mirroring the fused frontend's cid
        # stream: (rect4, w0..w3, depth_q) — overflow_emit decodes these
        # instead of re-gathering the cloud (see its docstring)
        cmask = visible & (n_rect > slots)
        (ids,) = jnp.nonzero(cmask, size=overflow_capacity, fill_value=n)
        ok = ids < n
        gi = jnp.where(ok, ids, 0)
        rect_all = pack_rect4(tx0, ty0, d["tx1"], d["ty1"])
        take = lambda a, fill: jnp.where(ok, a[gi], jnp.uint32(fill))
        clamped_words = (
            take(rect_all, 0xFFFFFFFF),
            take(w0, 0),
            take(w1, 0),
            take(w2, 0),
            take(w3, 0),
            take(depth_q, 0),
        )

    return PreprocessOut(
        keys=keys,
        payload=payload,
        num_visible=jnp.sum(visible.astype(jnp.int32)),
        num_clamped=jnp.sum((visible & (n_rect > slots)).astype(jnp.int32)),
        clamped_words=clamped_words,
    )


def pack_rect4(tx0, ty0, tx1, ty1):
    """Pack a clamped tile rect into one u32 (8 bits per field: tx0 | ty0<<8
    | tx1<<16 | ty1<<24, <=256 tiles per axis).  The sentinel fill 0xFFFFFFFF
    decodes to a 1x1 rect (w_t = h_t = 1, n_rect = 1 <= tile_slots), so
    sentinel rows SELF-MASK in the overflow walk and grid stages — no
    separate validity word.  A real splat can never collide: rect4 only ever
    packs rects with n_rect > tile_slots >= 1."""
    u = lambda x: x.astype(jnp.uint32)
    return (
        u(tx0)
        | (u(ty0) << np.uint32(8))
        | (u(tx1) << np.uint32(16))
        | (u(ty1) << np.uint32(24))
    )


def unpack_rect4(rect):
    i = lambda x: x.astype(jnp.int32)
    tx0 = i(rect & np.uint32(0xFF))
    ty0 = i((rect >> np.uint32(8)) & np.uint32(0xFF))
    tx1 = i((rect >> np.uint32(16)) & np.uint32(0xFF))
    ty1 = i(rect >> np.uint32(24))
    return tx0, ty0, tx1, ty1


def make_reaches(px, py, ha, hb, hc, a_max, ts_x: float, ts_y: float):
    """core_math's ellipse-reaches-tile test rebuilt from per-splat values
    (decoded record or gathered subset).  The returned callable accepts
    broadcast-compatible tile-coord arrays whose TRAILING axis matches the
    per-splat arrays (e.g. (n_tiles, g) vs (g,))."""

    def rect_min_a(x0, x1, y0, y1):
        inside_r = (x0 <= 0.0) & (0.0 <= x1) & (y0 <= 0.0) & (0.0 <= y1)

        def edge_x(e):
            dy_s = jnp.clip(-hb * e / jnp.maximum(2.0 * hc, 1e-20), y0, y1)
            return ha * e * e + hb * e * dy_s + hc * dy_s * dy_s

        def edge_y(e):
            dx_s = jnp.clip(-hb * e / jnp.maximum(2.0 * ha, 1e-20), x0, x1)
            return ha * dx_s * dx_s + hb * dx_s * e + hc * e * e

        best = jnp.minimum(
            jnp.minimum(edge_x(x0), edge_x(x1)),
            jnp.minimum(edge_y(y0), edge_y(y1)),
        )
        return jnp.where(inside_r, 0.0, best)

    def reaches(tx, ty):
        bx0 = tx.astype(jnp.float32) * ts_x + 0.5 - px
        bx1 = bx0 + (ts_x - 1)
        by0 = ty.astype(jnp.float32) * ts_y + 0.5 - py
        by1 = by0 + (ts_y - 1)
        return rect_min_a(bx0, bx1, by0, by1) <= a_max

    return reaches


def reaches_of(d, gi, ts_x: float, ts_y: float):
    """make_reaches over a gathered subset of core_math's ``reach_raw``."""
    px, py, ha, hb, hc, a_max = (a[gi] for a in d["reach_raw"])
    return make_reaches(px, py, ha, hb, hc, a_max, ts_x, ts_y)


def overflow_emit(
    cid_words,
    *,
    width: int,
    height: int,
    config: RasterConfig,
):
    """Emit the remaining rect tiles of CLAMPED splats (overflow pass).

    ``cid_words`` is the frontend's compacted 6-word clamped-splat stream —
    (rect4, w0, w1, w2, w3, depth_q), each (C,) u32 with sentinel tails
    (rect4 = 0xFFFFFFFF, which self-masks: see pack_rect4) — carrying
    everything this pass needs.  Earlier revisions carried only splat IDS
    and re-gathered all 34 cloud input streams + re-ran core_math here;
    the 34xC XLA gather alone cost ~2.2 ms/frame at bonsai scale.  The
    packed record (w0..w3) is IDENTICAL for every instance of a splat, so
    the frontend forwards it instead, and the only recomputed quantity is
    the reach cull, decoded from the record itself (the same f16/u16 values
    the rasterizer blends with — exact px/py are unavailable, but a
    boundary-tile flip at the quantization scale changes contributions only
    below the 2*CUTOFF discard).

    Three stages (coverage-complete union by row-major rank):

    1. WALK — ranks [tile_slots, overflow_slots) over EVERY cid row; the
       main pass emitted ranks [0, tile_slots) row-major, so the union is
       exact full coverage for n_rect <= overflow_slots.
    2. WINDOW — ranks [overflow_slots, overflow_window_slots) over the
       GATHERED giant rows (n_rect > overflow_slots, up to
       overflow_grid_capacity_for of them): covers the bulk of giant tiles
       at (window - slots) * g rows instead of a dense grid's n_tiles * g.
    3. DENSE grid — the extreme tail (n_rect > overflow_window_slots, 57
       of 1.24M splats measured at bonsai scale; up to
       overflow_dense_capacity_for): a dense (n_tiles, G2) emission of
       every remaining rect tile (rank >= window_slots, reach-culled) —
       no per-rank walk, so coverage is unbounded regardless of rect size.

    Together this restores the reference's unbounded quad coverage
    (/root/reference/src/shaders/gaussian.wgsl:47-53,
    preprocess.wgsl:242-251) for every frame within the static class
    capacities; anything beyond is counted in the residual diagnostic.

    Returns (keys, words4, num_clamped_residual): a flat candidate stream
    (invalid-key holes, NOT compacted) and the count of giant splats beyond
    the grid capacity (splats that still lost tiles).
    """
    invalid = jnp.uint32(0xFFFFFFFF)
    rect, w0, w1, w2, w3, depth_q = cid_words
    c = rect.shape[0]
    tx_tiles, ty_tiles = config.tiles_for(width, height)
    _, depth_bits = config.key_bits(width, height)

    tx0, ty0, tx1, ty1 = unpack_rect4(rect)
    w_t = tx1 - tx0 + 1
    h_t = ty1 - ty0 + 1
    n_rect = w_t * h_t  # sentinel rows decode to n_rect == 1 (self-masking)

    # reach cull decoded from the record (exactly what the rasterizer sees)
    cq = packing.CenterQuant.for_viewport(width, height)
    px, py, half_a, conic_b, half_c, opacity, _, _, _ = packing.unpack_record(
        w0, w1, w2, w3, cq
    )
    thr = float(config.alpha_threshold)
    if thr > 0.0:
        a_max = jnp.minimum(
            2.0 * CUTOFF,
            jnp.log(jnp.maximum(opacity, 1e-30) * (1.0 / thr)),
        )
    else:
        a_max = jnp.full_like(opacity, 2.0 * CUTOFF)
    reaches = make_reaches(
        px, py, half_a, conic_b, half_c, a_max, config.tile_w, config.tile_h
    )

    # ---- WALK stage: row-major ranks [tile_slots, overflow_slots) ----
    # Runs in XLA (not Mosaic), so per-lane integer division is available
    # and the rank -> (dx, dy) map needs no incremental carry walk.
    keys_slots = []
    for j in range(config.tile_slots, config.overflow_slots):
        dy = j // w_t
        dx = j - dy * w_t
        tx = tx0 + dx
        ty = ty0 + dy
        ok = (j < n_rect) & reaches(tx, ty)
        tile = (ty * tx_tiles + tx).astype(jnp.uint32)
        keys_slots.append(
            jnp.where(ok, (tile << np.uint32(depth_bits)) | depth_q, invalid)
        )
    k2 = len(keys_slots)
    keys = jnp.stack(keys_slots, axis=0).reshape(-1)
    words = tuple(
        jnp.broadcast_to(w[None, :], (k2, c)).reshape(-1)
        for w in (w0, w1, w2, w3)
    )

    # ---- WINDOW stage: giants' ranks [overflow_slots, window_slots) over
    # the GATHERED giant rows (n_rect > overflow_slots).  A dense per-tile
    # grid for EVERY giant costs n_tiles * g candidate rows (the dominant
    # overflow cost, measured 2.14 ms of emit at bonsai scale); the window
    # covers the bulk of giant tiles at (window - slots) * g rows, leaving
    # only the extreme tail (57 of 1.24M splats measured) to the grid. ----
    g = int(config.overflow_grid_capacity_for(c))
    g2 = int(config.overflow_dense_capacity_for(c))
    w_slots = int(config.overflow_window_slots)
    window_on = g > 0 and w_slots > config.overflow_slots
    dense_on = g2 > 0 and w_slots > config.overflow_slots

    # Residual (lost-coverage) accounting, EXACT and unconditional (ADVICE
    # r4): a captured splat loses tiles iff it is a giant beyond the window
    # capacity g (the nonzero gather keeps the FIRST g in index order) OR a
    # mega beyond the dense capacity g2 — counted ONCE even when both hold,
    # and counted even when a stage is disabled by config (then EVERY
    # giant/mega of that stage loses its rank >= stage-floor tiles).
    gmask = n_rect > config.overflow_slots
    mmask = n_rect > w_slots
    grank = jnp.cumsum(gmask.astype(jnp.int32)) - 1
    mrank = jnp.cumsum(mmask.astype(jnp.int32)) - 1
    lost_w = (gmask & (grank >= g)) if window_on else gmask
    lost_d = (mmask & (mrank >= g2)) if dense_on else mmask
    residual = jnp.sum((lost_w | lost_d).astype(jnp.int32))

    if window_on:
        (gids,) = jnp.nonzero(gmask, size=g, fill_value=c)
        gvalid = gids < c
        gi = jnp.where(gvalid, gids, 0)
        tx0g, ty0g = tx0[gi], ty0[gi]
        wtg = jnp.maximum(w_t[gi], 1)
        n_rectg = n_rect[gi]
        dqg = depth_q[gi]
        wg = tuple(w[gi] for w in (w0, w1, w2, w3))
        greaches = make_reaches(
            px[gi], py[gi], half_a[gi], conic_b[gi], half_c[gi], a_max[gi],
            config.tile_w, config.tile_h,
        )
        wkeys = []
        for j in range(config.overflow_slots, w_slots):
            dy = j // wtg
            dx = j - dy * wtg
            tx = tx0g + dx
            ty = ty0g + dy
            ok = gvalid & (j < n_rectg) & greaches(tx, ty)
            tile = (ty * tx_tiles + tx).astype(jnp.uint32)
            wkeys.append(
                jnp.where(ok, (tile << np.uint32(depth_bits)) | dqg, invalid)
            )
        kw = len(wkeys)
        keys = jnp.concatenate([keys, jnp.stack(wkeys, axis=0).reshape(-1)])
        words = tuple(
            jnp.concatenate(
                [wk, jnp.broadcast_to(wv[None, :], (kw, g)).reshape(-1)]
            )
            for wk, wv in zip(words, wg)
        )

    # ---- DENSE grid stage: the extreme tail (n_rect > window_slots) ----
    if dense_on:
        (mids,) = jnp.nonzero(mmask, size=g2, fill_value=c)
        mvalid = mids < c
        mi = jnp.where(mvalid, mids, 0)
        mega_words = tuple(
            jnp.where(mvalid, a[mi], jnp.uint32(fill))
            for a, fill in zip(
                (rect, w0, w1, w2, w3, depth_q),
                (0xFFFFFFFF, 0, 0, 0, 0, 0),
            )
        )
        gkeys, gwords = dense_grid_emit(
            mega_words, jnp.sum(mvalid.astype(jnp.int32)),
            width=width, height=height, config=config,
        )
        keys = jnp.concatenate([keys, gkeys])
        words = tuple(
            jnp.concatenate([wk, gw]) for wk, gw in zip(words, gwords)
        )
    return keys, words, residual


def dense_grid_emit(
    mega_words,
    n_mega,
    *,
    width: int,
    height: int,
    config: RasterConfig,
):
    """DENSE overflow stage standalone: every rect tile of row-major rank
    >= overflow_window_slots for each valid mega row (prefix rows of the
    6-word stream; sentinel rect4 tails self-mask via n_rect == 1).

    Consumed two ways: overflow_emit's extreme-tail stage (gathered megas)
    and the kernel overflow path (ops/overflow_pallas.py level-2 forwards
    its prefix-compacted mega stream here).  Returns a flat
    (n_tiles * G2,) holey candidate stream + matching words."""
    invalid = jnp.uint32(0xFFFFFFFF)
    rect, w0, w1, w2, w3, depth_q = mega_words
    g2 = rect.shape[0]
    tx_tiles, ty_tiles = config.tiles_for(width, height)
    _, depth_bits = config.key_bits(width, height)
    w_slots = int(config.overflow_window_slots)

    tx0m, ty0m, tx1m, ty1m = unpack_rect4(rect)
    wtm = jnp.maximum(tx1m - tx0m + 1, 1)

    cq = packing.CenterQuant.for_viewport(width, height)
    px, py, half_a, conic_b, half_c, opacity, _, _, _ = packing.unpack_record(
        w0, w1, w2, w3, cq
    )
    thr = float(config.alpha_threshold)
    if thr > 0.0:
        a_max = jnp.minimum(
            2.0 * CUTOFF,
            jnp.log(jnp.maximum(opacity, 1e-30) * (1.0 / thr)),
        )
    else:
        a_max = jnp.full_like(opacity, 2.0 * CUTOFF)
    mreaches = make_reaches(
        px, py, half_a, conic_b, half_c, a_max, config.tile_w, config.tile_h
    )
    mvalid = jnp.arange(g2, dtype=jnp.int32) < n_mega

    # dense (n_tiles, g2) emission: tile axis FIRST so the per-splat (g2,)
    # arrays broadcast along the trailing axis
    n_tiles = tx_tiles * ty_tiles
    tid = jnp.arange(n_tiles, dtype=jnp.int32)[:, None]  # (n_tiles, 1)
    ttx = tid % tx_tiles
    tty = tid // tx_tiles
    in_rect = (ttx >= tx0m) & (ttx <= tx1m) & (tty >= ty0m) & (tty <= ty1m)
    # row-major rank of this tile — ranks < window_slots were emitted by
    # the main pass + walk + window stages; duplicates double-blend
    rank = (tty - ty0m) * wtm + (ttx - tx0m)
    ok = mvalid & in_rect & (rank >= w_slots) & mreaches(ttx, tty)
    gkeys = jnp.where(
        ok,
        ((tty * tx_tiles + ttx).astype(jnp.uint32) << np.uint32(depth_bits))
        | depth_q,
        invalid,
    ).reshape(-1)
    gwords = tuple(
        jnp.broadcast_to(wv, (n_tiles, g2)).reshape(-1)
        for wv in (w0, w1, w2, w3)
    )
    return gkeys, gwords
