"""GaussianRenderer — the whole-frame TPU render pipeline.

Reference counterpart: ``GaussianRenderer`` (/root/reference/src/renderer.rs:
33-288) which records preprocess -> radix sort -> indirect draw into a wgpu
encoder.  Here a frame is one pure jit-compiled function:

    preprocess (ops/preprocess.py)  ->  sort (ops/sort.py)
        ->  tile ranges  ->  rasterize (ops/rasterize_pallas.py | _xla.py)

Static (compile-time) inputs: viewport size, RasterConfig, N, compressed
flag.  Traced inputs: cloud arrays, camera block, settings — so camera
motion and UI settings never recompile (the reference analogue: uniforms vs
pipeline specialization constants, renderer.rs:379-392).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
import numpy as np

from websplat_tpu.config import RasterConfig, ResolvedSettings, SplattingArgs, resolve_settings
from websplat_tpu.io.loader import GaussianCloud
from websplat_tpu.models.camera import CameraUniforms, PerspectiveCamera
from websplat_tpu.ops.preprocess import (
    CameraParams,
    CompressedDeviceCloud,
    DeviceCloud,
    DeviceSettings,
    preprocess,
)
from websplat_tpu.ops.sort import sort_instances, tile_ranges


def _pack_sh_f16(sh: np.ndarray) -> np.ndarray:
    """(M, 16, 3) f32/f16 SH -> (24, M) u32 of packed f16 pairs (the
    DeviceCloud.sh wire layout, flat index k = 3*coef + channel)."""
    m = sh.shape[0]
    sh48 = np.ascontiguousarray(sh.reshape(m, 48).T.astype(np.float16))
    bits = sh48.view(np.uint16).astype(np.uint32)
    return bits[0::2] | (bits[1::2] << np.uint32(16))


def upload_cloud(cloud: GaussianCloud, build_fat: bool = True) -> DeviceCloud:
    """Host cloud -> device pytree (reference: PointCloud::new upload,
    /root/reference/src/pointcloud.rs:99-170).  The f16 wire values are
    widened to f32 once; SH stays f16 in HBM (it is the bulk of the bytes and
    the preprocess reads it once per frame).  Arrays are transposed to the
    COLUMN-major device layout here, once (see DeviceCloud); the fused
    frontend's single-stream interleaved relayout (DeviceCloud.fat) is also
    built here, once.

    ``build_fat=False`` skips the fat stream (~an extra cloud footprint in
    both host RAM and HBM): use it when the cloud will be sharded
    (parallel.sharded.shard_cloud discards fat anyway) or rendered through
    the XLA fallbacks only."""
    xyz_t = np.ascontiguousarray(cloud.xyz.T).astype(np.float32)
    cov_t = np.ascontiguousarray(cloud.cov.T).astype(np.float32)
    opacity = cloud.opacity.astype(np.float32)
    sh_packed = _pack_sh_f16(cloud.sh)
    fat = None
    if build_fat:
        from websplat_tpu.ops.frontend_pallas import build_fat_stream

        fat = jnp.asarray(build_fat_stream(xyz_t, cov_t, opacity, sh_packed))
    return DeviceCloud(
        xyz=jnp.asarray(xyz_t),
        cov=jnp.asarray(cov_t),
        opacity=jnp.asarray(opacity),
        sh=jnp.asarray(sh_packed),
        fat=fat,
    )


def upload_compressed_cloud(cloud: GaussianCloud) -> CompressedDeviceCloud:
    """Compressed residency upload: int8/index streams + codebooks stay in
    HBM (~22 B/splat vs ~136 B decoded); per-frame expansion happens in-jit
    (decompress_cloud).  Reference: the GPU keeps the quantized buffers and
    dequantizes in preprocess_compressed.wgsl."""
    q = cloud.quantized
    return CompressedDeviceCloud(
        xyz=jnp.asarray(np.ascontiguousarray(cloud.xyz.T), jnp.float32),
        opacity_q=jnp.asarray(q.opacity_q, jnp.int8),
        opacity_scale=jnp.float32(q.opacity_scale),
        opacity_zp=jnp.float32(q.opacity_zp),
        scale_factor_q=(
            None if q.scale_factor_q is None else jnp.asarray(q.scale_factor_q, jnp.int8)
        ),
        sf_scale=jnp.float32(q.sf_scale),
        sf_zp=jnp.float32(q.sf_zp),
        covars=jnp.asarray(np.ascontiguousarray(q.covars.T), jnp.float32),
        geom_idx=jnp.asarray(q.geom_idx, jnp.int32),
        sh_cb=jnp.asarray(_pack_sh_f16(q.sh_codebook)),
        sh_idx=jnp.asarray(q.sh_idx, jnp.int32),
    )


def decompress_cloud(cc: CompressedDeviceCloud) -> DeviceCloud:
    """Per-frame on-device dequantization (inside the frame jit).

    Mirrors preprocess_compressed.wgsl:137-171,216-242: opacity/scale-factor
    int8 dequant + exp, covariance codebook lookup scaled by the squared
    factor, SH codebook lookup.  The codebook gathers run as XLA gathers
    (~5 ms per million rows on v5e) because TPU vector units cannot gather
    from VMEM per lane; everything else fuses into the surrounding jit."""
    opacity = (
        cc.opacity_q.astype(jnp.float32) - cc.opacity_zp
    ) * cc.opacity_scale
    cov = jnp.take(cc.covars, cc.geom_idx, axis=1)  # (6, N)
    if cc.scale_factor_q is not None:
        sf = jnp.exp(
            (cc.scale_factor_q.astype(jnp.float32) - cc.sf_zp) * cc.sf_scale
        )
        cov = cov * (sf * sf)[None, :]
    sh = jnp.take(cc.sh_cb, cc.sh_idx, axis=1)  # (24, N)
    return DeviceCloud(xyz=cc.xyz, cov=cov, opacity=opacity, sh=sh)


def frustum_visible(
    xyz: jnp.ndarray, camera: CameraParams, settings: DeviceSettings
) -> jnp.ndarray:
    """(N,) bool: EXACTLY the preprocess center-visibility test — clipping
    box AND z_ndc in (0,1) AND |clip_xy| <= 1.2*clip_w — on xyz alone
    (preprocess.wgsl:177-192, ops/preprocess.py:174-209).  This is a
    SUPERSET of core_math's final `visible` (which additionally culls
    degenerate lambda2 / off-screen rects / sub-threshold opacity — all of
    which need the dequantized covariance), so culling on it before
    dequantization drops no splat the frontend would have kept."""
    x_w, y_w, z_w = xyz[0], xyz[1], xyz[2]
    cb_min, cb_max = settings.clipping_box_min, settings.clipping_box_max
    inside = (
        (x_w >= cb_min[0]) & (x_w <= cb_max[0])
        & (y_w >= cb_min[1]) & (y_w <= cb_max[1])
        & (z_w >= cb_min[2]) & (z_w <= cb_max[2])
    )
    # elementwise, NOT matmuls (TPU f32 @ runs as bf16 MXU passes — see
    # ops/preprocess.py:182-186); comparisons written so NaN inputs fail
    v, p = camera.view, camera.proj
    cam = [v[i, 0] * x_w + v[i, 1] * y_w + v[i, 2] * z_w + v[i, 3] for i in range(3)]
    clip = [
        p[i, 0] * cam[0] + p[i, 1] * cam[1] + p[i, 2] * cam[2] + p[i, 3]
        for i in range(4)
    ]
    z_ndc = clip[2] / clip[3]
    bounds = 1.2 * clip[3]
    return (
        inside
        & (z_ndc > 0.0)
        & (z_ndc < 1.0)
        & (clip[0] >= -bounds)
        & (clip[0] <= bounds)
        & (clip[1] >= -bounds)
        & (clip[1] <= bounds)
    )


def decompress_cloud_culled(
    cc: CompressedDeviceCloud,
    camera: CameraParams,
    settings: DeviceSettings,
    *,
    capacity: int,
) -> Tuple[DeviceCloud, jnp.ndarray]:
    """Cull-before-gather dequantization: frustum-cull on the resident xyz
    FIRST, compact the survivors (Pallas, ~0.15 ms/M), and run the codebook
    gathers — the dominant compressed-path cost, ~5 ms per million rows —
    only over the visible prefix.  The reference analogue: the compressed
    preprocess dequantizes a splat only after its own cull passes
    (preprocess_compressed.wgsl:229-242 returns before touching codebooks).

    Everything a splat needs rides the compaction itself (opacity_q and
    scale_factor_q packed in the key word's low 16 bits; xyz + the two
    codebook indices as the 5 payload words), so NO per-splat gather at the
    original N ever runs.  Sentinel (padding) lanes get NaN xyz, which the
    preprocess cull rejects by construction (all its comparisons fail on
    NaN — ops/preprocess.py:198-209).

    Returns (cloud, num_culled_dropped): splats dropped because more than
    `capacity` survived the frustum cull (0 in correct sizing; surfaced in
    the frame diagnostics)."""
    from websplat_tpu.ops.compact_pallas import INVALID_KEY, compact_instances

    vis = frustum_visible(cc.xyz, camera, settings)
    op_u = cc.opacity_q.astype(jnp.uint8).astype(jnp.uint32)
    if cc.scale_factor_q is not None:
        sf_u = cc.scale_factor_q.astype(jnp.uint8).astype(jnp.uint32)
    else:
        sf_u = jnp.zeros_like(op_u)
    keys = jnp.where(vis, (op_u << 8) | sf_u, jnp.uint32(INVALID_KEY))
    bits = lambda a: lax.bitcast_convert_type(a, jnp.uint32)
    payload = (
        bits(cc.xyz[0]), bits(cc.xyz[1]), bits(cc.xyz[2]),
        bits(cc.geom_idx), bits(cc.sh_idx),
    )
    keys_c, payload_c, _n_vis, n_drop = compact_instances(
        keys, payload, capacity=capacity
    )
    cap = keys_c.shape[0]
    live = keys_c != INVALID_KEY
    nan = jnp.float32(np.nan)
    f32 = lambda a: lax.bitcast_convert_type(a, jnp.float32)
    xyz = jnp.stack([
        jnp.where(live, f32(payload_c[0]), nan),
        jnp.where(live, f32(payload_c[1]), nan),
        jnp.where(live, f32(payload_c[2]), nan),
    ])
    i32 = lambda a: lax.bitcast_convert_type(a, jnp.int32)
    # sentinel lanes decode to index 0 (a valid codebook row; harmless —
    # their NaN xyz culls them in the frontend before anything is emitted)
    geom_idx = jnp.where(live, i32(payload_c[3]), 0)
    sh_idx = jnp.where(live, i32(payload_c[4]), 0)
    to_i8 = lambda u: jnp.where(u > 127, u.astype(jnp.int32) - 256, u.astype(jnp.int32)).astype(jnp.float32)
    opacity = (to_i8((keys_c >> 8) & 0xFF) - cc.opacity_zp) * cc.opacity_scale
    cov = jnp.take(cc.covars, geom_idx, axis=1)  # (6, cap)
    if cc.scale_factor_q is not None:
        sf = jnp.exp((to_i8(keys_c & 0xFF) - cc.sf_zp) * cc.sf_scale)
        cov = cov * (sf * sf)[None, :]
    sh = jnp.take(cc.sh_cb, sh_idx, axis=1)  # (24, cap)
    return DeviceCloud(xyz=xyz, cov=cov, opacity=opacity, sh=sh), n_drop


def settings_to_device(s: ResolvedSettings) -> DeviceSettings:
    return DeviceSettings(
        clipping_box_min=jnp.asarray(s.clipping_box_min, jnp.float32),
        clipping_box_max=jnp.asarray(s.clipping_box_max, jnp.float32),
        gaussian_scaling=jnp.float32(s.gaussian_scaling),
        max_sh_deg=jnp.int32(s.max_sh_deg),
        mip_splatting=jnp.bool_(s.mip_splatting),
        kernel_size=jnp.float32(s.kernel_size),
        walltime=jnp.float32(s.walltime),
        scene_extend=jnp.float32(s.scene_extend),
        scene_center=jnp.asarray(s.scene_center, jnp.float32),
    )


def camera_to_device(cam: CameraUniforms) -> CameraParams:
    return CameraParams(
        view=jnp.asarray(cam.view, jnp.float32),
        view_inv=jnp.asarray(cam.view_inv, jnp.float32),
        proj=jnp.asarray(cam.proj, jnp.float32),
        viewport=jnp.asarray(cam.viewport, jnp.float32),
        focal=jnp.asarray(cam.focal, jnp.float32),
    )


def use_pallas_ops(multi_device: bool) -> bool:
    """Whether the Pallas kernels are usable in the current trace context.

    On non-TPU backends Pallas runs in the TPU *interpreter*, which simulates
    every device of the enclosing mesh with a global ``threading.Barrier`` —
    inside a multi-device ``shard_map`` on a host with too few cores the
    device programs cannot rendezvous and the barrier deadlocks.  Single-
    device interpret mode has no such barrier and stays enabled (it is how
    the kernel unit tests run)."""
    return jax.default_backend() == "tpu" or not multi_device


def render_frame_impl(
    cloud: DeviceCloud,
    camera: CameraParams,
    settings: DeviceSettings,
    background: jnp.ndarray,
    *,
    width: int,
    height: int,
    config: RasterConfig,
    compressed: bool = False,
    return_diag: bool = False,
    multi_device: bool = False,
    stop_after: Optional[str] = None,
):
    """Unjitted frame core: (H, W, 3) f32 linear image (+ diagnostics).

    Composable under jit / vmap / shard_map (the multi-view and multi-chip
    paths in websplat_tpu/parallel wrap this; they pass ``multi_device=True``
    so non-TPU traces avoid interpret-mode Pallas — see use_pallas_ops).

    ``stop_after="ranges"`` truncates the frame after tile-range extraction
    and returns (sorted_keys, sorted_payload, ranges) — the stage profiler's
    hook for timing the REAL pre-raster pipeline (including the overflow
    splice the stage-local reconstructions miss); not for production use."""
    pallas_ok = use_pallas_ops(multi_device)
    num_culled_dropped = jnp.int32(0)
    if isinstance(cloud, CompressedDeviceCloud):
        if config.compressed_cull_factor > 0.0 and pallas_ok:
            n0 = cloud.opacity_q.shape[0]
            cull_cap = max(4096, int(config.compressed_cull_factor * n0))
            cloud, num_culled_dropped = decompress_cloud_culled(
                cloud, camera, settings, capacity=cull_cap
            )
        else:
            cloud = decompress_cloud(cloud)
    keys, payload, n_valid, stats = build_instance_stream(
        cloud, camera, settings, width=width, height=height, config=config,
        compressed=compressed, pallas_ok=pallas_ok,
    )
    sorted_keys, sorted_payload = sort_instances(
        keys, payload, backend=config.sort_backend, n_valid=n_valid
    )
    tx, ty = config.tiles_for(width, height)
    _, depth_bits = config.key_bits(width, height)
    ranges = tile_ranges(sorted_keys, tx * ty, depth_bits)
    if stop_after == "ranges":
        return sorted_keys, sorted_payload, ranges

    if config.raster_backend == "pallas" and pallas_ok:
        from websplat_tpu.ops.rasterize_pallas import rasterize_pallas

        img = rasterize_pallas(
            sorted_payload, ranges, background, width=width, height=height, config=config
        )
    else:
        from websplat_tpu.ops.rasterize_xla import rasterize_xla

        img = rasterize_xla(
            sorted_payload, ranges, background, width=width, height=height, config=config
        )
    if return_diag:
        return img, dict(
            num_instances=ranges[-1],
            num_culled_dropped=num_culled_dropped,
            **stats,
        )
    return img


def build_instance_stream(
    cloud: DeviceCloud,
    camera: CameraParams,
    settings: DeviceSettings,
    *,
    width: int,
    height: int,
    config: RasterConfig,
    compressed: bool,
    pallas_ok: bool,
):
    """Preprocess + emission + compaction + overflow splice -> the unsorted
    instance stream: (keys, payload, n_valid, stats).

    ``n_valid`` (traced i32 or None) is the sort-ladder prefix bound
    (ops/sort.py); stats = dict(num_visible, num_clamped, num_dropped).
    Shared by the single-chip frame (render_frame_impl) and the
    splat-sharded shard body (parallel/sharded.py) so both get the fused
    frontend's in-place overflow splice and the exact-cursor ladder."""
    tx_tiles, ty_tiles = config.tiles_for(width, height)
    # the fused frontend computes everything in-kernel; its limits are the
    # per-axis tile count (int packing of tile ids) and the slot walk tables.
    # Off-TPU the kernel runs through the interpreter as one giant unrolled
    # XLA program — beyond 8 slots the XLA *CPU* compiler segfaults, so the
    # interpret path caps at 8 (Mosaic compiles 16 fine on hardware).
    max_fused_slots = 16 if jax.default_backend() == "tpu" else 8
    fused_ok = (
        config.compact and pallas_ok and tx_tiles <= 127 and ty_tiles <= 127
        and config.tile_slots <= max_fused_slots
    )
    if fused_ok:
        from websplat_tpu.ops.frontend_pallas import fused_frontend

        n = cloud.opacity.shape[0]
        capacity = max(4096, int(config.instance_capacity_factor * n))
        overflow = config.overflow_enabled
        cs = config.chunk_size
        # In-kernel overflow walk (ops/overflow_pallas.py): TPU only — the
        # 26/128-rank unrolled kernels would blow up the interpret-mode XLA
        # CPU compile (frontend_pallas caps interpret unrolls at 8 slots for
        # the same reason); off-TPU the XLA overflow_emit path below covers
        # the same semantics.
        use_walk = jax.default_backend() == "tpu" and pallas_ok
        window_on = (
            config.overflow_grid_capacity > 0
            and config.overflow_window_slots > config.overflow_slots
        )
        if overflow and use_walk:
            from websplat_tpu.ops.frontend_pallas import (
                ALIGN as _ALIGN,
                STAGE as _STAGE,
            )

            from websplat_tpu.ops.compact_pallas import BLOCK as _CBLK

            cap_c = config.overflow_capacity_for(n)
            # measured-margin capacities (config.py rationale): worst-case
            # sizing inflates the sort-ladder modulus and measurably loses;
            # overruns drop OVERFLOW instances only, counted in num_dropped
            walk_cap = config.overflow_walk_capacity_for(cap_c)
            walk_pad = -(-walk_cap // _ALIGN) * _ALIGN + _STAGE
            g_cap = config.overflow_grid_capacity_for(cap_c) if window_on else 0
            m_cap = config.overflow_dense_capacity_for(cap_c) if window_on else 0
            win_cap = config.overflow_window_capacity_for(g_cap)
            win_pad = (
                (-(-win_cap // _ALIGN) * _ALIGN + _STAGE) if window_on else 0
            )
            dense_len = tx_tiles * ty_tiles * m_cap
            # the dense candidate grid is compacted before splicing when it
            # is large (mirrors the XLA path's o_compact decision)
            d_compact = dense_len > 2 * config.overflow_dense_compact
            if d_compact:
                dcap = config.overflow_dense_compact
                dense_b = -(-dcap // _CBLK) * _CBLK + _CBLK
            else:
                dense_b = dense_len
            ext_needed = max(
                walk_pad,
                walk_cap + win_pad,
                walk_cap + win_cap + dense_b + _STAGE,
            )
            ext = (-(-ext_needed // cs) + 1) * cs
        elif overflow:
            # static size of the overflow candidate stream (mirrors
            # overflow_emit + the compaction decision below) so the frontend
            # can allocate splice headroom in its own outputs — the splice
            # is then a pure in-place dynamic_update_slice instead of a
            # concatenate copy of all five full-capacity words
            cap_c = config.overflow_capacity_for(n)
            o_raw = (config.overflow_slots - config.tile_slots) * cap_c
            if window_on:
                # giant WINDOW walk + extreme-tail dense grid
                # (overflow_emit's three-stage structure)
                o_raw += (
                    config.overflow_window_slots - config.overflow_slots
                ) * config.overflow_grid_capacity_for(cap_c)
                o_raw += (
                    tx_tiles * ty_tiles
                    * config.overflow_dense_capacity_for(cap_c)
                )
            o_compact = o_raw > 65536 and pallas_ok
            if o_compact:
                # the compactor pads its output to a block multiple + one
                # block (ops/compact_pallas.py:compact_instances)
                from websplat_tpu.ops.compact_pallas import BLOCK as _CBLK

                # compacted-overflow capacity: ~12 overflow tiles per
                # clamped splat (measured 8.3 average at bonsai scale) PLUS
                # dense-grid room for ~4 screen-filling giants — a
                # per-splat bound alone starves small scenes with one giant
                # (a single screen-filler needs ~tx*ty tiles; measured: one
                # wide splat dropped 1920 of its 2355 tiles at n=3)
                ocap = min(
                    cap_c * 12 + tx_tiles * ty_tiles * 4, o_raw
                )
                b = -(-ocap // _CBLK) * _CBLK + _CBLK
            else:
                b = o_raw
            ext = (-(-b // cs) + 1) * cs
        if overflow:
            (keys, payload, num_visible, num_clamped, num_valid, num_dropped,
             cid_words, _n_cid) = fused_frontend(
                cloud, camera, settings, width=width, height=height,
                config=config, compressed=compressed, capacity=capacity,
                capacity_c=cap_c, splice_pad=ext,
            )
        else:
            keys, payload, num_visible, num_clamped, num_valid, num_dropped = (
                fused_frontend(
                    cloud, camera, settings, width=width, height=height,
                    config=config, compressed=compressed, capacity=capacity,
                )
            )
        # exact-cursor stream: valid instances are a tight prefix, so the
        # sort can run on a runtime-selected prefix rung (ops/sort.py)
        n_valid = jnp.minimum(num_valid, capacity)
        if overflow and use_walk:
            # In-kernel overflow (round 5): level-1 walks ranks
            # [tile_slots, overflow_slots) over the cid stream and forwards
            # giants; level-2 walks [overflow_slots, window_slots) over the
            # giants and forwards megas; the XLA dense grid covers the
            # extreme tail.  Replaces the XLA walk/window emission + its
            # Pallas compaction (measured 1.36 + 0.46 ms at bonsai scale;
            # the kernels run at ~0.2 ms) and splices EXACT-prefix streams,
            # so the sort-ladder bound carries no per-block sentinel slack.
            from websplat_tpu.ops.overflow_pallas import overflow_walk
            from websplat_tpu.ops.preprocess import dense_grid_emit

            wkeys, wwords, w_tot, giants, g_tot = overflow_walk(
                cid_words, _n_cid,
                rank_lo=config.tile_slots, rank_hi=config.overflow_slots,
                giant_thresh=config.overflow_slots,
                capacity=walk_cap, giant_capacity=g_cap,
                width=width, height=height, config=config,
            )
            keys = lax.dynamic_update_slice(keys, wkeys, (n_valid,))
            payload = tuple(
                lax.dynamic_update_slice(w, ow, (n_valid,))
                for w, ow in zip(payload, wwords)
            )
            n_valid = n_valid + jnp.minimum(w_tot, walk_cap)
            num_dropped = num_dropped + jnp.maximum(w_tot - walk_cap, 0)
            resid = jnp.int32(0)
            if window_on:
                wkeys2, wwords2, w_tot2, megas, m_tot = overflow_walk(
                    giants, jnp.minimum(g_tot, g_cap),
                    rank_lo=config.overflow_slots,
                    rank_hi=config.overflow_window_slots,
                    giant_thresh=config.overflow_window_slots,
                    capacity=win_cap, giant_capacity=m_cap,
                    width=width, height=height, config=config,
                )
                keys = lax.dynamic_update_slice(keys, wkeys2, (n_valid,))
                payload = tuple(
                    lax.dynamic_update_slice(w, ow, (n_valid,))
                    for w, ow in zip(payload, wwords2)
                )
                n_valid = n_valid + jnp.minimum(w_tot2, win_cap)
                num_dropped = num_dropped + jnp.maximum(w_tot2 - win_cap, 0)
                dkeys, dwords = dense_grid_emit(
                    megas, jnp.minimum(m_tot, m_cap),
                    width=width, height=height, config=config,
                )
                if d_compact:
                    from websplat_tpu.ops.compact_pallas import (
                        compact_instances as _ci,
                    )

                    d_src_blocks = -(-dense_len // _CBLK)
                    dkeys, dwords, d_count, d_dropped = _ci(
                        dkeys, dwords, capacity=dcap
                    )
                    num_dropped = num_dropped + d_dropped
                keys = lax.dynamic_update_slice(keys, dkeys, (n_valid,))
                payload = tuple(
                    lax.dynamic_update_slice(w, ow, (n_valid,))
                    for w, ow in zip(payload, dwords)
                )
                if d_compact:
                    # compactor output is NOT an exact prefix (<=127
                    # sentinels interleave per source block)
                    n_valid = n_valid + jnp.minimum(
                        d_count + 127 * d_src_blocks, dense_b
                    )
                else:
                    # holey candidate block counts whole against the ladder
                    # (sentinels inside the prefix sort to the rung's end)
                    n_valid = n_valid + dense_len
                # lost coverage, counted once per splat (a mega beyond
                # g_cap never reaches level 2, so the two terms are
                # disjoint — same semantics as overflow_emit's residual)
                resid = jnp.maximum(g_tot - g_cap, 0) + jnp.maximum(
                    m_tot - m_cap, 0
                )
            else:
                # window/dense disabled by config: every giant loses its
                # rank >= overflow_slots tiles
                resid = g_tot
            num_clamped = resid + jnp.maximum(
                num_clamped - jnp.int32(cap_c), 0
            )
        elif overflow:
            # clamped splats' remaining rect tiles, spliced into the stream
            # at the end of the valid prefix (the region there is sentinel
            # tail, so the ladder-prefix contract still holds)
            from websplat_tpu.ops.preprocess import overflow_emit

            okeys, owords, num_clamped_resid = overflow_emit(
                cid_words, width=width, height=height, config=config,
            )
            assert okeys.shape[0] == o_raw, (okeys.shape, o_raw)
            o_count = None
            if o_compact:
                # the overflow candidate stream is mostly holes (capacity x
                # (overflow_slots - tile_slots) slots for ~capacity x ~6 real
                # tiles); compact it before splicing so the sort pays for
                # ~actual overflow instances, not the static worst case
                from websplat_tpu.ops.compact_pallas import BLOCK as _CBLOCK
                from websplat_tpu.ops.compact_pallas import (
                    compact_instances as _ci,
                )

                o_src_blocks = -(-okeys.shape[0] // _CBLOCK)
                okeys, owords, o_count, o_dropped = _ci(
                    okeys, owords, capacity=ocap
                )
                num_dropped = num_dropped + o_dropped
            assert okeys.shape[0] == b, (okeys.shape, b)
            # splice in place: the frontend allocated `ext` rows of headroom
            # past its capacity_pad (splice_pad above), so the stream stays
            # chunk-multiple with >= chunk_size sentinel headroom past the
            # last instance, with no concatenate copy
            keys = lax.dynamic_update_slice(keys, okeys, (n_valid,))
            payload = tuple(
                lax.dynamic_update_slice(w, ow, (n_valid,))
                for w, ow in zip(payload, owords)
            )
            # advance the sort-ladder prefix by the ACTUAL compacted count
            # when known, so the ladder skips ~capacity-count dead rows.
            # The compactor is NOT an exact prefix (up to 127 sentinels
            # interleave per source block, compact_pallas.py docstring), so
            # pad by that bound — a real instance beyond the ladder prefix
            # would land in the "untouched all-sentinel tail" unsorted.
            # The uncompacted branch's holey block counts whole (sentinels
            # INSIDE the prefix sort to the rung's end — still valid).
            if o_count is not None:
                n_valid = n_valid + jnp.minimum(o_count + 127 * o_src_blocks, b)
            else:
                n_valid = n_valid + b
            # residual = splats that LOST coverage: giants beyond the grid
            # capacity among the captured cid stream, PLUS every clamped
            # splat beyond the cid capture capacity itself (those keep only
            # their first tile_slots row-major tiles).  The round-3 counter
            # missed the second term — 18k silently truncated splats at
            # bonsai scale read as num_clamped=0.
            num_clamped = num_clamped_resid + jnp.maximum(
                num_clamped - jnp.int32(cap_c), 0
            )
        return keys, payload, n_valid, dict(
            num_visible=num_visible, num_clamped=num_clamped,
            num_dropped=num_dropped,
        )
    pre = preprocess(
        cloud, camera, settings, width=width, height=height, config=config,
        compressed=compressed,
        overflow_capacity=(
            config.overflow_capacity_for(cloud.opacity.shape[0])
            if config.overflow_enabled else 0
        ),
    )
    keys, payload = pre.keys, pre.payload
    num_dropped = jnp.int32(0)
    num_clamped = pre.num_clamped
    if config.overflow_enabled:
        # same full-coverage semantics as the fused path: append the
        # clamped splats' remaining rect tiles (holey candidates — the
        # compactor / sort downstream handle sentinels either way)
        from websplat_tpu.ops.preprocess import overflow_emit

        okeys, owords, o_resid = overflow_emit(
            pre.clamped_words, width=width, height=height, config=config,
        )
        keys = jnp.concatenate([keys, okeys])
        payload = tuple(
            jnp.concatenate([w, ow]) for w, ow in zip(payload, owords)
        )
        # residual accounting parity with the fused path: grid-capacity
        # overflow among captured splats + clamped splats beyond capture
        cap_nf = config.overflow_capacity_for(cloud.opacity.shape[0])
        num_clamped = o_resid + jnp.maximum(
            pre.num_clamped - jnp.int32(cap_nf), 0
        )
    if config.compact and pallas_ok:
        from websplat_tpu.ops.compact_pallas import compact_instances

        n = cloud.opacity.shape[0]
        capacity = max(4096, int(config.instance_capacity_factor * n))
        keys, payload, _, num_dropped = compact_instances(
            keys, payload, capacity=capacity
        )
    else:
        # the Pallas rasterizer DMAs the stream in chunk_size blocks (and
        # prefetches one past the ranges end): pad the holey uncompacted
        # stream to a chunk multiple plus one sentinel tail chunk
        cs = config.chunk_size
        pad = (-keys.shape[0]) % cs + cs
        keys = jnp.concatenate(
            [keys, jnp.full((pad,), np.uint32(0xFFFFFFFF), jnp.uint32)]
        )
        payload = tuple(
            jnp.concatenate([w, jnp.zeros((pad,), jnp.uint32)])
            for w in payload
        )
    return keys, payload, None, dict(
        num_visible=pre.num_visible, num_clamped=num_clamped,
        num_dropped=num_dropped,
    )


render_frame = jax.jit(
    render_frame_impl,
    static_argnames=(
        "width", "height", "config", "compressed", "return_diag",
        "multi_device", "stop_after",
    ),
)


class GaussianRenderer:
    """Stateful convenience wrapper (device cloud + jit cache).

    Mirrors the reference's GaussianRenderer::{new, prepare, render,
    num_visible_points} surface (renderer.rs:33,191,250,170) in one
    ``render()`` call; `prepare`/`render` need no split because XLA owns the
    whole frame graph.
    """

    def __init__(
        self,
        cloud: GaussianCloud,
        config: Optional[RasterConfig] = None,
    ):
        self.cloud = cloud
        self.config = config or RasterConfig()
        self.device_cloud = (
            upload_compressed_cloud(cloud)
            if cloud.quantized is not None
            else upload_cloud(cloud)
        )
        self._last_diag = None

    def render(
        self,
        camera: PerspectiveCamera,
        viewport: Tuple[int, int],
        args: SplattingArgs = SplattingArgs(),
        fit_near_far: bool = True,
        with_diag: bool = False,
    ) -> np.ndarray:
        width, height = int(viewport[0]), int(viewport[1])
        if fit_near_far:
            # per-frame near/far fit against the scene AABB
            # (/root/reference/src/lib.rs:396-397, camera.rs:26-35)
            camera.fit_near_far(*self.cloud.aabb)
        cam = CameraUniforms.from_camera(camera, (width, height))
        settings = resolve_settings(args, self.cloud)
        out = render_frame(
            self.device_cloud,
            camera_to_device(cam),
            settings_to_device(settings),
            jnp.asarray(settings.background_color, jnp.float32),
            width=width,
            height=height,
            config=self.config,
            compressed=self.cloud.compressed,
            return_diag=with_diag,
        )
        if with_diag:
            img, diag = out
            self._last_diag = jax.device_get(diag)
            return np.asarray(jax.device_get(img))
        return np.asarray(jax.device_get(out))

    @property
    def num_visible_points(self) -> Optional[int]:
        """Visible-splat count from the last diag render (renderer.rs:170-189)."""
        if self._last_diag is None:
            return None
        return int(self._last_diag["num_visible"])
