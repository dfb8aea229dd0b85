#!/usr/bin/env python
"""Per-stage frame profiler — the GPUStopwatch analogue.

The reference profiles preprocess / sorting / rasterization with GPU
timestamp queries (/root/reference/src/utils.rs:26-134, hooked at
renderer.rs:220-239 and lib.rs:447-466).  Through the axon tunnel,
``block_until_ready`` does not block, so each stage is timed by running a
truncated pipeline K times chained inside one jit (two different K; the
slope removes fixed overhead).

Usage: python scripts/profile_stages.py [n_splats] [width] [height]
"""

import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

import jax

from websplat_tpu.utils import compile_cache

compile_cache.enable()
import jax.numpy as jnp
import numpy as np

from websplat_tpu.config import RasterConfig, SplattingArgs, resolve_settings
from websplat_tpu.models.camera import CameraUniforms
from websplat_tpu.ops.preprocess import preprocess
from websplat_tpu.ops.sort import sort_instances, tile_ranges
from websplat_tpu.render.renderer import (
    camera_to_device,
    settings_to_device,
    upload_cloud,
)
from synth import make_bench_cloud, make_camera


def timed(f, *args, n1=2, n2=8):
    """Slope timing: run f chained n times in one jit, readback one scalar."""

    def loop(n):
        @jax.jit
        def g(*a):
            def body(i, acc):
                r = f(*a, salt=i)
                return acc + r
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
        return g

    f1, f2 = loop(n1), loop(n2)
    float(f1(*args))
    float(f2(*args))
    ts = []
    for g, n in [(f1, n1), (f2, n2), (f1, n1), (f2, n2)]:
        t0 = time.perf_counter()
        float(g(*args))
        ts.append((time.perf_counter() - t0, n))
    t1 = min(t for t, n in ts if n == n1)
    t2 = min(t for t, n in ts if n == n2)
    return (t2 - t1) / (n2 - n1) * 1e3


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_244_819
    width = int(sys.argv[2]) if len(sys.argv) > 2 else 1200
    height = int(sys.argv[3]) if len(sys.argv) > 3 else 799

    rng = np.random.default_rng(0)
    cloud = make_bench_cloud(rng, n=n)
    cam = make_camera(viewport=(width, height), distance=3.0)
    cam.fit_near_far(*cloud.aabb)
    uni = CameraUniforms.from_camera(cam, (width, height))
    settings = resolve_settings(SplattingArgs(), cloud)
    # env overrides for quick post-measurement tuning sweeps, e.g.
    #   WS_COMPOSITE=scan WS_TILE=16x8 WS_SLOTS=8 python scripts/profile_stages.py
    # (full list: RasterConfig.from_env)
    config = RasterConfig.from_env()

    dc = upload_cloud(cloud)
    dcam = camera_to_device(uni)
    dset = settings_to_device(settings)
    bg = jnp.asarray(settings.background_color, jnp.float32)
    tx, ty = config.tiles_for(width, height)
    _, depth_bits = config.key_bits(width, height)

    def salted(cam, salt):
        # perturb a traced input so chained iterations cannot be CSE'd
        return cam._replace(view=cam.view + salt * 1e-12)

    def stage_pre(dc, dcam, dset, salt=0):
        # with the fused frontend, "preprocess" and "emit+compact" are one
        # kernel; this stage times the whole frontend
        k, p, _ = _compacted(dc, dcam, dset, salt)
        return _live(k, p)

    def _compacted(dc, dcam, dset, salt):
        if config.compact:
            from websplat_tpu.ops.frontend_pallas import fused_frontend

            cap = max(
                4096, int(config.instance_capacity_factor * dc.opacity.shape[0])
            )
            k, p, _, _, num_valid, _ = fused_frontend(
                dc, salted(dcam, salt), dset, width=width, height=height,
                config=config, capacity=cap,
            )
            # n_valid enables the production sort ladder in stage timings
            return k, p, jnp.minimum(num_valid, cap)
        pre = preprocess(dc, salted(dcam, salt), dset, width=width, height=height,
                         config=config)
        return pre.keys, pre.payload, None

    def _live(k, p):
        # keep EVERY operand live: XLA dead-code-eliminates unused sort
        # payload operands in truncated pipelines, which silently halves the
        # measured sort cost (a 1-operand sort instead of the real 5)
        return (
            k[::65536].astype(jnp.float32).sum()
            + sum(w[::65536].astype(jnp.float32).sum() for w in p)
        )

    def stage_compact(dc, dcam, dset, salt=0):
        k, p, _ = _compacted(dc, dcam, dset, salt)
        return _live(k, p)

    def stage_sort(dc, dcam, dset, salt=0):
        k, p, nv = _compacted(dc, dcam, dset, salt)
        sk, sp = sort_instances(k, p, backend=config.sort_backend, n_valid=nv)
        return _live(sk, sp)

    def stage_ranges(dc, dcam, dset, salt=0):
        k, p, nv = _compacted(dc, dcam, dset, salt)
        sk, sp = sort_instances(k, p, backend=config.sort_backend, n_valid=nv)
        r = tile_ranges(sk, tx * ty, depth_bits)
        return _live(sk, sp) + r.astype(jnp.float32).sum()

    def stage_pre_raster(dc, dcam, dset, bg, salt=0):
        # the REAL frame pipeline truncated after tile ranges — unlike the
        # reconstructed stages above this includes the overflow pass
        # (overflow_emit + compact + splice), so (pre_raster - ranges) is the
        # overflow cost and (full - pre_raster) is raster kernel + assembly
        from websplat_tpu.render.renderer import render_frame_impl

        sk, sp, r = render_frame_impl(dc, salted(dcam, salt), dset, bg,
                                      width=width, height=height,
                                      config=config, stop_after="ranges")
        return _live(sk, sp) + r.astype(jnp.float32).sum()

    def stage_full(dc, dcam, dset, bg, salt=0):
        from websplat_tpu.render.renderer import render_frame_impl

        img = render_frame_impl(dc, salted(dcam, salt), dset, bg,
                                width=width, height=height, config=config)
        return img[::256, ::256].sum()

    def stage_assembly(tiles, bg, salt=0):
        # tiles -> image reassembly exactly as rasterize_pallas' epilogue
        tx_, ty_ = config.tiles_for(width, height)
        img = (tiles + salt * 1e-12).reshape(
            ty_, tx_, 4, config.tile_h, config.tile_w
        )
        img = img.transpose(0, 3, 1, 4, 2).reshape(
            ty_ * config.tile_h, tx_ * config.tile_w, 4
        )
        img = img[:height, :width]
        img = img[:, :, :3] + img[:, :, 3:4] * bg[None, None, :]
        return img[::256, ::256].sum()

    t_front = timed(stage_compact, dc, dcam, dset)
    t_sort = timed(stage_sort, dc, dcam, dset)
    t_rng = timed(stage_ranges, dc, dcam, dset)
    t_pre = timed(stage_pre_raster, dc, dcam, dset, bg)
    t_full = timed(stage_full, dc, dcam, dset, bg)
    sub = (config.tile_w * config.tile_h) // 128
    tiles0 = jnp.zeros((tx * ty, 4, sub, 128), jnp.float32)
    t_asm = timed(stage_assembly, tiles0, bg)
    print(f"backend={jax.default_backend()} n={n} {width}x{height} "
          f"slots={config.tile_slots} sort={config.sort_backend} "
          f"compact={config.compact} composite={config.composite} "
          f"alpha_thr={config.alpha_threshold}")
    print(f"frontend (pre+emit+compact): {t_front:8.2f} ms")
    print(f"+ sort                : {t_sort:8.2f} ms  (sort ~ {t_sort - t_front:.2f})")
    print(f"+ tile ranges         : {t_rng:8.2f} ms  (ranges ~ {t_rng - t_sort:.2f})")
    print(f"+ overflow splice     : {t_pre:8.2f} ms  (overflow ~ {t_pre - t_rng:.2f})")
    print(f"full frame            : {t_full:8.2f} ms  (raster+asm ~ {t_full - t_pre:.2f})")
    print(f"tile->image assembly  : {t_asm:8.2f} ms  (isolated; raster ~ "
          f"{t_full - t_pre - t_asm:.2f})")


if __name__ == "__main__":
    main()
