#!/usr/bin/env python
"""Rasterizer config sweep: frame/raster ms across tile shape / banding /
segment knobs (VERDICT r1 item 2c).

Each config is compiled and slope-timed like profile_stages.py; tile-shape
changes alter instance counts and sort volume, so the FULL frame is the
decision metric, with the raster-only share printed for attribution.

Usage: python scripts/sweep_raster.py [n_splats] [width] [height]
Optionally set WS_SWEEP to a semicolon list "tw,th,bands[,seg_k,batch]".
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

import jax
import jax.numpy as jnp
import numpy as np

from websplat_tpu.config import RasterConfig, SplattingArgs, resolve_settings
from websplat_tpu.models.camera import CameraUniforms
from websplat_tpu.ops.sort import sort_instances, tile_ranges
from websplat_tpu.render.renderer import (
    camera_to_device,
    render_frame_impl,
    settings_to_device,
    upload_cloud,
)
from synth import make_bench_cloud, make_camera


def timed(f, *args, n1=2, n2=8):
    def loop(n):
        @jax.jit
        def g(*a):
            def body(i, acc):
                return acc + f(*a, salt=i)
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

    dc = upload_cloud(cloud)
    dcam = camera_to_device(uni)
    dset = settings_to_device(settings)
    bg = jnp.asarray(settings.background_color, jnp.float32)

    def salted(cam, salt):
        return cam._replace(view=cam.view + salt * 1e-12)

    spec = os.environ.get(
        "WS_SWEEP",
        "32,16,1;32,16,2;32,16,4;32,16,8;64,16,4;64,16,8;32,32,4;32,32,8",
    )
    configs = []
    for item in spec.split(";"):
        parts = [int(x) for x in item.split(",")]
        tw, th, bands = parts[:3]
        kw = {}
        if len(parts) > 3:
            kw["seg_k"] = parts[3]
        if len(parts) > 4:
            kw["group_batch"] = parts[4]
        # instance counts scale ~ (1 + ex/tw)(1 + ey/th): smaller tiles need
        # proportionally more capacity or instances silently drop and the
        # timing (and image) is invalid.  Scale the 32x16-tuned factor.
        kw.setdefault(
            "instance_capacity_factor",
            2.0 * max(1.0, ((32 / tw) * (16 / th)) ** 0.5),
        )
        configs.append(
            dataclasses.replace(
                RasterConfig(), tile_w=tw, tile_h=th, y_bands=bands, **kw
            )
        )

    print(f"backend={jax.default_backend()} n={n} {width}x{height}")
    for config in configs:
        tx, ty = config.tiles_for(width, height)
        _, depth_bits = config.key_bits(width, height)

        def stage_ranges(dc, dcam, dset, salt=0, config=config, tx=tx, ty=ty,
                         depth_bits=depth_bits):
            from websplat_tpu.ops.frontend_pallas import fused_frontend

            cap = max(
                4096, int(config.instance_capacity_factor * dc.opacity.shape[0])
            )
            k, p, _, _, _, _ = fused_frontend(
                dc, salted(dcam, salt), dset, width=width, height=height,
                config=config, capacity=cap,
            )
            sk, sp = sort_instances(k, p, backend=config.sort_backend)
            r = tile_ranges(sk, tx * ty, depth_bits)
            return (
                sk[::65536].astype(jnp.float32).sum()
                + sum(w[::65536].astype(jnp.float32).sum() for w in sp)
                + r.astype(jnp.float32).sum()
            )

        def stage_full(dc, dcam, dset, bg, salt=0, config=config):
            img = render_frame_impl(dc, salted(dcam, salt), dset, bg,
                                    width=width, height=height, config=config)
            return img[::256, ::256].sum()

        try:
            _, diag = render_frame_impl(
                dc, dcam, dset, bg, width=width, height=height, config=config,
                return_diag=True,
            )
            diag = {k: int(v) for k, v in diag.items()}
            print(f"tile={config.tile_w}x{config.tile_h}: "
                  f"instances={diag.get('num_instances')} "
                  f"dropped={diag.get('num_dropped')} "
                  f"clamped_resid={diag.get('num_clamped')}", flush=True)
            if os.environ.get("WS_SWEEP_RANGES"):
                t_rng = timed(stage_ranges, dc, dcam, dset)
                print(f"tile={config.tile_w}x{config.tile_h}: "
                      f"front+sort+rng {t_rng:6.2f} ms", flush=True)
            t_full = timed(stage_full, dc, dcam, dset, bg)
        except Exception as e:  # noqa: BLE001 — sweep survives bad configs
            print(f"tile={config.tile_w}x{config.tile_h} bands={config.y_bands} "
                  f"seg_k={config.seg_k} batch={config.group_batch}: "
                  f"FAILED {type(e).__name__}: {e}", flush=True)
            continue
        print(f"tile={config.tile_w}x{config.tile_h} bands={config.y_bands} "
              f"seg_k={config.seg_k} batch={config.group_batch}: "
              f"full {t_full:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
