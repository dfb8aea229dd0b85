#!/usr/bin/env python
"""Alpha-threshold sweep on real TPU: instance count + sort + full frame.

RasterConfig.alpha_threshold culls instances whose PEAK per-pixel
contribution is below thr (see config.py); this sweep measures how much of
the sorted volume / frame time it buys at the bench scene, alongside the
PSNR gate in scripts/psnr_check.py (which bounds the quality cost).

Usage: python scripts/sweep_alpha.py [n_splats] [width] [height]
"""

import dataclasses
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
    bg = jnp.zeros((3,), jnp.float32)

    print(f"backend={jax.default_backend()} n={n} {width}x{height}")
    for thr in (0.0, 1.0 / 512.0, 1.0 / 255.0, 1.0 / 128.0):
        cfg = RasterConfig(alpha_threshold=thr)

        def salted(cam, salt):
            return cam._replace(view=cam.view + salt * 1e-12)

        def full(dc, dcam, dset, bg, salt=0, cfg=cfg):
            img = render_frame_impl(dc, salted(dcam, salt), dset, bg,
                                    width=width, height=height, config=cfg)
            return img[::256, ::256].sum()

        # instance count at this threshold (one readback, outside timing)
        from websplat_tpu.ops.frontend_pallas import fused_frontend

        cap = max(4096, int(cfg.instance_capacity_factor * n))
        res = jax.jit(
            lambda dc, dcam, dset: fused_frontend(
                dc, dcam, dset, width=width, height=height, config=cfg,
                capacity=cap,
            )[4]
        )(dc, dcam, dset)
        n_inst = int(res)
        ms = timed(full, dc, dcam, dset, bg)
        print(f"alpha_thr={thr:.6f}: frame {ms:7.2f} ms  n_inst={n_inst}",
              flush=True)


if __name__ == "__main__":
    main()
