#!/usr/bin/env python
"""Sweep RasterConfig variants on the real TPU in ONE process.

Prints, per variant: full-frame ms (two-length slope, salted — see
scripts/profile_stages.py for why) and the instance diagnostics
(num_visible / num_instances / num_dropped / num_clamped) that bound how far
``instance_capacity_factor`` can be lowered safely.
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tests"))

import numpy as np

import jax

from websplat_tpu.utils import compile_cache

compile_cache.enable()
import jax.numpy as jnp

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
    f1 = jax.jit(lambda *a: f(*a, salt=jnp.float32(0)))

    def run(n):
        @jax.jit
        def many(*a):
            def body(i, acc):
                return acc + f(*a, salt=acc * 1e-30 + jnp.float32(i) * 1e-30)

            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        float(many(*args))
        t0 = time.perf_counter()
        float(many(*args))
        return time.perf_counter() - t0

    run(1)
    t1 = run(n1)
    t2 = run(n2)
    return (t2 - t1) / (n2 - n1) * 1e3


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_244_819
    width, height = 1200, 799

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

    base = RasterConfig()
    variants = [
        ("base 32x16 cap2.0 sk2 gb4", base),
        ("cap1.85", dataclasses.replace(base, instance_capacity_factor=1.85)),
        ("seg_k1", dataclasses.replace(base, seg_k=1)),
        ("seg_k4", dataclasses.replace(base, seg_k=4)),
        ("gb8", dataclasses.replace(base, group_batch=8)),
        ("gb2", dataclasses.replace(base, group_batch=2)),
        ("eps1e-3", dataclasses.replace(base, transmittance_eps=1e-3)),
    ]

    for name, cfg in variants:
        # diagnostics once (cheap readback outside timing)
        _, diag = jax.jit(
            lambda dc, dcam, dset, bg: render_frame_impl(
                dc, dcam, dset, bg, width=width, height=height,
                config=cfg, return_diag=True,
            )
        )(dc, dcam, dset, bg)
        diag = {k: int(v) for k, v in jax.device_get(diag).items()}

        def frame(dc, dcam, dset, bg, salt):
            cam_s = dcam._replace(view=dcam.view + salt)
            img = render_frame_impl(
                dc, cam_s, dset, bg, width=width, height=height, config=cfg
            )
            return jnp.sum(img[::191, ::191])

        ms = timed(frame, dc, dcam, dset, bg)
        print(f"{name:28s}: {ms:7.2f} ms  {diag}", flush=True)


if __name__ == "__main__":
    main()
