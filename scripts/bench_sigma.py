#!/usr/bin/env python
"""FPS sensitivity to the synthetic splat-size distribution (VERDICT r1
weak #7): the benchmark cloud draws ln(scale) ~ N(-6.48, sigma); real
trained scenes vary in their size tail, so this bounds how much the
headline FPS depends on the assumed sigma.

Usage: python scripts/bench_sigma.py [sigmas...]   (default 0.9 1.1 1.3)
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
from websplat_tpu.render.renderer import (
    camera_to_device,
    render_frame_impl,
    settings_to_device,
    upload_cloud,
)
from synth import make_camera, make_cloud

N = 1_244_819
W, H = 1200, 799


def timed_frame(dc, dcam, dset, bg, config, n1=2, n2=8):
    def loop(n):
        @jax.jit
        def g(dc, dcam, dset, bg):
            def body(i, acc):
                cam = dcam._replace(view=dcam.view + i * 1e-12)
                img = render_frame_impl(
                    dc, cam, dset, bg, width=W, height=H, config=config
                )
                return acc + img[::256, ::256].sum()
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
        return g

    f1, f2 = loop(n1), loop(n2)
    float(f1(dc, dcam, dset, bg)); float(f2(dc, dcam, dset, bg))
    ts = []
    for g, n in [(f1, n1), (f2, n2), (f1, n1), (f2, n2)]:
        t0 = time.perf_counter()
        float(g(dc, dcam, dset, bg))
        ts.append((time.perf_counter() - t0, n))
    t1 = min(t for t, n in ts if n == n1)
    t2 = min(t for t, n in ts if n == n2)
    return (t2 - t1) / (n2 - n1) * 1e3


def main():
    sigmas = [float(s) for s in sys.argv[1:]] or [0.9, 1.1, 1.3]
    config = RasterConfig()
    for sigma in sigmas:
        rng = np.random.default_rng(0)
        cloud = make_cloud(rng, n=N, extent=2.0, scale_lognormal=(-6.48, sigma))
        cam = make_camera(viewport=(W, H), distance=3.0)
        cam.fit_near_far(*cloud.aabb)
        uni = CameraUniforms.from_camera(cam, (W, H))
        settings = resolve_settings(SplattingArgs(), cloud)
        dc = upload_cloud(cloud)
        dcam = camera_to_device(uni)
        dset = settings_to_device(settings)
        bg = jnp.asarray(settings.background_color, jnp.float32)
        _, diag = render_frame_impl(
            dc, dcam, dset, bg, width=W, height=H, config=config,
            return_diag=True,
        )
        ms = timed_frame(dc, dcam, dset, bg, config)
        print(
            f"sigma={sigma:.1f}: {ms:6.2f} ms/frame ({1e3/ms:6.2f} FPS)  "
            f"instances={int(diag['num_instances'])} "
            f"visible={int(diag['num_visible'])}",
            flush=True,
        )


if __name__ == "__main__":
    main()
