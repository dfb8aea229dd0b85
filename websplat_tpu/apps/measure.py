"""FPS benchmark harness.

Equivalent of the reference ``measure`` binary
(/root/reference/src/bin/measure.rs): renders all Train cameras at a fixed
2048x2048, ``samples`` times each, one warmup render excluded for lazy init
(measure.rs:59-96), average FPS = 1 / (wall / (views * samples))
(measure.rs:148-153), no per-frame readbacks.

TPU adaptation: the axon tunnel makes ``block_until_ready`` a no-op, so each
sample pass renders every view inside ONE jitted ``lax.map`` program and the
sync is a single tiny readback — the same no-readback-inside-timing spirit.

Usage:
    python -m websplat_tpu.apps.measure INPUT.ply|npz [SCENE.json]
        [--width 2048 --height 2048] [--samples 10]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from websplat_tpu.apps.common import load_inputs
from websplat_tpu.config import RasterConfig, SplattingArgs, resolve_settings
from websplat_tpu.models.camera import CameraUniforms
from websplat_tpu.models.scene import Split
from websplat_tpu.parallel.multiview import render_views, stack_cameras
from websplat_tpu.render.renderer import settings_to_device, upload_cloud


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("input")
    ap.add_argument("scene", nargs="?", default=None)
    ap.add_argument("--width", type=int, default=2048)
    ap.add_argument("--height", type=int, default=2048)
    ap.add_argument("--samples", type=int, default=10)
    args_ns = ap.parse_args(argv)

    cloud, scene = load_inputs(args_ns.input, args_ns.scene)
    cams = scene.cameras(Split.TRAIN)
    w, h = args_ns.width, args_ns.height

    unis = []
    for sc in cams:
        cam = sc.to_perspective()
        cam.projection.resize(w, h)
        cam.fit_near_far(*cloud.aabb)
        unis.append(CameraUniforms.from_camera(cam, (w, h)))

    config = RasterConfig.for_viewport(w, h)
    settings = resolve_settings(SplattingArgs(walltime=100.0), cloud)
    dc = upload_cloud(cloud)
    dcams = stack_cameras(unis)
    dset = settings_to_device(settings)
    bg = jnp.asarray(settings.background_color, jnp.float32)

    @jax.jit
    def one_pass(dc, dcams, dset, bg):
        imgs = render_views(
            dc, dcams, dset, bg, width=w, height=h, config=config,
            compressed=cloud.compressed,
        )
        return jnp.sum(imgs[:, ::509, ::509, :])

    print(f"{len(cams)} train views at {w}x{h}, {args_ns.samples} samples")
    chk = float(one_pass(dc, dcams, dset, bg))  # warmup (measure.rs:59-96)

    start = time.perf_counter()
    for _ in range(args_ns.samples):
        chk = float(one_pass(dc, dcams, dset, bg))
    elapsed = time.perf_counter() - start

    frames = len(cams) * args_ns.samples
    print(f"rendered {frames} frames in {elapsed:.2f}s (checksum {chk:.3f})")
    print(f"average FPS: {frames / elapsed:.2f}")


if __name__ == "__main__":
    main()
