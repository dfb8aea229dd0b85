#!/usr/bin/env python
"""Splat-sharded exchange overhead on real TPU (1-device mesh).

Multi-chip hardware does not exist in this environment, but the ENTIRE
splat-sharded machinery (parallel/sharded.py: region cut -> fixed-capacity
buffers -> all_to_all -> merge -> region re-sort -> region rasterize) runs
unchanged on a 1-device mesh with the production Pallas kernels — so its
per-device overhead vs the plain single-chip frame is measurable as a
number: overhead = sharded_frame(d=1) - plain_frame.  At d=1 the dominant
overhead is the region RE-sort (the full stream sorts twice) plus the
cut/pad/merge copies; on a real d-device mesh the local sort, frontend and
raster each scale ~1/d while this overhead term stays ~constant per device,
so (sharded_d1 - plain) bounds the per-device cost of going distributed.

Usage: python scripts/bench_sharded.py [n_splats] [width] [height]
Prints one JSON line.
"""

import dataclasses
import json
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

from websplat_tpu.utils import compile_cache

compile_cache.enable()

import jax
import jax.numpy as jnp
import numpy as np

from websplat_tpu.config import RasterConfig, SplattingArgs, resolve_settings
from websplat_tpu.models.camera import CameraUniforms
from websplat_tpu.parallel.sharded import (
    make_splat_sharded_renderer,
    shard_cloud,
    splat_mesh,
)
from websplat_tpu.render.renderer import (
    camera_to_device,
    render_frame,
    settings_to_device,
    upload_cloud,
)
from synth import make_bench_cloud, make_camera


def timed(fn, *args, n1=2, n2=8):
    """Two-length slope timing (CLAUDE.md: the axon tunnel makes
    block_until_ready a no-op; chain frames inside one jit per length)."""

    def loop(n):
        @jax.jit
        def g(*a):
            def body(i, acc):
                return acc + fn(*a, salt=i.astype(jnp.float32))

            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        return g

    f1, f2 = loop(n1), loop(n2)
    float(f1(*args))
    float(f2(*args))
    ts = {}
    for g, n in [(f1, n1), (f2, n2), (f1, n1), (f2, n2)]:
        t0 = time.perf_counter()
        float(g(*args))
        ts.setdefault(n, []).append(time.perf_counter() - t0)
    return (min(ts[n2]) - min(ts[n1])) / (n2 - n1) * 1e3


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
    config = RasterConfig.for_viewport(width, height)

    mesh = splat_mesh(1)
    ty = config.tiles_for(width, height)[1]
    if ty % 1 != 0:
        raise SystemExit("unreachable")
    dset = settings_to_device(settings)
    dcam = camera_to_device(uni)
    bg = jnp.asarray(settings.background_color, jnp.float32)

    # plain single-chip frame
    dc = upload_cloud(cloud)

    def plain(dc, dcam, dset, bg, salt):
        c = dcam._replace(view=dcam.view + salt * 1e-12)
        img = render_frame(
            dc, c, dset, bg, width=width, height=height, config=config
        )
        return img[::256, ::256].sum()

    ms_plain = timed(plain, dc, dcam, dset, bg)

    # sharded frame on the 1-device mesh, production config.  Region
    # capacity must hold the whole stream at d=1: size from the measured
    # instance count (one diag readback, outside timing) + 15% headroom.
    _, diag = render_frame(
        dc, dcam, dset, bg, width=width, height=height, config=config,
        return_diag=True,
    )
    n_inst = int(diag["num_instances"])
    region_capacity = int(1.15 * n_inst)
    sharded = make_splat_sharded_renderer(
        mesh, width=width, height=height, config=config,
        region_capacity=region_capacity,
    )
    dcs = shard_cloud(dc._replace(fat=None), mesh)

    def shard_frame(dcs, dcam, dset, bg, salt):
        c = dcam._replace(view=dcam.view + salt * 1e-12)
        img, _stats = sharded(dcs, c, dset, bg)
        return img[::256, ::256].sum()

    ms_sharded = timed(shard_frame, dcs, dcam, dset, bg)

    _, stats = sharded(dcs, dcam, dset, bg)
    print(json.dumps({
        "metric": "sharded_exchange_overhead_ms",
        "value": round(ms_sharded - ms_plain, 2),
        "unit": "ms",
        "detail": {
            "plain_ms": round(ms_plain, 2),
            "sharded_d1_ms": round(ms_sharded, 2),
            "splats": n,
            "instances": n_inst,
            "region_capacity": region_capacity,
            "dropped_exchange": int(stats["num_dropped_exchange"]),
            "backend": jax.default_backend(),
        },
    }), flush=True)


if __name__ == "__main__":
    main()
