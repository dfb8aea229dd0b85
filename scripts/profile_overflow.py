#!/usr/bin/env python
"""Sub-stage attribution of the overflow path on TPU.

The honest overflow capacities (round 4: cap_c ~ n/24, grid ~ cap_c/16)
grew the candidate stream to ~3.3M rows at bonsai scale and the profiled
overflow stage from 0.75 to ~4.2 ms.  This script times the pieces with
the two-length slope method:

  emit      — overflow_emit alone (walk + grid candidate materialization)
  compact   — + compact_instances of the candidate stream
  full      — the production frame minus a frame with overflow disabled
              (the same attribution profile_stages reports)

Usage: python scripts/profile_overflow.py [n] [w] [h]
"""

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
from websplat_tpu.ops.compact_pallas import compact_instances
from websplat_tpu.ops.frontend_pallas import fused_frontend
from websplat_tpu.ops.preprocess import overflow_emit
from websplat_tpu.render.renderer import (
    camera_to_device,
    settings_to_device,
    upload_cloud,
)
from synth import make_bench_cloud, make_camera


def timed(f, *args, n1=2, n2=8):
    def loop(n):
        @jax.jit
        def g(*a):
            def body(i, acc):
                return acc + f(*a, salt=i.astype(jnp.uint32))

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

    dc = upload_cloud(cloud)
    dcam = camera_to_device(uni)
    dset = settings_to_device(settings)

    cap_c = config.overflow_capacity_for(n)
    g1 = config.overflow_grid_capacity_for(cap_c)
    g2 = config.overflow_dense_capacity_for(cap_c)
    tx, ty = config.tiles_for(width, height)
    walk_rows = (config.overflow_slots - config.tile_slots) * cap_c
    win_rows = (config.overflow_window_slots - config.overflow_slots) * g1
    dense_rows = tx * ty * g2
    o_raw = walk_rows + win_rows + dense_rows
    print(
        f"cap_c={cap_c} g1={g1} g2={g2} walk_rows={walk_rows} "
        f"window_rows={win_rows} dense_rows={dense_rows} o_raw={o_raw}"
    )

    capacity = max(4096, int(config.instance_capacity_factor * n))

    def frontend_cid(dc, dcam, dset, salt):
        c = dcam._replace(view=dcam.view + salt.astype(jnp.float32) * 1e-12)
        out = fused_frontend(
            dc, c, dset, width=width, height=height, config=config,
            capacity=capacity, capacity_c=cap_c,
        )
        cid = out[6]
        return sum(w[::4096].astype(jnp.float32).sum() for w in cid)

    t_fe = timed(frontend_cid, dc, dcam, dset)
    print(f"frontend+cid only      : {t_fe:7.2f} ms")

    def plus_emit(dc, dcam, dset, salt):
        c = dcam._replace(view=dcam.view + salt.astype(jnp.float32) * 1e-12)
        out = fused_frontend(
            dc, c, dset, width=width, height=height, config=config,
            capacity=capacity, capacity_c=cap_c,
        )
        okeys, owords, _ = overflow_emit(
            out[6], width=width, height=height, config=config
        )
        return (
            okeys[::4096].astype(jnp.float32).sum()
            + sum(w[::4096].astype(jnp.float32).sum() for w in owords)
        )

    t_emit = timed(plus_emit, dc, dcam, dset)
    print(f"+ overflow_emit        : {t_emit:7.2f} ms  (emit ~ {t_emit - t_fe:.2f})")

    ocap = min(cap_c * 12 + tx * ty * 4, o_raw)

    def plus_compact(dc, dcam, dset, salt):
        c = dcam._replace(view=dcam.view + salt.astype(jnp.float32) * 1e-12)
        out = fused_frontend(
            dc, c, dset, width=width, height=height, config=config,
            capacity=capacity, capacity_c=cap_c,
        )
        okeys, owords, _ = overflow_emit(
            out[6], width=width, height=height, config=config
        )
        ck, cw, cnt, drop = compact_instances(okeys, owords, capacity=ocap)
        return (
            ck[::4096].astype(jnp.float32).sum()
            + sum(w[::4096].astype(jnp.float32).sum() for w in cw)
            + cnt.astype(jnp.float32)
        )

    t_cmp = timed(plus_compact, dc, dcam, dset)
    print(
        f"+ compact({o_raw}->{ocap}): {t_cmp:7.2f} ms  "
        f"(compact ~ {t_cmp - t_emit:.2f})"
    )


if __name__ == "__main__":
    main()
