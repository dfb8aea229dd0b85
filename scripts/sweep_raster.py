#!/usr/bin/env python
"""Sweep rasterizer inner-loop variants x tile shapes on real TPU.

Times ONLY the rasterize stage (frontend/sort/ranges run once, their outputs
feed every kernel variant) with the slope method (two chained-iteration
counts inside one jit; the difference cancels fixed overhead — the axon
tunnel makes block_until_ready a no-op, see CLAUDE.md).

Usage: python scripts/sweep_raster.py [n_splats] [width] [height]
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
from websplat_tpu.ops.sort import sort_instances, tile_ranges
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


def frontend_sorted(cloud, cam, dset, width, height, config):
    """One frontend+sort pass -> (sorted payload, ranges) device arrays."""
    from websplat_tpu.ops.frontend_pallas import fused_frontend

    n = cloud.opacity.shape[0]
    cap = max(4096, int(config.instance_capacity_factor * n))
    keys, payload, _, _, num_valid, _ = fused_frontend(
        cloud, cam, dset, width=width, height=height, config=config,
        capacity=cap,
    )
    sk, sp = sort_instances(keys, payload, n_valid=jnp.minimum(num_valid, cap))
    tx, ty = config.tiles_for(width, height)
    _, depth_bits = config.key_bits(width, height)
    ranges = tile_ranges(sk, tx * ty, depth_bits)
    return sp, ranges


def main():
    pos = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = int(pos[0]) if len(pos) > 0 else 1_244_819
    width = int(pos[1]) if len(pos) > 1 else 1200
    height = int(pos[2]) if len(pos) > 2 else 799

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

    from websplat_tpu.ops.rasterize_pallas import rasterize_pallas

    if "--btree" in sys.argv:
        # round-4: cross-group transmittance prefix tree (scan_batch_tree)
        # vs the serial carry, across batch widths — if the serial (1, P)
        # transmittance chain is a latency wall, wider batches + tree win
        # and tile size starts mattering again
        shapes = [(32, 32), (16, 16)]
        variants = [("scan", "monomial")]
        tune = [(sk, gb, bt) for bt in (False, True)
                for sk in (2,) for gb in (4, 8)]
        tune += [(1, 8, True), (4, 8, True), (2, 16, True)]
    elif "--tune" in sys.argv:
        # second pass: seg_k x group_batch at the shape/variant winners
        shapes = [(32, 32), (64, 16)]
        variants = [("scan", "monomial")]
        tune = [(sk, gb) for sk in (1, 2, 4) for gb in (2, 4, 8)]
    elif "--big" in sys.argv:
        # third pass: the first sweep's trend favored LARGER tiles for
        # scan/monomial (fewer instances beat more per-splat pixel work) —
        # chase it past 1024 px/tile
        shapes = [(64, 16), (16, 32), (64, 32), (32, 64), (128, 16)]
        variants = [("scan", "monomial")]
        tune = [(None, None)]
    elif "--mxu" in sys.argv:
        # MXU slab kernel vs the VPU scan winner, across the f32-emulation
        # pass counts (second element = mxu_precision, not qform)
        shapes = [(32, 32), (64, 16), (32, 16), (64, 32)]
        variants = [("scan", "monomial"), ("mxu", "default"),
                    ("mxu", "high"), ("mxu", "highest")]
        tune = [(None, None)]
    elif "--mxuskip" in sys.argv:
        # per-slab lax.cond (group_skip) serializes the 8 slab instruction
        # streams; measure the skip-free kernels (second element = skip mode)
        shapes = [(32, 32)]
        variants = [("scan", "monomial"), ("mxu", "skip"), ("mxu", "noskip"),
                    ("hybrid", "skip"), ("hybrid", "noskip")]
        tune = [(None, None)]
    else:
        shapes = [(32, 16), (16, 16), (32, 8), (16, 8), (64, 8), (32, 32)]
        variants = [("tree", "direct"), ("scan", "direct"),
                    ("tree", "monomial"), ("scan", "monomial")]
        tune = [(None, None)]
    base_img = None
    print(f"backend={jax.default_backend()} n={n} {width}x{height}")
    for tw, th in shapes:
        # generous capacity: small tiles emit ~2x the instances and a
        # capacity overflow would silently shrink the timed work
        cfg = RasterConfig(tile_w=tw, tile_h=th, instance_capacity_factor=3.0)
        sp, ranges = jax.jit(
            frontend_sorted, static_argnames=("width", "height", "config")
        )(dc, dcam, dset, width=width, height=height, config=cfg)
        sp = jax.block_until_ready(sp)
        n_inst = int(ranges[-1])
        zero = jnp.uint32(0)  # runtime-zero the tracer cannot fold
        for (composite, qform), t in [
            (v, t) for v in variants for t in tune
        ]:
            sk, gb = t[0], t[1]
            bt = t[2] if len(t) > 2 else None
            if composite in ("mxu", "hybrid") and qform in ("skip", "noskip"):
                over = dict(composite=composite, mxu_precision="default",
                            group_skip=(qform == "skip"))
            elif composite == "hybrid":
                over = dict(composite="hybrid")
            elif composite == "mxu":
                over = dict(composite="mxu", mxu_precision=qform)
            else:
                over = dict(composite=composite, qform=qform)
            label = f"{composite}/{qform}"
            if sk is not None:
                over.update(seg_k=sk, group_batch=gb)
                label += f" seg={sk} gb={gb}"
            if bt is not None:
                over.update(scan_batch_tree=bt)
                label += f" btree={int(bt)}"
            c = dataclasses.replace(cfg, **over)

            def stage(sp, ranges, bg, zero, salt=0, c=c):
                # XOR a payload word with salt*zero: the kernel input then
                # depends on the loop index (no hoist/CSE of the pallas_call
                # out of the chained loop) while the runtime values — and
                # the work — stay identical
                w3 = sp[3] ^ (salt.astype(jnp.uint32) * zero)
                img = rasterize_pallas(
                    (sp[0], sp[1], sp[2], w3), ranges, bg,
                    width=width, height=height, config=c,
                )
                return img[::256, ::256].sum()

            try:
                ms = timed(stage, sp, ranges, bg, zero)
            except Exception as e:  # Mosaic lowering failures show up here
                print(f"{tw}x{th} {label}: FAIL {type(e).__name__}: {str(e)[:120]}")
                continue
            img = None
            note = ""
            if tw == 32 and th == 16:
                # cross-check outputs at the default shape
                img = np.asarray(jax.device_get(rasterize_pallas(
                    sp, ranges, bg, width=width, height=height, config=c)))
                if base_img is None:
                    base_img = img
                else:
                    note = f"  maxdiff={np.abs(img - base_img).max():.2e}"
            print(f"{tw}x{th} {label}: {ms:7.2f} ms  n_inst={n_inst}{note}",
                  flush=True)


if __name__ == "__main__":
    main()
