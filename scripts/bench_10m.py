#!/usr/bin/env python
"""10M-splat stretch benchmark (BASELINE.json config 5).

Synthesizes a 10M-splat COMPRESSED cloud (c3dgs-style int8/index streams +
codebooks, io/npz.py QuantizedStreams) and renders it single-chip through the
compressed-residency path: ~22 B/splat in HBM (~0.22 GB at 10M) with
per-frame in-jit dequantization (renderer.decompress_cloud), the TPU
analogue of the reference keeping quantized buffers on the GPU and
dequantizing in preprocess_compressed.wgsl:137-171,216-242.  The reference
itself cannot scale past one GPU (SURVEY.md §2.9); the multi-chip version of
this path is exercised by `__graft_entry__.dryrun_multichip` (splat-sharded).

Usage: python scripts/bench_10m.py [n_splats] [width] [height]
Prints one JSON line: {"metric": "fps_synthetic_10m_compressed", ...}
"""

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
from websplat_tpu.io.loader import GaussianCloud
from websplat_tpu.io.npz import QuantizedStreams
from websplat_tpu.models.camera import CameraUniforms
from websplat_tpu.render.renderer import (
    camera_to_device,
    render_frame,
    settings_to_device,
    upload_compressed_cloud,
)
from synth import make_camera


def make_compressed_cloud(rng, n, extent=2.0, n_geom=4096, n_sh=4096):
    """c3dgs-like synthetic compressed cloud: codebook covariances (world
    units calibrated like make_bench_cloud's log-normal so the projected
    footprint matches trained scenes) + int8 opacity / scale-factor."""
    from websplat_tpu.utils.gmath import build_cov
    from synth import random_quats

    xyz = rng.normal(size=(n, 3)).astype(np.float32) * extent * 0.4
    # codebook geometry: C distinct covariances, heavy-tailed scales
    log_s = rng.normal(-6.48, 1.1, size=(n_geom, 3)).astype(np.float32)
    covars = build_cov(random_quats(rng, n_geom), np.exp(log_s) * extent)
    covars = covars.astype(np.float16).astype(np.float32)  # npz.rs:197-202
    geom_idx = rng.integers(0, n_geom, size=(n,), dtype=np.int32)
    sh_codebook = np.zeros((n_sh, 16, 3), np.float32)
    sh_codebook[:, 0, :] = rng.uniform(-0.5, 2.0, size=(n_sh, 3))
    sh_codebook[:, 1:, :] = rng.normal(0, 0.05, size=(n_sh, 15, 3))
    sh_idx = rng.integers(0, n_sh, size=(n,), dtype=np.int32)
    opacity_q = rng.integers(-127, 128, size=(n,), dtype=np.int8)
    q = QuantizedStreams(
        opacity_q=opacity_q,
        opacity_scale=0.35 / 127.0,
        opacity_zp=-127.0,  # dequantized opacity in (0, 0.7)
        scale_factor_q=rng.integers(-32, 33, size=(n,), dtype=np.int8),
        sf_scale=0.01,
        sf_zp=0.0,
        covars=covars,
        geom_idx=geom_idx,
        sh_codebook=sh_codebook,
        sh_idx=sh_idx,
    )
    # decoded attributes only used for aabb/metadata here
    lo, hi = xyz.min(axis=0), xyz.max(axis=0)
    return GaussianCloud(
        xyz=xyz, cov=None, opacity=None, sh=None, sh_deg=3, num_points=n,
        quantized=q, compressed=True, aabb=(lo, hi),
    )


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    width = int(sys.argv[2]) if len(sys.argv) > 2 else 1200
    height = int(sys.argv[3]) if len(sys.argv) > 3 else 799
    # camera distance: at the default 3.0 the frustum sees ~78% of the
    # cloud and cull-before-gather LOSES (measured 2.73 -> 2.57 FPS: the
    # predicate + 10M-row compact costs more than the ~10% capacity cut
    # saves).  A walkthrough-style camera inside the cloud (e.g. 0.45)
    # sees a small fraction and is the regime the cull is for.
    distance = float(sys.argv[4]) if len(sys.argv) > 4 else 3.0

    rng = np.random.default_rng(0)
    cloud = make_compressed_cloud(rng, n)
    cam = make_camera(viewport=(width, height), distance=distance)
    cam.fit_near_far(*cloud.aabb)
    args = SplattingArgs()
    settings = resolve_settings(args, cloud)
    uni = CameraUniforms.from_camera(cam, (width, height))

    dc = upload_compressed_cloud(cloud)
    hbm_bytes = sum(
        np.prod(x.shape) * x.dtype.itemsize
        for x in jax.tree_util.tree_leaves(dc)
    )
    dset = settings_to_device(settings)
    bg = jnp.asarray(settings.background_color, jnp.float32)
    dcam = camera_to_device(uni)

    # Size the cull-before-gather capacity from the MEASURED visible
    # fraction at the bench camera (+15% headroom), the sizing recipe the
    # config knob documents.  One cheap readback, outside all timing.
    from websplat_tpu.render.renderer import frustum_visible

    n_vis = int(jax.jit(
        lambda dc, dcam, dset: jnp.sum(
            frustum_visible(dc.xyz, dcam, dset).astype(jnp.int32))
    )(dc, dcam, dset))
    cull_factor = min(1.0, 1.15 * n_vis / n)

    import dataclasses

    base = RasterConfig.for_viewport(width, height)
    variants = [
        ("full_n", base),
        ("culled", dataclasses.replace(
            base, compressed_cull_factor=cull_factor)),
    ]
    for name, config in variants:
        def frame(cam_dev, salt, config=config):
            c = cam_dev._replace(view=cam_dev.view + salt * 1e-12)
            img = render_frame(
                dc, c, dset, bg, width=width, height=height, config=config,
                compressed=True,
            )
            return img[::256, ::256].sum()

        @jax.jit
        def loop(cam_dev, k, frame=frame):
            def body(i, acc):
                return acc + frame(cam_dev, i.astype(jnp.float32))
            return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

        float(loop(dcam, 1))  # compile + warmup
        n1, n2 = 2, 8
        ts = {}
        for k in (n1, n2, n1, n2):
            t0 = time.perf_counter()
            float(loop(dcam, k))
            ts.setdefault(k, []).append(time.perf_counter() - t0)
        per_frame = (min(ts[n2]) - min(ts[n1])) / (n2 - n1)
        fps = 1.0 / per_frame
        # the LAST printed line (culled) is the headline configuration
        print(json.dumps({
            "metric": "fps_synthetic_10m_compressed",
            "value": round(fps, 2),
            "unit": "fps",
            "detail": {
                "splats": n,
                "viewport": [width, height],
                "camera_distance": distance,
                "hbm_resident_mb": round(hbm_bytes / 1e6, 1),
                "bytes_per_splat": round(hbm_bytes / n, 1),
                "ms_per_frame": round(per_frame * 1e3, 2),
                "backend": jax.default_backend(),
                "variant": name,
                "visible_splats": n_vis,
                "compressed_cull_factor": round(
                    cull_factor if name == "culled" else 0.0, 4),
            },
        }), flush=True)


if __name__ == "__main__":
    main()
