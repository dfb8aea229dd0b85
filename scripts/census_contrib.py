#!/usr/bin/env python
"""Sorted-instance contribution census: how much of the sort's m is waste?

Answers the round-4 VERDICT question behind any further sort work: "what
fraction of sorted instances contribute >= 1 display quantum to the final
image?"  If ~all do, m cannot shrink without quality loss and the sort is
closed at its measured operand floor (ops/sort.py header).

Method: build the bench scene/camera (bench.py's exact workload), pull the
sorted instance stream + tile ranges via ``render_frame_impl(...,
stop_after="ranges")``, then re-run the blend math EXACTLY (the XLA
rasterizer's closed-form front-to-back weights, rasterize_xla.py:22-37 —
the same w_i = alpha_i * prod_{j<i}(1-alpha_j) the Pallas kernel
accumulates) and take each instance's MAX weight over its tile's pixels.
An instance with max weight w can move a display channel by at most
w * |color| (colors are O(1)), so w < 1/510 (half an 8-bit quantum)
means it cannot change the rounded output pixel; the census counts
instances above/below that and finer thresholds.

This is a measurement harness, not a frame-path op: it uses
per-tile gathers the frame deliberately avoids (CLAUDE.md design rule).
Reference context being interrogated: the reference sorts EVERY rect-
touching instance with no contribution cut (src/shaders/preprocess.wgsl:
tile loop + gpu_rs.rs 8-byte records) — affordable on a hardware raster
GPU, 4.6-5.3 ms of lax.sort here.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests")
)

import numpy as np

WIDTH, HEIGHT = 1200, 799
N_SPLATS = 1_244_819


def main():
    import jax
    import jax.numpy as jnp

    from websplat_tpu.config import RasterConfig, SplattingArgs, resolve_settings
    from websplat_tpu.models.camera import CameraUniforms
    from websplat_tpu.ops import packing
    from websplat_tpu.ops.rasterize_xla import blend_weights, splat_alpha
    from websplat_tpu.render.renderer import (
        camera_to_device,
        render_frame_impl,
        settings_to_device,
        upload_cloud,
    )
    from websplat_tpu.utils import compile_cache

    compile_cache.enable()
    from synth import make_bench_cloud, make_camera

    cloud = make_bench_cloud(np.random.default_rng(0), n=N_SPLATS)
    cam = make_camera(viewport=(WIDTH, HEIGHT), azimuth=0.0, distance=3.0)
    cam.fit_near_far(*cloud.aabb)
    uni = CameraUniforms.from_camera(cam, (WIDTH, HEIGHT))
    settings = resolve_settings(SplattingArgs(), cloud)
    config = RasterConfig.from_env()

    dc = upload_cloud(cloud)
    dcam = camera_to_device(uni)
    dset = settings_to_device(settings)
    bg = jnp.asarray(settings.background_color, jnp.float32)

    stream = jax.jit(
        lambda dc, dcam, dset, bg: render_frame_impl(
            dc, dcam, dset, bg, width=WIDTH, height=HEIGHT, config=config,
            stop_after="ranges",
        )
    )
    t0 = time.time()
    sorted_keys, sorted_payload, ranges = stream(dc, dcam, dset, bg)
    ranges_h = np.asarray(jax.device_get(ranges))
    print(
        f"stream built in {time.time() - t0:.1f}s: m_sorted={ranges_h[-1]}, "
        f"max_per_tile={np.diff(ranges_h).max()}",
        file=sys.stderr,
    )

    m_real = int(ranges_h[-1])
    kmax = int(np.diff(ranges_h).max())
    kmax_pad = -(-kmax // 256) * 256
    tw, th = config.tile_w, config.tile_h
    tx_tiles, ty_tiles = config.tiles_for(WIDTH, HEIGHT)
    num_tiles = tx_tiles * ty_tiles
    cq = packing.CenterQuant.for_viewport(WIDTH, HEIGHT)
    w0, w1, w2, w3 = sorted_payload
    m = w0.shape[0]

    ty_ix = jnp.arange(tw * th) // tw
    tx_ix = jnp.arange(tw * th) % tw
    # half a display quantum of a [0,1] channel under round-to-nearest
    # 8-bit encode, then finer rungs for sensitivity
    THRESHOLDS = (1.0 / 255.0, 1.0 / 510.0, 1.0 / 1020.0, 1.0 / 2550.0, 1e-5)
    # per-tile early-exit thresholds to census live (unskippable) depth at:
    # the production transmittance_eps, a tighter one, and exact
    LIVE_EPS = (float(config.transmittance_eps), 1e-3, 0.0)

    def tile_counts(t):
        start = ranges[t]
        count = jnp.minimum(ranges[t + 1] - start, kmax_pad)
        idx = jnp.minimum(start + jnp.arange(kmax_pad), m - 1)
        valid = jnp.arange(kmax_pad) < count
        px_c, py_c, ha, bb, hc, op, _r, _g, _b = packing.unpack_record(
            w0[idx], w1[idx], w2[idx], w3[idx], cq
        )
        tile_x = (t % tx_tiles) * tw
        tile_y = (t // tx_tiles) * th
        pix_x = (tile_x + tx_ix).astype(jnp.float32) + 0.5
        pix_y = (tile_y + ty_ix).astype(jnp.float32) + 0.5
        alpha = splat_alpha(
            px_c[:, None], py_c[:, None], ha[:, None], bb[:, None],
            hc[:, None], op[:, None], pix_x[None, :], pix_y[None, :],
        )
        alpha = jnp.where(valid[:, None], alpha, 0.0)
        weights, _t_final = blend_weights(alpha, axis=0)
        wmax = jnp.max(weights, axis=1)  # (K,) per-instance max contribution
        # live depth: instances BEFORE the tile saturates (some pixel still
        # has exclusive transmittance >= eps) — the blend work a
        # front-to-back compositor with a per-tile early exit cannot skip;
        # the raster roofline's unavoidable-instance count
        t_excl = jnp.concatenate(
            [jnp.ones((1, alpha.shape[1])), jnp.cumprod(1.0 - alpha, axis=0)[:-1]],
            axis=0,
        )
        t_live = jnp.max(t_excl, axis=1)  # (K,) max pixel transmittance
        return jnp.stack(
            [jnp.sum((wmax >= thr) & valid) for thr in THRESHOLDS]
            + [jnp.sum((t_live >= eps) & valid) for eps in LIVE_EPS]
            + [jnp.sum(valid)]
        )

    CHUNK = 16
    n_steps = -(-num_tiles // CHUNK)

    @jax.jit
    def census():
        def step(c, i):
            ts = i * CHUNK + jnp.arange(CHUNK)
            ts = jnp.minimum(ts, num_tiles - 1)
            # the min-clamp double-counts the last tile on the ragged final
            # step; mask those duplicates out
            ok = (i * CHUNK + jnp.arange(CHUNK)) < num_tiles
            cnt = jax.vmap(tile_counts)(ts)
            return c + jnp.sum(jnp.where(ok[:, None], cnt, 0), axis=0), None

        init = jnp.zeros((len(THRESHOLDS) + len(LIVE_EPS) + 1,), jnp.int32)
        out, _ = jax.lax.scan(step, init, jnp.arange(n_steps))
        return out

    t0 = time.time()
    counts = np.asarray(jax.device_get(census()))
    print(f"census ran in {time.time() - t0:.1f}s", file=sys.stderr)

    total = int(counts[-1])
    result = {
        "metric": "sorted_instance_contribution_census",
        "scene": "synthetic bonsai (bench.py workload), view azimuth=0",
        "m_sorted": m_real,
        "m_censused": total,
        "thresholds": {
            f">={thr:.6f}": {
                "count": int(c),
                "fraction": round(float(c) / max(total, 1), 4),
            }
            for thr, c in zip(THRESHOLDS, counts[: len(THRESHOLDS)])
        },
        "live_depth": {
            f"eps={eps:g}": {
                "count": int(c),
                "fraction": round(float(c) / max(total, 1), 4),
            }
            for eps, c in zip(
                LIVE_EPS, counts[len(THRESHOLDS) : len(THRESHOLDS) + len(LIVE_EPS)]
            )
        },
        "note": "thresholds: fraction of instances whose max pixel weight "
        "w=alpha*T reaches the level (>=1/510 = can move a display pixel). "
        "live_depth: instances reached before their tile saturates at eps "
        "(max pixel T_excl >= eps) - the blend work a per-tile early-exit "
        "compositor cannot skip; the raster roofline's unavoidable count.",
    }
    print(json.dumps(result, indent=1))
    out_path = os.environ.get("WS_CENSUS_OUT")
    if out_path:
        with open(out_path, "w") as f:
            json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
