#!/usr/bin/env python
"""Benchmark: bonsai-scale synthetic scene at 1200x799, measure-binary method.

Methodology mirrors the reference benchmark harness
(/root/reference/src/bin/measure.rs:34,50,98-153): render every view
``SAMPLES`` times, one warmup pass excluded, average FPS = 1 / (wall /
(views * samples)), no per-frame readbacks.  Because this container reaches
the TPU through an async tunnel where ``block_until_ready`` does not
actually block, all frames of a repetition run inside ONE jitted program
(``lax.map`` over views) and a single tiny readback at the end forces the
sync — same no-readback-inside-timing spirit as the reference.

No real bonsai asset ships in this environment (zero egress), so the scene
is synthetic with bonsai's point count (1,244,819 splats, trained-scene-like
log-normal scale statistics).  Prints one JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

WIDTH, HEIGHT = 1200, 799
N_SPLATS = 1_244_819  # INRIA bonsai point_cloud.ply point count
N_VIEWS = 8
# 8 samples x 8 views = 64 frames per number (~1.4 s of timed wall at the
# round-2 frame rate): the reference uses all-train-views x 10
# (measure.rs:98-153); more timed frames per readback costs nothing here
# since all repetitions chain inside one program anyway
SAMPLES = 8
BASELINE_FPS = 130.0  # reference on AMD R9 380 (README.md:55 / BASELINE.md)


def main():
    import jax

    from websplat_tpu.utils import compile_cache

    compile_cache.enable()
    import jax.numpy as jnp

    from websplat_tpu.config import RasterConfig, SplattingArgs, resolve_settings
    from websplat_tpu.models.camera import CameraUniforms
    from websplat_tpu.parallel.multiview import render_views, stack_cameras
    from websplat_tpu.render.renderer import (
        settings_to_device,
        upload_cloud,
    )

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))
    from synth import make_bench_cloud, make_camera, make_cloud

    # --sigma-sweep: bound the FPS number's sensitivity to the assumed
    # splat-size distribution (the one synthetic-workload free parameter):
    # rerun the identical measurement at ln-scale sigma {0.8, 1.1, 1.4}
    # (default 1.1) and print one JSON line each.  The LAST line is the
    # default-sigma result, so driver parsing is unaffected.
    sweep = "--sigma-sweep" in sys.argv
    sigmas = [0.8, 1.4, 1.1] if sweep else [1.1]

    for sigma in sigmas[:-1]:
        cloud = make_cloud(
            np.random.default_rng(0), n=N_SPLATS, extent=2.0,
            scale_lognormal=(-6.48, sigma),
        )
        run_one(cloud, sigma, sweep)
    # round-over-round context line: the round-1..3 opacity draw (no
    # low-alpha tail).  Same geometry, same compiled program (shapes are
    # identical — only the data differs), so this costs ~2 s of extra
    # timing, no extra compile.
    run_one(
        make_bench_cloud(np.random.default_rng(0), n=N_SPLATS, opacity="legacy"),
        1.1, sweep=True, opacity_model="legacy",
    )
    # the LAST line is the headline default (trained-scene bimodal opacity,
    # tests/synth.py:trained_opacity_logits) — the driver parses this one
    run_one(make_bench_cloud(np.random.default_rng(0), n=N_SPLATS), 1.1, sweep)


def run_one(cloud, sigma, sweep, opacity_model="trained"):
    import functools

    import jax
    import jax.numpy as jnp

    from websplat_tpu.config import RasterConfig, SplattingArgs, resolve_settings
    from websplat_tpu.models.camera import CameraUniforms
    from websplat_tpu.parallel.multiview import render_views, stack_cameras
    from websplat_tpu.render.renderer import settings_to_device, upload_cloud

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))
    from synth import make_camera

    cams = [
        make_camera(viewport=(WIDTH, HEIGHT), azimuth=2 * np.pi * i / N_VIEWS, distance=3.0)
        for i in range(N_VIEWS)
    ]
    for c in cams:
        c.fit_near_far(*cloud.aabb)
    unis = [CameraUniforms.from_camera(c, (WIDTH, HEIGHT)) for c in cams]
    settings = resolve_settings(SplattingArgs(), cloud)

    # WS_* env overrides (RasterConfig.from_env) allow config experiments
    # without editing the file; the defaults are the shipped configuration
    config = RasterConfig.from_env()
    dc = upload_cloud(cloud)
    dcams = stack_cameras(unis)
    dset = settings_to_device(settings)
    bg = jnp.asarray(settings.background_color, jnp.float32)

    import functools

    @functools.partial(jax.jit, static_argnames=("samples",))
    def run_all(dc, dcams, dset, bg, salt, *, samples):
        # all repetitions chained inside ONE program with a single readback
        # at the end — the reference times submits with one final
        # device.poll(Wait) (measure.rs:147) and no intra-timing readbacks.
        # The salt perturbs the camera block per repetition (below f32
        # resolution at view-matrix magnitude) so XLA cannot collapse or
        # hoist the repetitions.
        def rep(i, acc):
            cams_i = dcams._replace(
                view=dcams.view + salt * (1.0 + jnp.float32(i))
            )
            imgs = render_views(
                dc, cams_i, dset, bg, width=WIDTH, height=HEIGHT, config=config
            )
            return acc + jnp.sum(imgs[:, ::191, ::191, :])

        return jax.lax.fori_loop(0, samples, rep, jnp.float32(0.0))

    salt = jnp.float32(1e-30)
    # warmup both lengths (compile + lazy init, excluded like measure.rs:59-96)
    chk = float(run_all(dc, dcams, dset, bg, salt, samples=1))
    chk = float(run_all(dc, dcams, dset, bg, salt, samples=1 + SAMPLES))

    # two-length slope cancels the fixed dispatch + tunnel-readback overhead
    # (~75 ms here), which the reference's methodology also excludes; min of
    # 3 repeats per length rejects tunnel latency spikes (observed multi-
    # second stalls would otherwise poison a single-shot measurement)
    def best(samples):
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(run_all(dc, dcams, dset, bg, salt, samples=samples))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t_short = best(1)
    t_long = best(1 + SAMPLES)
    elapsed = t_long - t_short

    frames = N_VIEWS * SAMPLES
    fps = frames / elapsed
    # record any leaked WS_* env overrides so a published number can never
    # silently carry a non-default config (ablate vars would blank frames)
    ws_env = {k: v for k, v in os.environ.items() if k.startswith("WS_")}
    result = {
        "metric": "fps_synthetic_bonsai_1200x799",
        "value": round(fps, 2),
        "unit": "fps",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
        "detail": {
            "frames": frames,
            "elapsed_s": round(elapsed, 3),
            "splats": N_SPLATS,
            "checksum": chk,
            "backend": jax.default_backend(),
            "raster_backend": config.raster_backend,
            "sort_backend": config.sort_backend,
            "tile_slots": config.tile_slots,
        },
    }
    if ws_env:
        result["detail"]["ws_env_overrides"] = ws_env
    if sweep:
        result["detail"]["scale_lognormal_sigma"] = sigma
    result["detail"]["opacity_model"] = opacity_model
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
