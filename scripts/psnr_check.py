#!/usr/bin/env python
"""PSNR of the (TPU) rendered frame vs the NumPy oracle.

The BASELINE quality bar is "within 0.5 dB PSNR of the WGPU reference";
no reference renders or datasets ship in this environment, so the NumPy
oracle (websplat_tpu/ops/oracle.py — the reference's math, f32, no packing)
stands in.  The interpret-mode CPU tests already pin this per-op; this
script checks the REAL Mosaic-compiled TPU pipeline end-to-end.

Usage: python scripts/psnr_check.py [n_splats] [width] [height]
"""

import sys

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

import numpy as np

from websplat_tpu.utils import compile_cache

compile_cache.enable()

from websplat_tpu.config import RasterConfig, SplattingArgs, resolve_settings
from websplat_tpu.models.camera import CameraUniforms
from websplat_tpu.ops.oracle import render_oracle
from websplat_tpu.render.renderer import GaussianRenderer
from websplat_tpu.utils.image import psnr
from synth import make_camera, make_cloud


def main():
    # --bench: the EXACT benchmark scene (make_bench_cloud: bonsai point
    # count, trained-scene log-normal scales AND bimodal opacity) at the
    # bench viewport/camera — the full-scale quality artifact (PSNR_r04),
    # where f32 cancellation, RGB9E5, the ladder prefix and the overflow
    # splice all actually stress.  The box-limited oracle (ops/oracle.py)
    # makes the ground-truth render tractable at this scale.
    bench = "--bench" in sys.argv
    if bench:
        sys.argv.remove("--bench")
    n = int(sys.argv[1]) if len(sys.argv) > 1 else (1_244_819 if bench else 60_000)
    width = int(sys.argv[2]) if len(sys.argv) > 2 else (1200 if bench else 400)
    height = int(sys.argv[3]) if len(sys.argv) > 3 else (799 if bench else 300)

    rng = np.random.default_rng(0)
    if bench:
        from synth import make_bench_cloud

        cloud = make_bench_cloud(rng, n=n)
    else:
        cloud = make_cloud(rng, n=n, extent=2.0, scale_lognormal=(-5.8, 1.0))
    cam = make_camera(viewport=(width, height), distance=3.0)
    cam.fit_near_far(*cloud.aabb)
    args = SplattingArgs(background_color=(0.1, 0.12, 0.2))
    settings = resolve_settings(args, cloud)
    uni = CameraUniforms.from_camera(cam, (width, height))

    ref = render_oracle(cloud, uni, settings, width, height)
    variants = [
        ("defaults", RasterConfig()),
        ("scan/monomial", RasterConfig(composite="scan", qform="monomial")),
        ("eps=1e-4", RasterConfig(transmittance_eps=1e-4)),
        ("eps=2e-3", RasterConfig(transmittance_eps=2e-3)),
        ("eps=4e-3", RasterConfig(transmittance_eps=4e-3)),
        ("eps=1e-2", RasterConfig(transmittance_eps=1e-2)),
        ("alpha=1/255", RasterConfig(alpha_threshold=1.0 / 255.0)),
        ("alpha=0 (reference-exact coverage)", RasterConfig(alpha_threshold=0.0)),
        ("alpha=1/512", RasterConfig(alpha_threshold=1.0 / 512.0)),
        ("alpha=1/128", RasterConfig(alpha_threshold=1.0 / 128.0)),
        ("mxu/highest", RasterConfig(composite="mxu", mxu_precision="highest")),
        ("mxu/high", RasterConfig(composite="mxu", mxu_precision="high")),
        ("mxu/default", RasterConfig(composite="mxu", mxu_precision="default")),
    ]
    seen = {}
    results = []
    for name, cfg in variants:
        if cfg in seen:  # defaults may already equal a named variant
            continue
        seen[cfg] = name
        renderer = GaussianRenderer(cloud, cfg)
        img = renderer.render(cam, (width, height), args, fit_near_far=False,
                              with_diag=True)
        d = renderer._last_diag
        p = psnr(img, ref)
        print(
            f"[{name}] n={n} {width}x{height} visible={int(d['num_visible'])} "
            f"instances={int(d['num_instances'])} dropped={int(d['num_dropped'])}"
        )
        print(f"[{name}] PSNR vs oracle: {p:.2f} dB "
              f"(budget: e5m12+rho16 conic + RGB9E5 + u16 center + "
              f"22-bit depth + tie order)")
        results.append(dict(
            variant=name, psnr_db=round(float(p), 2),
            visible=int(d["num_visible"]), instances=int(d["num_instances"]),
            dropped=int(d["num_dropped"]),
        ))
    import json
    import os

    out = os.environ.get("WS_PSNR_OUT")
    if out:
        with open(out, "w") as f:
            json.dump(dict(n=n, width=width, height=height, results=results),
                      f, indent=1)
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
