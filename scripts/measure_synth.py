#!/usr/bin/env python
"""Run the REAL `measure` binary (websplat_tpu.apps.measure) on a synthetic
bonsai-scale scene — the reference benchmark methodology end to end.

The reference's bin/measure (measure.rs:34,50,98-153) renders every TRAIN
camera at 2048x2048, `samples` times, one warmup excluded.  No datasets ship
in this environment (zero egress), so this driver synthesizes the benchmark
cloud (tests/synth.py:make_bench_cloud — bonsai's point count, trained-scene
scale + opacity statistics), writes it as a real PLY plus a COLMAP-style
cameras.json (orbit poses, every-8th is the test split like scene.rs), and
then invokes apps.measure's main() unchanged — so the artifact exercises the
actual binary path: PLY loader -> Scene split -> for_viewport config (incl.
the 2048-px tile doubling for the 7-bit tile packing) -> multiview batched
render.

Usage: python scripts/measure_synth.py [--samples 10] [--views 16]
                                       [--width 2048 --height 2048]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

import numpy as np

from websplat_tpu.utils import compile_cache

compile_cache.enable()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=10)
    ap.add_argument("--views", type=int, default=16)
    ap.add_argument("--width", type=int, default=2048)
    ap.add_argument("--height", type=int, default=2048)
    ap.add_argument("--n", type=int, default=1_244_819)
    ap.add_argument("--out", default="/tmp/ws_measure")
    args = ap.parse_args()

    from websplat_tpu.io.ply import dumps_ply
    from websplat_tpu.models.scene import SceneCamera, Split
    from synth import make_camera

    os.makedirs(args.out, exist_ok=True)
    ply_path = os.path.join(args.out, "scene.ply")
    cam_path = os.path.join(args.out, "cameras.json")

    if not os.path.exists(ply_path):
        # the PLY wire format stores PRE-activation attributes (log scale,
        # logit opacity, raw quats), so re-draw make_bench_cloud's exact
        # streams (tests/synth.py:make_cloud order: xyz, log_s, quats,
        # uniform-logit consume, sh) instead of decoding its cov back
        from synth import random_quats, trained_opacity_logits

        g = np.random.default_rng(0)
        xyz = g.normal(size=(args.n, 3)).astype(np.float32) * 2.0 * 0.4
        log_s = g.normal(-6.48, 1.1, size=(args.n, 3)).astype(np.float32)
        scale_raw = log_s + np.float32(np.log(2.0))  # exp(.)*extent pre-act
        rot = random_quats(g, args.n)
        _consume = g.uniform(-1.0, 3.0, size=(args.n,))  # rng-stream parity
        op_raw = trained_opacity_logits(np.random.default_rng(7), args.n)
        sh = np.zeros((args.n, 16, 3), np.float32)
        sh[:, 0, :] = g.uniform(-0.5, 2.0, size=(args.n, 3))
        sh[:, 1:16, :] = g.normal(size=(args.n, 15, 3)) * 0.1
        blob = dumps_ply(xyz, sh, op_raw.astype(np.float32), scale_raw, rot)
        with open(ply_path, "wb") as f:
            f.write(blob)
        print(f"wrote {ply_path} ({len(blob)/1e6:.0f} MB)")

    cams = []
    for i in range(args.views):
        cam = make_camera(
            viewport=(args.width, args.height),
            azimuth=2 * np.pi * i / args.views,
            elevation=0.35,
            distance=3.0,
        )
        cams.append(
            SceneCamera.from_perspective(
                cam, f"synth_{i:03d}", i, (args.width, args.height),
                Split.TRAIN,
            ).to_json_dict()
        )
    with open(cam_path, "w") as f:
        json.dump(cams, f)
    print(f"wrote {cam_path} ({args.views} poses; every 8th -> test split)")

    from websplat_tpu.apps import measure

    measure.main([
        ply_path, cam_path,
        "--width", str(args.width), "--height", str(args.height),
        "--samples", str(args.samples),
    ])


if __name__ == "__main__":
    main()
