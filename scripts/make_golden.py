#!/usr/bin/env python
"""Regenerate tests/goldens/oracle_500.png from the NumPy oracle.

The golden is the oracle render of the fixed-seed synthetic scene used by
tests/test_golden.py (the in-repo analogue of the reference's offline golden
renders, /root/reference/src/bin/render.rs).  Run after any deliberate
change to the oracle math or the synthetic scene/camera helpers; never to
paper over a pipeline regression.
"""

import sys

sys.path.insert(0, ".")

import numpy as np

from websplat_tpu.config import SplattingArgs, resolve_settings
from websplat_tpu.models.camera import CameraUniforms
from websplat_tpu.ops.oracle import render_oracle
from websplat_tpu.utils.image import write_png
from tests.synth import make_camera, make_cloud

GOLDEN = "tests/goldens/oracle_500.png"


def main():
    rng = np.random.default_rng(20260816)
    cloud = make_cloud(rng, n=500)
    cam = make_camera(viewport=(128, 96))
    cam.fit_near_far(*cloud.aabb)
    args = SplattingArgs(background_color=(0.05, 0.08, 0.12))
    settings = resolve_settings(args, cloud)
    uni = CameraUniforms.from_camera(cam, (128, 96))
    img = render_oracle(cloud, uni, settings, width=128, height=96)
    write_png(GOLDEN, np.clip(img, 0.0, 1.0))
    print(f"wrote {GOLDEN}")


if __name__ == "__main__":
    main()
