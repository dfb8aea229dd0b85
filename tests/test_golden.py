"""Golden-image regression: the committed PNG was rendered by the NumPy
oracle from a fixed seed; the full TPU pipeline must stay within PSNR
budget of it across refactors (the in-repo analogue of BASELINE.json's
"within 0.5 dB PSNR of the WGPU reference renders")."""

import numpy as np

from websplat_tpu.config import RasterConfig, SplattingArgs
from websplat_tpu.render.renderer import GaussianRenderer
from websplat_tpu.utils.image import psnr, read_png
from tests.synth import make_camera, make_cloud

GOLDEN = "tests/goldens/oracle_500.png"


def _scene():
    rng = np.random.default_rng(20260816)
    cloud = make_cloud(rng, n=500)
    cam = make_camera(viewport=(128, 96))
    args = SplattingArgs(background_color=(0.05, 0.08, 0.12))
    return cloud, cam, args


def test_pipeline_matches_committed_golden():
    cloud, cam, args = _scene()
    golden = read_png(GOLDEN).astype(np.float32) / 255.0
    for compact in (False, True):
        r = GaussianRenderer(
            cloud, RasterConfig(raster_backend="xla", tile_slots=16, compact=compact)
        )
        img = np.clip(r.render(cam, (128, 96), args), 0, 1)
        p = psnr(img, golden)
        assert p > 40.0, f"compact={compact}: PSNR vs golden {p:.2f} dB"
