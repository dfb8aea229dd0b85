"""Pallas rasterizer vs the XLA rasterizer (bit-comparable inputs) and the
oracle, run in TPU interpret mode on CPU."""

import numpy as np
import pytest

# Interpret-mode compiles of the Pallas rasterizer at several configs take
# minutes each on CPU; the fast lane covers the same kernels via
# test_emit_compact / test_compact and the TPU bench exercises them for real.
pytestmark = pytest.mark.slow

from websplat_tpu.config import RasterConfig, SplattingArgs, resolve_settings
from websplat_tpu.models.camera import CameraUniforms
from websplat_tpu.ops.oracle import render_oracle
from websplat_tpu.render.renderer import GaussianRenderer
from websplat_tpu.utils.image import psnr
from tests.synth import make_camera, make_cloud

W, H = 64, 32  # tiny: interpret-mode Pallas is slow


def _render(cloud, cam, args, backend, **cfg_kw):
    cfg = RasterConfig(raster_backend=backend, tile_slots=16, **cfg_kw)
    r = GaussianRenderer(cloud, cfg)
    return r.render(cam, (W, H), args, with_diag=True), r


def test_pallas_matches_xla(rng):
    cloud = make_cloud(rng, n=120)
    cam = make_camera(viewport=(W, H))
    args = SplattingArgs(background_color=(0.2, 0.1, 0.4))
    (img_p, _), _ = _render(cloud, cam, args, "pallas"), None
    (img_x, _), _ = _render(cloud, cam, args, "xla"), None
    # same packed inputs, same math; differences only from blend association
    # and the pallas early-exit epsilon
    assert np.isfinite(img_p).all()
    assert np.abs(img_p - img_x).max() < 5e-3
    assert psnr(img_p, img_x) > 55


def test_pallas_matches_oracle(rng):
    cloud = make_cloud(rng, n=120)
    cam = make_camera(viewport=(W, H))
    args = SplattingArgs()
    (img_p, r), _ = _render(cloud, cam, args, "pallas"), None
    settings = resolve_settings(args, cloud)
    uni = CameraUniforms.from_camera(cam, (W, H))
    ref = render_oracle(cloud, uni, settings, W, H)
    assert r._last_diag["num_clamped"] == 0
    assert psnr(img_p, ref) > 40


def test_pallas_empty_scene(rng):
    cloud = make_cloud(rng, n=16)
    cam = make_camera(viewport=(W, H), azimuth=np.pi)  # looking away-ish
    cam.position = np.array([100.0, 100.0, 100.0], np.float32)
    args = SplattingArgs(background_color=(1.0, 0.5, 0.0))
    (img, r), _ = _render(cloud, cam, args, "pallas"), None
    if r._last_diag["num_visible"] == 0:
        np.testing.assert_allclose(img, np.broadcast_to([1.0, 0.5, 0.0], img.shape), atol=1e-6)


def test_pallas_early_exit_consistency(rng):
    """Opaque overlapping splats: early exit (eps=1e-4) vs exact (eps=0)."""
    cloud = make_cloud(rng, n=150, opacity_logit_range=(3.0, 5.0))
    cam = make_camera(viewport=(W, H))
    args = SplattingArgs()
    (img_fast, _), _ = _render(cloud, cam, args, "pallas", transmittance_eps=1e-4), None
    (img_exact, _), _ = _render(cloud, cam, args, "pallas", transmittance_eps=0.0), None
    assert np.abs(img_fast - img_exact).max() < 1e-3


def test_giant_splat_falloff(rng):
    """A splat with f16-SUBNORMAL conic coefficients (sigma of hundreds of
    px) must still render a smooth Gaussian falloff, not a solid box: the
    record decode keeps f16 subnormals (reference packs f16 eigenvectors,
    preprocess.wgsl:264-268, and its hardware interpolation never flushes).
    """
    import numpy as np

    from websplat_tpu.io.loader import GaussianCloud
    from websplat_tpu.utils.gmath import build_cov

    n = 1
    xyz = np.array([[0.0, 0.0, 0.0]], np.float32)
    scale = np.full((n, 3), 3.0, np.float32)  # huge in world units
    rot = np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1))
    cov = build_cov(rot, scale)
    sh = np.zeros((n, 16, 3), np.float32)
    sh[:, 0, :] = 1.0
    cloud = GaussianCloud(
        xyz=xyz, cov=cov.astype(np.float16), opacity=np.full((n,), 0.9, np.float32),
        sh=sh, sh_deg=3, num_points=n,
    )
    cam = make_camera(viewport=(W, H))
    # fit_near_far self-culls single-point scenes (znear fit uses Euclidean
    # distance vs axial z) -- probe with explicit near/far
    cfg = RasterConfig(raster_backend="pallas", tile_slots=16)
    r = GaussianRenderer(cloud, cfg)
    img = r.render(cam, (W, H), SplattingArgs(), fit_near_far=False, with_diag=True)
    assert r._last_diag["num_visible"] == 1, r._last_diag
    # center must be brighter than the frame edge and the falloff monotone-ish
    c = img[H // 2, W // 2].mean()
    e = img[2, 2].mean()
    assert c > 0.05, f"center {c}"
    assert c > e + 0.01, f"no falloff: center {c} edge {e}"


def test_band_skipping_bit_exact(rng):
    """y_bands segment/band skipping must be BIT-exact vs the unbanded
    kernel: skipped (segment, band) pairs contain only zero-alpha work
    (c += t*0, t *= 1 are f32 no-ops).  Runs the kernel directly with
    interpret=True because auto-interpret traces clamp y_bands to 1."""
    import dataclasses

    import jax.numpy as jnp

    from websplat_tpu.ops.preprocess import preprocess
    from websplat_tpu.ops.rasterize_pallas import rasterize_pallas
    from websplat_tpu.ops.sort import sort_instances, tile_ranges
    from websplat_tpu.render.renderer import (
        camera_to_device,
        settings_to_device,
        upload_cloud,
    )

    w, h = 64, 16  # 2x2 tiles at 32x8; band_p = 128 at 2 bands
    cloud = make_cloud(rng, n=200)
    cam = make_camera(viewport=(w, h))
    cam.fit_near_far(*cloud.aabb)
    cfg = RasterConfig(tile_w=32, tile_h=8, tile_slots=8, y_bands=2)
    from websplat_tpu.models.camera import CameraUniforms

    uni = camera_to_device(CameraUniforms.from_camera(cam, (w, h)))
    settings = settings_to_device(resolve_settings(SplattingArgs(), cloud))
    pre = preprocess(
        upload_cloud(cloud), uni, settings, width=w, height=h, config=cfg
    )
    sk, sp = sort_instances(pre.keys, pre.payload)
    tx, ty = cfg.tiles_for(w, h)
    _, depth_bits = cfg.key_bits(w, h)
    ranges = tile_ranges(sk, tx * ty, depth_bits)
    bg = jnp.asarray((0.3, 0.2, 0.1), jnp.float32)
    img_b = np.asarray(
        rasterize_pallas(sp, ranges, bg, width=w, height=h, config=cfg, interpret=True)
    )
    cfg1 = dataclasses.replace(cfg, y_bands=1)
    img_1 = np.asarray(
        rasterize_pallas(sp, ranges, bg, width=w, height=h, config=cfg1, interpret=True)
    )
    assert np.isfinite(img_b).all()
    assert np.array_equal(img_b, img_1), np.abs(img_b - img_1).max()


@pytest.mark.parametrize(
    "composite,qform,btree",
    [("scan", "monomial", False), ("tree", "monomial", False),
     ("scan", "direct", False), ("mxu", "monomial", False),
     ("hybrid", "monomial", False), ("scan", "monomial", True)],
)
def test_inner_loop_variants_agree(rng, composite, qform, btree):
    """The rasterizer's inner-loop math variants (config.composite/qform)
    must agree with the default (tree+direct) pipeline: scan-vs-tree is
    an f32 reassociation of the same over-composite (1-ulp), the
    monomial expansion of the quadratic form is bounded to ~1e-4 absolute
    in `a` by the tile-local coordinates (rasterize_pallas.py band_pix),
    the mxu composite's log-space transmittance round-trip stays ~1e-6
    relative in the live (T > eps) regime, and the cross-group batch
    prefix tree (scan_batch_tree) only reassociates the same f32
    transmittance products."""
    cloud = make_cloud(rng, n=120)
    cam = make_camera(viewport=(W, H))
    args = SplattingArgs(background_color=(0.2, 0.1, 0.4))
    (img_v, _), _ = _render(
        cloud, cam, args, "pallas", composite=composite, qform=qform,
        scan_batch_tree=btree,
    ), None
    (img_d, _), _ = _render(cloud, cam, args, "pallas"), None
    assert np.isfinite(img_v).all()
    assert np.abs(img_v - img_d).max() < 1e-3
