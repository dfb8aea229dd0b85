"""Analytic anchor fixtures for the oracle renderer.

The oracle (websplat_tpu/ops/oracle.py) is the ground truth every pipeline
test compares against — these fixtures pin the ORACLE itself to literal
constants derived by hand from the published 3DGS math (projection, EWA
Jacobian, eigen-conic, SH basis, premultiplied over), so it is anchored by
something other than its own output.  Derivation setup (all literals below
computed offline from closed forms, independent of any repo code):

  viewport 64x64, fovx = fovy = 90 deg  =>  fx = fy = 32
  camera at the origin, identity rotation, znear = 1, zfar = 10
  projection (after the viewport Y flip):
      clip = (x, -y, 10/9 * z - 10/9),  w = z
      px = (x/z + 1) * 32,  py = (y/z + 1) * 32
  EWA Jacobian at view-space (x, y, z):
      J = [[fx/z, 0, -fx x / z^2], [0, -fy/z, fy y / z^2]]
  conic: eigen-decompose cov2d + 0.3 I, invert (reference
  preprocess.wgsl:217-254 semantics).
"""

import numpy as np
import pytest

from websplat_tpu.config import ResolvedSettings
from websplat_tpu.io.loader import GaussianCloud
from websplat_tpu.models.camera import (
    CameraUniforms,
    PerspectiveCamera,
    PerspectiveProjection,
)
from websplat_tpu.ops.oracle import render_oracle

W = H = 64


def fixture_camera() -> CameraUniforms:
    cam = PerspectiveCamera(
        position=np.zeros(3, np.float32),
        rotation=np.array([1.0, 0.0, 0.0, 0.0], np.float32),
        projection=PerspectiveProjection(
            fovx=np.pi / 2, fovy=np.pi / 2, znear=1.0, zfar=10.0
        ),
    )
    uni = CameraUniforms.from_camera(cam, (W, H))
    # anchor the camera block itself: focal and the projection entries used
    # in the derivation above
    np.testing.assert_allclose(uni.focal, (32.0, 32.0), rtol=1e-12)
    np.testing.assert_allclose(uni.proj[0, 0], 1.0, atol=1e-7)
    np.testing.assert_allclose(uni.proj[1, 1], -1.0, atol=1e-7)
    np.testing.assert_allclose(uni.proj[2, 2], 10.0 / 9.0, atol=1e-6)
    np.testing.assert_allclose(uni.proj[2, 3], -10.0 / 9.0, atol=1e-6)
    assert uni.proj[3, 2] == 1.0
    return uni


def fixture_settings(max_sh_deg=0) -> ResolvedSettings:
    return ResolvedSettings(
        gaussian_scaling=1.0,
        max_sh_deg=max_sh_deg,
        mip_splatting=False,
        kernel_size=0.3,
        clipping_box_min=(-10.0, -10.0, -10.0),
        clipping_box_max=(10.0, 10.0, 10.0),
        walltime=100.0,
        scene_center=(0.0, 0.0, 2.0),
        scene_extend=1.0,
        background_color=(0.0, 0.0, 0.0),
    )


def make_fixture_cloud(xyz, cov6, opacity, sh, sh_deg):
    n = len(xyz)
    sh_full = np.zeros((n, 16, 3), np.float32)
    sh_arr = np.asarray(sh, np.float32)
    sh_full[:, : sh_arr.shape[1]] = sh_arr
    return GaussianCloud(
        xyz=np.asarray(xyz, np.float32),
        opacity=np.asarray(opacity, np.float32),
        cov=np.asarray(cov6, np.float32),
        sh=sh_full,
        sh_deg=sh_deg,
        num_points=n,
        kernel_size=None,
        mip_splatting=None,
        background_color=None,
    )


def test_isotropic_splat_analytic():
    """Splat at (0,0,2), cov = 0.01 I, opacity 0.8, SH0 = 1.

    Hand derivation: center projects to pixel (32, 32); cov2d =
    (fx/z)^2 * 0.01 * I = 2.56 I; + 0.3 kernel => conic = I / 2.86 =
    0.34965034965 I; color = SH_C0 * 1 + 0.5 = 0.7820947917738781.
    At the peak pixel's center (32.5, 32.5): dx = dy = 0.5,
    a = 0.5 * conic_a * (dx^2 + dy^2) = 0.25 / 2.86 = 0.08741258741,
    alpha = 0.8 * exp(-a) = 0.7330391713708664,
    pixel = alpha * color = 0.5733061180953939 (background black).
    """
    cloud = make_fixture_cloud(
        [[0.0, 0.0, 2.0]],
        [[0.01, 0.0, 0.0, 0.01, 0.0, 0.01]],
        [0.8],
        [[[1.0, 1.0, 1.0]]],
        sh_deg=0,
    )
    img = render_oracle(cloud, fixture_camera(), fixture_settings(), W, H)
    np.testing.assert_allclose(img[32, 32], 0.5733061180953939, atol=1e-6)
    # 4-fold symmetry around the projected center at (32.0, 32.0)
    np.testing.assert_allclose(img[31, 31], img[32, 32], atol=1e-6)
    np.testing.assert_allclose(img[31, 32], img[32, 32], atol=1e-6)
    np.testing.assert_allclose(img[32, 31], img[32, 32], atol=1e-6)
    # beyond the 2*CUTOFF discard radius (r^2 > 4*CUTOFF/conic_a = 26.93,
    # r > 5.19 px): exactly zero, matching gaussian.wgsl's discard
    assert img[32, 45].max() == 0.0
    assert img[45, 32].max() == 0.0
    # one off-center pixel: (40.5, 30.5) -> dx = 8.5, dy = -1.5,
    # a = 0.5 * (8.5^2 + 1.5^2) / 2.86 = 13.024475524,
    # alpha = 0.8 * exp(-a) = 1.7718768e-6 (inside the cutoff: a < 4.708
    # is FALSE here -> discarded to 0)
    assert img[30, 40].max() == 0.0


def test_anisotropic_offcenter_analytic():
    """Splat at (0.5, -0.25, 2), cov = diag(0.01, 0.04, 0.0025), SH deg 1.

    Hand derivation: center -> pixel (40, 28).  J = [[16, 0, -4],
    [0, -16, -2]]; cov2d = J diag J^T = [[2.6, 0.02], [0.02, 10.25]];
    eigen-conic of cov2d + 0.3 I =
      (0.3448320945526335, 0.0006537101318533336, 0.09478796911873336).
    View direction d = (0.5, -0.25, 2)/norm = (0.24077171, -0.12038585,
    0.96308682); SH coefficients sh0..sh3 = (0.6, 0.3, -0.2, 0.1) per
    channel => color = SH_C0*0.6 - SH_C1*d_y*0.3 + SH_C1*d_z*(-0.2)
    - SH_C1*d_x*0.1 + 0.5 = 0.5810256297414028.
    Peak pixel (28, 40), center (40.5, 28.5): dx = dy = 0.5,
    a = 0.125 * (conic_a + 2 conic_b + conic_c) = 0.05511593549188419,
    alpha = 0.8 * exp(-a) = 0.7571003384743364,
    pixel = alpha * color = 0.4398947009394806.
    """
    sh = [[[0.6] * 3, [0.3] * 3, [-0.2] * 3, [0.1] * 3]]
    cloud = make_fixture_cloud(
        [[0.5, -0.25, 2.0]],
        [[0.01, 0.0, 0.0, 0.04, 0.0, 0.0025]],
        [0.8],
        sh,
        sh_deg=1,
    )
    img = render_oracle(
        cloud, fixture_camera(), fixture_settings(max_sh_deg=1), W, H
    )
    np.testing.assert_allclose(img[28, 40], 0.4398947009394806, atol=1e-6)
    # the long axis is vertical (cyy >> cxx): 4 px above the center must
    # still be lit while 4 px to the right is far dimmer
    assert img[32, 40].min() > img[28, 44].max() > 0.0


def test_two_splat_over_composite_analytic():
    """Front (z=2) and back (z=4) isotropic splats both centered at
    pixel (32, 32): the blended peak must equal the hand-derived
    premultiplied `over`:

      front: alpha_f = 0.7330391713708664, color_f = 0.7820947917738781
      back:  cov2d = (32/4)^2 * 0.01 = 0.64; conic = 1/0.94
             a = 0.25/0.94 = 0.26595744680851063
             alpha_b = 0.5 * exp(-a) = 0.3832358713129553
             color_b = SH_C0 * (-0.4) + 0.5 = 0.38716208329044877
      pixel = alpha_f*color_f + (1-alpha_f)*alpha_b*color_b
            = 0.612916270420694

    Also anchors the ordering convention (ascending clip z = front first).
    """
    cloud = make_fixture_cloud(
        [[0.0, 0.0, 2.0], [0.0, 0.0, 4.0]],
        [[0.01, 0.0, 0.0, 0.01, 0.0, 0.01]] * 2,
        [0.8, 0.5],
        [[[1.0] * 3], [[-0.4] * 3]],
        sh_deg=0,
    )
    img = render_oracle(cloud, fixture_camera(), fixture_settings(), W, H)
    np.testing.assert_allclose(img[32, 32], 0.612916270420694, atol=1e-6)


def test_mip_splatting_analytic():
    """Mip-splatting opacity correction pinned to hand-derived constants
    (reference math: preprocess.wgsl:226-236).

    Same isotropic splat as test_isotropic_splat_analytic (cov2d = 2.56 I,
    kernel 0.3), with mip_splatting=True:
      det0 = 2.56^2 = 6.5536, det1 = 2.86^2 = 8.1796,
      coef = sqrt(det0/(det1 + 1e-6) + 1e-6) = 0.8951053989828214,
      opacity_eff = 0.8 * coef = 0.7160843191862571,
      alpha = opacity_eff * exp(-0.25/2.86) = 0.6561473199599561,
      pixel = alpha * 0.7820947917738781 = 0.51316940157707.
    The conic itself is unchanged (dilation still applies after the
    correction), so the discard radius matches the non-mip fixture.
    """
    cloud = make_fixture_cloud(
        [[0.0, 0.0, 2.0]],
        [[0.01, 0.0, 0.0, 0.01, 0.0, 0.01]],
        [0.8],
        [[[1.0, 1.0, 1.0]]],
        sh_deg=0,
    )
    import dataclasses

    settings = dataclasses.replace(fixture_settings(), mip_splatting=True)
    img = render_oracle(cloud, fixture_camera(), settings, W, H)
    np.testing.assert_allclose(img[32, 32], 0.51316940157707, atol=1e-6)
    # correction only scales opacity: the image is exactly coef x the
    # non-mip single-splat render (single splat => blending is linear)
    img0 = render_oracle(cloud, fixture_camera(), fixture_settings(), W, H)
    np.testing.assert_allclose(img, img0 * 0.8951053989828214, atol=1e-6)


def test_compressed_lambda_clamp_analytic():
    """The compressed shader's RADIUS clamp divergence pinned by hand
    (preprocess_compressed.wgsl:293-302 vs preprocess.wgsl:245-246).

    Isotropic cov2d + kernel = 2.86 I has radius 0; the compressed variant
    clamps r_c = max(radius, 0.1) which FORCES anisotropy:
      lambda1 = 2.96, lambda2 = 2.76, e1 = (0, 1)
      conic_a = 1/2.76 = 0.3623188405797102 (x axis now the NARROW one),
      conic_b = 0, conic_c = 1/2.96 = 0.33783783783783783,
      a(0.5, 0.5) = 0.125 * (conic_a + conic_c),
      alpha = 0.8 * exp(-a), pixel = alpha * 0.7820947917738781
            = 0.5732447791189261  (vs 0.5733061180953939 uncompressed).
    """
    cloud = make_fixture_cloud(
        [[0.0, 0.0, 2.0]],
        [[0.01, 0.0, 0.0, 0.01, 0.0, 0.01]],
        [0.8],
        [[[1.0, 1.0, 1.0]]],
        sh_deg=0,
    )
    img = render_oracle(
        cloud, fixture_camera(), fixture_settings(), W, H, compressed=True
    )
    np.testing.assert_allclose(img[32, 32], 0.5732447791189261, atol=1e-6)
    # the forced anisotropy is REAL and oriented: conic_a > conic_c, so
    # stepping +4 px in x dims more than +4 px in y
    assert img[32, 36].max() < img[36, 32].min()
    # the uncompressed render of the same cloud is the symmetric fixture
    img_u = render_oracle(cloud, fixture_camera(), fixture_settings(), W, H)
    np.testing.assert_allclose(img_u[32, 36], img_u[36, 32], atol=1e-6)


def test_sh_deg2_deg3_analytic():
    """SH degree 2 and 3 bands pinned to hand-evaluated basis constants
    (preprocess.wgsl:114-154, Condon-Shortley convention).

    Splat at (0.5, -0.25, 2), cov = 0.01 I, opacity 0.8:
      view dir d = (0.2407717061715384, -0.1203858530857692,
                    0.9630868246861536)
      J = [[16, 0, -4], [0, -16, -2]] => cov2d = [[2.72, 0.08],
      [0.08, 2.60]]; + 0.3 I: mid = 2.96, radius = sqrt(0.06^2 + 0.08^2)
      = 0.1 exactly => l1 = 3.06, l2 = 2.86; e1 from (off, l1 - diag1) =
      (-0.08, 0.04) => conic = (0.331367978426802, 0.009141185611773867,
      0.34507975684446274); a(0.5, 0.5) = 0.08684126331185156;
      alpha = 0.8 * exp(-a) = 0.733458093975149.

    deg 2 (coefs c4..c8 = 0.2, -0.1, 0.3, 0.15, -0.25 per channel, dc 0.6):
      color = C0*0.6 + C2[0]*xy*0.2 + C2[1]*yz*(-0.1)
            + C2[2]*(2z^2-x^2-y^2)*0.3 + C2[3]*xz*0.15
            + C2[4]*(x^2-y^2)*(-0.25) + 0.5 = 0.7749825090674352
      peak = alpha * color = 0.5684171939646796
    deg 3 adds c9 = 0.1, c12 = -0.2, c15 = 0.05:
      color += C3[0]*y*(3x^2-y^2)*0.1 + C3[3]*z*(2z^2-3x^2-3y^2)*(-0.2)
             + C3[6]*x*(x^2-3y^2)*0.05 = 0.6582950536030949
      peak = alpha * color = 0.4828318352889946
    """
    sh16 = np.zeros((16, 3), np.float32)
    sh16[0] = 0.6
    sh16[4], sh16[5], sh16[6], sh16[7], sh16[8] = 0.2, -0.1, 0.3, 0.15, -0.25
    cloud2 = make_fixture_cloud(
        [[0.5, -0.25, 2.0]],
        [[0.01, 0.0, 0.0, 0.01, 0.0, 0.01]],
        [0.8],
        [sh16[:9]],
        sh_deg=2,
    )
    img2 = render_oracle(
        cloud2, fixture_camera(), fixture_settings(max_sh_deg=2), W, H
    )
    np.testing.assert_allclose(img2[28, 40], 0.5684171939646796, atol=1e-6)

    sh16[9], sh16[12], sh16[15] = 0.1, -0.2, 0.05
    cloud3 = make_fixture_cloud(
        [[0.5, -0.25, 2.0]],
        [[0.01, 0.0, 0.0, 0.01, 0.0, 0.01]],
        [0.8],
        [sh16],
        sh_deg=3,
    )
    img3 = render_oracle(
        cloud3, fixture_camera(), fixture_settings(max_sh_deg=3), W, H
    )
    np.testing.assert_allclose(img3[28, 40], 0.4828318352889946, atol=1e-6)
    # max_sh_deg masking: rendering the deg-3 cloud at max_sh_deg=2 must
    # reproduce the deg-2 constant exactly (bands 3 masked out)
    img32 = render_oracle(
        cloud3, fixture_camera(), fixture_settings(max_sh_deg=2), W, H
    )
    np.testing.assert_allclose(img32[28, 40], 0.5684171939646796, atol=1e-6)


def test_pipeline_matches_fixture_constants():
    """The real (XLA-path) pipeline reproduces the analytic peak value of
    the isotropic fixture within packing quantization (u16 center, f16
    conic/opacity, RGB9E5 color ~ 2^-9 relative)."""
    import jax.numpy as jnp

    from websplat_tpu.config import RasterConfig
    from websplat_tpu.render.renderer import (
        camera_to_device,
        render_frame_impl,
        settings_to_device,
        upload_cloud,
    )

    cloud = make_fixture_cloud(
        [[0.0, 0.0, 2.0]],
        [[0.01, 0.0, 0.0, 0.01, 0.0, 0.01]],
        [0.8],
        [[[1.0, 1.0, 1.0]]],
        sh_deg=0,
    )
    cfg = RasterConfig(raster_backend="xla", compact=False, tile_slots=4)
    img = render_frame_impl(
        upload_cloud(cloud),
        camera_to_device(fixture_camera()),
        settings_to_device(fixture_settings()),
        jnp.zeros((3,), jnp.float32),
        width=W,
        height=H,
        config=cfg,
    )
    np.testing.assert_allclose(
        np.asarray(img)[32, 32], 0.5733061180953939, atol=5e-3
    )
