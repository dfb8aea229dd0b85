"""Hand-computed analytic fixtures anchoring the NumPy oracle.

The oracle (websplat_tpu/ops/oracle.py) is the ground truth every renderer
path is compared against, but until now it was pinned only by unit tests of
its ingredients.  These fixtures derive expected pixel values from FIRST
PRINCIPLES — closed-form projection, EWA covariance, Gaussian falloff and
the premultiplied `over` operator, written out longhand in the test body —
so the oracle is anchored by something other than itself.

Conventions verified (all cited to the reference):
- world2view / build_proj / VIEWPORT_Y_FLIP (camera.rs:106-112, 207-234)
- screen mapping px = (ndc_x+1)/2*W, py = (1-ndc_y_flipped)/2*H
- EWA projection J Sigma J^T + kernel dilation (preprocess.wgsl:204-240)
- alpha = min(0.99, exp(-0.5 d^T conic d) * opacity), cutoff 2*CUTOFF
  (gaussian.wgsl:2, 59-67)
- front-to-back premultiplied over == reference back-to-front blending
  (renderer.rs:65-79)
- SH evaluation with Condon-Shortley constants (preprocess.wgsl:114-154)
"""

import types

import numpy as np
import pytest

from websplat_tpu.config import CUTOFF, ResolvedSettings
from websplat_tpu.models.camera import (
    CameraUniforms,
    PerspectiveCamera,
    PerspectiveProjection,
)
from websplat_tpu.ops.oracle import render_oracle

W = H = 64
BIG = 1e9


def _camera():
    """Identity camera at the origin, 90 deg square fov: focal = W/2 and the
    projection reduces to ndc_x = x/z, ndc_y_flipped = -y/z exactly."""
    return PerspectiveCamera(
        position=np.zeros(3, np.float32),
        rotation=np.array([1.0, 0, 0, 0], np.float32),
        projection=PerspectiveProjection(
            fovx=np.pi / 2, fovy=np.pi / 2, znear=0.01, zfar=100.0
        ),
    )


def _settings(bg=(0.0, 0.0, 0.0)):
    return ResolvedSettings(
        gaussian_scaling=1.0,
        max_sh_deg=3,
        mip_splatting=False,
        kernel_size=0.3,
        clipping_box_min=(-BIG, -BIG, -BIG),
        clipping_box_max=(BIG, BIG, BIG),
        walltime=100.0,
        scene_center=(0.0, 0.0, 0.0),
        scene_extend=1.0,
        background_color=bg,
    )


def _cloud(xyz, cov6, opacity, sh):
    return types.SimpleNamespace(
        xyz=np.asarray(xyz, np.float32),
        cov=np.asarray(cov6, np.float32),
        opacity=np.asarray(opacity, np.float32),
        sh=np.asarray(sh, np.float32),
    )


def _sh0_only(rgb):
    """SH coefficients such that the deg-0 evaluation yields exactly `rgb`:
    color = SH_C0 * c0 + 0.5 with SH_C0 = 1/(2 sqrt(pi))  (the Y_0^0
    spherical harmonic basis constant; preprocess.wgsl:115)."""
    c0 = (np.asarray(rgb, np.float64) - 0.5) / (1.0 / (2.0 * np.sqrt(np.pi)))
    sh = np.zeros((1, 16, 3), np.float32)
    sh[0, 0] = c0
    return sh


def test_projected_center_lands_at_analytic_pixel():
    """Splat at (0.53, 0.27, 2): px = (1 + x/z)/2 * W = 40.48,
    py = (1 + y/z)/2 * H = 36.32 (the y-flip makes +y go DOWN), so the
    peak must land on the pixel whose center is nearest: (iy, ix)=(36, 40)."""
    cam = CameraUniforms.from_camera(_camera(), (W, H))
    sigma2 = 1e-4  # tiny isotropic splat -> sharp peak
    cloud = _cloud(
        [[0.53, 0.27, 2.0]],
        [[sigma2, 0, 0, sigma2, 0, sigma2]],
        [1.0],
        _sh0_only([1.0, 1.0, 1.0]),
    )
    img = render_oracle(cloud, cam, _settings(), W, H)
    peak = np.unravel_index(np.argmax(img.sum(-1)), (H, W))
    # pixel centers are at integer+0.5: the peak pixel is the one whose
    # center is nearest (40, 36), i.e. floor of the analytic position
    assert peak == (36, 40), peak


def test_isotropic_alpha_matches_closed_form():
    """Centered isotropic splat: cov2d = (f^2 sigma^2 / z^2) I, dilated by
    kernel_size; alpha(d) = exp(-0.5 d^2 / lambda) * opacity.

    EWA at x=y=0: J = [[f/z, 0, 0], [0, -f/z, 0]]  (preprocess.wgsl:209-219)
    => cov2d = diag(f^2 sigma^2 / z^2) exactly; + 0.3 dilation
    (preprocess.wgsl:238-240); lambda1 = lambda2 => conic = I/lambda."""
    f = W / 2.0  # fov2focal(pi/2, 64)
    z = 2.0
    sigma2 = 0.04
    opacity = 0.7
    lam = f * f * sigma2 / (z * z) + 0.3  # = 10.54
    cam = CameraUniforms.from_camera(_camera(), (W, H))
    rgb = np.array([0.9, 0.6, 0.3])
    cloud = _cloud(
        [[0.0, 0.0, z]],
        [[sigma2, 0, 0, sigma2, 0, sigma2]],
        [opacity],
        _sh0_only(rgb),
    )
    bg = (0.05, 0.05, 0.05)
    img = render_oracle(cloud, cam, _settings(bg), W, H)
    # center is (32, 32); pixel (iy, ix) center = (ix+0.5, iy+0.5)
    for iy, ix in [(31, 31), (32, 35), (28, 32), (40, 40)]:
        d2 = (ix + 0.5 - 32.0) ** 2 + (iy + 0.5 - 32.0) ** 2
        a = 0.5 * d2 / lam
        alpha = min(0.99, np.exp(-a) * opacity) if a <= 2.0 * CUTOFF else 0.0
        expected = alpha * rgb + (1.0 - alpha) * np.asarray(bg)
        np.testing.assert_allclose(img[iy, ix], expected, rtol=2e-5, atol=2e-6)


def test_anisotropic_conic_and_cutoff():
    """Axis-aligned anisotropic splat: lambda_x != lambda_y; also checks the
    hard cutoff a > 2*CUTOFF (gaussian.wgsl:2: CUTOFF^2 = 2 sqrt(log 255)
    ... i.e. discard where the quadratic exceeds 2*2.3539...)."""
    f = W / 2.0
    z = 4.0
    sx2, sy2 = 0.16, 0.01
    cam = CameraUniforms.from_camera(_camera(), (W, H))
    cloud = _cloud(
        [[0.0, 0.0, z]],
        [[sx2, 0, 0, sy2, 0, 1e-6]],
        [0.95],
        _sh0_only([1.0, 0.0, 0.0]),
    )
    img = render_oracle(cloud, cam, _settings(), W, H)
    lx = f * f * sx2 / (z * z) + 0.3  # 10.54
    ly = f * f * sy2 / (z * z) + 0.3  # 0.94
    for iy, ix in [(32, 38), (30, 32), (33, 25)]:
        dx = ix + 0.5 - 32.0
        dy = iy + 0.5 - 32.0
        a = 0.5 * (dx * dx / lx + dy * dy / ly)
        alpha = min(0.99, np.exp(-a) * 0.95) if a <= 2.0 * CUTOFF else 0.0
        np.testing.assert_allclose(img[iy, ix, 0], alpha, rtol=2e-5, atol=2e-6)
    # far along y the quadratic passes 2*CUTOFF and the fragment discards:
    # dy = 3.5: a = 0.5*3.5^2/0.94 = 6.5 > 4.708 -> exactly zero
    assert img[36, 32, 0] == 0.0
    # while the un-cutoff Gaussian would still be visible there
    assert np.exp(-6.5) * 0.95 > 1e-3


def test_depth_order_and_over_operator():
    """Front red over back green: img = aR*red + (1-aR)*aG*green — the
    premultiplied `over` in depth order (back-to-front blending with
    src*1 + dst*(1-src_alpha) gives the identical closed form)."""
    f = W / 2.0
    cam = CameraUniforms.from_camera(_camera(), (W, H))
    sigma2 = 10.0  # huge flat splats -> alpha ~ constant near center
    xyz = [[0.0, 0.0, 2.0], [0.0, 0.0, 3.0]]
    cov = [[sigma2, 0, 0, sigma2, 0, sigma2]] * 2
    sh = np.concatenate([_sh0_only([1, 0, 0]), _sh0_only([0, 1, 0])])
    cloud = _cloud(xyz, cov, [0.6, 0.8], sh)
    img = render_oracle(cloud, cam, _settings(), W, H)

    def alpha_at(z, op, d2):
        lam = f * f * sigma2 / (z * z) + 0.3
        a = 0.5 * d2 / lam
        return min(0.99, np.exp(-a) * op) if a <= 2 * CUTOFF else 0.0

    d2 = 0.5  # pixel (31, 31)
    a_r = alpha_at(2.0, 0.6, d2)
    a_g = alpha_at(3.0, 0.8, d2)
    np.testing.assert_allclose(img[31, 31, 0], a_r, rtol=2e-5)
    np.testing.assert_allclose(img[31, 31, 1], (1 - a_r) * a_g, rtol=2e-5)
    np.testing.assert_allclose(img[31, 31, 2], 0.0, atol=1e-7)


def test_sh_degree1_color_along_known_direction():
    """Deg-1 SH at view direction d = (0,0,1):
    color = C0*c0 + C1*c2 + 0.5 with C1 = sqrt(3/(4 pi)) and the
    Condon-Shortley signs (-y, +z, -x) (preprocess.wgsl:121-127)."""
    C0 = 1.0 / (2.0 * np.sqrt(np.pi))
    C1 = np.sqrt(3.0 / (4.0 * np.pi))
    sh = np.zeros((1, 16, 3), np.float32)
    sh[0, 0] = [0.4, 0.4, 0.4]
    sh[0, 1] = [0.11, 0.12, 0.13]  # -C1*y term: y=0 -> no contribution
    sh[0, 2] = [0.21, 0.22, 0.23]  # +C1*z term: z=1
    sh[0, 3] = [0.31, 0.32, 0.33]  # -C1*x term: x=0 -> no contribution
    cam = CameraUniforms.from_camera(_camera(), (W, H))
    cloud = _cloud([[0.0, 0.0, 2.0]], [[10.0, 0, 0, 10.0, 0, 10.0]], [0.99], sh)
    img = render_oracle(cloud, cam, _settings(), W, H)
    expected_rgb = C0 * np.array([0.4, 0.4, 0.4]) + C1 * np.array(
        [0.21, 0.22, 0.23]
    ) + 0.5
    # at the exact center pixel ring, alpha = min(0.99, exp(-a)*0.99)
    lam = (W / 2.0) ** 2 * 10.0 / 4.0 + 0.3
    a = 0.5 * 0.5 / lam
    alpha = min(0.99, np.exp(-a) * 0.99)
    np.testing.assert_allclose(img[31, 31], alpha * expected_rgb, rtol=3e-5)


def test_offcenter_ewa_jacobian_term():
    """Off-center splat exercises the J[0][2] = -f x / z^2 perspective term:
    for a POINT-like gaussian (sigma -> 0) the dilated cov2d is still 0.3*I,
    but a z-extended gaussian at off-center x smears along the radial
    direction: cov2d_xx = (f/z)^2 sx2 + (f x / z^2)^2 sz2 + 0.3 at y=0."""
    f = W / 2.0
    x0, z0 = 0.5, 2.0
    sz2 = 0.25
    cam = CameraUniforms.from_camera(_camera(), (W, H))
    cloud = _cloud(
        [[x0, 0.0, z0]],
        [[1e-6, 0, 0, 1e-6, 0, sz2]],
        [0.9],
        _sh0_only([1.0, 1.0, 1.0]),
    )
    img = render_oracle(cloud, cam, _settings(), W, H)
    lam_x = (f * x0 / (z0 * z0)) ** 2 * sz2 + 0.3 + 1e-6 * (f / z0) ** 2
    lam_y = 0.3 + 1e-6 * (f / z0) ** 2  # J[1][2] = +f*y/z^2 = 0 at y=0
    px = (1 + x0 / z0) / 2 * W  # 40.0
    py = H / 2.0
    for iy, ix in [(31, 41), (31, 38), (32, 40)]:
        dx = ix + 0.5 - px
        dy = iy + 0.5 - py
        a = 0.5 * (dx * dx / lam_x + dy * dy / lam_y)
        alpha = min(0.99, np.exp(-a) * 0.9) if a <= 2 * CUTOFF else 0.0
        np.testing.assert_allclose(img[iy, ix, 0], alpha, rtol=2e-4, atol=1e-6)
