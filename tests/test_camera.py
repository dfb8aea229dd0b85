import numpy as np
import pytest

from websplat_tpu.models.camera import (
    CameraUniforms,
    PerspectiveCamera,
    PerspectiveProjection,
    VIEWPORT_Y_FLIP,
    build_proj,
    focal2fov,
    fov2focal,
    world2view,
)
from websplat_tpu.utils.gmath import quat_to_mat


def test_build_proj_values():
    """Hand-computed fixture for build_proj (camera.rs:216-234)."""
    znear, zfar = 0.01, 100.0
    fovx = fovy = np.deg2rad(90.0)
    p = build_proj(znear, zfar, fovx, fovy)
    # tan(45deg) = 1 -> p00 = p11 = 1/tan = 1 * znear*2/(2*znear) = 1
    assert p[0, 0] == pytest.approx(1.0, rel=1e-6)
    assert p[1, 1] == pytest.approx(1.0, rel=1e-6)
    assert p[3, 2] == 1.0
    assert p[2, 2] == pytest.approx(zfar / (zfar - znear), rel=1e-6)
    assert p[2, 3] == pytest.approx(-(zfar * znear) / (zfar - znear), rel=1e-6)
    # z mapping: view z = znear -> ndc 0, view z = zfar -> ndc 1
    for z, expect in [(znear, 0.0), (zfar, 1.0)]:
        v = p @ np.array([0, 0, z, 1.0])
        assert v[2] / v[3] == pytest.approx(expect, abs=1e-6)


def test_znear_zfar_recovery_from_proj():
    """The shader recovers znear/zfar from the proj matrix
    (preprocess.wgsl:270-271); verify the algebra holds for our layout."""
    p = build_proj(0.2, 42.0, 1.0, 0.8)
    znear = -p[2, 3] / p[2, 2]
    zfar = -p[2, 3] / (p[2, 2] - 1.0)
    assert znear == pytest.approx(0.2, rel=1e-5)
    assert zfar == pytest.approx(42.0, rel=1e-4)


def test_world2view_transforms_camera_to_origin():
    q = np.array([0.9238795, 0.0, 0.3826834, 0.0], np.float32)  # 45 deg about y
    r = quat_to_mat(q)
    t = np.array([1.0, 2.0, 3.0], np.float32)
    v = world2view(r, t)
    # camera position maps to origin
    np.testing.assert_allclose((v @ np.append(t, 1.0))[:3], 0.0, atol=1e-6)
    # rotation part is R itself
    np.testing.assert_allclose(v[:3, :3], r, atol=1e-6)
    np.testing.assert_allclose(v[3], [0, 0, 0, 1], atol=0)


def test_fov_focal_roundtrip():
    fov = 1.1
    px = 1200.0
    assert focal2fov(fov2focal(fov, px), px) == pytest.approx(fov, rel=1e-6)


def test_viewport_flip_is_diag():
    np.testing.assert_array_equal(VIEWPORT_Y_FLIP, np.diag([1.0, -1.0, 1.0, 1.0]))


def test_projection_resize_preserves_ratio():
    proj = PerspectiveProjection.new((1200, 799), (1.2, 0.9), 0.01, 100.0)
    fovy0 = proj.fovy
    # width == height takes the else branch: fovx = fovy * ratio * r
    # (camera.rs:137-144)
    proj.resize(2048, 2048)
    assert proj.fovx == pytest.approx(fovy0 * proj.fov2view_ratio, rel=1e-6)
    fovx1 = proj.fovx
    proj.resize(1600, 800)  # width > height: fovy = fovx / ratio * r
    assert proj.fovy == pytest.approx(fovx1 / 2.0 * proj.fov2view_ratio, rel=1e-6)


def test_fit_near_far():
    cam = PerspectiveCamera.default()
    cam.position = np.array([0.0, 0.0, -10.0], np.float32)
    cam.fit_near_far(np.array([-1.0, -1, -1]), np.array([1.0, 1, 1]))
    radius = np.sqrt(3.0)
    assert cam.projection.zfar == pytest.approx(10 + radius, rel=1e-5)
    assert cam.projection.znear == pytest.approx(10 - radius, rel=1e-5)


def test_camera_uniforms_projection_flip():
    cam = PerspectiveCamera.default()
    uni = CameraUniforms.from_camera(cam, (640, 480))
    p_raw = cam.proj_matrix()
    np.testing.assert_allclose(uni.proj[1], -p_raw[1], atol=1e-7)
    np.testing.assert_allclose(uni.proj[0], p_raw[0], atol=1e-7)
    np.testing.assert_allclose(uni.view_inv @ uni.view, np.eye(4), atol=1e-5)


def test_camera_lerp_endpoints():
    a = PerspectiveCamera.default()
    b = PerspectiveCamera.default()
    b.position = np.array([1.0, 2.0, 3.0], np.float32)
    b.rotation = np.array([0.0, 1.0, 0.0, 0.0], np.float32)
    for t, ref in [(0.0, a), (1.0, b)]:
        c = a.lerp(b, t)
        np.testing.assert_allclose(c.position, ref.position, atol=1e-6)
        assert abs(np.dot(c.rotation, ref.rotation)) == pytest.approx(1.0, abs=1e-5)
