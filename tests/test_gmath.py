import numpy as np
import pytest

from websplat_tpu.utils.gmath import (
    build_cov,
    mat_to_quat,
    max_pairwise_distance,
    plane_from_points,
    quat_to_mat,
    sh_deg_from_num_coefs,
    sh_num_coefficients,
    sigmoid,
)


def test_sigmoid_matches_definition_and_is_stable():
    x = np.array([-100.0, -5.0, 0.0, 5.0, 100.0], np.float32)
    y = sigmoid(x)
    assert np.all(np.isfinite(y))
    np.testing.assert_allclose(y[2], 0.5)
    np.testing.assert_allclose(
        y, 1.0 / (1.0 + np.exp(-x.astype(np.float64))), rtol=1e-6, atol=1e-40
    )


def test_sh_helpers():
    assert sh_num_coefficients(0) == 1
    assert sh_num_coefficients(3) == 16
    assert sh_deg_from_num_coefs(16) == 3
    assert sh_deg_from_num_coefs(1) == 0
    assert sh_deg_from_num_coefs(7) is None


def test_quat_roundtrip(rng):
    for _ in range(50):
        q = rng.normal(size=4)
        q = (q / np.linalg.norm(q)).astype(np.float32)
        m = quat_to_mat(q)
        # rotation matrix properties
        np.testing.assert_allclose(m @ m.T, np.eye(3), atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(m), 1.0, atol=1e-5)
        q2 = mat_to_quat(m)
        # q and -q are the same rotation
        if np.dot(q, q2) < 0:
            q2 = -q2
        np.testing.assert_allclose(q, q2, atol=1e-5)


def test_build_cov_identity():
    # identity rotation, isotropic scale s -> s^2 * I
    q = np.array([1.0, 0.0, 0.0, 0.0], np.float32)
    cov = build_cov(q, np.array([2.0, 2.0, 2.0], np.float32))
    np.testing.assert_allclose(cov, [4.0, 0.0, 0.0, 4.0, 0.0, 4.0], atol=1e-6)


def test_build_cov_rotation_invariants(rng):
    q = rng.normal(size=4)
    q = (q / np.linalg.norm(q)).astype(np.float32)
    scale = np.array([0.5, 1.0, 2.0], np.float32)
    cov6 = build_cov(q, scale)
    m = np.array(
        [
            [cov6[0], cov6[1], cov6[2]],
            [cov6[1], cov6[3], cov6[4]],
            [cov6[2], cov6[4], cov6[5]],
        ]
    )
    eig = np.sort(np.linalg.eigvalsh(m))
    np.testing.assert_allclose(eig, np.sort(scale**2), rtol=1e-4)


def test_plane_from_points_flat_plane(rng):
    # points on the y=3 plane -> normal = +y
    pts = rng.normal(size=(500, 3)).astype(np.float32)
    pts[:, 1] = 3.0
    centroid, up = plane_from_points(pts)
    assert up is not None
    np.testing.assert_allclose(np.abs(up), [0, 1, 0], atol=1e-4)
    np.testing.assert_allclose(centroid[1], 3.0, atol=1e-4)
    assert up[1] > 0  # flipped toward +y (io/mod.rs:276-278)


def test_plane_from_points_degenerate():
    centroid, up = plane_from_points(np.zeros((2, 3), np.float32))
    assert up is None


def test_max_pairwise_distance():
    pts = np.array([[0, 0, 0], [3, 4, 0], [1, 1, 1]], np.float32)
    assert max_pairwise_distance(pts) == pytest.approx(5.0)
    assert max_pairwise_distance(pts[:1]) == 0.0
