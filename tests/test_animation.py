import numpy as np
import pytest

from websplat_tpu.models.animation import Animation, TrackingShot, Transition, smoothstep, unroll
from websplat_tpu.models.camera import PerspectiveCamera, PerspectiveProjection
from websplat_tpu.models.controller import CameraController
from websplat_tpu.utils.gmath import quat_to_mat
from tests.synth import make_camera


def cams_on_circle(n=6, r=3.0):
    return [
        make_camera(distance=r, azimuth=2 * np.pi * i / n, viewport=(64, 64))
        for i in range(n)
    ]


def test_smoothstep():
    assert smoothstep(0.0) == 0.0
    assert smoothstep(1.0) == 1.0
    assert smoothstep(0.5) == pytest.approx(0.5)
    assert smoothstep(-1.0) == 0.0 and smoothstep(2.0) == 1.0


def test_transition_endpoints():
    cams = cams_on_circle(2)
    tr = Transition(cams[0], cams[1])
    np.testing.assert_allclose(tr.sample(0.0).position, cams[0].position, atol=1e-6)
    np.testing.assert_allclose(tr.sample(1.0).position, cams[1].position, atol=1e-6)


def test_tracking_shot_passes_through_control_points():
    cams = cams_on_circle(5)
    shot = TrackingShot(cams)
    assert shot.num_control_points() == 9  # n + 4 wrap keys (animation.rs:54-65)
    # Catmull-Rom interpolates its control points.  Reference key layout
    # (animation.rs:54-65) puts camera i at v = (i + 1) / n — progress 0 is
    # the LAST camera (chain = last_two + cameras + first_two).
    n = len(cams)
    for i, c in enumerate(cams):
        s = shot.sample(((i + 1) % n) / n)
        np.testing.assert_allclose(s.position, c.position, atol=1e-4)


def test_tracking_shot_closed_loop():
    cams = cams_on_circle(4)
    shot = TrackingShot(cams)
    a = shot.sample(0.0)
    b = shot.sample(1.0 - 1e-7)
    np.testing.assert_allclose(a.position, b.position, atol=1e-3)


def test_tracking_shot_continuity():
    cams = cams_on_circle(5)
    shot = TrackingShot(cams)
    prev = shot.sample(0.0)
    for v in np.linspace(1e-3, 0.999, 97):
        cur = shot.sample(float(v))
        assert np.linalg.norm(cur.position - prev.position) < 1.0, f"jump at {v}"
        # rotation stays normalized
        assert np.linalg.norm(cur.rotation) == pytest.approx(1.0, abs=1e-5)
        prev = cur


def test_unroll_shortest_path():
    q = np.array([0.9, 0.1, 0, 0]) / np.linalg.norm([0.9, 0.1, 0, 0])
    rots = unroll([q, -q, q, -q])
    for i in range(1, 4):
        assert np.dot(rots[i], rots[i - 1]) >= 0
    assert rots[0][0] > 0


def test_animation_progress_and_looping():
    cams = cams_on_circle(3)
    anim = Animation(duration=3.0, looping=False, sampler=TrackingShot(cams))
    anim.update(1.0)
    assert anim.progress() == pytest.approx(1 / 3)
    anim.update(5.0)
    assert anim.done()
    loop = Animation(duration=2.0, looping=True, sampler=TrackingShot(cams))
    loop.update(3.0)  # wraps
    assert 0.0 <= loop.progress() < 1.0
    assert not loop.done()


def test_controller_orbit_preserves_distance():
    cam = make_camera(distance=4.0, viewport=(64, 64))
    ctl = CameraController(speed=1.0, sensitivity=1.0)
    ctl.center = np.zeros(3)
    ctl.left_mouse_pressed = True
    ctl.process_mouse(30.0, 0.0)
    d0 = np.linalg.norm(cam.position - ctl.center)
    for _ in range(10):
        ctl.update_camera(cam, 1 / 60)
    d1 = np.linalg.norm(cam.position - ctl.center)
    assert d1 == pytest.approx(d0, rel=1e-3)
    # camera still looks at the center: forward axis ~ -dir
    r = quat_to_mat(cam.rotation)
    fwd = r[2]  # third row = camera forward in world
    to_center = (ctl.center - cam.position) / np.linalg.norm(cam.position - ctl.center)
    assert float(fwd @ to_center) == pytest.approx(1.0, abs=1e-3)


def test_controller_zoom_changes_distance():
    cam = make_camera(distance=4.0, viewport=(64, 64))
    ctl = CameraController()
    ctl.center = np.zeros(3)
    ctl.process_scroll(5.0)  # scroll down -> scroll negative -> zoom in
    for _ in range(5):
        ctl.update_camera(cam, 1 / 60)
    assert np.linalg.norm(cam.position) < 4.0


def test_controller_input_decay():
    cam = make_camera(viewport=(64, 64))
    ctl = CameraController()
    ctl.center = np.zeros(3)
    ctl.left_mouse_pressed = True
    ctl.process_mouse(10.0, 5.0)
    for _ in range(200):
        ctl.update_camera(cam, 1 / 60)
    assert np.linalg.norm(ctl.rotation) == 0.0
    assert ctl.scroll == 0.0


def test_controller_touch_gestures():
    ctl = CameraController()
    ctl.process_touch(1, (10.0, 10.0), "started")
    ctl.process_touch(1, (20.0, 15.0), "moved")
    assert ctl.rotation[0] != 0  # single-finger rotate
    ctl.process_touch(2, (50.0, 50.0), "started")
    ctl.process_touch(2, (60.0, 60.0), "moved")  # pinch out -> zoom
    assert ctl.scroll != 0 or ctl._last_pinch_distance is not None
    ctl.process_touch(1, (0, 0), "ended")
    ctl.process_touch(2, (0, 0), "ended")
    assert ctl._last_touch_center is None or len(ctl._touches) == 0
