import json

import numpy as np
import pytest

from websplat_tpu.models.scene import Scene, SceneCamera, Split
from websplat_tpu.utils.gmath import quat_to_mat


def make_scene_json(n=17, seed=0):
    rng = np.random.default_rng(seed)
    entries = []
    for i in range(n):
        # random rotation via QR
        q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
        if np.linalg.det(q) < 0:
            q[:, 0] = -q[:, 0]
        entries.append(
            dict(
                id=i,
                img_name=f"img_{i:04d}",
                width=1200,
                height=799,
                position=list(rng.normal(size=3) * 3),
                rotation=[list(r) for r in q],
                fx=1000.0 + i,
                fy=990.0 + i,
            )
        )
    return json.dumps(entries)


def test_split_assignment():
    scene = Scene.from_json(make_scene_json(17))
    cams = scene.cameras()
    assert len(cams) == 17
    # every 8th camera is Test (scene.rs:139-147)
    for i, c in enumerate(cams):
        expect = Split.TEST if i % 8 == 0 else Split.TRAIN
        assert c.split == expect
    assert len(scene.cameras(Split.TEST)) == 3
    assert len(scene.cameras(Split.TRAIN)) == 14


def test_duplicate_ids_removed():
    data = json.loads(make_scene_json(4))
    data.append(dict(data[0]))  # duplicate id 0
    scene = Scene.from_json(json.dumps(data))
    assert scene.num_cameras() == 4


def test_extend_is_max_pairwise_distance():
    data = json.loads(make_scene_json(5))
    pts = np.array([e["position"] for e in data])
    d = np.sqrt((((pts[:, None] - pts[None]) ** 2).sum(-1)).max())
    scene = Scene.from_json(json.dumps(data))
    assert scene.extend() == pytest.approx(d, rel=1e-5)


def test_nearest_camera():
    scene = Scene.from_json(make_scene_json(9))
    c0 = scene.cameras()[0]
    assert scene.nearest_camera(np.asarray(c0.position)) == c0.id
    assert scene.nearest_camera(np.asarray(c0.position), Split.TEST) in {
        c.id for c in scene.cameras(Split.TEST)
    }


def test_to_perspective_det_fix():
    rng = np.random.default_rng(7)
    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    if np.linalg.det(q) > 0:
        q[:, 0] = -q[:, 0]  # force det = -1
    cam = SceneCamera(
        id=0, img_name="x", width=640, height=480,
        position=np.zeros(3, np.float32), rotation=q.astype(np.float32),
        fx=500.0, fy=500.0,
    )
    p = cam.to_perspective()
    r = quat_to_mat(p.rotation)
    # quaternion produced a proper rotation
    assert np.linalg.det(r) == pytest.approx(1.0, abs=1e-4)
    # det fix flips JSON column 1 then transposes (scene.rs:85-108)
    fixed = q.copy()
    fixed[:, 1] = -fixed[:, 1]
    np.testing.assert_allclose(r, fixed.T, atol=1e-5)
    assert p.projection.znear == pytest.approx(0.01)
    assert p.projection.zfar == pytest.approx(100.0)


def test_perspective_roundtrip():
    scene = Scene.from_json(make_scene_json(3))
    c = scene.cameras()[1]
    p = c.to_perspective()
    back = SceneCamera.from_perspective(p, c.img_name, c.id, (c.width, c.height), c.split)
    np.testing.assert_allclose(back.position, c.position, atol=1e-5)
    np.testing.assert_allclose(back.fx, c.fx, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(back.rotation), np.asarray(c.rotation), atol=1e-4)
