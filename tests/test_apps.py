"""End-to-end CLI app tests on tiny synthetic datasets."""

import json
import os

import numpy as np
import pytest

from websplat_tpu.io.ply import write_ply
from websplat_tpu.models.scene import SceneCamera, Split
from websplat_tpu.utils.image import read_png
from tests.synth import make_camera, make_cloud, random_quats


@pytest.fixture()
def dataset(tmp_path, rng):
    """Tiny PLY + cameras.json dataset on disk."""
    n = 80
    xyz = rng.normal(size=(n, 3)).astype(np.float32) * 0.5
    sh = rng.normal(size=(n, 1, 3)).astype(np.float32) * 0.3
    write_ply(
        str(tmp_path / "point_cloud.ply"),
        xyz,
        sh,
        rng.normal(size=n).astype(np.float32),
        rng.uniform(-4, -2.5, size=(n, 3)).astype(np.float32),
        random_quats(rng, n),
    )
    cams = []
    for i in range(6):
        cam = make_camera(azimuth=i, viewport=(64, 48))
        sc = SceneCamera.from_perspective(cam, f"img{i}", i, (64, 48), Split.TRAIN)
        cams.append(sc.to_json_dict())
    (tmp_path / "cameras.json").write_text(json.dumps(cams))
    return tmp_path


def test_render_app(dataset):
    from websplat_tpu.apps.render import main

    out = dataset / "renders"
    main([str(dataset / "point_cloud.ply"), "--out", str(out), "--splits", "test,train"])
    test_imgs = sorted(os.listdir(out / "test"))
    train_imgs = sorted(os.listdir(out / "train"))
    assert len(test_imgs) == 1  # every 8th of 6 cameras -> 1 test
    assert len(train_imgs) == 5
    img = read_png(str(out / "train" / train_imgs[0]))
    assert img.shape == (48, 64, 3)


def test_render_app_psnr_self(dataset):
    """--psnr-vs against its own output reports ~inf PSNR."""
    from websplat_tpu.apps.render import main

    out = dataset / "r1"
    main([str(dataset / "point_cloud.ply"), "--out", str(out), "--splits", "test"])
    main(
        [
            str(dataset / "point_cloud.ply"),
            "--out",
            str(dataset / "r2"),
            "--splits",
            "test",
            "--psnr-vs",
            str(out),
        ]
    )


def test_measure_app(dataset, capsys):
    from websplat_tpu.apps.measure import main

    main([str(dataset / "point_cloud.ply"), "--width", "64", "--height", "64",
          "--samples", "2"])
    out = capsys.readouterr().out
    assert "average FPS:" in out


def test_video_app(dataset):
    from websplat_tpu.apps.video import main

    out = dataset / "frames"
    main([str(dataset / "point_cloud.ply"), "--out", str(out), "--fps", "2",
          "--duration", "1.5", "--width", "64", "--height", "48"])
    frames = sorted(os.listdir(out))
    assert frames == ["frame_0000.png", "frame_0001.png", "frame_0002.png"]


def test_scene_autodiscovery(dataset):
    from websplat_tpu.apps.common import find_scene_file

    assert find_scene_file(str(dataset / "point_cloud.ply")) == str(
        dataset / "cameras.json"
    )
    sub = dataset / "a" / "b"
    sub.mkdir(parents=True)
    (sub / "pc.ply").write_bytes(b"ply")
    assert find_scene_file(str(sub / "pc.ply")) == str(dataset / "cameras.json")


def test_viewer_smoke(dataset):
    """Boot the HTTP viewer, poke every endpoint, verify input changes frames."""
    import json as _json
    import threading
    import time
    import urllib.request

    from http.server import ThreadingHTTPServer

    from websplat_tpu.apps.viewer import ViewerState, make_handler
    from websplat_tpu.config import RasterConfig
    from websplat_tpu.io.loader import load_gaussian_cloud
    from websplat_tpu.models.scene import Scene

    cloud = load_gaussian_cloud(str(dataset / "point_cloud.ply"))
    scene = Scene.from_json(str(dataset / "cameras.json"))
    state = ViewerState(cloud, scene, 64, 48, RasterConfig.for_backend())
    render_thread = threading.Thread(target=state.render_loop, daemon=True)
    render_thread.start()
    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(state))
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()

    def get(path):
        with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}", timeout=10) as r:
            return r.read()

    def post(obj):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/input", data=_json.dumps(obj).encode()
        )
        urllib.request.urlopen(req, timeout=10).read()

    assert b"websplat-tpu viewer" in get("/")
    deadline = time.time() + 180
    while time.time() < deadline and not state.frame_png:
        time.sleep(0.5)
    assert state.frame_png, "no frame rendered within 180s"
    f1 = get("/frame.png")
    assert f1[:4] == b"\x89PNG"
    stats = _json.loads(get("/stats"))
    assert stats["num_visible"] >= 0 and len(stats["cameras"]) == 6
    post({"type": "rotate", "dx": 40, "dy": 5})
    post({"type": "setting", "name": "bg", "value": "#ff0000"})
    post({"type": "snap", "id": 2})
    post({"type": "save_view"})
    post({"type": "tracking_shot"})
    time.sleep(3)
    assert state.saved_cameras
    server.shutdown()
    state.stop = True
    render_thread.join(timeout=60)


def test_render_app_hdr(dataset):
    """--hdr writes 16-bit PNGs (reference Rgba16Float path, lib.rs:192-196)."""
    from websplat_tpu.apps.render import main

    out = dataset / "renders_hdr"
    main([str(dataset / "point_cloud.ply"), "--out", str(out), "--splits", "test",
          "--hdr"])
    img = read_png(str(out / "test" / "00000.png"))
    assert img.dtype == np.uint16
    assert img.shape == (48, 64, 3)


def test_png_16bit_roundtrip(tmp_path, rng):
    from websplat_tpu.utils.image import to_u16, write_png

    img = rng.random((9, 11, 3)).astype(np.float32)
    path = str(tmp_path / "x.png")
    write_png(path, img, bit_depth=16)
    back = read_png(path)
    assert back.dtype == np.uint16
    assert np.array_equal(back, to_u16(img))
    # u16 quantization error is below 1e-4 -> effectively lossless vs f32
    assert np.abs(back.astype(np.float64) / 65535.0 - img).max() < 1e-4


def test_viewer_view_keys_and_tristate(dataset):
    """View-selection keys (lib.rs:741-787), tri-state settings (ui.rs:438-496)
    and touch forwarding (controller.rs:145-228) through the HTTP handler."""
    from websplat_tpu.apps.viewer import ViewerState
    from websplat_tpu.config import RasterConfig
    from websplat_tpu.io.loader import load_gaussian_cloud
    from websplat_tpu.models.scene import Scene

    cloud = load_gaussian_cloud(str(dataset / "point_cloud.ply"))
    scene = Scene.from_json(str(dataset / "cameras.json"))
    state = ViewerState(cloud, scene, 64, 48, RasterConfig.for_backend())

    # digit key -> snap animation to that scene camera
    assert state.handle_view_key("2")
    assert state.current_view == 2
    assert state.animation is not None
    state.animation = None
    # PageUp/PageDown wrap through views
    assert state.handle_view_key("PageUp")
    assert state.current_view == 3
    assert state.handle_view_key("PageDown")
    assert state.current_view == 2
    # N snaps to the nearest camera, R to a random one
    assert state.handle_view_key("n")
    assert state.handle_view_key("r")
    # digits beyond the camera count are ignored
    assert not state.handle_view_key("9")
    # unrelated keys fall through to the controller
    assert not state.handle_view_key("w")

    # tri-state settings round-trip through the POST handler semantics
    state.settings["kernel"] = 0.2
    state.settings["mip"] = True
    for value, expect in ((None, None), ("auto", None), (0.1, 0.1)):
        state.settings["kernel"] = None if value in (None, "auto") else float(value)
        assert state.settings["kernel"] == expect

    # touch gestures reach the controller
    ctl = state.controller
    ctl.process_touch(1, (10.0, 10.0), "started")
    ctl.process_touch(2, (30.0, 10.0), "started")
    ctl.process_touch(2, (40.0, 10.0), "moved")
    assert ctl.scroll != 0.0 or ctl.shift.any() or ctl.rotation.any()
    ctl.process_touch(1, (0, 0), "ended")
    ctl.process_touch(2, (0, 0), "ended")


def test_viewer_lazy_redraw(dataset):
    """Idle viewer (capped walltime, decayed inputs) stops re-rendering
    (lib.rs:829-838)."""
    import threading
    import time

    from websplat_tpu.apps.viewer import ViewerState
    from websplat_tpu.config import RasterConfig
    from websplat_tpu.io.loader import load_gaussian_cloud
    from websplat_tpu.models.scene import Scene

    cloud = load_gaussian_cloud(str(dataset / "point_cloud.ply"))
    scene = Scene.from_json(str(dataset / "cameras.json"))
    state = ViewerState(cloud, scene, 32, 16, RasterConfig.for_backend())
    state.walltime = 5.0  # grow-in capped -> args become stable
    t = threading.Thread(target=state.render_loop, daemon=True)
    t.start()
    deadline = time.time() + 120
    while time.time() < deadline and state.lazy_skips < 3:
        time.sleep(0.2)
    state.stop = True
    t.join(timeout=60)
    assert state.lazy_skips >= 3, "render loop never settled into lazy skips"
    assert state.frame_png  # a frame was rendered before settling


def test_viewer_gallery_and_scene_switch(dataset, tmp_path):
    """--scenes-dir gallery: /demo lists scenes, /?file= loads one at runtime
    and path escapes are rejected (reference: public/demo.html +
    index.html URL-param loader)."""
    import threading
    import urllib.request
    from http.server import ThreadingHTTPServer

    from websplat_tpu.apps.viewer import ViewerState, make_handler
    from websplat_tpu.config import RasterConfig

    root = tmp_path / "gallery"
    (root / "sceneA").mkdir(parents=True)
    (root / "sceneA" / "pc.ply").write_bytes(
        (dataset / "point_cloud.ply").read_bytes()
    )
    state = ViewerState(
        None, None, 32, 16, RasterConfig.for_backend(), scenes_dir=str(root)
    )
    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(state))
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()

    def get(path):
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}{path}", timeout=10
        ) as r:
            return r.status, r.read()

    # gallery at /demo and at / while nothing is loaded
    for path in ("/demo", "/"):
        code, body = get(path)
        assert code == 200 and b"sceneA" in body

    assert state.renderer is None
    code, body = get("/?file=sceneA/pc.ply")
    assert code == 200 and b"viewer" in body
    assert state.renderer is not None and state.cloud.num_points == 80

    # directory traversal must be rejected
    import urllib.error

    try:
        code, _ = get("/?file=../../etc/passwd")
    except urllib.error.HTTPError as e:
        code = e.code
    assert code == 400

    state.stop = True
    server.shutdown()


def test_for_viewport_keeps_fused_grid():
    """for_viewport must pick a tile shape whose grid fits the fused
    frontend's 7-bit tile coordinates (<=127 per axis) — at the measure
    binary's 2048x2048 the default 32x16 grid is 128 rows and would
    silently fall back to the slot-stream path."""
    from websplat_tpu.config import RasterConfig

    for w, h in ((2048, 2048), (3840, 2160), (1200, 799), (640, 480)):
        cfg = RasterConfig.for_viewport(w, h)
        tx, ty = cfg.tiles_for(w, h)
        assert tx <= 127 and ty <= 127, (w, h, tx, ty)
        assert (cfg.tile_w * cfg.tile_h) % 128 == 0
    # explicit tile overrides are respected untouched
    cfg = RasterConfig.for_viewport(2048, 2048, tile_h=16)
    assert cfg.tile_h == 16
