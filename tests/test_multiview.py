"""Multi-view batching + multi-chip view-parallel sharding (8-dev CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np

from websplat_tpu.config import RasterConfig, SplattingArgs, resolve_settings
from websplat_tpu.models.camera import CameraUniforms
from websplat_tpu.parallel.multiview import (
    make_view_parallel_renderer,
    render_views,
    stack_cameras,
    view_mesh,
)
from websplat_tpu.render.renderer import (
    GaussianRenderer,
    camera_to_device,
    settings_to_device,
    upload_cloud,
)
from tests.synth import make_camera, make_cloud

W, H = 64, 64
# compact=False keeps these programs pure XLA: interpret-mode Pallas embeds
# callbacks that make the module ineligible for the persistent compilation
# cache, and these tests cover PARALLEL correctness, not compaction (which
# test_compact / test_emit_compact own).
CFG = RasterConfig(
    raster_backend="xla", tile_slots=16, xla_max_per_tile=512, compact=False
)


def _setup(rng, n_views):
    cloud = make_cloud(rng, n=200)
    cams = [make_camera(viewport=(W, H), azimuth=0.3 + 0.2 * i) for i in range(n_views)]
    for c in cams:
        c.fit_near_far(*cloud.aabb)
    unis = [CameraUniforms.from_camera(c, (W, H)) for c in cams]
    settings = resolve_settings(SplattingArgs(), cloud)
    return cloud, cams, unis, settings


def test_render_views_matches_single(rng):
    cloud, cams, unis, settings = _setup(rng, 3)
    dc = upload_cloud(cloud)
    bg = jnp.asarray(settings.background_color, jnp.float32)
    batched = jax.jit(
        lambda dc, cams_, s, bg: render_views(
            dc, cams_, s, bg, width=W, height=H, config=CFG
        )
    )(dc, stack_cameras(unis), settings_to_device(settings), bg)
    renderer = GaussianRenderer(cloud, CFG)
    for i, cam in enumerate(cams):
        single = renderer.render(cam, (W, H), SplattingArgs(), fit_near_far=False)
        np.testing.assert_allclose(np.asarray(batched[i]), single, atol=1e-5)


def test_view_parallel_over_mesh(rng):
    n_dev = len(jax.devices())
    assert n_dev == 8
    cloud, cams, unis, settings = _setup(rng, n_dev)
    mesh = view_mesh(n_dev)
    fn = make_view_parallel_renderer(mesh, width=W, height=H, config=CFG)
    dc = upload_cloud(cloud)
    bg = jnp.asarray(settings.background_color, jnp.float32)
    imgs, total_visible = fn(dc, stack_cameras(unis), settings_to_device(settings), bg)
    assert imgs.shape == (n_dev, H, W, 3)
    assert int(total_visible) > 0
    # sharded result matches the single-device path
    renderer = GaussianRenderer(cloud, CFG)
    for i in [0, 3, 7]:
        single = renderer.render(cams[i], (W, H), SplattingArgs(), fit_near_far=False)
        np.testing.assert_allclose(np.asarray(imgs[i]), single, atol=1e-5)


def test_view_parallel_uneven_shards(rng):
    """2 views per device on a 4-device submesh."""
    cloud, cams, unis, settings = _setup(rng, 8)
    mesh = view_mesh(4)
    fn = make_view_parallel_renderer(mesh, width=W, height=H, config=CFG)
    imgs, _ = fn(
        upload_cloud(cloud),
        stack_cameras(unis),
        settings_to_device(settings),
        jnp.asarray(settings.background_color, jnp.float32),
    )
    assert imgs.shape == (8, H, W, 3)
