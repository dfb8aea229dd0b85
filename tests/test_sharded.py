"""Splat-sharded multi-chip rendering vs the single-device renderer."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from websplat_tpu.config import RasterConfig, SplattingArgs, resolve_settings
from websplat_tpu.models.camera import CameraUniforms
from websplat_tpu.parallel.sharded import (
    make_splat_sharded_renderer,
    shard_cloud,
    splat_mesh,
)
from websplat_tpu.render.renderer import (
    GaussianRenderer,
    camera_to_device,
    settings_to_device,
    upload_cloud,
)
from websplat_tpu.utils.image import psnr
from tests.synth import make_camera, make_cloud

W, H = 96, 64  # 6x8 tiles of 16x8 -> 8 tile rows over 8 devices
# compact=False: pure-XLA programs hit the persistent compilation cache
# (interpret-Pallas callbacks are uncacheable); compaction coverage lives in
# test_compact / test_emit_compact.
CFG = RasterConfig(
    raster_backend="xla", tile_w=16, tile_h=8, tile_slots=8,
    xla_max_per_tile=512, compact=False
)


def test_splat_sharded_matches_single(rng):
    n_dev = len(jax.devices())
    cloud = make_cloud(rng, n=303)  # deliberately not divisible by 8
    cam = make_camera(viewport=(W, H))
    cam.fit_near_far(*cloud.aabb)
    args = SplattingArgs(background_color=(0.15, 0.1, 0.3))
    settings = resolve_settings(args, cloud)
    uni = CameraUniforms.from_camera(cam, (W, H))

    mesh = splat_mesh(n_dev)
    dc = upload_cloud(cloud)
    dc_sharded = shard_cloud(dc, mesh)
    step = make_splat_sharded_renderer(
        mesh, width=W, height=H, config=CFG, region_capacity=2048
    )
    img, stats = step(
        dc_sharded,
        camera_to_device(uni),
        settings_to_device(settings),
        jnp.asarray(settings.background_color, jnp.float32),
    )
    img = np.asarray(img)
    assert img.shape == (H, W, 3)
    assert int(stats["num_dropped_exchange"]) == 0

    single = GaussianRenderer(cloud, CFG).render(cam, (W, H), args, fit_near_far=False)
    # depth-tie ordering across devices may differ; everything else is exact
    assert psnr(img, single) > 60, f"sharded vs single PSNR {psnr(img, single):.1f}"


def test_splat_sharded_capacity_overflow(rng):
    n_dev = len(jax.devices())
    cloud = make_cloud(rng, n=4000)
    cam = make_camera(viewport=(W, H))
    cam.fit_near_far(*cloud.aabb)
    args = SplattingArgs()
    settings = resolve_settings(args, cloud)
    uni = CameraUniforms.from_camera(cam, (W, H))
    mesh = splat_mesh(n_dev)
    step = make_splat_sharded_renderer(
        mesh, width=W, height=H, config=CFG, region_capacity=128
    )
    img, stats = step(
        shard_cloud(upload_cloud(cloud), mesh),
        camera_to_device(uni),
        settings_to_device(settings),
        jnp.asarray(settings.background_color, jnp.float32),
    )
    assert np.isfinite(np.asarray(img)).all()
    assert int(stats["num_dropped_exchange"]) > 0


def test_splat_sharded_bad_mesh_split():
    with pytest.raises(ValueError, match="tile rows"):
        make_splat_sharded_renderer(
            splat_mesh(3), width=W, height=H, config=CFG, region_capacity=256
        )


@pytest.mark.slow
def test_splat_sharded_production_branch_one_device(rng):
    """The PRODUCTION config (fused frontend + compaction + Pallas raster +
    overflow) must execute under shard_map, not just the XLA fallback: a
    1-device mesh runs interpret-mode Pallas without the multi-device
    barrier (renderer.use_pallas_ops), so this traces and executes the
    fused_ok branch of sharded.shard_fn end-to-end on CPU."""
    cfg = RasterConfig(
        tile_w=32, tile_h=8, tile_slots=6, instance_capacity_factor=32.0
    )
    assert cfg.raster_backend == "pallas" and cfg.compact
    cloud = make_cloud(rng, n=500)
    cam = make_camera(viewport=(W, H))
    cam.fit_near_far(*cloud.aabb)
    args = SplattingArgs(background_color=(0.15, 0.1, 0.3))
    settings = resolve_settings(args, cloud)
    uni = CameraUniforms.from_camera(cam, (W, H))

    mesh = splat_mesh(1)
    step = make_splat_sharded_renderer(
        mesh, width=W, height=H, config=cfg, region_capacity=8192
    )
    img, stats = step(
        shard_cloud(upload_cloud(cloud), mesh),
        camera_to_device(uni),
        settings_to_device(settings),
        jnp.asarray(settings.background_color, jnp.float32),
    )
    img = np.asarray(img)
    assert img.shape == (H, W, 3)
    assert np.isfinite(img).all()
    assert int(stats["num_dropped_exchange"]) == 0

    single = GaussianRenderer(cloud, cfg).render(
        cam, (W, H), args, fit_near_far=False
    )
    assert psnr(img, single) > 60, f"PSNR {psnr(img, single):.1f}"


@pytest.mark.slow
def test_multiview_production_branch_one_device(rng):
    """Same for the view-parallel path: a 1-device mesh executes the fused
    Pallas branch inside multiview's shard_map body."""
    from websplat_tpu.parallel.multiview import (
        make_view_parallel_renderer,
        stack_cameras,
        view_mesh,
    )

    cfg = RasterConfig(
        tile_w=32, tile_h=8, tile_slots=6, instance_capacity_factor=32.0
    )
    cloud = make_cloud(rng, n=400)
    cams = []
    for az in (0.0, 0.7):
        c = make_camera(viewport=(W, H), azimuth=az)
        c.fit_near_far(*cloud.aabb)
        cams.append(CameraUniforms.from_camera(c, (W, H)))
    args = SplattingArgs()
    settings = resolve_settings(args, cloud)
    mesh = view_mesh(1)
    step = make_view_parallel_renderer(mesh, width=W, height=H, config=cfg)
    imgs, vis = step(
        upload_cloud(cloud),
        stack_cameras(cams),
        settings_to_device(settings),
        jnp.asarray(settings.background_color, jnp.float32),
    )
    imgs = np.asarray(imgs)
    assert imgs.shape == (2, H, W, 3)
    assert np.isfinite(imgs).all()
    assert int(vis) > 0
    single = GaussianRenderer(cloud, cfg)
    for i, az in enumerate((0.0, 0.7)):
        c = make_camera(viewport=(W, H), azimuth=az)
        ref = single.render(c, (W, H), args)
        assert psnr(imgs[i], ref) > 60, f"view {i}: {psnr(imgs[i], ref):.1f}"
