"""Fused emission+compaction kernel (ops/emit_compact_pallas.py).

The kernel replaces the reference's atomic stream compaction
(/root/reference/src/shaders/preprocess.wgsl:262-279) together with the slot
emission; equivalence is checked against the materialized slot-stream path,
which the rest of the suite pins to the NumPy oracle.
"""

import dataclasses

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from websplat_tpu.config import RasterConfig, SplattingArgs, resolve_settings
from websplat_tpu.models.camera import CameraUniforms
from websplat_tpu.ops.emit_compact_pallas import SPLATS, emit_compact
from websplat_tpu.ops.preprocess import preprocess
from websplat_tpu.ops.sort import sort_instances
from websplat_tpu.render.renderer import (
    camera_to_device,
    render_frame_impl,
    settings_to_device,
    upload_cloud,
)
from tests.synth import make_camera, make_cloud

W, H = 256, 192


def _setup(seed, n=2000):
    # independent fixed-seed generator: the session rng fixture's state
    # depends on which tests ran earlier, and these tests assert exact
    # instance counts against static capacities
    cloud = make_cloud(np.random.default_rng(seed), n=n)
    cam = make_camera(viewport=(W, H))
    cam.fit_near_far(*cloud.aabb)
    uni = CameraUniforms.from_camera(cam, (W, H))
    settings = resolve_settings(SplattingArgs(), cloud)
    return (
        upload_cloud(cloud),
        camera_to_device(uni),
        settings_to_device(settings),
        jnp.asarray(settings.background_color, jnp.float32),
    )


def test_fused_matches_slot_stream():
    """The fused frontend kernel emits the same sorted multiset of
    (key, record) instances as the XLA slot-stream path (the production
    pair: both walk iter_slots with the center-out clamped ordering).

    The standalone packed+emit_compact fallback is NOT compared here — its
    kernel reconstructs tiles row-major from the packed rect word, so its
    packed emission deliberately disables the center-out walk (see
    iter_slots(center_out=False)); its own unit tests cover that contract.
    """
    from websplat_tpu.ops.frontend_pallas import fused_frontend

    dc, dcam, dset, _ = _setup(1001)
    cfg = RasterConfig(instance_capacity_factor=32.0)
    tx, ty = cfg.tiles_for(W, H)
    _, depth_bits = cfg.key_bits(W, H)

    keys_f, pay_f, nvis, ncl, nv, nd = fused_frontend(
        dc, dcam, dset, width=W, height=H, config=cfg,
        capacity=int(cfg.instance_capacity_factor * dc.opacity.shape[0]),
    )
    assert int(nd) == 0

    slot = preprocess(dc, dcam, dset, width=W, height=H, config=cfg)
    # the kernel's math compiles in a different fma-contraction context than
    # the XLA path, so boundary comparisons (culls, reach tests, depth
    # quantization) may flip on a handful of splats — counts and the key
    # multiset must agree up to that sliver; image-level equality is pinned
    # by test_fused_render_matches
    n = int(dc.opacity.shape[0])
    assert abs(int(nvis) - int(slot.num_visible)) <= max(2, n // 500)
    assert abs(int(ncl) - int(slot.num_clamped)) <= max(2, n // 500)

    sk_f, _ = sort_instances(keys_f, pay_f)
    sk_s, _ = sort_instances(slot.keys, slot.payload)
    a = np.asarray(sk_f); a = a[a != np.uint32(0xFFFFFFFF)]
    b = np.asarray(sk_s); b = b[b != np.uint32(0xFFFFFFFF)]
    assert abs(len(a) - int(nv)) == 0
    assert abs(len(a) - len(b)) <= max(4, len(b) // 200)
    common = np.intersect1d(a, b).size
    assert common >= 0.995 * min(len(a), len(b)), (common, len(a), len(b))


@pytest.mark.slow
def test_fused_render_matches():
    """End-to-end image equality (the renderer auto-selects the fused path).

    The two paths feed the (unstable) sort in different pre-sort orders, so
    instances that collide in (tile, quantized depth) may blend in either
    order — the same ambiguity the reference has between atomic submission
    order and GPU scheduling.  The sorted-multiset test above is the exact
    check; here images must agree up to tie-order noise."""
    dc, dcam, dset, bg = _setup(1002, n=1500)
    cfg = RasterConfig(instance_capacity_factor=16.0)
    cfg_slots = dataclasses.replace(cfg, compact=False)
    img_f = np.asarray(jax.jit(
        lambda *a: render_frame_impl(*a, width=W, height=H, config=cfg)
    )(dc, dcam, dset, bg))
    img_s = np.asarray(jax.jit(
        lambda *a: render_frame_impl(*a, width=W, height=H, config=cfg_slots)
    )(dc, dcam, dset, bg))
    assert np.isfinite(img_f).all() and np.isfinite(img_s).all()
    mse = np.mean((img_f - img_s) ** 2)
    psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
    assert psnr > 55, psnr
    assert np.abs(img_f - img_s).max() < 0.05


def test_fused_capacity_drop_counted():
    """Overflow beyond capacity is dropped and reported, like the standalone
    compactor (instances survive up to `capacity`).

    The tile shape is pinned (not the RasterConfig default): the scene/
    capacity pair is chosen so the instance count overflows `cap`, and that
    count scales with tiles-per-splat — a default tile-shape flip must not
    silently defuse the overflow this test exists to exercise."""
    dc, dcam, dset, _ = _setup(1003)
    cfg = RasterConfig(tile_w=32, tile_h=16)
    tx, ty = cfg.tiles_for(W, H)
    _, depth_bits = cfg.key_bits(W, H)
    packed = preprocess(
        dc, dcam, dset, width=W, height=H, config=cfg, emit="packed"
    )
    cap = 512
    keys, pay, nv, nd = emit_compact(
        packed.depth_q, packed.rect, packed.words,
        slots=cfg.tile_slots, tx_tiles=tx, depth_bits=depth_bits, capacity=cap,
    )
    from websplat_tpu.ops.emit_compact_pallas import ALIGN

    n_pad = -(-int(dc.opacity.shape[0]) // SPLATS) * SPLATS
    n_units = (n_pad // SPLATS) * cfg.tile_slots
    limit = cap + n_units * ALIGN  # positional cut budgets align padding
    kept = int(jnp.sum(keys != np.uint32(0xFFFFFFFF)))
    assert cap <= kept <= limit  # at least `capacity` real instances kept
    assert int(nv) > limit  # scene chosen to overflow
    assert int(nd) > 0
    # all keys at/after the cut are sentinels
    assert np.all(np.asarray(keys[limit:]) == np.uint32(0xFFFFFFFF))


def test_fused_empty_scene():
    """All-culled input: no instances, no dropped, all-sentinel keys."""
    dc, dcam, dset, _ = _setup(1004, n=100)
    cfg = RasterConfig()
    tx, ty = cfg.tiles_for(W, H)
    _, depth_bits = cfg.key_bits(W, H)
    zeros = jnp.zeros((SPLATS,), jnp.uint32)
    keys, pay, nv, nd = emit_compact(
        zeros, zeros, (zeros,) * 4,
        slots=cfg.tile_slots, tx_tiles=tx, depth_bits=depth_bits, capacity=4096,
    )
    assert int(nv) == 0 and int(nd) == 0
    assert np.all(np.asarray(keys) == np.uint32(0xFFFFFFFF))
