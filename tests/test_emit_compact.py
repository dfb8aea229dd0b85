"""Fused emission+compaction kernel (ops/emit_compact_pallas.py).

The kernel replaces the reference's atomic stream compaction
(/root/reference/src/shaders/preprocess.wgsl:262-279) together with the slot
emission; equivalence is checked against the materialized slot-stream path,
which the rest of the suite pins to the NumPy oracle.
"""

import dataclasses

import jax
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


def _setup(rng, n=2000):
    cloud = make_cloud(rng, n=n)
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


def test_fused_matches_slot_stream(rng):
    """Same sorted multiset of (key, record) instances as the slot path."""
    dc, dcam, dset, _ = _setup(rng)
    cfg = RasterConfig(instance_capacity_factor=16.0)
    tx, ty = cfg.tiles_for(W, H)
    _, depth_bits = cfg.key_bits(W, H)

    packed = preprocess(
        dc, dcam, dset, width=W, height=H, config=cfg, emit="packed"
    )
    keys_f, pay_f, nv, nd = emit_compact(
        packed.depth_q, packed.rect, packed.words,
        slots=cfg.tile_slots, tx_tiles=tx, depth_bits=depth_bits,
        capacity=int(cfg.instance_capacity_factor * dc.xyz.shape[0]),
    )
    assert int(nd) == 0

    slot = preprocess(dc, dcam, dset, width=W, height=H, config=cfg)
    assert int(packed.num_visible) == int(slot.num_visible)
    assert int(packed.num_clamped) == int(slot.num_clamped)

    sk_f, sp_f = sort_instances(keys_f, pay_f)
    sk_s, sp_s = sort_instances(slot.keys, slot.payload)
    n_valid = int(jnp.sum(sk_s != np.uint32(0xFFFFFFFF)))
    assert int(nv) == n_valid
    np.testing.assert_array_equal(
        np.asarray(sk_f[:n_valid]), np.asarray(sk_s[:n_valid])
    )
    # records of equal-key instances may legitimately permute; compare the
    # multiset via a secondary lexicographic sort of the full rows
    def rows(sk, sp):
        a = np.stack([np.asarray(sk)] + [np.asarray(w) for w in sp], axis=1)
        a = a[:n_valid]
        return a[np.lexsort(a.T[::-1])]

    np.testing.assert_array_equal(rows(sk_f, sp_f), rows(sk_s, sp_s))


def test_fused_render_matches(rng):
    """End-to-end image equality (the renderer auto-selects the fused path)."""
    dc, dcam, dset, bg = _setup(rng, n=1500)
    cfg = RasterConfig(instance_capacity_factor=16.0)
    cfg_slots = dataclasses.replace(cfg, compact=False)
    img_f = jax.jit(
        lambda *a: render_frame_impl(*a, width=W, height=H, config=cfg)
    )(dc, dcam, dset, bg)
    img_s = jax.jit(
        lambda *a: render_frame_impl(*a, width=W, height=H, config=cfg_slots)
    )(dc, dcam, dset, bg)
    np.testing.assert_allclose(np.asarray(img_f), np.asarray(img_s), atol=1e-6)


def test_fused_capacity_drop_counted(rng):
    """Overflow beyond capacity is dropped and reported, like the standalone
    compactor (instances survive up to `capacity`)."""
    dc, dcam, dset, _ = _setup(rng)
    cfg = RasterConfig()
    tx, ty = cfg.tiles_for(W, H)
    _, depth_bits = cfg.key_bits(W, H)
    packed = preprocess(
        dc, dcam, dset, width=W, height=H, config=cfg, emit="packed"
    )
    cap = 4096
    keys, pay, nv, nd = emit_compact(
        packed.depth_q, packed.rect, packed.words,
        slots=cfg.tile_slots, tx_tiles=tx, depth_bits=depth_bits, capacity=cap,
    )
    kept = int(jnp.sum(keys != np.uint32(0xFFFFFFFF)))
    assert kept <= cap
    assert int(nv) > cap  # scene chosen to overflow
    assert int(nd) >= int(nv) - cap
    # all keys at/after capacity are sentinels
    assert np.all(np.asarray(keys[cap:]) == np.uint32(0xFFFFFFFF))


def test_fused_empty_scene(rng):
    """All-culled input: no instances, no dropped, all-sentinel keys."""
    dc, dcam, dset, _ = _setup(rng, n=100)
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
