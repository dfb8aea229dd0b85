"""Splat-sharded multi-chip rendering — scaling the Gaussian count.

The reference is strictly single-GPU; its scaling story for splat count is
atomic compaction + indirect draw (SURVEY.md §5.7).  For clouds beyond one
chip's HBM (the 10M+ stretch config in BASELINE.json), this module shards
the *Gaussians* over a 1-D mesh and keeps the math exact:

  1. each device preprocesses its splat shard into (tile|depth)-keyed
     instances and sorts them locally — the packed key is tile-major, so
     the local sorted stream is partitioned by screen region;
  2. the screen's tile rows are split into one contiguous region per
     device; regions are exchanged with ``all_to_all`` over ICI in
     fixed-capacity buffers (overflow instances drop, reported);
  3. each device re-sorts the instances it received for its own region
     (restoring exact global depth order per tile — cross-device ties are
     arbitrary, like the reference's atomic submission order) and
     rasterizes its rows of the image.

Compute and sort scale ~1/D; the all_to_all moves each instance over ICI
once.  Output images come back sharded over rows.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from websplat_tpu.config import RasterConfig
from websplat_tpu.ops.preprocess import CameraParams, DeviceCloud, DeviceSettings
from websplat_tpu.ops.sort import sort_instances, tile_ranges

SPLAT_AXIS = "splat"
INVALID_KEY = np.uint32(0xFFFFFFFF)


def splat_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (SPLAT_AXIS,))


def shard_cloud(cloud: DeviceCloud, mesh: Mesh) -> DeviceCloud:
    """Pad N to a mesh multiple and shard every array over the splat axis."""
    # the fused frontend's interleaved fat stream (built for the UNsharded
    # splat count) does not split along the splat axis; each shard's frontend
    # falls back to the 34-row column streams
    if cloud.fat is not None:
        cloud = cloud._replace(fat=None)
    d = mesh.shape[SPLAT_AXIS]
    n = cloud.opacity.shape[0]
    n_pad = -(-n // d) * d
    if n_pad != n:
        pad = n_pad - n

        # splat axis is LAST in the column-major device layout (first for
        # the rank-1 opacity); padded splats get opacity 0 -> zero
        # contribution everywhere
        def padded(x):
            w = [(0, 0)] * (x.ndim - 1) + [(0, pad)]
            return jnp.pad(x, w)

        cloud = DeviceCloud(
            xyz=padded(cloud.xyz),
            cov=padded(cloud.cov),
            opacity=padded(cloud.opacity),
            sh=padded(cloud.sh),
        )

    def shard(x):
        spec = P(*([None] * (x.ndim - 1) + [SPLAT_AXIS]))
        return jax.device_put(x, jax.sharding.NamedSharding(mesh, spec))

    return DeviceCloud(*(None if x is None else shard(x) for x in cloud))


def make_splat_sharded_renderer(
    mesh: Mesh,
    *,
    width: int,
    height: int,
    config: RasterConfig,
    region_capacity: int,
    compressed: bool = False,
):
    """Build a jitted splat-sharded render step.

    ``region_capacity`` is the per-(sender, region) instance buffer size —
    the all_to_all moves (D, region_capacity) instances per device.  Returns
    ``fn(cloud_sharded, camera, settings, background) -> (image, stats)``
    with image rows sharded over the mesh.

    Sizing ``region_capacity``: each sender cuts its LOCAL sorted stream
    (~total_instances/D) into D region buffers, so the mean fill is
    ~total_instances/D²; the worst case is one sender's entire stream
    landing in one region (total_instances/D).  Recipe: render one diag
    frame (``render_frame(..., return_diag=True)["num_instances"]``) and set
    ``region_capacity = skew * n_inst / D`` — ``skew = 1.15`` is safe for
    near-uniform splat shards (each shard sees the whole screen, so its
    per-region split mirrors the global tile distribution; measured on the
    bonsai bench the busiest tile ROW band holds well under 2x the mean),
    ``skew = D`` (i.e. n_inst per buffer) is the no-drop worst case.
    Overfill DROPS instances and is reported per frame in
    ``stats["num_dropped_exchange"]`` — treat any nonzero as a resize
    signal.  HBM cost is D * region_capacity * 24 B per device.
    ``scripts/bench_sharded.py`` applies this recipe at D=1.
    """
    d = mesh.shape[SPLAT_AXIS]
    tx_tiles, ty_tiles = config.tiles_for(width, height)
    if ty_tiles % d != 0:
        raise ValueError(
            f"tile rows ({ty_tiles}) must divide by mesh size ({d}); "
            f"pick tile_h so that ceil({height}/tile_h) % {d} == 0"
        )
    rows_per_dev = ty_tiles // d
    tiles_per_region = rows_per_dev * tx_tiles
    _, depth_bits = config.key_bits(width, height)
    cap = -(-region_capacity // 128) * 128

    def shard_fn(cloud, camera, settings, background):
        my = lax.axis_index(SPLAT_AXIS)

        # 1. local preprocess + emission + compaction + overflow splice +
        #    sort (tile-major keys) — the SAME stream builder as the
        #    single-chip frame (renderer.build_instance_stream), so the
        #    sharded path inherits the fused frontend's in-place overflow
        #    splice and the exact-cursor sort ladder
        from websplat_tpu.render.renderer import (
            build_instance_stream,
            use_pallas_ops,
        )

        # d == 1: interpret-mode Pallas has no mesh barrier, so the REAL
        # fused-frontend + Pallas-raster branch runs under shard_map off-TPU
        # (renderer.use_pallas_ops)
        pallas_ok = use_pallas_ops(multi_device=d > 1)
        keys, payload, n_valid, stats = build_instance_stream(
            cloud, camera, settings, width=width, height=height,
            config=config, compressed=compressed, pallas_ok=pallas_ok,
        )
        sk, sp = sort_instances(
            keys, payload, backend=config.sort_backend, n_valid=n_valid
        )

        # 2. cut the sorted stream into D region buffers (fixed capacity)
        region_starts = jnp.searchsorted(
            sk,
            (jnp.arange(d + 1, dtype=jnp.uint32) * np.uint32(tiles_per_region))
            << np.uint32(depth_bits),
            side="left",
        ).astype(jnp.int32)
        m_loc = sk.shape[0]
        nw = 1 + len(sp)  # key + payload words per instance
        stream = jnp.stack((sk,) + tuple(sp), axis=0)  # (nw, M)
        stream = jnp.pad(stream, ((0, 0), (0, cap)))

        # dead slots: INVALID key but ZERO payload — 0xFFFF payload halves
        # decode to f16 NaN, and NaN * 0 weight would poison the blend
        dead = jnp.concatenate(
            [
                jnp.full((1, cap), INVALID_KEY, jnp.uint32),
                jnp.zeros((nw - 1, cap), jnp.uint32),
            ],
            axis=0,
        )

        def cut(r):
            start = region_starts[r]
            count = region_starts[r + 1] - start
            buf = lax.dynamic_slice(stream, (0, start), (nw, cap))
            live = jnp.arange(cap)[None, :] < count
            return jnp.where(live, buf, dead)

        outgoing = jax.vmap(cut)(jnp.arange(d))  # (D, nw, cap)
        dropped = jnp.maximum(
            jnp.diff(region_starts) - cap, 0
        ).sum()

        # 3. exchange regions over ICI
        incoming = lax.all_to_all(outgoing, SPLAT_AXIS, 0, 0, tiled=False)
        # incoming: (D, nw, cap) — D senders' instances for MY region

        merged = jnp.concatenate(
            [incoming[s] for s in range(d)], axis=1
        )  # (nw, D*cap)
        mk, mp = merged[0], tuple(merged[i] for i in range(1, nw))

        # 4. restore global depth order for my region
        mk, mp = sort_instances(mk, mp, backend=config.sort_backend)
        # rebase tile ids so the rasterizer's grid covers only my region
        tile_base = (my * tiles_per_region).astype(jnp.uint32) << np.uint32(depth_bits)
        mk = jnp.where(mk == INVALID_KEY, mk, mk - tile_base)
        # rebase the packed splat centers into region-local pixel coords:
        # the records were encoded against the full viewport's CenterQuant,
        # but the region rasterizer decodes with the region viewport's
        region_h = rows_per_dev * config.tile_h
        from websplat_tpu.ops import packing as _packing

        full_cq = _packing.CenterQuant.for_viewport(width, height)
        region_cq = _packing.CenterQuant.for_viewport(width, region_h)
        px_c, py_c = _packing.unpack_center(mp[0], full_cq)
        py_c = py_c - (my * region_h).astype(jnp.float32)
        mp = (_packing.pack_center(px_c, py_c, region_cq),) + mp[1:]
        # pad to the rasterizer's chunk granularity
        chunk = 1024
        pad = (-mk.shape[0]) % chunk + chunk
        mk = jnp.concatenate([mk, jnp.full((pad,), INVALID_KEY, jnp.uint32)])
        mp = tuple(jnp.concatenate([w, jnp.zeros((pad,), jnp.uint32)]) for w in mp)

        ranges = tile_ranges(mk, tiles_per_region, depth_bits)

        # 5. rasterize my tile rows
        if config.raster_backend == "pallas" and pallas_ok:
            from websplat_tpu.ops.rasterize_pallas import rasterize_pallas

            img = rasterize_pallas(
                mp, ranges, background,
                width=width, height=region_h, config=config,
            )
        else:
            from websplat_tpu.ops.rasterize_xla import rasterize_xla

            img = rasterize_xla(
                mp, ranges, background,
                width=width, height=region_h, config=config,
            )
        total_visible = lax.psum(stats["num_visible"], SPLAT_AXIS)
        total_clamped = lax.psum(stats["num_clamped"], SPLAT_AXIS)
        total_fe_dropped = lax.psum(stats["num_dropped"], SPLAT_AXIS)
        total_dropped = lax.psum(dropped, SPLAT_AXIS)
        return img, total_visible, total_clamped, total_fe_dropped, total_dropped

    # splat axis is LAST for the column-major 2-D cloud leaves
    cloud_spec = DeviceCloud(
        xyz=P(None, SPLAT_AXIS),
        cov=P(None, SPLAT_AXIS),
        opacity=P(SPLAT_AXIS),
        sh=P(None, SPLAT_AXIS),
    )

    def step(cloud, camera, settings, background):
        img, vis, clamp, fe_drop, drop = jax.shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(cloud_spec, P(), P(), P()),
            out_specs=(P(SPLAT_AXIS), P(), P(), P(), P()),
            check_vma=False,
        )(cloud, camera, settings, background)
        # rows come back stacked; crop the bottom tile padding
        return img[:height], dict(
            num_visible=vis, num_clamped=clamp, num_dropped=fe_drop,
            num_dropped_exchange=drop,
        )

    return jax.jit(step)
