"""View-parallel (multi-camera) rendering: single chip and multi-chip.

The reference is strictly single-GPU (SURVEY.md §2.9 — no DP/TP/PP/NCCL/MPI
anywhere); its throughput benchmark renders train views one frame at a time
(/root/reference/src/bin/measure.rs:98-146).  The TPU-native scaling axis is
**data parallelism over camera views**: the point cloud is replicated per
chip (bonsai ≈ 0.3 GB decoded, far under per-chip HBM) and a batch of
cameras is sharded over a 1-D device mesh via ``shard_map``; each device
renders its views sequentially with ``lax.map`` (sequential, not vmapped, so
the large per-frame instance buffers are not materialized V times).

Collectives: the per-frame visible-splat counts are ``psum``-reduced over
the mesh as a cross-chip render statistic; image tiles never leave their
device (view DP is embarrassingly parallel — ICI is only exercised by the
stats reduction and by the splat-sharded path in
websplat_tpu/parallel/sharded.py).
"""

from __future__ import annotations

import functools
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from websplat_tpu.config import RasterConfig
from websplat_tpu.models.camera import CameraUniforms
from websplat_tpu.ops.preprocess import CameraParams, DeviceCloud
from websplat_tpu.render.renderer import render_frame_impl

VIEW_AXIS = "view"


def view_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    """1-D mesh over the view axis."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (VIEW_AXIS,))


def stack_cameras(uniforms: List[CameraUniforms]) -> CameraParams:
    """List of host camera blocks -> batched CameraParams pytree (V, ...)."""
    return CameraParams(
        view=jnp.asarray(np.stack([u.view for u in uniforms]), jnp.float32),
        view_inv=jnp.asarray(np.stack([u.view_inv for u in uniforms]), jnp.float32),
        proj=jnp.asarray(np.stack([u.proj for u in uniforms]), jnp.float32),
        viewport=jnp.asarray(np.stack([u.viewport for u in uniforms]), jnp.float32),
        focal=jnp.asarray(np.stack([u.focal for u in uniforms]), jnp.float32),
    )


def render_views(
    cloud: DeviceCloud,
    cameras: CameraParams,
    settings,
    background: jnp.ndarray,
    *,
    width: int,
    height: int,
    config: RasterConfig,
    compressed: bool = False,
):
    """Sequentially render a batch of V views on one device -> (V, H, W, 3).

    The reference measure binary's inner loop (measure.rs:98-146), fused into
    one XLA program: no host round-trips between frames.
    """

    def one(cam):
        return render_frame_impl(
            cloud, cam, settings, background,
            width=width, height=height, config=config, compressed=compressed,
        )

    return jax.lax.map(one, cameras)


def make_view_parallel_renderer(
    mesh: Mesh,
    *,
    width: int,
    height: int,
    config: RasterConfig,
    compressed: bool = False,
):
    """Build a jitted multi-chip view-parallel render step.

    Returns ``fn(cloud, cameras, settings, background) -> (images, stats)``
    where ``cameras`` is a batched CameraParams whose leading dim V must be a
    multiple of the mesh size; images come back sharded over the view axis.
    """

    # multi_device gates interpret-mode Pallas OFF only when the mesh really
    # has >1 device (the interpreter's threading.Barrier deadlock, see
    # renderer.use_pallas_ops); a 1-device mesh runs the production Pallas
    # kernels even off-TPU, so tests can execute the real fused branch under
    # shard_map
    multi = mesh.shape[VIEW_AXIS] > 1

    def step(cloud, cameras, settings, background):
        def shard_fn(cloud, cams, settings, background):
            def one(cam):
                img, diag = render_frame_impl(
                    cloud, cam, settings, background,
                    width=width, height=height, config=config,
                    compressed=compressed, return_diag=True,
                    multi_device=multi,
                )
                return img, diag["num_visible"]

            imgs, nvis = jax.lax.map(one, cams)
            # cross-chip render statistic over ICI (psum over the view axis)
            total_visible = jax.lax.psum(jnp.sum(nvis), VIEW_AXIS)
            return imgs, total_visible

        # check_vma=False: the per-device body may call pallas_call, whose
        # out_shape carries no varying-mesh-axes annotation and trips the
        # static vma check; the specs above fully describe the sharding.
        return jax.shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(P(), P(VIEW_AXIS), P(), P()),
            out_specs=(P(VIEW_AXIS), P()),
            check_vma=False,
        )(cloud, cameras, settings, background)

    return jax.jit(step)
