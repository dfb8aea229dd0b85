"""websplat_tpu — a TPU-native 3D Gaussian Splatting framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
KeKsBoTer/web-splat (Rust + wgpu + WGSL).  The reference renders 3D Gaussian
point clouds (INRIA ``point_cloud.ply`` and c3dgs compressed ``.npz``) at
interactive rates on GPUs; this framework renders the same scenes on TPU with
a fully jit-compiled frame function:

    preprocess (cull + EWA project + SH eval)   -- fused XLA elementwise
    tile binning + depth ordering               -- one stable radix/merge sort
    tile rasterization (front-to-back blending) -- Pallas kernel, (8,128) VPU

Multi-chip scaling uses ``jax.sharding`` meshes: view-parallel batching over
cameras (data parallel) and splat-sharded partial-image compositing.

Architecture intentionally diverges from the reference (bind groups, indirect
dispatch, hardware rasterization, atomic compaction) because those are
GPU-idioms; see SURVEY.md §7 for the mapping.
"""

__version__ = "0.1.0"

from websplat_tpu.config import RasterConfig, SplattingArgs
from websplat_tpu.io.loader import GaussianCloud, load_gaussian_cloud
from websplat_tpu.models.camera import (
    PerspectiveCamera,
    PerspectiveProjection,
    build_proj,
    focal2fov,
    fov2focal,
    world2view,
)
from websplat_tpu.models.scene import Scene, SceneCamera, Split
from websplat_tpu.render.renderer import GaussianRenderer

__all__ = [
    "RasterConfig",
    "SplattingArgs",
    "GaussianCloud",
    "load_gaussian_cloud",
    "PerspectiveCamera",
    "PerspectiveProjection",
    "build_proj",
    "focal2fov",
    "fov2focal",
    "world2view",
    "Scene",
    "SceneCamera",
    "Split",
    "GaussianRenderer",
]
