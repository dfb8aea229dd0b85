"""Format-agnostic Gaussian point-cloud container + loader dispatch.

Equivalent of ``GenericGaussianPointCloud`` (/root/reference/src/io/mod.rs:27-179):
dispatches by magic bytes ("ply" vs PK-zip, io/mod.rs:45-61), computes the
AABB (io/mod.rs:74-77) and scene center/up via the weighted plane fit
(io/mod.rs:79-89, up discarded when bbox radius < 10).
"""

from __future__ import annotations

import dataclasses
import io as _io
import os
from typing import BinaryIO, Optional, Tuple, Union

import numpy as np

from websplat_tpu.io import npz as npz_io
from websplat_tpu.io import ply as ply_io
from websplat_tpu.utils.gmath import plane_from_points


@dataclasses.dataclass
class GaussianCloud:
    """Host-side (NumPy) Gaussian point cloud, f16-packed like the reference wire
    format (/root/reference/src/pointcloud.rs:38-45)."""

    xyz: np.ndarray  # (N, 3) f32
    opacity: np.ndarray  # (N,) f16 (activation already applied)
    cov: np.ndarray  # (N, 6) f16 upper-triangular 3D covariance [xx,xy,xz,yy,yz,zz]
    sh: np.ndarray  # (N, 16, 3) f16 coefficient-major SH (zero-padded)
    sh_deg: int
    num_points: int
    kernel_size: Optional[float] = None
    mip_splatting: Optional[bool] = None
    background_color: Optional[Tuple[float, float, float]] = None
    compressed: bool = False
    # device-residency compressed streams (io/npz.py QuantizedStreams); when
    # set, opacity/cov/sh above are None and dequantization happens per frame
    # on device (reference: preprocess_compressed.wgsl:137-171,216-242)
    quantized: Optional[npz_io.QuantizedStreams] = None

    # derived scene metadata
    aabb: Tuple[np.ndarray, np.ndarray] = None  # (min, max)
    center: np.ndarray = None  # (3,)
    up: Optional[np.ndarray] = None  # (3,) or None

    def __post_init__(self):
        if self.aabb is None:
            mn = self.xyz.min(axis=0) if self.num_points else np.zeros(3, np.float32)
            mx = self.xyz.max(axis=0) if self.num_points else np.zeros(3, np.float32)
            self.aabb = (mn.astype(np.float32), mx.astype(np.float32))
        if self.center is None:
            center, up = plane_from_points(self.xyz)
            # up vector is unreliable for synthetic/small scenes
            # (/root/reference/src/io/mod.rs:87-89)
            if self.bbox_radius() < 10.0:
                up = None
            self.center = center
            self.up = up

    def bbox_radius(self) -> float:
        mn, mx = self.aabb
        return float(np.linalg.norm((mx - mn) / 2.0))

    def bbox_center(self) -> np.ndarray:
        mn, mx = self.aabb
        return (mn + mx) / 2.0


def load_gaussian_cloud(
    source: Union[str, bytes, BinaryIO], keep_compressed: bool = False
) -> GaussianCloud:
    """Load a .ply or .npz Gaussian cloud, dispatching on magic bytes
    (/root/reference/src/io/mod.rs:45-61).  keep_compressed keeps npz int8
    streams + codebooks for on-device residency (ignored for PLY, which is
    uncompressed)."""
    if isinstance(source, (str, os.PathLike)):
        with open(source, "rb") as f:
            data = f.read()
        return load_gaussian_cloud(data, keep_compressed)
    if isinstance(source, (bytes, bytearray)):
        f: BinaryIO = _io.BytesIO(source)
    else:
        f = source
    magic = f.read(4)
    f.seek(0)
    if magic.startswith(ply_io.MAGIC):
        d = ply_io.read_ply(f)
    elif magic.startswith(npz_io.MAGIC):
        d = npz_io.read_npz(f, keep_compressed=keep_compressed)
    else:
        raise ValueError("Unknown file format")
    return GaussianCloud(**d)
