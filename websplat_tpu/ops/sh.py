"""Spherical-harmonics color evaluation (deg <= 3, Condon-Shortley phase).

Vectorized jnp equivalent of ``evaluate_sh``
(/root/reference/src/shaders/preprocess.wgsl:114-154).  Instead of the
shader's runtime degree branches, every band is evaluated and masked by
``max_sh_deg`` — identical results, branch-free, XLA-fusible.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from jax import lax

SH_C0 = 0.28209479177387814
SH_C1 = 0.4886025119029199
SH_C2 = (
    1.0925484305920792,
    -1.0925484305920792,
    0.31539156525252005,
    -1.0925484305920792,
    0.5462742152960396,
)
SH_C3 = (
    -0.5900435899266435,
    2.890611442640554,
    -0.4570457994644658,
    0.3731763325901154,
    -0.4570457994644658,
    1.445305721320277,
    -0.5900435899266435,
)


def eval_sh(sh: jnp.ndarray, x, y, z, max_sh_deg):
    """Evaluate SH color.

    Args:
      sh: (24, N) uint32 rows, each packing TWO f16 coefficients
        (coefficient 2p in the low half of row p, 2p+1 in the high half;
        flat coefficient index k = 3*coef + channel).  This mirrors the
        reference's 2-per-u32 f16 packing (preprocess.wgsl:114-154 /
        pointcloud.rs f16 SH buffer) in COLUMN-major form: each row is a
        contiguous (N,) read, and the wire format is half the f32 bytes.
      x, y, z: (N,) unit view direction components.
      max_sh_deg: traced int degree in [0, 3].

    Returns 3 (N,) channel arrays including the reference's +0.5 offset
    (preprocess.wgsl:151); clamping to >= 0 happens at the call site
    (preprocess.wgsl:257-258).
    """

    import os

    _ablate = os.environ.get("WS_SH_ABLATE", "")  # profiling only: "nodecode"
    # skips the f16 decode (garbage colors, same dataflow), "flat" skips SH
    # entirely — both bound the SH share of the frontend stage on hardware
    if _ablate:
        import warnings

        warnings.warn(
            f"WS_SH_ABLATE={_ablate!r} is set: SH colors will be garbage "
            "(profiling ablation mode). Unset it outside ablation runs.",
            stacklevel=2,
        )

    def coef(k):
        from websplat_tpu.ops.packing import f16_bits_to_f32

        row = sh[k // 2]
        bits = row if k % 2 == 0 else row >> np.uint32(16)
        if _ablate == "nodecode":
            return lax.bitcast_convert_type(bits, jnp.float32)
        return f16_bits_to_f32(bits)

    if _ablate == "flat":
        half = jnp.full_like(x, 0.5)
        return half, half, half

    xx, yy, zz = x * x, y * y, z * z
    xy, yz, xz = x * y, y * z, x * z

    deg = jnp.asarray(max_sh_deg)
    g1 = jnp.where(deg > 0, 1.0, 0.0)
    g2 = jnp.where(deg > 1, 1.0, 0.0)
    g3 = jnp.where(deg > 2, 1.0, 0.0)

    # per-coefficient angular basis values (shared across channels)
    basis = [
        jnp.full_like(x, SH_C0),
        g1 * (-SH_C1) * y,
        g1 * SH_C1 * z,
        g1 * (-SH_C1) * x,
        g2 * SH_C2[0] * xy,
        g2 * SH_C2[1] * yz,
        g2 * SH_C2[2] * (2.0 * zz - xx - yy),
        g2 * SH_C2[3] * xz,
        g2 * SH_C2[4] * (xx - yy),
        g3 * SH_C3[0] * y * (3.0 * xx - yy),
        g3 * SH_C3[1] * xy * z,
        g3 * SH_C3[2] * y * (4.0 * zz - xx - yy),
        g3 * SH_C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy),
        g3 * SH_C3[4] * x * (4.0 * zz - xx - yy),
        g3 * SH_C3[5] * z * (xx - yy),
        g3 * SH_C3[6] * x * (xx - 3.0 * yy),
    ]
    channels = []
    for ch in range(3):
        acc = basis[0] * coef(ch)
        for c in range(1, 16):
            acc = acc + basis[c] * coef(3 * c + ch)
        channels.append(acc + 0.5)
    return tuple(channels)
