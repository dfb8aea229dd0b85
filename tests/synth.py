"""Synthetic Gaussian scenes + cameras for testing (no real datasets in CI)."""

from __future__ import annotations

import numpy as np

from websplat_tpu.io.loader import GaussianCloud
from websplat_tpu.models.camera import PerspectiveCamera, PerspectiveProjection
from websplat_tpu.utils.gmath import build_cov, mat_to_quat, sigmoid


def random_quats(rng, n):
    q = rng.normal(size=(n, 4)).astype(np.float32)
    return q / np.linalg.norm(q, axis=1, keepdims=True)


def trained_opacity_logits(rng, n):
    """Opacity logits matching trained-3DGS statistics: a BIMODAL logit-
    normal mixture — a dominant high-opacity 'surface' mode plus a low-
    opacity 'dust' mode (floaters, soft edges, densification residue).

    Trained INRIA scenes are strongly bimodal in opacity: training prunes
    below 0.005 but each densification round reintroduces low-alpha splats,
    and published histograms (3DGS follow-ups on pruning, e.g. LightGaussian
    / Compact-3DGS, which prune 40-60% of splats by opacity x scale
    importance with little quality loss) show a heavy low-opacity mass next
    to a near-opaque peak.  This mixture gives ~20% of splats opacity < 0.1,
    ~12% < 0.05, ~2% < 0.01, ~0.3% < 1/255 — conservative relative to those
    histograms.
    The earlier sigmoid(uniform(-1, 3)) draw had NO opacity below 0.26,
    which hid the value of alpha-aware culling entirely (it also made the
    early-exit saturate unrealistically fast)."""
    low = rng.normal(-2.2, 1.4, size=n)
    high = rng.normal(2.2, 1.6, size=n)
    pick = rng.random(n) < 0.4
    return np.where(pick, low, high).astype(np.float32)


def make_cloud(
    rng,
    n=500,
    sh_deg=3,
    extent=1.0,
    scale_range=(-4.5, -2.5),
    scale_lognormal=None,
    opacity_logit_range=(-1.0, 3.0),
    opacity_logits=None,
    kernel_size=None,
    mip_splatting=None,
    background_color=None,
) -> GaussianCloud:
    """Random cloud in a ball of `extent`, log-scales chosen so splats stay
    small on screen (a few pixels), like a trained 3DGS scene's bulk.

    ``scale_lognormal=(mu, sigma)`` draws ln(scale) ~ N(mu, sigma) instead of
    the uniform ``scale_range`` — the realistic choice for benchmark scenes
    (trained 3DGS scales are heavy-tailed log-normal-ish: most splats project
    to a few pixels, a thin tail spans many tiles).  ``opacity_logits`` (an
    (n,) array) overrides the uniform ``opacity_logit_range`` draw — pass
    :func:`trained_opacity_logits` output for realistic benchmark scenes."""
    xyz = rng.normal(size=(n, 3)).astype(np.float32) * extent * 0.4
    if scale_lognormal is not None:
        mu, sigma = scale_lognormal
        log_s = rng.normal(mu, sigma, size=(n, 3)).astype(np.float32)
    else:
        log_s = rng.uniform(*scale_range, size=(n, 3)).astype(np.float32)
    scale = np.exp(log_s) * extent
    rot = random_quats(rng, n)
    cov = build_cov(rot, scale)
    # the uniform draw always happens so the downstream rng stream (SH
    # colors) stays bit-identical whether or not logits are overridden
    uniform_logits = rng.uniform(*opacity_logit_range, size=(n,)).astype(np.float32)
    if opacity_logits is not None:
        opacity = sigmoid(np.asarray(opacity_logits, np.float32))
    else:
        opacity = sigmoid(uniform_logits)
    sh = np.zeros((n, 16, 3), np.float32)
    sh[:, 0, :] = rng.uniform(-0.5, 2.0, size=(n, 3))
    if sh_deg > 0:
        ncoef = (sh_deg + 1) ** 2
        sh[:, 1:ncoef, :] = rng.normal(size=(n, ncoef - 1, 3)) * 0.1
    return GaussianCloud(
        xyz=xyz,
        opacity=opacity.astype(np.float16),
        cov=cov.astype(np.float16),
        sh=sh.astype(np.float16),
        sh_deg=sh_deg,
        num_points=n,
        kernel_size=kernel_size,
        mip_splatting=mip_splatting,
        background_color=background_color,
    )


def make_camera(
    distance=2.5,
    target=(0.0, 0.0, 0.0),
    azimuth=0.3,
    elevation=0.2,
    fov=0.9,
    viewport=(128, 96),
    znear=0.01,
    zfar=100.0,
) -> PerspectiveCamera:
    """Orbit camera looking at `target` (camera-from-world rotation built from
    an orthonormal look-at basis)."""
    target = np.asarray(target, np.float32)
    pos = target + distance * np.array(
        [
            np.cos(elevation) * np.sin(azimuth),
            np.sin(elevation),
            -np.cos(elevation) * np.cos(azimuth),
        ],
        dtype=np.float32,
    )
    fwd = target - pos
    fwd = fwd / np.linalg.norm(fwd)
    world_up = np.array([0.0, 1.0, 0.0], np.float32)
    # right-handed camera-from-world basis with +z looking into the scene
    # (3DGS convention): right = up x fwd, up = fwd x right — identity at
    # fwd=+z.  (right = fwd x up builds a det=-1 REFLECTION, which
    # mat_to_quat cannot represent; that bug made every synthetic camera
    # look along ~world +z regardless of azimuth.)
    right = np.cross(world_up, fwd)
    right /= np.linalg.norm(right)
    up = np.cross(fwd, right)
    r = np.stack([right, up, fwd], axis=0)
    q = mat_to_quat(r)
    w, h = viewport
    fovx = fov
    fovy = 2.0 * np.arctan(np.tan(fov / 2.0) * h / w)
    return PerspectiveCamera(
        position=pos.astype(np.float32),
        rotation=q,
        projection=PerspectiveProjection.new((w, h), (fovx, fovy), znear, zfar),
    )


def make_bench_cloud(rng, n=1_244_819, extent=2.0, opacity="trained") -> GaussianCloud:
    """The benchmark cloud: bonsai's point count with trained-scene-like
    footprint statistics.

    ln(scale) ~ N(-6.48, 1.1) is calibrated so the MEDIAN projected splat
    radius at the benchmark camera (distance 3.0, fovx 0.9, 1200 px wide:
    radius_px ~= CUTOFF * focal/z * scale ~= 975 * scale) is ~3 px, matching
    trained 3DGS scenes where most splats cover a few pixels and a thin
    log-normal tail spans many tiles.  (A uniform-log draw used earlier gave
    a 13 px median - ~5x fatter than real scenes, i.e. an unrealistically
    rasterization-heavy workload.)

    ``opacity="trained"`` (default since round 4) draws the bimodal
    trained-scene opacity mixture (:func:`trained_opacity_logits`);
    ``opacity="legacy"`` keeps the round-1..3 sigmoid(uniform(-1, 3)) draw —
    no low-opacity tail at all — for round-over-round comparability
    (bench.py reports both)."""
    logits = None
    if opacity == "trained":
        # drawn from a dedicated child generator so the geometry draw stays
        # bit-identical between the two opacity models
        logits = trained_opacity_logits(np.random.default_rng(7), n)
    elif opacity != "legacy":
        raise ValueError(f"unknown opacity model: {opacity!r}")
    return make_cloud(
        rng, n=n, extent=extent, scale_lognormal=(-6.48, 1.1),
        opacity_logits=logits,
    )
