import numpy as np
import pytest

from websplat_tpu.io.loader import load_gaussian_cloud
from websplat_tpu.io.npz import dumps_npz
from websplat_tpu.io.ply import dumps_ply
from websplat_tpu.utils.gmath import build_cov, sigmoid
from tests.synth import random_quats


def make_raw(rng, n=64, sh_deg=2):
    ncoef = (sh_deg + 1) ** 2
    xyz = rng.normal(size=(n, 3)).astype(np.float32) * 20  # radius > 10 for `up`
    sh = np.zeros((n, ncoef, 3), np.float32)
    sh[:] = rng.normal(size=(n, ncoef, 3)) * 0.3
    opacity_raw = rng.normal(size=(n,)).astype(np.float32)
    scale_raw = rng.uniform(-5, -2, size=(n, 3)).astype(np.float32)
    rot = random_quats(rng, n) * 2.0  # unnormalized on purpose
    return xyz, sh, opacity_raw, scale_raw, rot


def test_ply_roundtrip(rng):
    xyz, sh, opacity_raw, scale_raw, rot = make_raw(rng)
    blob = dumps_ply(xyz, sh, opacity_raw, scale_raw, rot)
    cloud = load_gaussian_cloud(blob)

    assert cloud.num_points == len(xyz)
    assert cloud.sh_deg == 2
    assert not cloud.compressed
    np.testing.assert_allclose(cloud.xyz, xyz, atol=1e-6)
    # activations applied (ply.rs:77-88), then f16 packed (ply.rs:92-99)
    np.testing.assert_allclose(
        cloud.opacity.astype(np.float32), sigmoid(opacity_raw), atol=2e-3
    )
    rot_n = rot / np.linalg.norm(rot, axis=1, keepdims=True)
    cov_expect = build_cov(rot_n, np.exp(scale_raw))
    np.testing.assert_allclose(cloud.cov.astype(np.float32), cov_expect, atol=2e-3, rtol=2e-3)
    # SH channel-first transpose roundtrip (ply.rs:63-75)
    np.testing.assert_allclose(cloud.sh[:, :9].astype(np.float32), sh, atol=1e-3)
    np.testing.assert_array_equal(cloud.sh[:, 9:], 0)
    # metadata defaults
    assert cloud.kernel_size is None and cloud.mip_splatting is None
    # plane fit ran; bbox radius > 10 so up is retained (io/mod.rs:87-89)
    assert cloud.up is not None


def test_ply_comment_metadata(rng):
    xyz, sh, opacity_raw, scale_raw, rot = make_raw(rng, n=8)
    blob = dumps_ply(
        xyz, sh, opacity_raw, scale_raw, rot,
        comments=["mip=true", "kernel_size=0.1", "background_color=1.0,0.5,0.25"],
    )
    cloud = load_gaussian_cloud(blob)
    assert cloud.mip_splatting is True
    assert cloud.kernel_size == pytest.approx(0.1)
    assert cloud.background_color == (1.0, 0.5, 0.25)


def test_ply_big_endian(rng):
    xyz, sh, opacity_raw, scale_raw, rot = make_raw(rng, n=8, sh_deg=0)
    blob = dumps_ply(xyz, sh, opacity_raw, scale_raw, rot)
    # byte-swap the payload to build a big-endian file
    le = load_gaussian_cloud(blob)
    header_end = blob.index(b"end_header") + len(b"end_header\n")
    header = blob[:header_end].replace(b"binary_little_endian", b"binary_big_endian")
    body = np.frombuffer(blob[header_end:], dtype="<f4").astype(">f4").tobytes()
    be = load_gaussian_cloud(header + body)
    np.testing.assert_allclose(be.xyz, le.xyz)
    np.testing.assert_allclose(be.cov, le.cov)


def test_ascii_ply_matches_binary(rng):
    """ASCII PLY loads bit-equal to the binary layout (a superset of the
    reference, which todo!()s ASCII at io/ply.rs:169): convert a binary blob
    to whitespace rows in header property order and compare clouds."""
    xyz, sh, opacity_raw, scale_raw, rot = make_raw(rng, n=23)
    blob = dumps_ply(xyz, sh, opacity_raw, scale_raw, rot)
    header_end = blob.index(b"end_header\n") + len(b"end_header\n")
    header = blob[:header_end].decode()
    n_props = header.count("property float")
    body = np.frombuffer(blob[header_end:], dtype="<f4").reshape(-1, n_props)
    ascii_blob = (
        header.replace("binary_little_endian", "ascii").encode()
        + "\n".join(" ".join(f"{v:.9g}" for v in row) for row in body).encode()
        + b"\n"
    )
    bi = load_gaussian_cloud(blob)
    asc = load_gaussian_cloud(ascii_blob)
    np.testing.assert_allclose(asc.xyz, bi.xyz, rtol=1e-6)
    np.testing.assert_allclose(asc.cov, bi.cov, rtol=1e-3, atol=1e-6)
    np.testing.assert_allclose(asc.opacity, bi.opacity, rtol=1e-3)
    np.testing.assert_allclose(asc.sh, bi.sh, rtol=1e-3, atol=1e-6)


def test_unknown_format_rejected():
    with pytest.raises(ValueError, match="Unknown file format"):
        load_gaussian_cloud(b"\x00\x01\x02\x03garbage")


def test_npz_roundtrip(rng):
    n = 128
    xyz = rng.normal(size=(n, 3)).astype(np.float32)
    scaling_log = rng.uniform(-5, -2, size=(n, 3)).astype(np.float32)
    rot = random_quats(rng, n)
    opacity = rng.uniform(0.05, 1.0, size=(n,)).astype(np.float32)
    sh = rng.normal(size=(n, 16, 3)).astype(np.float32) * 0.4
    blob = dumps_npz(xyz, scaling_log, rot, opacity, sh, sh_deg=3,
                     kernel_size=0.3, mip_splatting=True)
    cloud = load_gaussian_cloud(blob)
    assert cloud.compressed
    assert cloud.sh_deg == 3
    assert cloud.kernel_size == pytest.approx(0.3)
    assert cloud.mip_splatting is True
    # xyz goes through f16 (npz.rs:96-100)
    np.testing.assert_allclose(cloud.xyz, xyz.astype(np.float16), atol=1e-3)
    # int8 quantization: coarse tolerance
    np.testing.assert_allclose(cloud.opacity.astype(np.float32), opacity, atol=0.02)
    np.testing.assert_allclose(cloud.sh.astype(np.float32), sh, atol=0.05)
    cov_expect = build_cov(rot, np.exp(scaling_log))
    np.testing.assert_allclose(
        cloud.cov.astype(np.float32), cov_expect, atol=5e-3, rtol=0.3
    )


def test_npz_codebooks(rng):
    """feature_indices / gaussian_indices indirection (npz.rs:134-154)."""
    import io as _io

    n, k = 50, 7
    xyz = rng.normal(size=(n, 3)).astype(np.float16)
    table_scaling = rng.uniform(-4, -2, size=(k, 3)).astype(np.float32)
    table_rot = random_quats(rng, k)
    gi = rng.integers(0, k, size=n).astype(np.int32)
    fi = rng.integers(0, k, size=n).astype(np.int32)
    dc = rng.normal(size=(k, 1, 3)).astype(np.float32)

    def q(x):
        scale = max(float(np.abs(x).max()), 1e-6) / 127.0
        return np.clip(np.round(x / scale), -127, 127).astype(np.int8), np.float32(scale)

    s_q, s_scale = q(table_scaling)
    r_q, r_scale = q(table_rot)
    o_q, o_scale = q(rng.uniform(0.1, 1, size=(n,)).astype(np.float32))
    dc_q, dc_scale = q(dc)

    buf = _io.BytesIO()
    np.savez(
        buf,
        xyz=xyz,
        scaling=s_q, scaling_scale=s_scale, scaling_zero_point=np.int32(0),
        rotation=r_q, rotation_scale=r_scale, rotation_zero_point=np.int32(0),
        opacity=o_q, opacity_scale=o_scale, opacity_zero_point=np.int32(0),
        features_dc=dc_q, features_dc_scale=dc_scale, features_dc_zero_point=np.int32(0),
        gaussian_indices=gi, feature_indices=fi,
    )
    cloud = load_gaussian_cloud(buf.getvalue())
    assert cloud.num_points == n
    assert cloud.sh_deg == 0
    # per-point cov comes from the geometry codebook entry
    cov_table = build_cov(
        (r_q.astype(np.float32) * r_scale)
        / np.linalg.norm(r_q.astype(np.float32) * r_scale, axis=1, keepdims=True),
        np.exp(s_q.astype(np.float32) * s_scale),
    ).astype(np.float16)
    np.testing.assert_allclose(
        cloud.cov.astype(np.float32), cov_table[gi].astype(np.float32), rtol=2e-3, atol=1e-5
    )
    # per-point sh from the feature codebook entry
    sh_expect = (dc_q.astype(np.float32) * dc_scale)[fi]
    np.testing.assert_allclose(cloud.sh[:, :1].astype(np.float32), sh_expect, atol=2e-3)


def test_compressed_residency_matches_decoded(rng):
    """keep_compressed=True keeps int8 streams + codebooks on device and
    dequantizes per frame; the expanded view must match the decode-at-load
    path up to its extra f16 rounding, and the rendered frames must agree.
    Reference: preprocess_compressed.wgsl:137-171,216-242."""
    import jax.numpy as jnp

    from websplat_tpu.config import RasterConfig, SplattingArgs, resolve_settings
    from websplat_tpu.models.camera import CameraUniforms
    from websplat_tpu.render.renderer import (
        camera_to_device,
        decompress_cloud,
        render_frame,
        settings_to_device,
        upload_cloud,
        upload_compressed_cloud,
    )
    from tests.synth import make_camera

    n, k = 600, 17
    xyz = rng.normal(size=(n, 3)).astype(np.float32) * 0.5
    table_scaling = rng.uniform(-4, -2, size=(k, 3)).astype(np.float32)
    table_rot = random_quats(rng, k)
    table_sh = rng.normal(size=(k, 16, 3)).astype(np.float32) * 0.4
    gi = rng.integers(0, k, size=n).astype(np.int32)
    fi = rng.integers(0, k, size=n).astype(np.int32)
    opacity = rng.uniform(0.05, 1.0, size=(n,)).astype(np.float32)
    sf_log = rng.uniform(-0.5, 0.5, size=(n,)).astype(np.float32)

    blob = dumps_npz(
        xyz, table_scaling, table_rot, opacity, table_sh, sh_deg=3,
        gaussian_indices=gi, feature_indices=fi, scaling_factor_log=sf_log,
    )
    decoded = load_gaussian_cloud(blob)
    resident = load_gaussian_cloud(blob, keep_compressed=True)
    assert resident.quantized is not None
    assert decoded.quantized is None
    assert resident.num_points == decoded.num_points

    dc_dec = upload_cloud(decoded)
    dc_res = decompress_cloud(upload_compressed_cloud(resident))
    # decoded path rounds cov/opacity through f16 once more than the
    # resident path (which matches the reference's f32 frame-time math)
    np.testing.assert_allclose(
        np.asarray(dc_res.opacity), np.asarray(dc_dec.opacity), atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(dc_res.cov), np.asarray(dc_dec.cov), rtol=2e-3, atol=1e-4
    )
    assert np.array_equal(np.asarray(dc_res.sh), np.asarray(dc_dec.sh))

    # end-to-end frames agree
    w, h = 96, 64
    cam = make_camera(viewport=(w, h))
    cam.fit_near_far(*decoded.aabb)
    uni = camera_to_device(CameraUniforms.from_camera(cam, (w, h)))
    cfg = RasterConfig.for_backend()
    args = SplattingArgs()
    imgs = []
    for cloud_obj, dev in ((decoded, dc_dec), (resident, upload_compressed_cloud(resident))):
        settings = settings_to_device(resolve_settings(args, cloud_obj))
        imgs.append(
            np.asarray(
                render_frame(
                    dev, uni, settings, jnp.zeros(3, jnp.float32),
                    width=w, height=h, config=cfg, compressed=True,
                )
            )
        )
    from websplat_tpu.utils.image import psnr

    p = psnr(imgs[0], imgs[1])
    assert p > 45.0, f"decoded vs resident PSNR {p:.1f} dB"


def test_compressed_cull_before_gather_matches(rng):
    """compressed_cull_factor routes the compressed path through
    decompress_cloud_culled (frustum cull on resident xyz -> Pallas compact
    -> codebook gathers at the culled capacity).  The culled render must
    match the full-N render: the pre-cull is exactly the preprocess center
    test (a superset of the frontend's final visible), compaction preserves
    splat order, and NaN-padded sentinel lanes are culled by construction.
    Differences are only sort-tie reordering (same tile, same quantized
    depth), so the images agree to high PSNR and the diagnostics exactly.
    Reference: preprocess_compressed.wgsl:229-242 (cull before dequant)."""
    import dataclasses

    import jax.numpy as jnp

    from websplat_tpu.config import RasterConfig, SplattingArgs, resolve_settings
    from websplat_tpu.models.camera import CameraUniforms
    from websplat_tpu.render.renderer import (
        camera_to_device,
        render_frame,
        settings_to_device,
        upload_compressed_cloud,
    )
    from tests.synth import make_camera

    n, k = 700, 13
    xyz = rng.normal(size=(n, 3)).astype(np.float32) * 0.6
    table_scaling = rng.uniform(-4, -2, size=(k, 3)).astype(np.float32)
    table_rot = random_quats(rng, k)
    table_sh = rng.normal(size=(k, 16, 3)).astype(np.float32) * 0.4
    gi = rng.integers(0, k, size=n).astype(np.int32)
    fi = rng.integers(0, k, size=n).astype(np.int32)
    opacity = rng.uniform(0.05, 1.0, size=(n,)).astype(np.float32)
    sf_log = rng.uniform(-0.5, 0.5, size=(n,)).astype(np.float32)
    blob = dumps_npz(
        xyz, table_scaling, table_rot, opacity, table_sh, sh_deg=3,
        gaussian_indices=gi, feature_indices=fi, scaling_factor_log=sf_log,
    )
    resident = load_gaussian_cloud(blob, keep_compressed=True)
    dev = upload_compressed_cloud(resident)

    w, h = 96, 64
    cam = make_camera(viewport=(w, h))
    cam.fit_near_far(*resident.aabb)
    uni = camera_to_device(CameraUniforms.from_camera(cam, (w, h)))
    settings = settings_to_device(resolve_settings(SplattingArgs(), resident))
    cfg0 = RasterConfig.for_backend()
    cfg1 = dataclasses.replace(cfg0, compressed_cull_factor=1.0)
    outs = []
    for cfg in (cfg0, cfg1):
        img, diag = render_frame(
            dev, uni, settings, jnp.zeros(3, jnp.float32),
            width=w, height=h, config=cfg, compressed=True, return_diag=True,
        )
        outs.append((np.asarray(img), {k_: int(v) for k_, v in diag.items()}))
    (img0, d0), (img1, d1) = outs
    assert d1["num_culled_dropped"] == 0, d1
    assert d1["num_visible"] == d0["num_visible"], (d0, d1)
    assert d1["num_instances"] == d0["num_instances"], (d0, d1)
    from websplat_tpu.utils.image import psnr

    assert np.isfinite(img1).all()
    p = psnr(img0, img1)
    assert p > 60.0, f"culled vs full compressed path PSNR {p:.1f} dB"
