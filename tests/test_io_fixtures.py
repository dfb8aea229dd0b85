"""Independent byte fixtures for the PLY / npz loaders.

Unlike tests/test_io.py (which roundtrips through the repo's own
``dumps_ply``/``dumps_npz`` writers and would miss a shared misunderstanding
of the wire layout), these fixtures are hand-constructed byte blobs with
expected values computed BY HAND from the reference's documented decode math:

- PLY: channel-first SH rest transpose (/root/reference/src/io/ply.rs:63-75),
  sigmoid opacity (:77), exp scales (:79-82), quaternion-normalized
  covariance R S (R S)^T stored as upper-6 f16 (:90-97, utils.rs:194-203),
  comment metadata k=v parsing (:123-161), LE and BE encodings.
- npz: per-tensor zero-point/scale int8 dequantization
  (/root/reference/src/io/npz.rs:61-94), NO sigmoid on opacity (wgsl:236),
  exp on scaling (npz.rs:102-111), the normalize+scaling_factor variant
  (:112-121), and codebook indirection (:134-154).
"""

from __future__ import annotations

import io
import struct

import numpy as np
import pytest

from websplat_tpu.io.loader import load_gaussian_cloud
from websplat_tpu.io.ply import read_ply
from websplat_tpu.io.npz import read_npz


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def _make_ply_bytes(byte_order: str) -> bytes:
    """Hand-built 2-point INRIA-layout PLY, deg-1 SH (4 coefficients).

    Property order: x y z nx ny nz f_dc_0..2 f_rest_0..8 opacity
    scale_0..2 rot_0..3 (26 floats/point).  f_rest is CHANNEL-FIRST:
    f_rest_{j*3 + i} = channel j, rest-coefficient i (ply.rs:63-75).
    """
    fmt_name = "binary_little_endian" if byte_order == "<" else "binary_big_endian"
    fields = ["x", "y", "z", "nx", "ny", "nz"]
    fields += [f"f_dc_{j}" for j in range(3)]
    fields += [f"f_rest_{k}" for k in range(9)]
    fields += ["opacity", "scale_0", "scale_1", "scale_2"]
    fields += [f"rot_{i}" for i in range(4)]
    header = (
        "ply\n"
        f"format {fmt_name} 1.0\n"
        "comment mip=true\n"
        "comment kernel_size=0.45\n"
        "comment background_color=0.25,0.5,0.75\n"
        "element vertex 2\n"
        + "".join(f"property float {f}\n" for f in fields)
        + "end_header\n"
    ).encode("ascii")

    ln2, ln3 = float(np.log(2.0)), float(np.log(3.0))
    # point 0: identity rotation, uniform scale 2 -> cov = diag(4, 4, 4)
    p0 = (
        [1.0, 2.0, 3.0]  # xyz
        + [9.0, 9.0, 9.0]  # normals (skipped by the loader)
        + [0.1, 0.2, 0.3]  # dc
        # channel-first rest: f_rest_{j*3+i} = (j+1) + 0.01*(i+1)
        + [(j + 1) + 0.01 * (i + 1) for j in range(3) for i in range(3)]
        + [0.0]  # opacity logit -> sigmoid(0) = 0.5
        + [ln2, ln2, ln2]  # log scales -> (2, 2, 2)
        + [1.0, 0.0, 0.0, 0.0]  # identity quaternion (w, x, y, z)
    )
    # point 1: quat (2,2,2,2) normalizes to (.5,.5,.5,.5) = 120deg about
    # (1,1,1): maps ex->ey, ey->ez, ez->ex, so R S^2 R^T = diag(s3^2,
    # s1^2, s2^2); scales (1, 2, 3) -> cov diag (9, 1, 4)
    p1 = (
        [-1.0, 0.0, 5.0]
        + [0.0, 0.0, 0.0]
        + [1.0, 1.0, 1.0]
        + [0.25] * 9
        + [2.0]  # sigmoid(2) = 0.88079707...
        + [0.0, ln2, ln3]  # scales (1, 2, 3)
        + [2.0, 2.0, 2.0, 2.0]
    )
    body = struct.pack(f"{byte_order}26f", *p0) + struct.pack(f"{byte_order}26f", *p1)
    return header + body


def _check_ply_decode(d):
    np.testing.assert_allclose(
        d["xyz"], [[1, 2, 3], [-1, 0, 5]], rtol=0, atol=0
    )
    assert d["sh_deg"] == 1 and d["num_points"] == 2
    # opacity = sigmoid(raw), stored f16
    np.testing.assert_allclose(
        np.asarray(d["opacity"], np.float32),
        np.float16([_sigmoid(0.0), _sigmoid(2.0)]).astype(np.float32),
        rtol=0, atol=0,
    )
    # SH: dc at coefficient 0; rest transposed from channel-first
    sh = np.asarray(d["sh"], np.float32)
    np.testing.assert_allclose(
        sh[0, 0], np.float16([0.1, 0.2, 0.3]).astype(np.float32), atol=0
    )
    expect_rest0 = np.zeros((3, 3), np.float32)  # [coef i, channel j]
    for i in range(3):
        for j in range(3):
            expect_rest0[i, j] = (j + 1) + 0.01 * (i + 1)
    np.testing.assert_allclose(
        sh[0, 1:4], np.float16(expect_rest0).astype(np.float32), atol=0
    )
    np.testing.assert_allclose(sh[0, 4:], 0.0, atol=0)
    np.testing.assert_allclose(
        sh[1, 1:4], np.float16(np.full((3, 3), 0.25)).astype(np.float32), atol=0
    )
    # covariances (upper-6 [xx, xy, xz, yy, yz, zz], f16)
    cov = np.asarray(d["cov"], np.float32)
    np.testing.assert_allclose(cov[0], [4, 0, 0, 4, 0, 4], atol=1e-3)
    np.testing.assert_allclose(cov[1], [9, 0, 0, 1, 0, 4], atol=5e-3)
    # comment metadata (ply.rs:123-161)
    assert d["mip_splatting"] is True
    assert d["kernel_size"] == pytest.approx(0.45)
    assert d["background_color"] == pytest.approx((0.25, 0.5, 0.75))


@pytest.mark.parametrize("byte_order", ["<", ">"])
def test_ply_byte_fixture(byte_order):
    d = read_ply(io.BytesIO(_make_ply_bytes(byte_order)))
    _check_ply_decode(d)


def test_ply_byte_fixture_numpy_path(monkeypatch):
    """Force the pure-NumPy decode (bypassing the native C++ decoder) so both
    implementations are pinned to the same hand-derived expectations."""
    import websplat_tpu.io.ply as plymod

    monkeypatch.setattr(
        plymod, "_try_native_decode", lambda *a, **k: None
    )
    d = read_ply(io.BytesIO(_make_ply_bytes("<")))
    _check_ply_decode(d)


def test_ply_fixture_through_loader():
    cloud = load_gaussian_cloud(_make_ply_bytes("<"))
    assert cloud.num_points == 2 and cloud.sh_deg == 1
    assert not cloud.compressed


def _npz_bytes(arrays: dict) -> bytes:
    buf = io.BytesIO()
    np.savez(buf, **arrays)
    return buf.getvalue()


def test_npz_byte_fixture_plain():
    """No codebooks, no scaling_factor: scale = exp(dequant(scaling)),
    opacity dequantized WITHOUT sigmoid (npz.rs:96-111, wgsl:236)."""
    blob = _npz_bytes(
        dict(
            xyz=np.float16([[1.0, 2.0, 3.0]]),
            # (scaling - 10) * 0.1 -> (0, 1, 2); scale = (1, e, e^2)
            scaling=np.int8([[10, 20, 30]]),
            scaling_scale=np.float32(0.1),
            scaling_zero_point=np.int32(10),
            # (100 - 0) * 0.02 = 2 -> normalized quat (1, 0, 0, 0)
            rotation=np.int8([[100, 0, 0, 0]]),
            rotation_scale=np.float32(0.02),
            rotation_zero_point=np.int32(0),
            # (50 - 10) * 0.01 = 0.4 — directly, NO sigmoid
            opacity=np.int8([50]),
            opacity_scale=np.float32(0.01),
            opacity_zero_point=np.int32(10),
            # (10, 20, 30) * 0.05 = (0.5, 1.0, 1.5)
            features_dc=np.int8([[[10, 20, 30]]]),
            features_dc_scale=np.float32(0.05),
            features_dc_zero_point=np.int32(0),
            # deg-1: 3 rest coefficients; (q - 2) * 0.25
            features_rest=np.int8(np.arange(9).reshape(1, 3, 3)),
            features_rest_scale=np.float32(0.25),
            features_rest_zero_point=np.int32(2),
            kernel_size=np.float32(0.3),
            mip_splatting=np.bool_(False),
        )
    )
    d = read_npz(io.BytesIO(blob))
    assert d["compressed"] is True
    assert d["sh_deg"] == 1 and d["num_points"] == 1
    np.testing.assert_allclose(d["xyz"], [[1, 2, 3]], atol=0)
    np.testing.assert_allclose(
        np.float32(d["opacity"]), [np.float16(0.4)], atol=0
    )
    # cov for identity quat = diag(scale^2) = (1, e^2, e^4), f16-rounded
    e = np.exp(1.0)
    np.testing.assert_allclose(
        np.float32(d["cov"][0]),
        np.float16([1.0, 0, 0, e * e, 0, e ** 4]).astype(np.float32),
        rtol=2e-3,
    )
    sh = np.float32(d["sh"])
    np.testing.assert_allclose(
        sh[0, 0], np.float16([0.5, 1.0, 1.5]).astype(np.float32), atol=0
    )
    expect_rest = (np.arange(9).reshape(3, 3) - 2.0) * 0.25
    np.testing.assert_allclose(
        sh[0, 1:4], np.float16(expect_rest).astype(np.float32), atol=0
    )
    assert d["kernel_size"] == pytest.approx(0.3)
    assert d["mip_splatting"] is False


def test_npz_byte_fixture_codebooks_and_factor():
    """Codebook indirection + scaling_factor variant: scaling normalizes,
    the exp(factor) applies SQUARED to the covariance (npz.rs:112-154,
    preprocess_compressed.wgsl:237-242)."""
    blob = _npz_bytes(
        dict(
            xyz=np.float16([[0, 0, 0], [1, 1, 1]]),
            # one codebook entry: dequant (3, 4, 0) -> normalized (.6, .8, 0)
            scaling=np.int8([[3, 4, 0]]),
            scaling_scale=np.float32(1.0),
            scaling_zero_point=np.int32(0),
            rotation=np.int8([[50, 0, 0, 0]]),
            rotation_scale=np.float32(0.02),
            rotation_zero_point=np.int32(0),
            opacity=np.int8([10, 20]),
            opacity_scale=np.float32(0.05),
            opacity_zero_point=np.int32(0),
            features_dc=np.int8([[[4, 4, 4]]]),
            features_dc_scale=np.float32(0.25),
            features_dc_zero_point=np.int32(0),
            gaussian_indices=np.int64([0, 0]),
            feature_indices=np.int64([0, 0]),
            # factors: exp((q - 0) * 0.1) -> exp(0) = 1, exp(1) = e
            scaling_factor=np.int8([0, 10]),
            scaling_factor_scale=np.float32(0.1),
            scaling_factor_zero_point=np.int32(0),
        )
    )
    d = read_npz(io.BytesIO(blob))
    assert d["sh_deg"] == 0 and d["num_points"] == 2
    # base cov (identity rot, normalized scale (.6,.8,0)) = diag(.36,.64,0)
    base = np.float16([0.36, 0, 0, 0.64, 0, 0]).astype(np.float32)
    cov = np.float32(d["cov"])
    np.testing.assert_allclose(cov[0], base, rtol=2e-3, atol=1e-6)
    # second point: same codebook entry scaled by factor^2 = e^2
    np.testing.assert_allclose(
        cov[1], np.float16(base * np.exp(2.0)).astype(np.float32),
        rtol=2e-3, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.float32(d["opacity"]), np.float16([0.5, 1.0]).astype(np.float32),
        atol=0,
    )
    sh = np.float32(d["sh"])
    np.testing.assert_allclose(sh[:, 0], [[1, 1, 1], [1, 1, 1]], atol=0)

    # keep_compressed residency form decodes to the same streams
    q = read_npz(io.BytesIO(blob), keep_compressed=True)["quantized"]
    np.testing.assert_array_equal(q.opacity_q, [10, 20])
    np.testing.assert_array_equal(q.geom_idx, [0, 0])
    np.testing.assert_array_equal(q.sh_idx, [0, 0])
    np.testing.assert_allclose(q.covars[0], base, rtol=2e-3, atol=1e-6)


def test_npz_fixture_through_loader():
    blob = _npz_bytes(
        dict(
            xyz=np.float16([[0, 0, 0]]),
            scaling=np.int8([[0, 0, 0]]),
            rotation=np.int8([[100, 0, 0, 0]]),
            rotation_scale=np.float32(0.02),
            opacity=np.int8([50]),
            opacity_scale=np.float32(0.01),
            features_dc=np.int8([[[0, 0, 0]]]),
        )
    )
    cloud = load_gaussian_cloud(blob)
    assert cloud.compressed
    assert cloud.num_points == 1
