"""Native C++ PLY decoder vs the NumPy reference path."""

import numpy as np
import pytest

from websplat_tpu import native
from websplat_tpu.io import ply as ply_io
from tests.synth import random_quats


@pytest.fixture(scope="module")
def have_native():
    if native.get_lib() is None:
        pytest.skip("native toolchain unavailable")


def _blob(rng, n=257, sh_deg=3, be=False):
    ncoef = (sh_deg + 1) ** 2
    xyz = rng.normal(size=(n, 3)).astype(np.float32) * 5
    sh = rng.normal(size=(n, ncoef, 3)).astype(np.float32)
    op = rng.normal(size=n).astype(np.float32) * 3
    sc = rng.uniform(-6, 1, size=(n, 3)).astype(np.float32)
    rot = random_quats(rng, n) * 1.7
    blob = ply_io.dumps_ply(xyz, sh, op, sc, rot, comments=["kernel_size=0.2"])
    if be:
        end = blob.index(b"end_header") + len(b"end_header\n")
        header = blob[:end].replace(b"binary_little_endian", b"binary_big_endian")
        body = np.frombuffer(blob[end:], "<f4").astype(">f4").tobytes()
        blob = header + body
    return blob


def _numpy_decode(blob):
    import io

    f = io.BytesIO(blob)
    header = ply_io.parse_header(f)
    # force the numpy path by calling read_ply with native disabled
    orig = ply_io._try_native_decode
    ply_io._try_native_decode = lambda *a, **k: None
    try:
        f.seek(0)
        return ply_io.read_ply(f)
    finally:
        ply_io._try_native_decode = orig


def test_native_matches_numpy(rng, have_native):
    blob = _blob(rng)
    ref = _numpy_decode(blob)
    import io

    out = ply_io.read_ply(io.BytesIO(blob))
    np.testing.assert_array_equal(out["xyz"], ref["xyz"])
    # f16 results must match bit-for-bit (same math, same rounding)
    np.testing.assert_array_equal(
        out["opacity"].view(np.uint16), ref["opacity"].view(np.uint16)
    )
    np.testing.assert_allclose(
        out["cov"].astype(np.float32), ref["cov"].astype(np.float32), rtol=2e-3, atol=1e-6
    )
    np.testing.assert_array_equal(out["sh"].view(np.uint16), ref["sh"].view(np.uint16))
    assert out["kernel_size"] == pytest.approx(0.2)


def test_native_big_endian(rng, have_native):
    blob = _blob(rng, n=64, be=True)
    ref = _numpy_decode(blob)
    import io

    out = ply_io.read_ply(io.BytesIO(blob))
    np.testing.assert_array_equal(out["xyz"], ref["xyz"])
    np.testing.assert_allclose(
        out["cov"].astype(np.float32), ref["cov"].astype(np.float32), rtol=2e-3, atol=1e-6
    )


def test_native_deg0(rng, have_native):
    blob = _blob(rng, n=32, sh_deg=0)
    import io

    out = ply_io.read_ply(io.BytesIO(blob))
    ref = _numpy_decode(blob)
    np.testing.assert_array_equal(out["sh"].view(np.uint16), ref["sh"].view(np.uint16))
