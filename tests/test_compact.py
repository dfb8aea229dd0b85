"""Property tests for the Pallas instance compaction (interpret mode)."""

import jax.numpy as jnp
import numpy as np
import pytest

from websplat_tpu.ops.compact_pallas import BLOCK, INVALID_KEY, compact_instances


def run(keys, payload, capacity):
    k, p, nv, nd = compact_instances(
        jnp.asarray(keys), tuple(jnp.asarray(w) for w in payload), capacity=capacity
    )
    return np.asarray(k), [np.asarray(w) for w in p], int(nv), int(nd)


def make(rng, m, frac_valid=0.3):
    keys = rng.integers(0, 2**31, size=m, dtype=np.uint32)
    keys[rng.random(m) > frac_valid] = INVALID_KEY
    payload = [rng.integers(0, 2**32, size=m, dtype=np.uint32) for _ in range(5)]
    return keys, payload


def test_compaction_preserves_valid_set(rng):
    m = 3 * BLOCK
    keys, payload = make(rng, m)
    out_k, out_p, nv, nd = run(keys, payload, capacity=m)
    valid_in = keys != INVALID_KEY
    assert nv == valid_in.sum()
    assert nd == 0
    # multiset of (key, w0..w4) tuples is preserved
    def rows(k, p, mask):
        arr = np.stack([k] + p, 1)[mask]
        return set(map(tuple, arr.tolist()))

    assert rows(out_k, out_p, out_k != INVALID_KEY) == rows(keys, payload, valid_in)
    # compacted: all valids in a prefix of ~nv + block padding
    last_valid = np.max(np.nonzero(out_k != INVALID_KEY)[0]) if nv else -1
    assert last_valid < nv + (m // BLOCK) * 128


def test_compaction_unaligned_input(rng):
    keys, payload = make(rng, BLOCK + 777)
    out_k, out_p, nv, nd = run(keys, payload, capacity=2 * BLOCK)
    assert nv == (keys != INVALID_KEY).sum()
    assert nd == 0


def test_compaction_overflow(rng):
    m = 2 * BLOCK
    keys, payload = make(rng, m, frac_valid=0.9)
    cap = BLOCK // 2
    out_k, out_p, nv, nd = run(keys, payload, capacity=cap)
    assert nd > 0
    # everything at/past capacity is sentinel
    assert np.all(out_k[cap:] == INVALID_KEY)
    # surviving instances are a subset of the valid inputs
    valid_rows = set(
        map(tuple, np.stack([keys] + payload, 1)[keys != INVALID_KEY].tolist())
    )
    out_rows = np.stack([out_k] + out_p, 1)[out_k != INVALID_KEY]
    assert all(tuple(r) in valid_rows for r in out_rows.tolist())


def test_compaction_all_invalid(rng):
    m = BLOCK
    keys = np.full(m, INVALID_KEY, np.uint32)
    payload = [np.zeros(m, np.uint32) for _ in range(5)]
    out_k, _, nv, nd = run(keys, payload, capacity=m)
    assert nv == 0 and nd == 0
    assert np.all(out_k == INVALID_KEY)


def test_compaction_all_valid(rng):
    m = BLOCK
    keys = rng.integers(0, 2**31, size=m, dtype=np.uint32)
    payload = [rng.integers(0, 2**32, size=m, dtype=np.uint32) for _ in range(5)]
    out_k, out_p, nv, nd = run(keys, list(payload), capacity=m)
    assert nv == m and nd == 0
    np.testing.assert_array_equal(np.sort(out_k[:m]), np.sort(keys))


def test_pipeline_with_compaction_matches(rng):
    """Full pipeline with compact=True matches compact=False (ties aside)."""
    from websplat_tpu.config import RasterConfig, SplattingArgs
    from websplat_tpu.render.renderer import GaussianRenderer
    from websplat_tpu.utils.image import psnr
    from tests.synth import make_camera, make_cloud

    cloud = make_cloud(rng, n=300)
    cam = make_camera(viewport=(96, 64))
    args = SplattingArgs(background_color=(0.3, 0.2, 0.1))
    imgs = {}
    for compact in [False, True]:
        cfg = RasterConfig(raster_backend="xla", tile_slots=16, compact=compact)
        r = GaussianRenderer(cloud, cfg)
        imgs[compact] = r.render(cam, (96, 64), args, with_diag=True)
        assert r._last_diag["num_dropped"] == 0
    assert psnr(imgs[True], imgs[False]) > 60


def test_pipeline_compaction_overflow_drops(rng):
    from websplat_tpu.config import RasterConfig, SplattingArgs
    from websplat_tpu.render.renderer import GaussianRenderer
    from tests.synth import make_camera, make_cloud

    # n must put the instance count above the 4096 minimum capacity floor
    # (instances ~ visible splats at the default 32x16 tile size)
    cloud = make_cloud(rng, n=8000)
    cam = make_camera(viewport=(96, 64))
    cfg = RasterConfig(
        raster_backend="xla", tile_slots=16, compact=True, instance_capacity_factor=0.1
    )
    r = GaussianRenderer(cloud, cfg)
    img = r.render(cam, (96, 64), SplattingArgs(), with_diag=True)
    assert np.isfinite(img).all()
    assert r._last_diag["num_dropped"] > 0
