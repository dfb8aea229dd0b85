"""Property tests for the sort + tile-range machinery (the analogue of the
reference's only self-test, GPURSSorter::test_sort, gpu_rs.rs:295-331)."""

import jax.numpy as jnp
import numpy as np

from websplat_tpu.ops.sort import sort_instances, tile_ranges


def test_sort_matches_numpy(rng):
    m = 10000
    keys = rng.integers(0, 2**32, size=m, dtype=np.uint32)
    payload = rng.integers(0, 2**32, size=(3, m), dtype=np.uint32)
    sk, sp = sort_instances(jnp.asarray(keys), [jnp.asarray(p) for p in payload])
    order = np.argsort(keys, kind="stable")
    np.testing.assert_array_equal(np.asarray(sk), keys[order])
    for got, orig in zip(sp, payload):
        np.testing.assert_array_equal(np.asarray(got), orig[order])


def test_sort_reversed_keys(rng):
    """The reference's self test: sort reversed keys, verify ascending
    (gpu_rs.rs:295-331)."""
    m = 8192
    keys = np.arange(m, dtype=np.uint32)[::-1].copy()
    sk, (si,) = sort_instances(jnp.asarray(keys), [jnp.arange(m, dtype=jnp.uint32)])
    np.testing.assert_array_equal(np.asarray(sk), np.arange(m, dtype=np.uint32))
    np.testing.assert_array_equal(np.asarray(si), np.arange(m, dtype=np.uint32)[::-1])


def test_sort_tie_payload_pairing(rng):
    """The instance sort is UNstable (equal keys = same tile + same quantized
    depth, whose relative order the reference leaves to GPU scheduling;
    unstable measured ~8% cheaper).  What must hold: key-payload rows stay
    paired, and each key's payload multiset is preserved."""
    m = 4096
    keys = rng.integers(0, 8, size=m, dtype=np.uint32)  # many duplicates
    idx = np.arange(m, dtype=np.uint32)
    sk, (si,) = sort_instances(jnp.asarray(keys), [jnp.asarray(idx)])
    sk, si = np.asarray(sk), np.asarray(si)
    assert np.all(np.diff(sk.astype(np.int64)) >= 0)
    for k in range(8):
        np.testing.assert_array_equal(
            np.sort(si[sk == k]), np.sort(idx[keys == k])
        )


def test_sentinel_keys_go_last(rng):
    m = 1000
    keys = rng.integers(0, 2**20, size=m, dtype=np.uint32)
    keys[::3] = 0xFFFFFFFF
    sk, _ = sort_instances(jnp.asarray(keys), [jnp.zeros(m, jnp.uint32)])
    sk = np.asarray(sk)
    n_valid = int((keys != 0xFFFFFFFF).sum())
    assert np.all(sk[n_valid:] == 0xFFFFFFFF)
    assert np.all(sk[:n_valid] != 0xFFFFFFFF)


def test_tile_ranges(rng):
    depth_bits = 22
    num_tiles = 37
    m = 5000
    tiles = rng.integers(0, num_tiles, size=m, dtype=np.uint32)
    depth = rng.integers(0, 2**depth_bits, size=m, dtype=np.uint32)
    keys = np.sort((tiles << depth_bits) | depth)
    ranges = np.asarray(tile_ranges(jnp.asarray(keys), num_tiles, depth_bits))
    assert ranges.shape == (num_tiles + 1,)
    assert ranges[0] == 0 and ranges[-1] == m
    counts = np.bincount(tiles, minlength=num_tiles)
    np.testing.assert_array_equal(np.diff(ranges), counts)


def test_tile_ranges_with_sentinels(rng):
    depth_bits = 22
    num_tiles = 10
    keys = np.sort(
        np.concatenate(
            [
                (rng.integers(0, num_tiles, 100, dtype=np.uint32) << depth_bits),
                np.full(28, 0xFFFFFFFF, np.uint32),
            ]
        )
    )
    ranges = np.asarray(tile_ranges(jnp.asarray(keys), num_tiles, depth_bits))
    assert ranges[-1] == 100  # sentinels excluded from the last tile's range


def test_prefix_ladder_matches_full_sort():
    """n_valid prefix-ladder sorts must equal the full sort whenever the
    valid keys form a prefix with an all-sentinel tail (the fused-frontend
    exact-cursor contract)."""
    rng = np.random.default_rng(7)
    m = 1 << 18
    for n_valid in (0, 1, 977, m // 3, m - 1, m):
        keys = np.full((m,), 0xFFFFFFFF, np.uint32)
        # distinct keys: the sort is deliberately UNstable, so duplicate keys
        # may permute payload differently between the two runs
        keys[:n_valid] = rng.permutation(
            np.arange(n_valid, dtype=np.uint32) * 997 + 13
        )
        pay = rng.integers(0, 1 << 32, m, dtype=np.uint32)
        ref_k, (ref_p,) = sort_instances(jnp.asarray(keys), [jnp.asarray(pay)])
        lad_k, (lad_p,) = sort_instances(
            jnp.asarray(keys), [jnp.asarray(pay)], n_valid=jnp.int32(n_valid)
        )
        np.testing.assert_array_equal(np.asarray(ref_k), np.asarray(lad_k))
        # payload rows tied to valid keys must match; the sentinel tail's
        # payload is unspecified (never read: tile ranges end at the first
        # sentinel)
        np.testing.assert_array_equal(
            np.asarray(ref_p)[:n_valid], np.asarray(lad_p)[:n_valid]
        )


def test_sort_u64_backend_matches_xla(rng):
    """The u64-packed backend must produce the same sorted stream as the
    5-operand backend: same keys ascending, same key->record pairing (the
    packed low word w0 makes the u64 comparison a (key, w0) lexicographic
    tie-break, which is A valid order of the same multiset)."""
    m = 200_000  # above the ladder threshold to cover the rung path
    n_valid = m - 12345
    keys = np.concatenate([
        rng.integers(0, 2**32 - 1, size=n_valid, dtype=np.uint32),
        np.full(m - n_valid, 0xFFFFFFFF, np.uint32),
    ])
    payload = rng.integers(0, 2**32, size=(4, m), dtype=np.uint32)
    args = (jnp.asarray(keys), [jnp.asarray(p) for p in payload])
    sk_x, sp_x = sort_instances(*args, backend="xla", n_valid=jnp.int32(n_valid))
    sk_u, sp_u = sort_instances(*args, backend="u64", n_valid=jnp.int32(n_valid))
    np.testing.assert_array_equal(np.asarray(sk_x), np.asarray(sk_u))
    # rows stay paired: the (key, w0, w1, w2, w3) row multisets must match
    rows_x = np.stack([np.asarray(sk_x)] + [np.asarray(w) for w in sp_x], 1)
    rows_u = np.stack([np.asarray(sk_u)] + [np.asarray(w) for w in sp_u], 1)
    order = lambda r: np.lexsort(r.T[::-1])
    np.testing.assert_array_equal(rows_x[order(rows_x)], rows_u[order(rows_u)])


def test_sort_u64_backend_end_to_end(rng):
    """Full frame through config.sort_backend='u64' equals the xla-sort
    frame (sort order ties broken differently -> tiny blend reassociation
    tolerance)."""
    import sys
    sys.path.insert(0, "tests")
    from synth import make_camera, make_cloud

    from websplat_tpu.config import RasterConfig, SplattingArgs
    from websplat_tpu.render.renderer import GaussianRenderer

    cloud = make_cloud(rng, n=300)
    cam = make_camera(viewport=(64, 32))
    args = SplattingArgs(background_color=(0.1, 0.2, 0.3))
    img_x = GaussianRenderer(
        cloud, RasterConfig.for_backend(sort_backend="xla")
    ).render(cam, (64, 32), args)
    img_u = GaussianRenderer(
        cloud, RasterConfig.for_backend(sort_backend="u64")
    ).render(cam, (64, 32), args)
    assert np.isfinite(img_u).all()
    assert np.abs(img_x - img_u).max() < 5e-3


import pytest


@pytest.mark.slow
def test_overflow_ladder_prefix_fuzz():
    """Fuzz the overflow/ladder boundary (renderer.py n_valid accounting).

    The renderer advances the sort-ladder prefix past the spliced overflow
    stream by min(o_count + 127 * o_src_blocks, b) — a bound from the
    compactor's "up to 127 interleaved sentinels per source block" contract
    (ops/compact_pallas.py).  If that bound ever under-counted, a real
    instance would land beyond the sorted ladder prefix and the final key
    array would NOT be globally sorted (the untouched tail must be pure
    sentinel).  Scenes are big-splat-heavy so the clamped/overflow counts
    vary across seeds and straddle sort-rung boundaries (rungs are eighths
    of the capacity, ops/sort.py); capacities are sized so the ladder
    (m >= 2^17) and the overflow compactor (candidates > 65536) both engage.
    """
    import sys

    import jax

    sys.path.insert(0, "tests")
    from synth import make_camera, make_cloud

    from websplat_tpu.config import RasterConfig, SplattingArgs, resolve_settings
    from websplat_tpu.models.camera import CameraUniforms
    from websplat_tpu.render.renderer import (
        camera_to_device,
        render_frame,
        settings_to_device,
        upload_cloud,
    )

    W, H = 256, 192
    for seed, oslots, factor in [(11, 40, 64.0), (12, 48, 64.0), (13, 40, 72.0)]:
        rng = np.random.default_rng(seed)
        cloud = make_cloud(rng, n=2100, scale_range=(-2.8, -1.6))
        cfg = RasterConfig(
            tile_slots=4,
            overflow_slots=oslots,
            instance_capacity_factor=factor,
        )
        cam = make_camera(viewport=(W, H))
        cam.fit_near_far(*cloud.aabb)
        uni = CameraUniforms.from_camera(cam, (W, H))
        settings = resolve_settings(SplattingArgs(), cloud)
        sk, sp, ranges = render_frame(
            upload_cloud(cloud),
            camera_to_device(uni),
            settings_to_device(settings),
            jnp.asarray(settings.background_color, jnp.float32),
            width=W, height=H, config=cfg, stop_after="ranges",
        )
        k = np.asarray(sk)
        n_real = int((k != np.uint32(0xFFFFFFFF)).sum())
        assert n_real > 0
        # THE invariant: globally non-decreasing keys — every real instance
        # (main stream AND spliced overflow) was inside the sorted prefix
        assert np.all(k[:-1] <= k[1:]), (
            seed, np.argmin(k[:-1] <= k[1:]), n_real, k.shape[0],
        )
        # and the tile ranges span exactly the real instances
        assert int(np.asarray(ranges)[-1]) == n_real
