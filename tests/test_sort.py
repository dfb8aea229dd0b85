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
