"""In-kernel overflow walk (ops/overflow_pallas.py) unit tests.

Runs the kernel in TPU interpret mode on CPU with SMALL rank bounds (the
production 26/128-rank unrolls are TPU-only — the interpreted XLA program
would be enormous, the same reason frontend_pallas caps interpret slot
budgets).  Coverage semantics being preserved: the reference's unbounded
per-splat quad coverage (/root/reference/src/shaders/gaussian.wgsl:47-53).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from websplat_tpu.config import RasterConfig
from websplat_tpu.ops import packing
from websplat_tpu.ops.preprocess import overflow_emit, pack_rect4
from websplat_tpu.ops.overflow_pallas import overflow_walk

W, H = 256, 192


def _make_stream(rng, n, cfg, big_sigma=True):
    """Synthetic 6-word cid stream with known rects; huge reach so the
    reach cull passes everywhere (separately tested against overflow_emit
    which shares the decode)."""
    tx_tiles, ty_tiles = cfg.tiles_for(W, H)
    tx0 = rng.integers(0, tx_tiles - 1, n)
    ty0 = rng.integers(0, ty_tiles - 1, n)
    w_t = rng.integers(1, 5, n)
    h_t = rng.integers(1, 5, n)
    tx1 = np.minimum(tx0 + w_t - 1, tx_tiles - 1)
    ty1 = np.minimum(ty0 + h_t - 1, ty_tiles - 1)
    rect = np.asarray(
        pack_rect4(*(jnp.asarray(a) for a in (tx0, ty0, tx1, ty1)))
    )
    cq = packing.CenterQuant.for_viewport(W, H)
    px = (tx0 + 0.5) * cfg.tile_w
    py = (ty0 + 0.5) * cfg.tile_h
    zer = jnp.zeros(n)
    sig = 1e-6 if big_sigma else 0.5
    w0, w1, w2, w3 = packing.pack_record(
        jnp.asarray(px, jnp.float32), jnp.asarray(py, jnp.float32),
        zer + sig, zer, zer + sig, zer + 0.9, (zer + 1, zer + 1, zer + 1),
        cq,
    )
    depth_q = rng.integers(0, 1 << 16, n).astype(np.uint32)
    return (
        (jnp.asarray(rect), w0, w1, w2, w3, jnp.asarray(depth_q)),
        (tx0, ty0, tx1, ty1, depth_q),
    )


def test_walk_matches_reference_enumeration():
    """Kernel instance multiset == a NumPy row-major rank enumeration,
    including the valid-prefix cut and the giant forwarding order."""
    rng = np.random.default_rng(0)
    cfg = RasterConfig(tile_slots=2, overflow_slots=6, alpha_threshold=0.0)
    tx_tiles, _ = cfg.tiles_for(W, H)
    _, depth_bits = cfg.key_bits(W, H)
    n, n_cid = 300, 200
    cid, (tx0, ty0, tx1, ty1, depth_q) = _make_stream(rng, n, cfg)
    keys, words, total, giants, g_total = overflow_walk(
        cid, n_cid, rank_lo=cfg.tile_slots, rank_hi=cfg.overflow_slots,
        giant_thresh=cfg.overflow_slots, capacity=4096, giant_capacity=256,
        width=W, height=H, config=cfg, interpret=True,
    )
    keys = np.asarray(keys)
    total, g_total = int(total), int(g_total)

    exp = []
    for i in range(n_cid):
        w_t = tx1[i] - tx0[i] + 1
        nr = w_t * (ty1[i] - ty0[i] + 1)
        for j in range(cfg.tile_slots, min(nr, cfg.overflow_slots)):
            dy, dx = divmod(j, w_t)
            tile = (ty0[i] + dy) * tx_tiles + (tx0[i] + dx)
            exp.append((int(tile) << depth_bits) | int(depth_q[i]))
    assert sorted(keys[:total].tolist()) == sorted(exp)
    # all keys past the count are sentinel-masked
    assert (keys[total:] == 0xFFFFFFFF).all()

    nrect = (tx1 - tx0 + 1) * (ty1 - ty0 + 1)
    gmask = nrect[:n_cid] > cfg.overflow_slots
    assert g_total == int(gmask.sum())
    grect = np.asarray(giants[0])[:g_total]
    exp_rect = np.asarray(cid[0])[:n_cid][gmask]
    # giant stream preserves input order (prefix-compacted)
    assert (grect == exp_rect).all()


def test_walk_reach_cull_matches_overflow_emit():
    """With a REAL (finite) conic, the kernel's in-kernel reach cull must
    agree with overflow_emit's XLA decode bit-for-bit — both decode the
    same record words through the same integer codecs."""
    rng = np.random.default_rng(1)
    cfg = RasterConfig(tile_slots=2, overflow_slots=6,
                       overflow_grid_capacity=0)
    n = 256
    cid, _ = _make_stream(rng, n, cfg, big_sigma=False)
    keys, _, total, _, _ = overflow_walk(
        cid, n, rank_lo=cfg.tile_slots, rank_hi=cfg.overflow_slots,
        giant_thresh=cfg.overflow_slots, capacity=4096, giant_capacity=0,
        width=W, height=H, config=cfg, interpret=True,
    )
    okeys, _, _ = overflow_emit(cid, width=W, height=H, config=cfg)
    okeys = np.asarray(okeys)
    got = sorted(np.asarray(keys)[: int(total)].tolist())
    exp = sorted(okeys[okeys != 0xFFFFFFFF].tolist())
    assert got == exp


def test_walk_capacity_overflow_counted():
    rng = np.random.default_rng(2)
    cfg = RasterConfig(tile_slots=1, overflow_slots=5, alpha_threshold=0.0)
    n = 128
    cid, _ = _make_stream(rng, n, cfg)
    _, _, total, _, _ = overflow_walk(
        cid, n, rank_lo=1, rank_hi=5, giant_thresh=5,
        capacity=4096, giant_capacity=0,
        width=W, height=H, config=cfg, interpret=True,
    )
    # tiny capacity: total still reports the TRUE emitted count (the
    # caller turns the excess into num_dropped)
    _, _, total_small, _, _ = overflow_walk(
        cid, n, rank_lo=1, rank_hi=5, giant_thresh=5,
        capacity=1024, giant_capacity=0,
        width=W, height=H, config=cfg, interpret=True,
    )
    assert int(total_small) == int(total)
