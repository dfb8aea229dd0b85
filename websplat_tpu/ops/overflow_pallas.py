"""In-kernel overflow rank walk (Pallas TPU): clamped-splat coverage
restoration without the XLA candidate-stream materialization.

Round-4 restored the reference's unbounded per-splat tile coverage
(/root/reference/src/shaders/gaussian.wgsl:47-53) with a three-stage XLA
pass (ops/preprocess.py:overflow_emit) that materializes a holey candidate
stream of ~1.8M rows at bonsai scale for ~220k real overflow instances and
Pallas-compacts it — measured 1.36 ms emit + 0.46 ms compact + ~2 ms of
sort-ladder slack from the compactor's inexact prefix (round-4 VERDICT).

This kernel replaces the WALK and WINDOW stages: it consumes a compacted
6-word clamped-splat stream — (rect4, w0..w3, depth_q) rows, the fused
frontend's cid stream — and walks row-major ranks [rank_lo, rank_hi)
IN-KERNEL with the same exact-cursor ordered-overlap stream writer the
frontend uses, so the output is a tight compacted prefix (no holes, no
per-block sentinel slack) and the sort ladder advances by the exact
instance count.  Rows whose rect exceeds ``giant_thresh`` are forwarded as
a second compacted 6-word stream, which feeds the next level:

  level 1: cid stream    -> ranks [tile_slots, overflow_slots)  + giants
  level 2: giant stream  -> ranks [overflow_slots, window_slots) + megas
  level 3 (XLA, ops/preprocess.py:dense_grid_emit): megas' ranks >=
           window_slots as a dense tile grid (unbounded coverage).

The grid is ~cap_c/16384 steps (4 at bonsai scale) instead of the
frontend's n/16384 (76), because the cid compaction already concentrated
the <3% clamped splats; a 26-rank unrolled walk is affordable here where
it would quadruple the frontend's slot-walk cost.

The rank -> (dx, dy) map is carried incrementally from rank 0 (Mosaic has
no per-lane integer division); ranks below rank_lo burn one add+select
each.  The reach cull decodes the record itself (packing's integer
codecs — exactly what the rasterizer blends with), matching
overflow_emit's decode bit-for-bit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from websplat_tpu.config import CUTOFF, RasterConfig
from websplat_tpu.ops import packing
from websplat_tpu.ops.frontend_pallas import (
    ALIGN,
    CARRY_ROWS,
    INVALID_KEY,
    ROWS,
    SPLATS,
    SROWS,
    STAGE,
    _flat_roll,
    _flat_roll_dyn,
)

LOG2 = int(np.log2(SPLATS))
CID_W = 6  # words per clamped-splat row (rect4, w0..w3, depth_q)


def _make_kernel(
    *,
    rank_lo: int,
    rank_hi: int,
    giant_thresh: int,
    with_giants: bool,
    capacity_pad: int,
    giant_capacity_pad: int,
    n_steps: int,
    tx_tiles: int,
    ts_x: int,
    ts_y: int,
    depth_bits: int,
    alpha_threshold: float,
    cq: packing.CenterQuant,
):
    n_out_streams = 5 + (CID_W if with_giants else 0)

    def kernel(scal_ref, *refs):
        ins = refs[:CID_W]
        keys_out, o0, o1, o2, o3 = refs[CID_W : CID_W + 5]
        giant_outs = (
            refs[CID_W + 5 : CID_W + 5 + CID_W] if with_giants else None
        )
        stats_out = refs[CID_W + 5 + (CID_W if with_giants else 0)]
        sc = CID_W + 5 + (CID_W if with_giants else 0) + 1
        stages_all = refs[sc : sc + n_out_streams]
        carries_all = refs[sc + n_out_streams : sc + 2 * n_out_streams]
        sems, state = refs[sc + 2 * n_out_streams :]
        outs = (keys_out, o0, o1, o2, o3)

        s = pl.program_id(0)

        @pl.when(s == 0)
        def _init():
            for i in range(2):
                state[i] = 0

        def block(r):
            return r[...].reshape(ROWS, 128)

        rect = block(ins[0])
        words = tuple(block(ins[1 + i]) for i in range(4))
        depth_q = block(ins[5])

        n_cid = scal_ref[0]

        lane = lax.broadcasted_iota(jnp.int32, (ROWS, 128), 1)
        row = lax.broadcasted_iota(jnp.int32, (ROWS, 128), 0)
        flat_pos = row * 128 + lane
        valid = (flat_pos + s * SPLATS) < n_cid

        s_lane = lax.broadcasted_iota(jnp.int32, (SROWS, 128), 1)
        s_row = lax.broadcasted_iota(jnp.int32, (SROWS, 128), 0)
        s_flat = s_row * 128 + s_lane

        # ---- decode the 6-word row ----
        i32 = lambda x: x.astype(jnp.int32)
        tx0 = i32(rect & np.uint32(0xFF))
        ty0 = i32((rect >> np.uint32(8)) & np.uint32(0xFF))
        tx1 = i32((rect >> np.uint32(16)) & np.uint32(0xFF))
        ty1 = i32(rect >> np.uint32(24))
        w_t = tx1 - tx0 + 1
        h_t = ty1 - ty0 + 1
        n_rect = w_t * h_t  # sentinel rect (0xFFFFFFFF) decodes to 1

        # reach cull decoded from the record (rasterize_pallas._decode_conic_op
        # field layout; see overflow_emit's identical XLA decode)
        from websplat_tpu.ops.rasterize_pallas import _decode_conic_op

        # center decode via the i32 hop (Mosaic has no u32 -> f32 cast);
        # same expression as the rasterizer's in-kernel decode
        px = (words[0] & 0xFFFF).astype(jnp.int32).astype(jnp.float32) * (
            1.0 / cq.scale_x
        ) - cq.margin
        py = (words[0] >> 16).astype(jnp.int32).astype(jnp.float32) * (
            1.0 / cq.scale_y
        ) - cq.margin
        ha, hb, hc, opacity = _decode_conic_op(words[1], words[2])
        if alpha_threshold > 0.0:
            a_max = jnp.minimum(
                2.0 * CUTOFF,
                jnp.log(
                    jnp.maximum(opacity, 1e-30) * (1.0 / alpha_threshold)
                ),
            )
        else:
            a_max = jnp.full_like(opacity, 2.0 * CUTOFF)

        # The per-rank divides are hoisted: reaches' edge minimizers divide
        # by the (rank-invariant) conic diagonal, so precompute the inverses
        # once per step — 4 vector divides per rank was a measured chunk of
        # the 14 us/rank serial floor.
        inv2ha = 1.0 / jnp.maximum(2.0 * ha, 1e-20)
        inv2hc = 1.0 / jnp.maximum(2.0 * hc, 1e-20)

        def rect_min_a(x0, x1, y0, y1):
            inside_r = (x0 <= 0.0) & (0.0 <= x1) & (y0 <= 0.0) & (0.0 <= y1)

            def edge_x(e):
                dy_s = jnp.clip(-hb * e * inv2hc, y0, y1)
                return ha * e * e + hb * e * dy_s + hc * dy_s * dy_s

            def edge_y(e):
                dx_s = jnp.clip(-hb * e * inv2ha, x0, x1)
                return ha * dx_s * dx_s + hb * dx_s * e + hc * e * e

            best = jnp.minimum(
                jnp.minimum(edge_x(x0), edge_x(x1)),
                jnp.minimum(edge_y(y0), edge_y(y1)),
            )
            return jnp.where(inside_r, 0.0, best)

        def reaches(tx, ty):
            bx0 = tx.astype(jnp.float32) * ts_x + 0.5 - px
            bx1 = bx0 + (ts_x - 1)
            by0 = ty.astype(jnp.float32) * ts_y + 0.5 - py
            by1 = by0 + (ts_y - 1)
            return rect_min_a(bx0, bx1, by0, by1) <= a_max

        def compact_multi(oks, arrs_list):
            """Monotone-shuffle compaction of SEVERAL independent rank
            blocks at once, loops written innermost-over-ranks so the
            serial prefix/shuffle chains interleave into independent
            instruction streams (VPU retires chained vreg ops at ~0.25/
            cycle but >2/cycle with >=4 streams — the single-rank form
            measured 14 us per (step, rank) unit, fully serialized)."""
            invs = [1 - ok for ok in oks]
            pres = list(invs)
            for i in range(LOG2):
                k = 1 << i
                pres = [
                    pre + jnp.where(flat_pos >= k, _flat_roll(pre, k), 0)
                    for pre in pres
                ]
            works = [
                [(pre - inv).astype(jnp.uint32)] + list(arrs)
                for pre, inv, arrs in zip(pres, invs, arrs_list)
            ]
            for i in range(LOG2):
                k = 1 << i
                nxt = []
                for work in works:
                    rolled = [_flat_roll(a, SPLATS - k) for a in work]
                    arrives = (rolled[0] & np.uint32(k)) != 0
                    nxt.append(
                        [
                            jnp.where(arrives, r, a)
                            for r, a in zip(rolled, work)
                        ]
                    )
                works = nxt
            return [tuple(w[1:]) for w in works]

        def compact_block(ok, arrs):
            return compact_multi([ok], [arrs])[0]

        def stream_write(vals, cnt, fills, *, st, ca, out_refs, sem0,
                         cursor_idx, cap_pad):
            # exact-cursor ordered-overlap append (frontend_pallas protocol)
            nw = len(vals)
            total = state[cursor_idx]
            carry_len = lax.rem(total, ALIGN)
            aligned = total - carry_len
            off_clamped = pl.multiple_of(
                jnp.minimum(aligned, cap_pad - STAGE), ALIGN
            )

            def dma(w):
                return pltpu.make_async_copy(
                    st[w], out_refs[w].at[pl.ds(off_clamped, STAGE)],
                    sems.at[sem0 + w],
                )

            @pl.when(total > 0)
            def _wait_prev():
                for w in range(nw):
                    dma(w).wait()

            for w in range(nw):
                ext = jnp.concatenate(
                    [
                        vals[w],
                        jnp.full((SROWS - ROWS, 128), fills[w], jnp.uint32),
                    ],
                    axis=0,
                )
                rolled = _flat_roll_dyn(ext, carry_len, SROWS)
                carry_full = jnp.concatenate(
                    [
                        ca[w][...].reshape(CARRY_ROWS, 128),
                        jnp.full(
                            (SROWS - CARRY_ROWS, 128), fills[w], jnp.uint32
                        ),
                    ],
                    axis=0,
                )
                merged = jnp.where(s_flat < carry_len, carry_full, rolled)
                st[w][...] = merged.reshape(STAGE)

            stage_len = carry_len + cnt
            advance = stage_len - lax.rem(stage_len, ALIGN)
            adv_c = pl.multiple_of(jnp.minimum(advance, SPLATS), ALIGN)
            for w in range(nw):
                ca[w][...] = st[w][pl.ds(adv_c, ALIGN)]
            for w in range(nw):
                dma(w).start()

            state[cursor_idx] = total + cnt

        # ---- the rank walk, in interleave batches of RANK_BATCH ----
        # Phase A per batch: (key, ok, cnt) for each rank (the dx/dy carry
        # advances serially but is ~4 cheap ops); the reach tests and the
        # compaction chains of the batch then run as independent
        # instruction streams; only the cursor writes serialize.
        RANK_BATCH = 4
        dx = jnp.zeros_like(tx0)
        dy = jnp.zeros_like(tx0)
        j = 0
        while j < rank_hi:
            batch = []  # (rank, key, ok, cnt)
            while j < rank_hi and len(batch) < RANK_BATCH:
                if j >= rank_lo:
                    tx = tx0 + dx
                    ty = ty0 + dy
                    slot_ok = (
                        valid & (j < n_rect) & (dy < h_t) & reaches(tx, ty)
                    )
                    ok = slot_ok.astype(jnp.int32)
                    tile = (ty * tx_tiles + tx).astype(jnp.uint32)
                    key = jnp.where(
                        slot_ok,
                        (tile << np.uint32(depth_bits)) | depth_q,
                        jnp.uint32(INVALID_KEY),
                    )
                    batch.append((j, key, ok, jnp.sum(ok)))
                if j + 1 < rank_hi:
                    wrap = dx + 1 >= w_t
                    dx = jnp.where(wrap, 0, dx + 1)
                    dy = dy + wrap.astype(jnp.int32)
                j += 1
            if not batch:
                continue
            nb = len(batch)
            cnt_any = batch[0][3]
            for _, _, _, c in batch[1:]:
                cnt_any = cnt_any + c

            def do_shuffle(batch=batch, nb=nb):
                outs_b = compact_multi(
                    [b[2] for b in batch],
                    [[b[1]] + list(words) for b in batch],
                )
                res = []
                for (jj, key, ok, cnt), arrs in zip(batch, outs_b):
                    key_c = jnp.where(
                        flat_pos >= cnt, jnp.uint32(INVALID_KEY), arrs[0]
                    )
                    res.extend((key_c,) + tuple(arrs[1:]))
                return tuple(res)

            def no_shuffle(nb=nb):
                zero = jnp.zeros((ROWS, 128), jnp.uint32)
                inval = jnp.full((ROWS, 128), INVALID_KEY, jnp.uint32)
                return tuple(
                    (inval if i % 5 == 0 else zero) for i in range(5 * nb)
                )

            flat_vals = lax.cond(cnt_any > 0, do_shuffle, no_shuffle)
            for bi, (jj, key, ok, cnt) in enumerate(batch):
                vals = flat_vals[5 * bi : 5 * bi + 5]

                @pl.when(cnt > 0)
                def _write(vals=vals, cnt=cnt):
                    stream_write(
                        vals, cnt,
                        (jnp.uint32(INVALID_KEY),) + (jnp.uint32(0),) * 4,
                        st=stages_all[:5], ca=carries_all[:5],
                        out_refs=outs, sem0=0, cursor_idx=0,
                        cap_pad=capacity_pad,
                    )

        if with_giants:
            gmask = valid & (n_rect > giant_thresh)
            g_ok = gmask.astype(jnp.int32)
            rect_key = jnp.where(gmask, rect, jnp.uint32(INVALID_KEY))
            g_cnt = jnp.sum(g_ok)

            def g_shuffle(rect_key=rect_key, g_ok=g_ok, g_cnt=g_cnt):
                arrs = compact_block(
                    g_ok, [rect_key] + list(words) + [depth_q]
                )
                rect_c = jnp.where(
                    flat_pos >= g_cnt, jnp.uint32(INVALID_KEY), arrs[0]
                )
                return (rect_c,) + tuple(arrs[1:])

            def g_none():
                return (
                    jnp.full((ROWS, 128), INVALID_KEY, jnp.uint32),
                ) + tuple(
                    jnp.zeros((ROWS, 128), jnp.uint32)
                    for _ in range(CID_W - 1)
                )

            g_vals = lax.cond(g_cnt > 0, g_shuffle, g_none)

            @pl.when(g_cnt > 0)
            def _write_giants():
                stream_write(
                    g_vals, g_cnt,
                    (jnp.uint32(INVALID_KEY),) + (jnp.uint32(0),) * (CID_W - 1),
                    st=stages_all[5:], ca=carries_all[5:],
                    out_refs=giant_outs, sem0=5, cursor_idx=1,
                    cap_pad=giant_capacity_pad,
                )

        @pl.when(s == n_steps - 1)
        def _finish():
            @pl.when(state[0] > 0)
            def _drain():
                for w in range(5):
                    pltpu.make_async_copy(
                        stages_all[w],
                        outs[w].at[pl.ds(jnp.int32(0), STAGE)],
                        sems.at[w],
                    ).wait()

            if with_giants:

                @pl.when(state[1] > 0)
                def _drain_giants():
                    for w in range(CID_W):
                        pltpu.make_async_copy(
                            stages_all[5 + w],
                            giant_outs[w].at[pl.ds(jnp.int32(0), STAGE)],
                            sems.at[5 + w],
                        ).wait()

            li = lax.broadcasted_iota(jnp.int32, (1, 128), 1)
            stats = jnp.where(
                li == 0, state[0], jnp.where(li == 1, state[1], 0)
            )
            stats_out[...] = stats

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "rank_lo", "rank_hi", "giant_thresh", "capacity", "giant_capacity",
        "width", "height", "config", "interpret",
    ),
)
def overflow_walk(
    cid_words,
    n_cid,
    *,
    rank_lo: int,
    rank_hi: int,
    giant_thresh: int,
    capacity: int,
    giant_capacity: int = 0,
    width: int,
    height: int,
    config: RasterConfig,
    interpret: bool = False,
):
    """Walk row-major ranks [rank_lo, rank_hi) of every valid 6-word row.

    Returns (keys, words4, total, giant_words6_or_None, giant_total):
    ``keys``/``words4`` are the exact-cursor compacted instance stream
    (capacity_pad rows; rows past min(total, capacity) are sentinel-masked
    here, payload garbage past the cursor is tolerated downstream);
    ``total`` the exact emitted-instance count (may exceed capacity —
    the difference is dropped, caller accounts it); the giant stream
    mirrors the input layout for rows with n_rect > giant_thresh.
    """
    c = cid_words[0].shape[0]
    tx_tiles, ty_tiles = config.tiles_for(width, height)
    _, depth_bits = config.key_bits(width, height)
    if tx_tiles > 256 or ty_tiles > 256:
        raise ValueError("overflow walk supports <=256 tiles per axis")

    c_pad = -(-c // SPLATS) * SPLATS
    n_steps = c_pad // SPLATS
    if c_pad != c:
        pad = c_pad - c
        cid_words = tuple(
            jnp.concatenate(
                [w, jnp.full((pad,), fill, jnp.uint32)]
            )
            for w, fill in zip(
                cid_words, (np.uint32(0xFFFFFFFF),) + (np.uint32(0),) * 5
            )
        )

    capacity_pad = -(-capacity // ALIGN) * ALIGN + STAGE
    with_giants = giant_capacity > 0
    giant_capacity_pad = (
        (-(-giant_capacity // ALIGN) * ALIGN + STAGE) if with_giants else 0
    )
    n_streams = 5 + (CID_W if with_giants else 0)

    kernel = _make_kernel(
        rank_lo=rank_lo,
        rank_hi=rank_hi,
        giant_thresh=giant_thresh,
        with_giants=with_giants,
        capacity_pad=capacity_pad,
        giant_capacity_pad=giant_capacity_pad,
        n_steps=n_steps,
        tx_tiles=tx_tiles,
        ts_x=config.tile_w,
        ts_y=config.tile_h,
        depth_bits=depth_bits,
        alpha_threshold=float(config.alpha_threshold),
        cq=packing.CenterQuant.for_viewport(width, height),
    )

    out_specs = [pl.BlockSpec(memory_space=pl.ANY)] * 5
    out_shapes = [
        jax.ShapeDtypeStruct((capacity_pad,), jnp.uint32)
    ] * 5
    if with_giants:
        out_specs.extend([pl.BlockSpec(memory_space=pl.ANY)] * CID_W)
        out_shapes.extend(
            [jax.ShapeDtypeStruct((giant_capacity_pad,), jnp.uint32)] * CID_W
        )
    out_specs.append(
        pl.BlockSpec((1, 128), lambda s, scal: (0, 0), memory_space=pltpu.VMEM)
    )
    out_shapes.append(jax.ShapeDtypeStruct((1, 128), jnp.int32))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec((SPLATS,), lambda s, scal: (s,),
                         memory_space=pltpu.VMEM)
        ] * CID_W,
        out_specs=out_specs,
        scratch_shapes=[pltpu.VMEM((STAGE,), jnp.uint32)] * n_streams
        + [pltpu.VMEM((ALIGN,), jnp.uint32)] * n_streams
        + [
            pltpu.SemaphoreType.DMA((n_streams,)),
            pltpu.SMEM((2,), jnp.int32),
        ],
    )
    interp = (
        pltpu.InterpretParams()
        if (interpret or jax.default_backend() != "tpu")
        else False
    )
    res = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interp,
    )(jnp.asarray(n_cid, jnp.int32).reshape(1), *cid_words)

    keys, w0, w1, w2, w3 = res[:5]
    stats = res[-1]
    total = stats[0, 0]
    giant_total = stats[0, 1]

    n_keep = jnp.minimum(total, capacity)
    cap_iota = jnp.arange(capacity_pad, dtype=jnp.int32)
    keys = jnp.where(cap_iota >= n_keep, jnp.uint32(INVALID_KEY), keys)
    out_giants = None
    if with_giants:
        graw = res[5 : 5 + CID_W]
        g_keep = jnp.minimum(giant_total, giant_capacity)
        grect = jnp.where(
            jnp.arange(giant_capacity_pad, dtype=jnp.int32) >= g_keep,
            jnp.uint32(INVALID_KEY),
            graw[0],
        )[:giant_capacity]
        out_giants = (grect,) + tuple(w[:giant_capacity] for w in graw[1:])
    return keys, (w0, w1, w2, w3), total, out_giants, giant_total
