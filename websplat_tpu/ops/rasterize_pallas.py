"""Pallas TPU tile rasterizer — the hot kernel of the frame.

Replaces the reference's hardware rasterization path (instanced quads +
premultiplied-alpha blending, /root/reference/src/shaders/gaussian.wgsl and
pipeline state renderer.rs:57-85): TPUs have no rasterizer or blend units,
so each screen tile is composited front-to-back by a grid program walking
its depth-sorted instance span.

Fully-vectorized design (v3 — v1 decoded records on the scalar core, v2
required a group-major XLA transpose of the whole sorted stream between the
sort and the kernel, ~2-3 ms of pure data movement at bonsai scale):

- grid = (num_tiles,); per-tile [start, end) spans via scalar prefetch (they
  replace the reference's indirect draw counts).
- Instances are consumed in their natural sorted order.  In-kernel, each
  1024-splat chunk row is re-laid out in registers via the Mosaic-supported
  chain  (8,128) -> transpose -> (16,8,8) swap last dims -> (128,8) ->
  transpose,  yielding a column-PERMUTED group-major (8,128) vreg: column
  p = 8a+k holds the depth-consecutive splats [128k+8a, 128k+8a+8).  Groups
  are visited k-major / a-minor, which is exactly depth order.
- A group of 8 splats is evaluated against all P tile pixels in (8, P)
  registers: alpha for 8 splats at once; the order-dependent transmittance
  composite runs as a log-step pairwise over-composite along the sublane
  (splat) axis — 3 roll/multiply levels instead of an 8-long serial chain;
  GROUP_BATCH groups are evaluated with their instruction streams
  interleaved (the VPU retires chained vreg ops at ~0.25/cycle but >2/cycle
  given independent streams).
- Two selectable inner-loop math variants (RasterConfig.composite / .qform,
  both oracle-tested; see config.py for the trade-offs): composite="scan"
  replaces the 4-stream log tree with ONE masked Hillis-Steele prefix
  product of (1-alpha) whose weights accumulate into per-band (8, P)
  channel accumulators (sublane-reduced once per tile); qform="monomial"
  evaluates the quadratic form as a per-splat 6-coefficient dot against
  per-tile pixel monomials in tile-local coordinates with log(opacity)
  folded into the constant term.  Together they cut the per-(group, pixel)
  vector-op count roughly in half vs tree/direct.
- Two-level skipping: segments of seg_k*16 groups sharing one branch (a
  segment = the k-rows of the permuted layout, selected by a lane%8 mask);
  the chunk loop terminates once every pixel saturates (max transmittance
  < eps).  The reference blends back-to-front with no early out
  (gaussian.wgsl:59-67); front-to-back with eps cutoff is identical up to
  eps.
- f16/u16 record decode is vectorized integer bit math + vector bitcast
  (subnormals flush to zero; inf/nan cannot occur in our records).
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

GROUP = 8  # splats blended per register step (the sublane dimension)
CHUNK = GROUP * 128  # splats per DMA chunk (fixed by the (8, 128) relayout)
SEG_K = 2  # k-rows per skip-branch segment (seg_k*16 groups share a branch)
GROUP_BATCH = 4  # groups whose instruction streams are interleaved for ILP


def _f16_vec(bits_u32):
    """Vectorized f16 decode: u32 lanes (f16 pattern in low 16) -> f32.

    Subnormals decode exactly (value = ±man * 2^-24): a giant splat's conic
    coefficients can be f16-subnormal (sigma ≳ 300 px), and flushing them to
    zero would rasterize it as a solid box instead of a Gaussian."""
    h = bits_u32 & 0xFFFF
    sign = (h & 0x8000) << 16
    exp = (h >> 10) & 0x1F
    man = h & 0x3FF
    f32_bits = sign | ((exp + 112) << 23) | (man << 13)
    val = pltpu.bitcast(f32_bits.astype(jnp.uint32), jnp.float32)
    sub = jnp.where(sign != 0, -1.0, 1.0) * (
        man.astype(jnp.int32).astype(jnp.float32) * 5.9604645e-8
    )
    return jnp.where(exp == 0, sub, val)


def _e5m12_vec(bits_u32):
    """Vectorized UNSIGNED e5m12 decode (the conic codec,
    packing.e5m12_bits_to_f32): u32 low 17 bits -> f32, exact incl.
    subnormals (value = man * 2^-26).  Same structure as _f16_vec with the
    wider mantissa; no sign bit — the conic diagonal is PSD-non-negative."""
    h = bits_u32 & 0x1FFFF
    exp = (h >> 12) & 0x1F
    man = h & 0xFFF
    f32_bits = ((exp + 112) << 23) | (man << 11)
    val = pltpu.bitcast(f32_bits.astype(jnp.uint32), jnp.float32)
    sub = man.astype(jnp.int32).astype(jnp.float32) * 1.4901161e-8
    return jnp.where(exp == 0, sub, val)


def _decode_conic_op(w1, w2):
    """(w1, w2) record words -> (half_a, b, half_c, opacity), f32.

    Field layout (packing.pack_record): w1 = A17 | C_low15<<17,
    w2 = C_high2 | RHO16<<2 | OP12<<18; A/C unsigned e5m12 of the
    CONIC_SCALE-pre-scaled halves, RHO16 the fixed-point correlation
    (B is REBUILT as rho * 2 sqrt(A'C') — PSD by construction, no
    disc cancellation; see packing.py), OP12 the sqrt-domain opacity.
    Garbage lanes (uninitialized HBM tails) decode to large-but-FINITE
    conic values (exp=31 -> 2^16 scale), which the discard comparison
    rejects; opacity of sentinel rows (w2 == 0) decodes to exactly 0."""
    inv = packing.INV_CONIC_SCALE
    ha = _e5m12_vec(w1) * inv
    hc = _e5m12_vec((w1 >> 17) | ((w2 & 0x3) << 15)) * inv
    rho = ((w2 >> 2) & 0xFFFF).astype(jnp.int32).astype(jnp.float32) * (
        2.0 / 65535.0
    ) - 1.0
    hb = (rho * float(packing.RHO_DECODE) * 2.0) * jnp.sqrt(ha * hc)
    u = ((w2 >> 18) & 0xFFF).astype(jnp.int32).astype(jnp.float32) * (
        1.0 / 4095.0
    )
    op = u * u
    return ha, hb, hc, op


def _gm_shuffle(s):
    """(8, 128) row-major chunk tile -> (8, 128) permuted group-major.

    Input element j of the 1024-splat chunk sits at (j // 128, j % 128);
    output column p = 8a+k holds splats [128k+8a, 128k+8a+8) along sublanes.
    Every step is a Mosaic-supported reshape/transpose (lane<->sublane moves
    only ever cross at the 128 or 8x8-block grain)."""
    st = jnp.transpose(s, (1, 0))  # (128, 8)
    v = st.reshape(16, 8, 8)
    v = jnp.transpose(v, (0, 2, 1))
    w = v.reshape(128, 8)
    return jnp.transpose(w, (1, 0))  # (8, 128)


def _make_kernel_mxu(
    *,
    num_tiles_x: int,
    tile_w: int,
    tile_h: int,
    eps: float,
    cq: packing.CenterQuant,
    group_skip: bool = True,
    precision: str = "highest",
    hybrid: bool = False,
):
    """MXU-structured rasterizer body (composite="mxu").

    The VPU variants evaluate 8 splats x P pixels per register step; here a
    SLAB of 128 depth-consecutive splats is evaluated against all P tile
    pixels with the three dense contractions on the MXU:

      1. quadratic form:  na(S,P) = C(6,S) . M6(6,P)   per-splat monomial
         coefficients against the tile-constant pixel monomials (the VPU
         monomial variant's 6 broadcast-FMAs, as one matmul);
      2. transmittance:   the order-dependent prefix product of (1 - alpha)
         moves to LOG SPACE, where it is a prefix SUM along the depth axis =
         one strictly-lower-triangular (S,S) . (S,P) matmul (exclusive scan);
      3. colors:          rgb(3,P) += RGB(3,S) . W(S,P) with W = alpha *
         T_excl — the premultiplied-over accumulation as a matmul.

    The VPU work that remains per (splat, pixel) pair is ~4x smaller than the
    scan composite (exp/min/where for alpha, log1p, one exp back from log
    space, one multiply), and it overlaps the MXU issue.  Depth order needs
    no relayout at all: the raw (8, 128) chunk row r holds splats
    [128r, 128r+128) along LANES, which is exactly the contraction order the
    triangular matmul consumes — the group-major shuffle of the VPU variants
    disappears.

    Numerics: TPU f32 matmuls default to a single bf16 MXU pass (~4e-3
    relative), which would corrupt the quadratic form (terms up to ~1e4
    need ~1e-4 absolute, see the monomial variant's cancellation analysis);
    `precision` selects the f32-emulation pass count for all three matmuls
    ("default" 1-pass bf16 / "high" 3-pass / "highest" 6-pass ~= true f32).

    ``hybrid=True`` (composite="hybrid") rebalances the slab design across
    the two units by where each is strong.  Every matmul here pads to the
    same (128, 128, P) MXU tile volume regardless of its nominal size
    (qform k=6 and colors m=8 both round up), so the MXU assignment is
    chosen by PASS COUNT, not FLOP count — and the quadratic form, whose
    magnitude spread (terms ~1e4 vs 1e-4 error budget) would need 3-4
    de-emulation passes on the MXU, goes back to the VPU as 6 exact-f32
    broadcast FMAs against (128, 1) per-splat coefficient columns (one
    (8, 128) -> (128, 8) transpose per chunk).  The transmittance prefix
    and the color accumulation stay on the MXU with a 2-pass exact split
    each: the 0/1 triangular matrix is bf16-EXACT, so splitting only the
    loga operand (hi = bf16(x), lo = bf16(x - hi)) leaves a ~2^-17 relative
    residual — f32-grade — at 2 passes instead of lax's 6 ("highest" splits
    both operands three ways); colors split both operands once (3 passes,
    lo.lo dropped — a single bf16 rounding of either operand alone is a
    ~2e-3 image error, measured).  Net per-pair work: ~13 VPU ops + 5 MXU
    volumes, vs the scan composite's ~24 VPU ops and mxu/"highest"'s 18
    volumes.
    Order of blending is bit-identical to the other variants (same sorted
    stream, same front-to-back semantics); alpha math matches the monomial
    variant, the composite differs only by the exp/log round-trip (|cum| <=
    -log(eps) ~ 9.2 in the live regime, so f32 log/exp keeps T to ~1e-6
    relative).  Reference semantics preserved: b = min(0.99, exp(-a)*op),
    2*CUTOFF discard, premultiplied over (gaussian.wgsl:2,59-67).
    """
    p = tile_w * tile_h
    sub = p // 128
    import os
    cross_tile = not os.environ.get("WS_NO_CROSS_TILE")
    # Mosaic lowers only DEFAULT (1-pass bf16) and HIGHEST (6-pass) dot
    # precisions; "high" (3-pass) is emulated by hand: split both operands
    # into bf16 hi/lo and sum hi@hi + hi@lo + lo@hi (lo@lo dropped, ~2^-17
    # residual) — the same arithmetic lax.Precision.HIGH would request.
    if precision == "high":

        def mmul(a, b, dims):
            ah = a.astype(jnp.bfloat16)
            al = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)
            bh = b.astype(jnp.bfloat16)
            bl = (b - bh.astype(jnp.float32)).astype(jnp.bfloat16)

            def d(x, y):
                return lax.dot_general(
                    x, y, (dims, ((), ())),
                    preferred_element_type=jnp.float32,
                )

            return d(ah, bh) + (d(ah, bl) + d(al, bh))

    else:
        prec = {
            "default": lax.Precision.DEFAULT,
            "highest": lax.Precision.HIGHEST,
        }[precision]

        def mmul(a, b, dims):
            return lax.dot_general(a, b, (dims, ((), ())), precision=prec)
    # all-sentinel tails still saturate pixels in LOG space: log(eps) floor
    log_eps = float(np.log(eps)) if eps > 0.0 else -3.0e38
    NEG = -1.0e30  # python float: a jnp scalar here would be captured as a
    # pallas_call constant, which Mosaic rejects

    def kernel(ranges_ref, w0_hbm, w1_hbm, w2_hbm, w3_hbm, out_ref,
               v0a, v1a, v2a, v3a, v0b, v1b, v2b, v3b, sems):
        t = pl.program_id(0)
        start = ranges_ref[t]
        end = ranges_ref[t + 1]

        tile_x = (t % num_tiles_x) * tile_w
        tile_y = (t // num_tiles_x) * tile_h

        # tile-constant pixel monomials in TILE-LOCAL coordinates (see the
        # monomial variant for the cancellation-error argument); (6, P) =
        # [-x^2, -xy, -y^2, x, y, 1] rows so na = C . M6 needs no negations
        f = lax.broadcasted_iota(jnp.int32, (1, p), 1)
        xl = (f % tile_w).astype(jnp.float32) + 0.5
        yl = (f // tile_w).astype(jnp.float32) + 0.5
        m6 = jnp.concatenate(
            [-(xl * xl), -(xl * yl), -(yl * yl), xl, yl, jnp.ones_like(xl)],
            axis=0,
        )  # (6, P)
        # strictly-lower-triangular ones: cum_excl = L . loga (exclusive
        # prefix sum along the 128-splat depth axis)
        li = lax.broadcasted_iota(jnp.int32, (128, 128), 0)
        lj = lax.broadcasted_iota(jnp.int32, (128, 128), 1)
        l_strict = (lj < li).astype(jnp.bfloat16 if hybrid else jnp.float32)

        def _split(x):
            hi = x.astype(jnp.bfloat16)
            return hi, (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)

        def _dbf(a, b):
            return lax.dot_general(
                a, b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        def dot2(lhs_bf, x):
            # 2-pass exact-split matmul: lhs is bf16-EXACT (the 0/1
            # triangular); splitting x leaves a ~2^-17 relative residual
            hi, lo = _split(x)
            return _dbf(lhs_bf, hi) + _dbf(lhs_bf, lo)

        def dot3(lhs, x):
            # 3-pass split of BOTH operands (lo.lo dropped, ~2^-17 residual)
            lh, ll = _split(lhs)
            hi, lo = _split(x)
            return _dbf(lh, hi) + (_dbf(lh, lo) + _dbf(ll, hi))

        chunk0 = lax.div(start, CHUNK)
        # see the VPU kernel: empty tiles MUST yield n_chunks == 0 (the
        # predecessor never started their first-chunk DMA)
        n_chunks = jnp.where(
            end > start, lax.div(end + CHUNK - 1, CHUNK) - chunk0, 0
        )

        g_lane = lax.broadcasted_iota(jnp.int32, (GROUP, 128), 1)
        g_sub = lax.broadcasted_iota(jnp.int32, (GROUP, 128), 0)
        # RAW row-major chunk order: element (r, l) is chunk splat 128r + l
        chunk_raw_idx = 128 * g_sub + g_lane

        words_hbm = (w0_hbm, w1_hbm, w2_hbm, w3_hbm)
        vbufs = ((v0a, v1a, v2a, v3a), (v0b, v1b, v2b, v3b))

        def copies(slot, ci):
            off = pl.multiple_of((chunk0 + ci) * CHUNK, CHUNK)
            return [
                pltpu.make_async_copy(
                    words_hbm[i].at[pl.ds(off, CHUNK)],
                    vbufs[slot][i],
                    sems.at[slot, i],
                )
                for i in range(4)
            ]

        def chunk_start(slot, ci):
            for c in copies(slot, ci):
                c.start()

        def chunk_wait(slot, ci):
            for c in copies(slot, ci):
                c.wait()

        @pl.when(((t == 0) | (not cross_tile)) & (n_chunks > 0))
        def _warmup():
            chunk_start(0, 0)

        def chunk_body(carry):
            ci, acc, carry_log = carry
            s = ci % 2

            @pl.when(s == 0)
            def _w0():
                chunk_wait(0, ci)

            @pl.when(s == 1)
            def _w1():
                chunk_wait(1, ci)

            @pl.when((s == 0) & (ci + 1 < n_chunks))
            def _p1():
                chunk_start(1, ci + 1)

            @pl.when((s == 1) & (ci + 1 < n_chunks))
            def _p0():
                chunk_start(0, ci + 1)

            def word(i):
                w = jnp.where(s == 0, vbufs[0][i][...], vbufs[1][i][...])
                return w.reshape(8, 128)  # raw order — no group shuffle

            w0 = word(0)
            w1 = word(1)
            w2 = word(2)
            w3 = word(3)
            off = (chunk0 + ci) * CHUNK
            cx_g = (w0 & 0xFFFF).astype(jnp.int32).astype(jnp.float32) * (
                1.0 / cq.scale_x
            ) - cq.margin
            cy_g = (w0 >> 16).astype(jnp.int32).astype(jnp.float32) * (
                1.0 / cq.scale_y
            ) - cq.margin
            ha_g, hb_g, hc_g, op_g = _decode_conic_op(w1, w2)
            e9 = (w3 >> 27).astype(jnp.int32)
            scale9 = pltpu.bitcast(((e9 + 103) << 23).astype(jnp.uint32), jnp.float32)
            r_g = (w3 & 0x1FF).astype(jnp.int32).astype(jnp.float32) * scale9
            g_g = ((w3 >> 9) & 0x1FF).astype(jnp.int32).astype(jnp.float32) * scale9
            b_g = ((w3 >> 18) & 0x1FF).astype(jnp.int32).astype(jnp.float32) * scale9
            idx = off + chunk_raw_idx
            op_g = jnp.where((idx >= start) & (idx < end), op_g, 0.0)
            live = op_g > 0.0

            # monomial coefficients (see the VPU monomial variant); dead and
            # garbage lanes (sentinel tails, chunk over-reads — possibly
            # NaN/inf decodes) are SANITIZED to finite values because they
            # flow through MXU contractions where a NaN would poison whole
            # output tiles: coefs -> 0, c5 -> -1e30 (na ~ -1e30, exp -> 0),
            # t5 -> 0 (discard compare false).
            u = cx_g - tile_x.astype(jnp.float32)
            v = cy_g - tile_y.astype(jnp.float32)
            hbv = hb_g * v
            a0 = (ha_g * u + hbv) * u + hc_g * (v * v)
            logop = jnp.log(op_g)  # -inf on dead lanes; selected away below
            z = jnp.float32(0.0)
            coef_rows = (
                jnp.where(live, ha_g, z),
                jnp.where(live, hb_g, z),
                jnp.where(live, hc_g, z),
                jnp.where(live, (ha_g + ha_g) * u + hbv, z),
                jnp.where(live, hb_g * u + (hc_g + hc_g) * v, z),
                jnp.where(live, logop - a0, NEG),
            )
            t5_g = jnp.where(live, logop - jnp.float32(2.0 * CUTOFF), z)
            # one small transpose per chunk: per-splat threshold columns
            t5_t = jnp.transpose(t5_g, (1, 0))  # (128, 8)
            if hybrid:
                # per-splat coefficient COLUMNS for the VPU quadratic form
                # (6 small transposes per chunk, amortized over 8 slabs)
                ct = [jnp.transpose(c, (1, 0)) for c in coef_rows]

            def slab(r, state):
                acc_, clog = state
                shift = (8 - r) % 8

                def row(x):
                    y = pltpu.roll(x, shift=shift, axis=0) if shift else x
                    return y[0:1, :]

                if hybrid:
                    # exact-f32 quadratic form on the VPU: 6 broadcast FMAs
                    # of (128, 1) per-splat coefficients against the (1, P)
                    # tile monomials (rows of m6)
                    na = (
                        ct[0][:, r : r + 1] * m6[0:1, :]
                        + ct[1][:, r : r + 1] * m6[1:2, :]
                        + ct[2][:, r : r + 1] * m6[2:3, :]
                        + ct[3][:, r : r + 1] * m6[3:4, :]
                        + ct[4][:, r : r + 1] * m6[4:5, :]
                        + ct[5][:, r : r + 1] * m6[5:6, :]
                    )
                else:
                    c6 = jnp.concatenate([row(c) for c in coef_rows], axis=0)
                    # (128, P) = contraction over the 6 monomials; splats are
                    # SUBLANES in depth order (lanes of raw row r)
                    na = mmul(c6, m6, ((0,), (0,)))
                t5_col = t5_t[:, r : r + 1]  # (128, 1)
                alpha = jnp.where(
                    na > t5_col, jnp.minimum(0.99, jnp.exp(na)), 0.0
                )
                loga = jnp.log1p(-alpha)  # 0 on dead lanes (alpha == 0)
                if hybrid:
                    cum = dot2(l_strict, loga)
                else:
                    cum = mmul(l_strict, loga, ((1,), (0,)))
                w_ = alpha * jnp.exp(cum + clog)
                # (8, 128) lhs: rgb rows 0-2 + five zero rows (sublane-dim
                # padding keeps the accumulator roll-extractable at 8 rows)
                rgb8 = jnp.concatenate(
                    [row(r_g), row(g_g), row(b_g),
                     jnp.zeros((5, 128), jnp.float32)],
                    axis=0,
                )
                if hybrid:
                    acc_ = acc_ + dot3(rgb8, w_)
                else:
                    acc_ = acc_ + mmul(rgb8, w_, ((1,), (0,)))
                clog = clog + jnp.sum(loga, axis=0, keepdims=True)
                return acc_, clog

            state = (acc, carry_log)
            for r in range(8):
                if group_skip:
                    shift = (8 - r) % 8
                    op_row = (
                        pltpu.roll(op_g, shift=shift, axis=0) if shift else op_g
                    )[0:1, :]
                    go = (jnp.max(op_row) > 0.0) & (
                        jnp.max(state[1]) > log_eps
                    )
                    state = lax.cond(
                        go, functools.partial(slab, r), lambda st: st, state
                    )
                else:
                    state = slab(r, state)
            return ci + 1, state[0], state[1]

        def chunk_cond(carry):
            ci, _, carry_log = carry
            return jnp.logical_and(ci < n_chunks, jnp.max(carry_log) > log_eps)

        acc0 = jnp.zeros((8, p), jnp.float32)
        clog0 = jnp.zeros((1, p), jnp.float32)
        ci_f, acc, carry_log = lax.while_loop(
            chunk_cond, chunk_body, (jnp.int32(0), acc0, clog0)
        )

        @pl.when((ci_f < n_chunks) & (ci_f % 2 == 0))
        def _d0():
            chunk_wait(0, ci_f)

        @pl.when((ci_f < n_chunks) & (ci_f % 2 == 1))
        def _d1():
            chunk_wait(1, ci_f)

        num_t = pl.num_programs(0)

        @pl.when((t + 1 < num_t) & cross_tile)
        def _next_tile():
            nstart = ranges_ref[t + 1]
            nend = ranges_ref[t + 2]

            @pl.when(nend > nstart)
            def _():
                noff = pl.multiple_of(lax.div(nstart, CHUNK) * CHUNK, CHUNK)
                for i in range(4):
                    pltpu.make_async_copy(
                        words_hbm[i].at[pl.ds(noff, CHUNK)],
                        vbufs[0][i],
                        sems.at[0, i],
                    ).start()

        trans = jnp.exp(carry_log)
        out_ref[0, 0] = acc[0:1, :].reshape(sub, 128)
        out_ref[0, 1] = pltpu.roll(acc, shift=7, axis=0)[0:1, :].reshape(sub, 128)
        out_ref[0, 2] = pltpu.roll(acc, shift=6, axis=0)[0:1, :].reshape(sub, 128)
        out_ref[0, 3] = trans.reshape(sub, 128)

    return kernel


def _make_kernel(
    *,
    num_tiles_x: int,
    tile_w: int,
    tile_h: int,
    eps: float,
    cq: packing.CenterQuant,
    group_skip: bool = True,
    seg_k: int = SEG_K,
    group_batch: int = GROUP_BATCH,
    y_bands: int = 1,
    composite: str = "scan",
    qform: str = "monomial",
    mxu_precision: str = "highest",
    batch_tree: bool = False,
):
    if composite in ("mxu", "hybrid"):
        if y_bands != 1:
            raise ValueError(f"composite={composite!r} supports y_bands=1 only")
        return _make_kernel_mxu(
            num_tiles_x=num_tiles_x,
            tile_w=tile_w,
            tile_h=tile_h,
            eps=eps,
            cq=cq,
            group_skip=group_skip,
            precision=mxu_precision,
            hybrid=(composite == "hybrid"),
        )
    if composite not in ("tree", "scan"):
        raise ValueError(f"unknown composite: {composite!r}")
    if qform not in ("direct", "monomial"):
        raise ValueError(f"unknown qform: {qform!r}")
    p = tile_w * tile_h  # pixels per tile (multiple of 128)
    sub = p // 128
    n_bands = y_bands
    band_p = p // n_bands  # pixels per band (multiple of 128)
    band_rows = tile_h // n_bands
    import os
    cross_tile = not os.environ.get("WS_NO_CROSS_TILE")

    def kernel(ranges_ref, w0_hbm, w1_hbm, w2_hbm, w3_hbm, out_ref,
               v0a, v1a, v2a, v3a, v0b, v1b, v2b, v3b, sems):
        t = pl.program_id(0)
        start = ranges_ref[t]
        end = ranges_ref[t + 1]

        tile_x = (t % num_tiles_x) * tile_w
        tile_y = (t // num_tiles_x) * tile_h

        # per-band flat pixel coordinates, laid out (1, band_p) to broadcast
        # against the (8, 1) per-group splat columns.  Bands are contiguous
        # row groups of the row-major tile, so band b covers flat pixels
        # [b*band_p, (b+1)*band_p).
        band_pix = []
        for b in range(n_bands):
            f = b * band_p + lax.broadcasted_iota(jnp.int32, (1, band_p), 1)
            if qform == "monomial":
                # TILE-LOCAL pixel-center coordinates (t-invariant: Mosaic
                # hoists them out of the grid).  Local coordinates bound the
                # f32 cancellation of the expanded quadratic form: every
                # monomial term stays O((extent/sigma)^2) <~ 2e3, so the
                # absolute error in `a` is <~ 1e-4 (alpha error <0.01%).
                xl = (f % tile_w).astype(jnp.float32) + 0.5
                yl = (f // tile_w).astype(jnp.float32) + 0.5
                # negated square monomials: na = ha*mx2 + hb*mxy + hc*my2
                # + c3*xl + c4*yl + c5 needs no coefficient negations
                band_pix.append((xl, yl, -(xl * xl), -(xl * yl), -(yl * yl)))
            else:
                band_pix.append(
                    (
                        (tile_x + f % tile_w).astype(jnp.float32) + 0.5,
                        (tile_y + f // tile_w).astype(jnp.float32) + 0.5,
                    )
                )
        if composite == "scan":
            # Hillis-Steele masks for the sublane prefix product (see
            # eval_groups); (GROUP, band_p) so jnp.where sees a full-shape
            # condition (loop-invariant — computed once per grid step).
            rows_bp = lax.broadcasted_iota(jnp.int32, (GROUP, band_p), 0)
            row0_bp = rows_bp == 0
            scan_masks = {sh: rows_bp >= sh for sh in (1, 2, 4)}

        chunk0 = lax.div(start, CHUNK)
        # EMPTY tiles must yield n_chunks == 0: with start == end at a non-
        # CHUNK-aligned position, ceil(end/C) - floor(start/C) is 1, and the
        # tile would WAIT for a first-chunk DMA its predecessor (whose
        # cross-tile prefetch is guarded by the true emptiness test
        # nend > nstart) never started — an unmatched semaphore wait that
        # hangs the core until the TPU watchdog kills the worker.  Dense
        # scenes have no empty tiles, which is how this survived bench runs.
        n_chunks = jnp.where(
            end > start, lax.div(end + CHUNK - 1, CHUNK) - chunk0, 0
        )

        # chunk-local sorted index of element (i, col p=8a+k): 128k + 8a + i
        g_lane = lax.broadcasted_iota(jnp.int32, (GROUP, 128), 1)
        g_sub = lax.broadcasted_iota(jnp.int32, (GROUP, 128), 0)
        chunk_local_idx = 128 * (g_lane % 8) + 8 * (g_lane // 8) + g_sub

        words_hbm = (w0_hbm, w1_hbm, w2_hbm, w3_hbm)
        vbufs = ((v0a, v1a, v2a, v3a), (v0b, v1b, v2b, v3b))

        def copies(slot, ci):
            # chunk ci of word i = the rank-1 slice [CHUNK*(chunk0+ci), +CHUNK)
            # of the flat sorted word (no host-side relayout: an XLA
            # (M,) -> (M/128, 128) reshape costs ~8 ms at bonsai scale).
            # slot is a PYTHON int: each (slot, word) buffer is its own
            # scratch ref — Mosaic cannot slice a stacked VMEM scratch below
            # its (4, 128) tile
            off = pl.multiple_of((chunk0 + ci) * CHUNK, CHUNK)
            return [
                pltpu.make_async_copy(
                    words_hbm[i].at[pl.ds(off, CHUNK)],
                    vbufs[slot][i],
                    sems.at[slot, i],
                )
                for i in range(4)
            ]

        # double-buffered DMA: chunk 0 is started before the loop; each body
        # waits on its own slot (parity ci%2), immediately starts the
        # prefetch of ci+1 into the other slot (guarded: only if it exists),
        # then decodes/blends while that DMA flies.  Slot parity is handled
        # with pl.when branches + a both-slot select, because the scratch
        # refs are statically indexed (Mosaic cannot dynamically slice a
        # stacked VMEM scratch below its tile).  On early exit (saturation)
        # one prefetch may be outstanding — drained after the loop so the
        # per-slot semaphores stay balanced across grid steps.
        def chunk_start(slot, ci):
            for c in copies(slot, ci):
                c.start()

        def chunk_wait(slot, ci):
            for c in copies(slot, ci):
                c.wait()

        # Cross-tile prefetch: every tile's first chunk is started at the END
        # of the previous grid step (scratch + semaphores persist across
        # steps), so only tile 0 pays the warm-up DMA latency — with ~2k
        # tiles, per-tile first-chunk stalls are a multi-ms cost otherwise.
        @pl.when(((t == 0) | (not cross_tile)) & (n_chunks > 0))
        def _warmup():
            chunk_start(0, 0)

        def chunk_body(carry):
            ci, crs, cgs, cbs, transs = carry
            s = ci % 2

            @pl.when(s == 0)
            def _w0():
                chunk_wait(0, ci)

            @pl.when(s == 1)
            def _w1():
                chunk_wait(1, ci)

            @pl.when((s == 0) & (ci + 1 < n_chunks))
            def _p1():
                chunk_start(1, ci + 1)

            @pl.when((s == 1) & (ci + 1 < n_chunks))
            def _p0():
                chunk_start(0, ci + 1)

            # ---- in-register relayout + vectorized decode ----
            def word(i):
                w = jnp.where(s == 0, vbufs[0][i][...], vbufs[1][i][...])
                return _gm_shuffle(w.reshape(8, 128))

            w0 = word(0)
            w1 = word(1)
            w2 = word(2)
            w3 = word(3)
            off = (chunk0 + ci) * CHUNK
            cx_g = (w0 & 0xFFFF).astype(jnp.int32).astype(jnp.float32) * (
                1.0 / cq.scale_x
            ) - cq.margin
            cy_g = (w0 >> 16).astype(jnp.int32).astype(jnp.float32) * (
                1.0 / cq.scale_y
            ) - cq.margin
            ha_g, hb_g, hc_g, op_g = _decode_conic_op(w1, w2)
            # RGB9E5 decode (packing.pack_rgb9e5): scale = 2^(e-24) built
            # directly in the f32 exponent field
            e9 = (w3 >> 27).astype(jnp.int32)
            scale9 = pltpu.bitcast(((e9 + 103) << 23).astype(jnp.uint32), jnp.float32)
            r_g = (w3 & 0x1FF).astype(jnp.int32).astype(jnp.float32) * scale9
            g_g = ((w3 >> 9) & 0x1FF).astype(jnp.int32).astype(jnp.float32) * scale9
            b_g = ((w3 >> 18) & 0x1FF).astype(jnp.int32).astype(jnp.float32) * scale9
            # span-edge masking folds into opacity
            idx = off + chunk_local_idx
            op_g = jnp.where((idx >= start) & (idx < end), op_g, 0.0)
            if qform == "monomial":
                # Expand a(d) around the TILE ORIGIN into 6 per-splat
                # coefficients against per-pixel monomials [X^2 XY Y^2 X Y 1]
                # (tile-local, see band_pix), and fold log(op) into the
                # constant term: alpha = exp(na') directly — the per-pixel
                # opacity multiply and the op>0 test disappear.  Dead lanes
                # (op == 0, incl. every uninitialized-garbage lane, which the
                # span mask above zeroed) get c5 = t5 = -inf, so na' is -inf
                # or NaN and the discard comparison below rejects them.
                # ~17 (8,128) ops once per chunk, amortized over 128 groups.
                u = cx_g - tile_x.astype(jnp.float32)
                v = cy_g - tile_y.astype(jnp.float32)
                hbv = hb_g * v
                c3_g = (ha_g + ha_g) * u + hbv
                c4_g = hb_g * u + (hc_g + hc_g) * v
                a0 = (ha_g * u + hbv) * u + hc_g * (v * v)
                logop = jnp.log(op_g)  # log(0) = -inf for dead lanes
                c5_g = logop - a0
                t5_g = logop - jnp.float32(2.0 * CUTOFF)
            else:
                # negated conic: alpha needs exp(-a); folding the sign into
                # the per-chunk coefficients saves a per-(group, pixel)
                # negation
                nha_g = -ha_g
                nhb_g = -hb_g
                nhc_g = -hc_g

            # ---- per-group y-extent bounds (for band skipping) ----
            # ellipse {a(d) <= 2*CUTOFF} of the form a = ha dx^2 + hb dxdy +
            # hc dy^2 has max |dy| = sqrt(2*CUTOFF * ha / (ha*hc - hb^2/4)).
            # Degenerate / non-PSD decodes (possible only for garbage lanes,
            # which carry op=0, or f16-subnormal giants) fall back to an
            # always-live range; comparisons are written NaN-safe (a NaN
            # fails `>`, selecting the conservative branch).
            det_q = ha_g * hc_g - 0.25 * hb_g * hb_g
            pos_def = (det_q > 1e-30) & (ha_g > 0.0)
            ey_g = jnp.sqrt(
                jnp.maximum(2.0 * CUTOFF * ha_g, 0.0)
                / jnp.maximum(det_q, 1e-30)
            )
            live_l = op_g > 0.0
            big_f = jnp.float32(3.0e38)
            ymin_l = jnp.where(
                live_l, jnp.where(pos_def, cy_g - ey_g, -big_f), big_f
            )
            ymax_l = jnp.where(
                live_l, jnp.where(pos_def, cy_g + ey_g, big_f), -big_f
            )
            # butterfly min/max over the 8 sublanes: every sublane of a
            # column ends up holding its GROUP's y-range
            gmin, gmax = ymin_l, ymax_l
            for sh in (4, 2, 1):
                gmin = jnp.minimum(gmin, pltpu.roll(gmin, shift=sh, axis=0))
                gmax = jnp.maximum(gmax, pltpu.roll(gmax, shift=sh, axis=0))

            # ---- blend groups in depth order ----
            # GROUP_BATCH groups are evaluated TOGETHER with their
            # instruction streams interleaved step-by-step; only the final
            # carry update (a few (1, band_p) ops per group) is serial.
            def eval_groups(cols, state, pix):
                cr, cg, cb, trans = state
                nb = len(cols)
                sls = [(lambda x, pc=pc: x[:, pc : pc + 1]) for pc in cols]
                if qform == "monomial":
                    xl, yl, mx2, mxy, my2 = pix
                    # na' = -a + log(op): per-splat 6-coefficient dot with
                    # the per-tile monomials (6 broadcast fmas)
                    na = [
                        s(ha_g) * mx2
                        + s(hb_g) * mxy
                        + s(hc_g) * my2
                        + s(c3_g) * xl
                        + s(c4_g) * yl
                        + s(c5_g)
                        for s in sls
                    ]
                    # discard: na' > log(op) - 2*CUTOFF <=> a < 2*CUTOFF.
                    # Dead/garbage lanes have t5 = -inf and na' in {-inf,
                    # NaN} (see the c5 fold above), so the comparison —
                    # written to reject NaN — kills them; exp(na') <= ~1 by
                    # construction (a >= 0 up to f32 rounding), min(0.99, .)
                    # bounds the rest exactly like the direct form.
                    alpha = [
                        jnp.where(
                            na[k] > s(t5_g),
                            jnp.minimum(0.99, jnp.exp(na[k])),
                            0.0,
                        )
                        for k, s in enumerate(sls)
                    ]
                else:
                    pix_x, pix_y = pix
                    dx = [pix_x - s(cx_g) for s in sls]
                    dy = [pix_y - s(cy_g) for s in sls]
                    # na = -a (negated quadratic form, coefficients
                    # pre-negated per chunk)
                    na = [
                        s(nha_g) * dx[k] * dx[k]
                        + s(nhb_g) * dx[k] * dy[k]
                        + s(nhc_g) * dy[k] * dy[k]
                        for k, s in enumerate(sls)
                    ]
                    # mask-first (reference discard, gaussian.wgsl:59-67)
                    # with the comparison written to REJECT NaN/inf `a`:
                    # sentinel and chunk-over-read lanes may carry
                    # uninitialized payload bits whose decoded conic is
                    # non-PSD or NaN — exp(-a) can be inf, and inf*0 or
                    # min(0.99, NaN) would poison the whole tile.  The min
                    # also bounds slightly-non-PSD f16-rounded conics whose
                    # na grows POSITIVE with distance — do not fold it into
                    # op_g.
                    alpha = [
                        jnp.where(
                            (na[k] > -2.0 * CUTOFF) & (s(op_g) > 0.0),
                            jnp.minimum(0.99, jnp.exp(na[k]) * s(op_g)),
                            0.0,
                        )
                        for k, s in enumerate(sls)
                    ]
                if composite == "scan":
                    # Exclusive prefix product of (1 - alpha) along the 8
                    # sublanes (masked Hillis-Steele), one stream per group
                    # instead of the tree's four:  w_k = alpha_k * T<k are
                    # the group-local over weights; colors accumulate into
                    # the (8, P) per-band accumulators (reduced across
                    # sublanes ONCE per tile), so the only serial carry is
                    # the (1, P) tile transmittance.
                    t_l = [1.0 - alpha[k] for k in range(nb)]
                    tp = [
                        jnp.where(
                            row0_bp, 1.0, pltpu.roll(t, shift=1, axis=0)
                        )
                        for t in t_l
                    ]
                    for sh in (1, 2, 4):
                        tp = [
                            p
                            * jnp.where(
                                scan_masks[sh],
                                pltpu.roll(p, shift=sh, axis=0),
                                1.0,
                            )
                            for p in tp
                        ]
                    w = [alpha[k] * tp[k] for k in range(nb)]
                    # group transmittance: inclusive prefix at row 7,
                    # extracted via roll (sublane slices only at offset 0)
                    tot = [
                        pltpu.roll(tp[k] * t_l[k], shift=1, axis=0)[0:1, :]
                        for k in range(nb)
                    ]
                    if batch_tree and nb > 1:
                        # Cross-group transmittance prefix TREE: the serial
                        # dependence chain through `trans` was one (1, P)
                        # multiply per group — ~224k dependent 8-vreg ops per
                        # frame at bonsai scale, a pure latency wall that
                        # P-size changes cannot touch (and the measured
                        # reason raster time barely moved between 512- and
                        # 1024-px tiles).  Here the batch's group totals are
                        # prefix-multiplied independently of `trans`
                        # (Hillis-Steele over the nb-list, depth log2(nb)),
                        # so the cross-batch chain is ONE multiply per batch:
                        # trans' = trans * inclusive[nb-1].
                        inc = list(tot)
                        sh = 1
                        while sh < nb:
                            inc = [
                                inc[k] if k < sh else inc[k - sh] * inc[k]
                                for k in range(nb)
                            ]
                            sh *= 2
                        t_k = [trans] + [trans * inc[k] for k in range(nb - 1)]
                        for k, s in enumerate(sls):
                            tw = w[k] * t_k[k]
                            cr = cr + tw * s(r_g)
                            cg = cg + tw * s(g_g)
                            cb = cb + tw * s(b_g)
                        trans = trans * inc[nb - 1]
                        return cr, cg, cb, trans
                    # serial pass: weights scaled by the running tile
                    # transmittance (the chain is one (1, P) mul per group)
                    for k, s in enumerate(sls):
                        tw = w[k] * trans
                        cr = cr + tw * s(r_g)
                        cg = cg + tw * s(g_g)
                        cb = cb + tw * s(b_g)
                        trans = trans * tot[k]
                    return cr, cg, cb, trans
                # pairwise over-composite up the 8 splat rows (log tree):
                # after 3 levels row 0 holds the whole group's premultiplied
                # color and transmittance
                c_r = [alpha[k] * s(r_g) for k, s in enumerate(sls)]
                c_g = [alpha[k] * s(g_g) for k, s in enumerate(sls)]
                c_b = [alpha[k] * s(b_g) for k, s in enumerate(sls)]
                t_l = [1.0 - alpha[k] for k in range(nb)]
                for k_shift in (1, 2, 4):
                    roll = functools.partial(
                        pltpu.roll, shift=GROUP - k_shift, axis=0
                    )
                    rolled_r = [roll(c) for c in c_r]
                    rolled_g = [roll(c) for c in c_g]
                    rolled_b = [roll(c) for c in c_b]
                    rolled_t = [roll(t) for t in t_l]
                    c_r = [c_r[k] + t_l[k] * rolled_r[k] for k in range(nb)]
                    c_g = [c_g[k] + t_l[k] * rolled_g[k] for k in range(nb)]
                    c_b = [c_b[k] + t_l[k] * rolled_b[k] for k in range(nb)]
                    t_l = [t_l[k] * rolled_t[k] for k in range(nb)]
                row0 = lambda x: x[0:1, :]
                # serial carry across the batch (cheap (1, P) ops)
                for k in range(nb):
                    cr = cr + trans * row0(c_r[k])
                    cg = cg + trans * row0(c_g[k])
                    cb = cb + trans * row0(c_b[k])
                    trans = trans * row0(t_l[k])
                return cr, cg, cb, trans

            band_states = [
                (crs[b], cgs[b], cbs[b], transs[b]) for b in range(n_bands)
            ]
            # depth order over the permuted columns: k-major, a-minor; for
            # each segment, each band is evaluated only when some splat in
            # the segment can reach the band's pixel-row range
            for k0 in range(0, 8, seg_k):
                cols = [8 * a + k for k in range(k0, k0 + seg_k) for a in range(16)]
                m = (g_lane % 8 >= k0) & (g_lane % 8 < k0 + seg_k)
                for b in range(n_bands):
                    def eval_segment(st, cols=cols, b=b):
                        s_ = st
                        for c0 in range(0, len(cols), group_batch):
                            s_ = eval_groups(
                                cols[c0 : c0 + group_batch], s_, band_pix[b]
                            )
                        return s_

                    if group_skip:
                        band_lo = (tile_y + b * band_rows).astype(jnp.float32) + 0.5
                        band_hi = band_lo + (band_rows - 1)
                        reach = m & (gmin <= band_hi) & (gmax >= band_lo)
                        live = jnp.max(jnp.where(reach, op_g, 0.0))
                        go = live > 0.0
                        if eps > 0.0:
                            # segment-level saturation exit: the chunk loop
                            # only re-checks transmittance at chunk (1024-
                            # splat) boundaries; heavy-overdraw tiles
                            # saturate mid-chunk and every later segment's
                            # blend would be discarded at eps anyway (same
                            # up-to-eps argument as the chunk early-out)
                            go = go & (jnp.max(band_states[b][3]) > eps)
                        band_states[b] = lax.cond(
                            go, eval_segment, lambda st: st, band_states[b]
                        )
                    else:
                        band_states[b] = eval_segment(band_states[b])
            return (
                ci + 1,
                tuple(st[0] for st in band_states),
                tuple(st[1] for st in band_states),
                tuple(st[2] for st in band_states),
                tuple(st[3] for st in band_states),
            )

        def chunk_cond(carry):
            ci, _, _, _, transs = carry
            t_max = transs[0]
            for b in range(1, n_bands):
                t_max = jnp.maximum(t_max, transs[b])
            return jnp.logical_and(ci < n_chunks, jnp.max(t_max) > eps)

        # scan composite carries (GROUP, band_p) channel accumulators
        # (reduced across sublanes once per tile, below); tree carries the
        # already-composited (1, band_p) rows
        acc_rows = GROUP if composite == "scan" else 1
        zero = jnp.zeros((acc_rows, band_p), jnp.float32)
        one = jnp.ones((1, band_p), jnp.float32)
        ci_f, crs, cgs, cbs, transs = lax.while_loop(
            chunk_cond,
            chunk_body,
            (
                jnp.int32(0),
                (zero,) * n_bands,
                (zero,) * n_bands,
                (zero,) * n_bands,
                (one,) * n_bands,
            ),
        )
        if composite == "scan":
            crs = tuple(jnp.sum(c, axis=0, keepdims=True) for c in crs)
            cgs = tuple(jnp.sum(c, axis=0, keepdims=True) for c in cgs)
            cbs = tuple(jnp.sum(c, axis=0, keepdims=True) for c in cbs)
        cr = jnp.concatenate(crs, axis=1) if n_bands > 1 else crs[0]
        cg = jnp.concatenate(cgs, axis=1) if n_bands > 1 else cgs[0]
        cb = jnp.concatenate(cbs, axis=1) if n_bands > 1 else cbs[0]
        trans = jnp.concatenate(transs, axis=1) if n_bands > 1 else transs[0]

        # drain the prefetch left in flight by a saturation early-exit
        # (exhaustion exits start no prefetch: the ci+1 < n_chunks guard)
        @pl.when((ci_f < n_chunks) & (ci_f % 2 == 0))
        def _d0():
            chunk_wait(0, ci_f)

        @pl.when((ci_f < n_chunks) & (ci_f % 2 == 1))
        def _d1():
            chunk_wait(1, ci_f)

        # start the NEXT tile's first chunk (slot 0) before this grid step
        # ends; its loop's first wait consumes it (see _warmup note)
        num_t = pl.num_programs(0)

        @pl.when((t + 1 < num_t) & cross_tile)
        def _next_tile():
            nstart = ranges_ref[t + 1]
            nend = ranges_ref[t + 2]

            @pl.when(nend > nstart)
            def _():
                noff = pl.multiple_of(
                    lax.div(nstart, CHUNK) * CHUNK, CHUNK
                )
                for i in range(4):
                    pltpu.make_async_copy(
                        words_hbm[i].at[pl.ds(noff, CHUNK)],
                        vbufs[0][i],
                        sems.at[0, i],
                    ).start()
        out_ref[0, 0] = cr.reshape(sub, 128)
        out_ref[0, 1] = cg.reshape(sub, 128)
        out_ref[0, 2] = cb.reshape(sub, 128)
        out_ref[0, 3] = trans.reshape(sub, 128)

    return kernel


@functools.partial(jax.jit, static_argnames=("width", "height", "config", "interpret"))
def rasterize_pallas(
    sorted_payload,
    ranges: jnp.ndarray,
    background: jnp.ndarray,
    *,
    width: int,
    height: int,
    config: RasterConfig,
    interpret: bool = False,
):
    """-> (H, W, 3) f32 image from sorted packed instances + tile ranges."""
    tw, th = config.tile_w, config.tile_h
    if (tw * th) % 128 != 0:
        raise ValueError("tile_w * tile_h must be a multiple of 128")
    bands = max(1, int(config.y_bands))
    # Off-TPU the kernel runs through the interpreter as one giant unrolled
    # XLA program; banding multiplies the unrolled blend code by y_bands and
    # the XLA CPU compile time becomes minutes.  Auto-interpret traces clamp
    # to 1 band (bit-identical output — banding only skips zero-contribution
    # work); explicit interpret=True (kernel unit tests) honors y_bands.
    if bands > 1 and not interpret and jax.default_backend() != "tpu":
        bands = 1
    if th % bands != 0 or (tw * th // bands) % 128 != 0:
        raise ValueError(
            "y_bands must divide tile_h with (tile_w*tile_h/y_bands) % 128 == 0"
        )
    tx_tiles, ty_tiles = config.tiles_for(width, height)
    num_tiles = tx_tiles * ty_tiles
    cq = packing.CenterQuant.for_viewport(width, height)
    sub = (tw * th) // 128

    # Each record word stays the flat (M,) array the sort produced; the
    # kernel DMAs rank-1 CHUNK slices (1024-aligned, tile-exact).  Earlier
    # designs stacked the words into one (8, M) matrix (~7 ms of pure
    # relayout at bonsai scale + 2x DMA traffic from the 4 dead pad rows) or
    # reshaped each word to (M/128, 128) (~8 ms: XLA's rank-1 layout is not
    # sublane-tiled).  The group-major relayout happens inside the kernel,
    # in registers.
    m_len = sorted_payload[0].shape[0]
    if m_len % CHUNK != 0:
        raise ValueError("instance stream length must be a chunk multiple")
    words = list(sorted_payload)

    kernel = _make_kernel(
        num_tiles_x=tx_tiles,
        tile_w=tw,
        tile_h=th,
        eps=config.transmittance_eps,
        cq=cq,
        group_skip=config.group_skip,
        seg_k=config.seg_k,
        group_batch=config.group_batch,
        y_bands=bands,
        composite=config.composite,
        qform=config.qform,
        mxu_precision=config.mxu_precision,
        batch_tree=config.scan_batch_tree,
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4,
        out_specs=pl.BlockSpec(
            (1, 4, sub, 128), lambda t, ranges: (t, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((CHUNK,), jnp.uint32)] * 8 + [
            pltpu.SemaphoreType.DMA((2, 4)),
        ],
    )

    interp = pltpu.InterpretParams() if (interpret or jax.default_backend() != "tpu") else False
    tiles = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_tiles, 4, sub, 128), jnp.float32),
        interpret=interp,
    )(ranges, *words)

    # reassemble tiles -> image, composite background over final transmittance
    img = tiles.reshape(ty_tiles, tx_tiles, 4, th, tw)
    img = img.transpose(0, 3, 1, 4, 2).reshape(ty_tiles * th, tx_tiles * tw, 4)
    img = img[:height, :width]
    return img[:, :, :3] + img[:, :, 3:4] * background[None, None, :]
