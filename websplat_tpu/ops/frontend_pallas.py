"""Fully-fused frame frontend (Pallas TPU): preprocess + slot emission +
stream compaction in ONE kernel pass over the cloud.

This is the TPU-native equivalent of the reference's single preprocess
dispatch (/root/reference/src/shaders/preprocess.wgsl:163-280), which does
all the per-Gaussian math AND the atomic stream compaction in one kernel.
Here the math is ops/preprocess.py's ``core_math`` (single source of truth,
shape-agnostic) evaluated on (ROWS, 128) register blocks, and the atomic
counter is replaced by a RUNNING CURSOR in SMEM: the Pallas grid is
sequential, so the kernel itself accumulates per-(step, slot) output
offsets — no XLA phase-1 offsets pass, no per-splat intermediate arrays in
HBM at all.  Inputs are the raw cloud rows; outputs are the compacted
(key, 4-word record) instance stream ready for the sort.

Compaction machinery (flat-order rolls, monotone shuffle, ordered-overlap
DMA protocol) is shared with ops/emit_compact_pallas.py, which remains the
standalone two-kernel path (used when preprocess must run in XLA, e.g. the
oracle-comparison tests and CPU fallbacks).
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from websplat_tpu.config import RasterConfig
from websplat_tpu.ops.preprocess import DeviceCloud, CameraParams, DeviceSettings, core_math, iter_slots, pack_rect4, scalars_from_pytrees

INVALID_KEY = np.uint32(0xFFFFFFFF)

# Profiling decomposition only (scripts/, never production): "math" stops the
# kernel after core_math (outputs kept live via an SMEM checksum), "keys"
# additionally walks the slots and builds keys but skips compaction + DMA.
# frontend(full) - frontend(keys) = the compaction/staging/write cost.
# A leaked ablate var silently turns the production frontend into a no-emit
# checksum kernel (blank frames, zero instances), so it WARNS loudly.
_FRONT_ABLATE = os.environ.get("WS_FRONT_ABLATE", "")
if _FRONT_ABLATE:
    import warnings

    warnings.warn(
        f"WS_FRONT_ABLATE={_FRONT_ABLATE!r} is set: the fused frontend will "
        "emit NO instances (profiling ablation mode — blank frames). Unset "
        "it unless you are running scripts/profile_stages.py decomposition.",
        stacklevel=1,
    )

SPLATS = 16384  # splats per grid step ((128, 128) view); VMEM-bounded:
# 34 input blocks x 64 KB x 2 (pipeline) + staging + math temporaries
ROWS = SPLATS // 128
N_FAT = 34  # attribute rows per splat: 3 xyz + 6 cov + 1 opacity + 24 sh


def build_fat_stream(xyz, cov, opacity, sh) -> np.ndarray:
    """Interleave the 34 column-major cloud rows into the fused frontend's
    single-DMA-stream layout: (n_steps, 34, SPLATS) row-major, flattened.

    Host-side numpy, run once at upload (renderer.upload_cloud).  Padding
    matches fused_frontend's per-row convention exactly (positions +3e38 so
    the frustum test culls pad splats; everything else zero), so the kernel's
    math is bit-identical between the fat and 34-stream paths.
    """
    n = int(opacity.shape[0])
    n_pad = -(-n // SPLATS) * SPLATS
    n_steps = n_pad // SPLATS
    out = np.empty((n_steps, N_FAT, SPLATS), np.uint32)

    def put(i, row, fill, dtype):
        buf = np.full((n_pad,), fill, dtype)
        buf[:n] = np.asarray(row, dtype)
        out[:, i, :] = buf.view(np.uint32).reshape(n_steps, SPLATS)

    for i in range(3):
        put(i, xyz[i], 3.0e38, np.float32)
    for i in range(6):
        put(3 + i, cov[i], 0.0, np.float32)
    put(9, opacity, 0.0, np.float32)
    for i in range(24):
        put(10 + i, sh[i], 0, np.uint32)
    return out.reshape(-1)
LOG2 = int(np.log2(SPLATS))
ALIGN = 1024  # rank-1 HBM slice offsets must be (8,128)-tile aligned
# Staged write = one compacted unit plus the sub-ALIGN carry tile prepended
# (exact-cursor protocol, see _write in the kernel).
STAGE = SPLATS + ALIGN
SROWS = STAGE // 128
CARRY_ROWS = ALIGN // 128


def _flat_roll(x, k: int):
    """out[p] = x[(p - k) mod SPLATS] over the flat row-major order of a
    (ROWS, 128) block (sublane roll + lane roll + one-row carry)."""
    a, b = divmod(k % SPLATS, 128)
    y = pltpu.roll(x, shift=a, axis=0) if a else x
    if b == 0:
        return y
    z = pltpu.roll(y, shift=b, axis=1)
    w = pltpu.roll(z, shift=1, axis=0)
    lane = lax.broadcasted_iota(jnp.int32, (ROWS, 128), 1)
    return jnp.where(lane < b, w, z)


def _flat_roll_dyn(x, r, rows):
    """Flat roll RIGHT by a TRACED r in [0, ALIGN) over a (rows, 128) block:
    sublane-roll(r // 128) + lane-roll(r % 128) + one-row carry select
    (tpu.DynamicRotate handles traced shift amounts)."""
    a = r // 128
    b = lax.rem(r, 128)
    y = pltpu.roll(x, shift=a, axis=0)
    z = pltpu.roll(y, shift=b, axis=1)
    w = pltpu.roll(z, shift=1, axis=0)
    lane = lax.broadcasted_iota(jnp.int32, (rows, 128), 1)
    return jnp.where(lane < b, w, z)


def _make_kernel(
    *,
    slots: int,
    tx_tiles: int,
    depth_bits: int,
    capacity_pad: int,
    n_steps: int,
    width: int,
    height: int,
    config: RasterConfig,
    compressed: bool,
    capacity_c_pad: int = 0,
    fat_input: bool = False,
):
    # capacity_c_pad > 0 adds a compacted 6-WORD clamped-splat stream
    # (rect4, w0..w3, depth_q) for CLAMPED splats (visible & n_rect > slots),
    # written by its own exact-cursor writer.  The renderer's overflow pass
    # decodes these rows directly — no cloud re-gather, no core_math re-run
    # (see ops/preprocess.py:overflow_emit) — and emits the remaining rect
    # tiles (row-major ranks >= slots), restoring the reference's unbounded
    # per-splat coverage (gaussian.wgsl:47-53) at ~1%-of-splats cost.
    with_cid = capacity_c_pad > 0
    CID_W = 6  # words per clamped-splat row

    n_in = 1 if fat_input else 34

    def kernel(scal_ref, *refs):
        # refs layout: n_in inputs (1 fat stream or 34 attribute rows);
        # outputs (5 stream + stats [+ 6 cid]); scratch (5+6 staged,
        # 5+6 carry, sems, smem)
        ins = refs[:n_in]
        n_out = 6 + (CID_W if with_cid else 0)
        keys_out, o0, o1, o2, o3, stats_out = refs[n_in : n_in + 6]
        cid_outs = (
            refs[n_in + 6 : n_in + 6 + CID_W] if with_cid else None
        )
        sc = n_in + n_out
        n_st = 5 + (CID_W if with_cid else 0)
        stages_all = refs[sc : sc + n_st]
        carries_all = refs[sc + n_st : sc + 2 * n_st]
        sems, state = refs[sc + 2 * n_st :]
        outs = (keys_out, o0, o1, o2, o3)
        stages = stages_all[:5]
        carries = carries_all[:5]

        s = pl.program_id(0)

        @pl.when(s == 0)
        def _init():
            for i in range(6):
                state[i] = 0

        if fat_input:
            # one interleaved block: attribute row i of this grid step is the
            # rank-1 slice [i*SPLATS, (i+1)*SPLATS) of the fat block (static
            # 1024-aligned offsets; the (SPLATS,) <-> (ROWS, 128) reshape is
            # layout-identity).  f32 rows decode by vector bitcast.
            fat_ref = ins[0]

            def stream_u32(i):
                return fat_ref[i * SPLATS : (i + 1) * SPLATS].reshape(
                    ROWS, 128
                )

            def stream_f32(i):
                return pltpu.bitcast(stream_u32(i), jnp.float32)

            pos = (stream_f32(0), stream_f32(1), stream_f32(2))
            cov6 = tuple(stream_f32(3 + i) for i in range(6))
            opacity = stream_f32(9)
            sh_rows = tuple(stream_u32(10 + i) for i in range(24))
        else:

            def block(r):
                return r[...].reshape(ROWS, 128)

            pos = (block(ins[0]), block(ins[1]), block(ins[2]))
            cov6 = tuple(block(ins[3 + i]) for i in range(6))
            opacity = block(ins[9])
            sh_rows = tuple(block(ins[10 + i]) for i in range(24))

        view = tuple(tuple(scal_ref[4 * i + j] for j in range(4)) for i in range(4))
        proj = tuple(
            tuple(scal_ref[16 + 4 * i + j] for j in range(4)) for i in range(4)
        )
        cam_pos = tuple(scal_ref[32 + i] for i in range(3))
        focal = (scal_ref[35], scal_ref[36])
        stt = dict(
            cb_min=tuple(scal_ref[37 + i] for i in range(3)),
            cb_max=tuple(scal_ref[40 + i] for i in range(3)),
            center=tuple(scal_ref[43 + i] for i in range(3)),
            gaussian_scaling=scal_ref[46],
            kernel=scal_ref[47],
            walltime=scal_ref[48],
            extend=scal_ref[49],
            mip=scal_ref[50] > 0.5,
            max_sh_deg=scal_ref[51],
        )

        d = core_math(
            pos, cov6, opacity, sh_rows, view, proj, cam_pos, focal, stt,
            width=width, height=height, config=config, compressed=compressed,
        )
        words = d["words"]
        depth_q = d["depth_q"]
        visible = d["visible"]

        state[2] = state[2] + jnp.sum(visible.astype(jnp.int32))
        state[3] = state[3] + jnp.sum(
            (visible & (d["n_rect"] > slots)).astype(jnp.int32)
        )

        lane = lax.broadcasted_iota(jnp.int32, (ROWS, 128), 1)
        row = lax.broadcasted_iota(jnp.int32, (ROWS, 128), 0)
        flat_pos = row * 128 + lane

        # (SROWS, 128) iotas for the carry-merge select
        s_lane = lax.broadcasted_iota(jnp.int32, (SROWS, 128), 1)
        s_row = lax.broadcasted_iota(jnp.int32, (SROWS, 128), 0)
        s_flat = s_row * 128 + s_lane

        def compact_block(ok, arrs):
            """Monotone-shuffle compaction of (ROWS, 128) u32 arrays by the
            int32 0/1 mask ``ok`` (flat row-major order).  arrs[0] is the
            key; positions past the valid count are NOT masked here."""
            inv = 1 - ok
            pre = inv
            for i in range(LOG2):
                k = 1 << i
                pre = pre + jnp.where(flat_pos >= k, _flat_roll(pre, k), 0)
            shift = (pre - inv).astype(jnp.uint32)
            work = [shift] + list(arrs)
            for i in range(LOG2):
                k = 1 << i
                rolled = [_flat_roll(a, SPLATS - k) for a in work]
                arrives = (rolled[0] & np.uint32(k)) != 0
                work = [jnp.where(arrives, r, a) for r, a in zip(rolled, work)]
            return tuple(work[1:])

        def stream_write(vals, cnt, fills, *, st, ca, out_refs, sem0,
                         cursor_idx, cap_pad):
            """EXACT-cursor ordered-overlap stream append.  The stream cursor
            advances by exactly cnt (no ALIGN rounding): the staged write is
            [carry-tile | compacted unit] placed at the ALIGN-floored cursor,
            where the carry tile re-writes the partial last tile of the
            stream so far.  DMA completion must stay ORDERED per word
            (wait-before-overwrite), and the sub-ALIGN tail of each write is
            carried in VMEM to be prepended to the next unit."""
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

            # new carry = the partial tile at the advanced cursor
            stage_len = carry_len + cnt
            advance = stage_len - lax.rem(stage_len, ALIGN)
            adv_c = pl.multiple_of(jnp.minimum(advance, SPLATS), ALIGN)
            for w in range(nw):
                ca[w][...] = st[w][pl.ds(adv_c, ALIGN)]
            for w in range(nw):
                dma(w).start()

            state[cursor_idx] = total + cnt

        if _FRONT_ABLATE:
            chk = depth_q
            for w in words:
                chk = chk + w
            chk = (
                chk
                + d["tx0"].astype(jnp.uint32)
                + d["ty0"].astype(jnp.uint32)
                + d["n_rect"].astype(jnp.uint32)
            )
            if _FRONT_ABLATE == "keys":
                for j, slot_ok, tile in iter_slots(
                    d, slots, tx_tiles, center_out=not with_cid
                ):
                    key = jnp.where(
                        slot_ok,
                        (tile.astype(jnp.uint32) << np.uint32(depth_bits))
                        | depth_q,
                        jnp.uint32(INVALID_KEY),
                    )
                    state[1] = state[1] + jnp.sum(slot_ok.astype(jnp.int32))
                    chk = chk + key
            state[3] = state[3] + jnp.sum(chk.astype(jnp.int32))

        for j, slot_ok, tile in (
            iter_slots(d, slots, tx_tiles, center_out=not with_cid)
            if not _FRONT_ABLATE
            else ()
        ):
            ok = slot_ok.astype(jnp.int32)
            key = jnp.where(
                slot_ok,
                (tile.astype(jnp.uint32) << np.uint32(depth_bits)) | depth_q,
                jnp.uint32(INVALID_KEY),
            )
            cnt = jnp.sum(ok)

            def do_shuffle(key=key, ok=ok, cnt=cnt):
                arrs = compact_block(ok, [key] + list(words))
                key_c = jnp.where(
                    flat_pos >= cnt, jnp.uint32(INVALID_KEY), arrs[0]
                )
                return (key_c,) + tuple(arrs[1:])

            def no_shuffle():
                return (jnp.full((ROWS, 128), INVALID_KEY, jnp.uint32),) + tuple(
                    jnp.zeros((ROWS, 128), jnp.uint32) for _ in range(4)
                )

            vals = lax.cond(cnt > 0, do_shuffle, no_shuffle)

            @pl.when(cnt > 0)
            def _write():
                stream_write(
                    vals, cnt, (jnp.uint32(INVALID_KEY),) + (jnp.uint32(0),) * 4,
                    st=stages, ca=carries, out_refs=outs, sem0=0,
                    cursor_idx=0, cap_pad=capacity_pad,
                )
                state[1] = state[1] + cnt

        if with_cid and not _FRONT_ABLATE:
            # clamped-splat record stream: (rect4, w0..w3, depth_q) of every
            # visible splat whose rect exceeds the slot budget, compacted
            # exactly like the instance stream (6-word units, own
            # cursor/sems).  rect4's 0xFFFFFFFF sentinel self-masks in the
            # overflow decode (n_rect == 1), so no separate validity word.
            cid_mask = d["visible"] & (d["n_rect"] > slots)
            cid_ok = cid_mask.astype(jnp.int32)
            rect4 = pack_rect4(d["tx0"], d["ty0"], d["tx1"], d["ty1"])
            rect_key = jnp.where(cid_mask, rect4, jnp.uint32(INVALID_KEY))
            cid_cnt = jnp.sum(cid_ok)

            def cid_shuffle(rect_key=rect_key, cid_ok=cid_ok, cid_cnt=cid_cnt):
                arrs = compact_block(
                    cid_ok, [rect_key] + list(words) + [depth_q]
                )
                rect_c = jnp.where(
                    flat_pos >= cid_cnt, jnp.uint32(INVALID_KEY), arrs[0]
                )
                return (rect_c,) + tuple(arrs[1:])

            def cid_none():
                return (
                    jnp.full((ROWS, 128), INVALID_KEY, jnp.uint32),
                ) + tuple(
                    jnp.zeros((ROWS, 128), jnp.uint32) for _ in range(CID_W - 1)
                )

            cid_vals = lax.cond(cid_cnt > 0, cid_shuffle, cid_none)

            @pl.when(cid_cnt > 0)
            def _write_cid():
                stream_write(
                    cid_vals, cid_cnt,
                    (jnp.uint32(INVALID_KEY),) + (jnp.uint32(0),) * (CID_W - 1),
                    st=stages_all[5:], ca=carries_all[5:],
                    out_refs=cid_outs, sem0=5,
                    cursor_idx=4, cap_pad=capacity_c_pad,
                )

        @pl.when(s == n_steps - 1)
        def _finish():
            final_cursor = state[0]

            @pl.when(final_cursor > 0)
            def _drain():
                # a wait only decrements the semaphore; the descriptor's
                # offset is irrelevant, any valid aligned slice works
                for w in range(5):
                    pltpu.make_async_copy(
                        stages[w],
                        outs[w].at[pl.ds(jnp.int32(0), STAGE)],
                        sems.at[w],
                    ).wait()

            if with_cid:

                @pl.when(state[4] > 0)
                def _drain_cid():
                    for w in range(CID_W):
                        pltpu.make_async_copy(
                            stages_all[5 + w],
                            cid_outs[w].at[pl.ds(jnp.int32(0), STAGE)],
                            sems.at[5 + w],
                        ).wait()

            li = lax.broadcasted_iota(jnp.int32, (1, 128), 1)
            stats = jnp.where(
                li == 0,
                state[0],
                jnp.where(
                    li == 1,
                    state[1],
                    jnp.where(
                        li == 2,
                        state[2],
                        jnp.where(
                            li == 3,
                            state[3],
                            jnp.where(li == 4, state[4], 0),
                        ),
                    ),
                ),
            )
            stats_out[...] = stats

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "width", "height", "config", "compressed", "capacity", "capacity_c",
        "splice_pad", "interpret"
    ),
)
def fused_frontend(
    cloud: DeviceCloud,
    camera: CameraParams,
    settings: DeviceSettings,
    *,
    width: int,
    height: int,
    config: RasterConfig,
    compressed: bool = False,
    capacity: int,
    capacity_c: int = 0,
    splice_pad: int = 0,
    interpret: bool = False,
):
    """cloud -> (keys, payload4, num_visible, num_clamped, num_valid,
    num_dropped): the whole frame frontend in one kernel launch.

    capacity_c > 0 additionally returns (cid_words, num_clamped_ids):
    a compacted 6-word-per-row stream (rect4, w0..w3, depth_q) of clamped
    splats (rect4 == 0xFFFFFFFF sentinel tail), consumed directly by the
    renderer's overflow pass (ops/preprocess.py:overflow_emit).

    ``splice_pad`` (static) extends the five stream outputs by that many
    rows of headroom the kernel never writes, so the renderer's overflow
    splice is a pure in-place dynamic_update_slice — without it the splice
    pays jnp.concatenate's full-stream copy (~0.5 ms x 5 words at bonsai
    scale).  Keys in the headroom are sentinel-masked here; payload
    headroom stays uninitialized, which the rasterizer already tolerates
    anywhere past the last valid instance (span masks are written to
    reject NaN/garbage decodes — see rasterize_pallas.py)."""
    n = cloud.opacity.shape[0]
    slots = config.tile_slots
    tx_tiles, ty_tiles = config.tiles_for(width, height)
    _, depth_bits = config.key_bits(width, height)
    if tx_tiles > 127 or ty_tiles > 127 or slots > 16:
        raise ValueError("fused frontend limits: <=127 tiles per axis, <=16 slots")

    n_pad = -(-n // SPLATS) * SPLATS
    n_steps = n_pad // SPLATS
    # exact-cursor protocol: `capacity` counts real instances with NO
    # per-unit align padding; the array only needs one STAGE of headroom for
    # the clamped last write
    limit = capacity
    capacity_pad = -(-limit // ALIGN) * ALIGN + STAGE

    # single interleaved input stream when the cloud carries the upload-time
    # relayout (build_fat_stream); otherwise 34 per-attribute streams padded
    # per-frame.  Identical bits either way — the kernel only differs in how
    # the grid pipeline delivers them (1 DMA stream vs 34).
    use_fat = (
        cloud.fat is not None
        and cloud.fat.shape[0] == n_steps * N_FAT * SPLATS
    )
    if use_fat:
        inputs = [cloud.fat]
    else:

        def padded(x, fill=0.0):
            if n_pad == n:
                return x
            return jnp.concatenate(
                [x, jnp.full((n_pad - n,), fill, x.dtype)]
            )

        # padded splats: opacity stays 0 BUT culling must reject them — pad
        # positions at +inf so the frustum test fails
        inputs = (
            [padded(cloud.xyz[i], np.float32(3.0e38)) for i in range(3)]
            + [padded(cloud.cov[i]) for i in range(6)]
            + [padded(cloud.opacity)]
            + [padded(cloud.sh[i]) for i in range(24)]
        )

    view, proj, cam_pos, focal, st = scalars_from_pytrees(camera, settings)
    scal = jnp.stack(
        [view[i][j] for i in range(4) for j in range(4)]
        + [proj[i][j] for i in range(4) for j in range(4)]
        + list(cam_pos)
        + [focal[0], focal[1]]
        + list(st["cb_min"]) + list(st["cb_max"]) + list(st["center"])
        + [
            st["gaussian_scaling"], st["kernel"], st["walltime"], st["extend"],
            st["mip"].astype(jnp.float32), st["max_sh_deg"].astype(jnp.float32),
        ]
    ).astype(jnp.float32)

    with_cid = capacity_c > 0
    capacity_c_pad = (-(-capacity_c // ALIGN) * ALIGN + STAGE) if with_cid else 0
    CID_W = 6
    n_streams = 5 + (CID_W if with_cid else 0)

    kernel = _make_kernel(
        slots=slots,
        tx_tiles=tx_tiles,
        depth_bits=depth_bits,
        capacity_pad=capacity_pad,
        n_steps=n_steps,
        width=width,
        height=height,
        config=config,
        compressed=compressed,
        capacity_c_pad=capacity_c_pad,
        fat_input=use_fat,
    )
    out_specs = [pl.BlockSpec(memory_space=pl.ANY)] * 5 + [
        pl.BlockSpec((1, 128), lambda s, scal: (0, 0), memory_space=pltpu.VMEM)
    ]
    out_shapes = [
        jax.ShapeDtypeStruct((capacity_pad + splice_pad,), jnp.uint32)
    ] * 5 + [jax.ShapeDtypeStruct((1, 128), jnp.int32)]
    if with_cid:
        out_specs.extend([pl.BlockSpec(memory_space=pl.ANY)] * CID_W)
        out_shapes.extend(
            [jax.ShapeDtypeStruct((capacity_c_pad,), jnp.uint32)] * CID_W
        )
    if use_fat:
        in_specs = [
            pl.BlockSpec(
                (N_FAT * SPLATS,), lambda s, scal: (s,),
                memory_space=pltpu.VMEM,
            )
        ]
    else:
        in_specs = [
            pl.BlockSpec(
                (SPLATS,), lambda s, scal: (s,), memory_space=pltpu.VMEM
            )
        ] * 34
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_steps,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[pltpu.VMEM((STAGE,), jnp.uint32)] * n_streams
        + [pltpu.VMEM((ALIGN,), jnp.uint32)] * n_streams
        + [
            pltpu.SemaphoreType.DMA((n_streams,)),
            pltpu.SMEM((6,), jnp.int32),
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
    )(scal, *inputs)
    keys, w0, w1, w2, w3, stats = res[:6]

    total = stats[0, 0]
    num_valid = stats[0, 1]
    num_visible = stats[0, 2]
    num_clamped = stats[0, 3]
    num_dropped = jnp.maximum(0, total - limit)

    cap_iota = jnp.arange(capacity_pad + splice_pad, dtype=jnp.int32)
    tail = cap_iota >= jnp.minimum(total, limit)
    keys = jnp.where(tail, jnp.uint32(INVALID_KEY), keys)
    out = (keys, (w0, w1, w2, w3), num_visible, num_clamped, num_valid,
           num_dropped)
    if with_cid:
        cid_raw = res[6 : 6 + CID_W]
        cid_total = stats[0, 4]
        n_cid = jnp.minimum(cid_total, capacity_c)
        # sentinel-mask the rect word past the compacted count (rect4
        # sentinels self-mask downstream); other words pass through
        rect = jnp.where(
            jnp.arange(capacity_c_pad, dtype=jnp.int32) >= n_cid,
            jnp.uint32(INVALID_KEY),
            cid_raw[0],
        )[:capacity_c]
        cid_words = (rect,) + tuple(w[:capacity_c] for w in cid_raw[1:])
        out = out + (cid_words, n_cid)
    return out
