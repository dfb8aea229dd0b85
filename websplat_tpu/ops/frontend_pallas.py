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
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from websplat_tpu.config import RasterConfig
from websplat_tpu.ops.preprocess import DeviceCloud, CameraParams, DeviceSettings, core_math, iter_slots, scalars_from_pytrees

INVALID_KEY = np.uint32(0xFFFFFFFF)

SPLATS = 16384  # splats per grid step ((128, 128) view); VMEM-bounded:
# 34 input blocks x 64 KB x 2 (pipeline) + staging + math temporaries
ROWS = SPLATS // 128
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
):
    def kernel(scal_ref, *refs):
        # refs: 34 inputs, 6 outputs, then scratch (5 staged, 5 carry, sems,
        # smem)
        ins = refs[:34]
        keys_out, o0, o1, o2, o3, stats_out = refs[34:40]
        st_k, st_0, st_1, st_2, st_3 = refs[40:45]
        ca_k, ca_0, ca_1, ca_2, ca_3 = refs[45:50]
        sems, state = refs[50:]
        outs = (keys_out, o0, o1, o2, o3)
        stages = (st_k, st_0, st_1, st_2, st_3)
        carries = (ca_k, ca_0, ca_1, ca_2, ca_3)

        s = pl.program_id(0)

        @pl.when(s == 0)
        def _init():
            for i in range(4):
                state[i] = 0

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

        def unit_dma(w, off):
            return pltpu.make_async_copy(
                stages[w], outs[w].at[pl.ds(off, STAGE)], sems.at[w]
            )

        # (SROWS, 128) iotas for the carry-merge select
        s_lane = lax.broadcasted_iota(jnp.int32, (SROWS, 128), 1)
        s_row = lax.broadcasted_iota(jnp.int32, (SROWS, 128), 0)
        s_flat = s_row * 128 + s_lane

        for j, slot_ok, tile in iter_slots(d, slots, tx_tiles):
            ok = slot_ok.astype(jnp.int32)
            key = jnp.where(
                slot_ok,
                (tile.astype(jnp.uint32) << np.uint32(depth_bits)) | depth_q,
                jnp.uint32(INVALID_KEY),
            )
            cnt = jnp.sum(ok)

            def do_shuffle(key=key, ok=ok):
                inv = 1 - ok
                pre = inv
                for i in range(LOG2):
                    k = 1 << i
                    pre = pre + jnp.where(flat_pos >= k, _flat_roll(pre, k), 0)
                shift = (pre - inv).astype(jnp.uint32)
                arrs = [shift, key] + list(words)
                for i in range(LOG2):
                    k = 1 << i
                    rolled = [_flat_roll(a, SPLATS - k) for a in arrs]
                    arrives = (rolled[0] & np.uint32(k)) != 0
                    arrs = [
                        jnp.where(arrives, r, a) for r, a in zip(rolled, arrs)
                    ]
                key_c = jnp.where(
                    flat_pos >= cnt, jnp.uint32(INVALID_KEY), arrs[1]
                )
                return (key_c,) + tuple(arrs[2:])

            def no_shuffle(key=key):
                return (jnp.full((ROWS, 128), INVALID_KEY, jnp.uint32),) + tuple(
                    jnp.zeros((ROWS, 128), jnp.uint32) for _ in range(4)
                )

            vals = lax.cond(cnt > 0, do_shuffle, no_shuffle)

            @pl.when(cnt > 0)
            def _write():
                # EXACT-cursor ordered-overlap protocol.  The stream cursor
                # advances by exactly cnt (no ALIGN rounding): the staged
                # write is [carry-tile | compacted unit] placed at the
                # ALIGN-floored cursor, where the carry tile re-writes the
                # partial last tile of the stream so far.  DMA completion
                # must stay ORDERED per word (wait-before-overwrite), and the
                # sub-ALIGN tail of each write is carried in VMEM to be
                # prepended to the next unit.
                total = state[0]
                carry_len = lax.rem(total, ALIGN)
                aligned = total - carry_len
                off_clamped = pl.multiple_of(
                    jnp.minimum(aligned, capacity_pad - STAGE), ALIGN
                )

                @pl.when(total > 0)
                def _wait_prev():
                    for w in range(5):
                        unit_dma(w, off_clamped).wait()

                fills = (jnp.uint32(INVALID_KEY),) + (jnp.uint32(0),) * 4
                for w in range(5):
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
                            carries[w][...].reshape(CARRY_ROWS, 128),
                            jnp.full(
                                (SROWS - CARRY_ROWS, 128), fills[w], jnp.uint32
                            ),
                        ],
                        axis=0,
                    )
                    merged = jnp.where(s_flat < carry_len, carry_full, rolled)
                    stages[w][...] = merged.reshape(STAGE)

                # new carry = the partial tile at the advanced cursor
                stage_len = carry_len + cnt
                advance = stage_len - lax.rem(stage_len, ALIGN)
                adv_c = pl.multiple_of(jnp.minimum(advance, SPLATS), ALIGN)
                for w in range(5):
                    carries[w][...] = stages[w][pl.ds(adv_c, ALIGN)]
                for w in range(5):
                    unit_dma(w, off_clamped).start()

                state[0] = total + cnt
                state[1] = state[1] + cnt

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

            li = lax.broadcasted_iota(jnp.int32, (1, 128), 1)
            stats = jnp.where(
                li == 0,
                state[0],
                jnp.where(
                    li == 1,
                    state[1],
                    jnp.where(li == 2, state[2], jnp.where(li == 3, state[3], 0)),
                ),
            )
            stats_out[...] = stats

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "width", "height", "config", "compressed", "capacity", "interpret"
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
    interpret: bool = False,
):
    """cloud -> (keys, payload4, num_visible, num_clamped, num_valid,
    num_dropped): the whole frame frontend in one kernel launch."""
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
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec((SPLATS,), lambda s, scal: (s,), memory_space=pltpu.VMEM)
        ]
        * 34,
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 5
        + [
            pl.BlockSpec((1, 128), lambda s, scal: (0, 0), memory_space=pltpu.VMEM)
        ],
        scratch_shapes=[pltpu.VMEM((STAGE,), jnp.uint32)] * 5
        + [pltpu.VMEM((ALIGN,), jnp.uint32)] * 5
        + [pltpu.SemaphoreType.DMA((5,)), pltpu.SMEM((4,), jnp.int32)],
    )
    interp = (
        pltpu.InterpretParams()
        if (interpret or jax.default_backend() != "tpu")
        else False
    )
    out_shapes = [jax.ShapeDtypeStruct((capacity_pad,), jnp.uint32)] * 5 + [
        jax.ShapeDtypeStruct((1, 128), jnp.int32)
    ]
    keys, w0, w1, w2, w3, stats = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interp,
    )(scal, *inputs)

    total = stats[0, 0]
    num_valid = stats[0, 1]
    num_visible = stats[0, 2]
    num_clamped = stats[0, 3]
    num_dropped = jnp.maximum(0, total - limit)

    cap_iota = jnp.arange(capacity_pad, dtype=jnp.int32)
    tail = cap_iota >= jnp.minimum(total, limit)
    keys = jnp.where(tail, jnp.uint32(INVALID_KEY), keys)
    return keys, (w0, w1, w2, w3), num_visible, num_clamped, num_valid, num_dropped
