"""Fused slot emission + stream compaction (Pallas TPU).

Replaces the two-step "materialize N*tile_slots slot instances in HBM (XLA)
-> compact them (Pallas)" pipeline with ONE kernel that expands each splat's
tile rect into (tile|depth)-keyed instances *in registers* and appends only
the valid ones to the output stream.  This is the TPU-native analogue of the
reference's fused preprocess+atomic-compaction
(/root/reference/src/shaders/preprocess.wgsl:262-279): where the GPU uses
``atomicAdd`` on a global counter, the TPU uses the *sequential* Pallas grid
plus precomputed per-(step, slot) output offsets — deterministic by
construction instead of by atomic order.

Why fused: the slot stream is ``tile_slots * N`` instances * 5 words (~150 MB
at bonsai scale) of pure HBM materialization plus XLA relayouts; per-splat
inputs are ~6 words * N (~29 MB).  Measured 15.1 ms (preprocess + compact)
before, with the kernel cost itself ~2 ms.

Layout/machinery notes (Mosaic constraints, see CLAUDE.md):
- All instance streams are rank-1 ``(M,)`` u32 arrays (the sort's operand
  format).  In-kernel, a rank-1 VMEM block of 128*k lanes is viewed as
  ``(k, 128)`` — a layout-identity reshape — and "flat order" means
  row-major (r, l) -> p = 128 r + l.
- Rolls along the flat order decompose into a sublane roll (axis 0) plus a
  lane roll (axis 1) with a one-row carry correction: 2 rolls + 1 select.
- Compaction per (step, slot): exclusive prefix-count of invalid lanes in
  flat order (log-steps), then the bit-serial monotone left-shuffle exactly
  as ops/compact_pallas.py, but over the flat order.
- Output DMAs of consecutive units OVERLAP (each writes its full staged
  buffer; the next unit's data starts where this unit's valid prefix ends,
  inside this unit's sentinel tail).  Correctness therefore requires
  *ordered* completion: each word's DMA is waited before the next unit's
  same-word DMA starts (one-deep pipeline: unit u's DMAs overlap unit u+1's
  compute).  The standalone compactor started its stream DMAs concurrently,
  which left the overlap ordering to the DMA engines — the fused kernel
  serializes per word by protocol.
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

INVALID_KEY = np.uint32(0xFFFFFFFF)

SPLATS = 32768  # splats per grid step (rank-1 block; viewed as (ROWS, 128))
ROWS = SPLATS // 128
N_STEPS_LOG2 = int(np.log2(SPLATS))
# rank-1 HBM slices must start at an (8, 128)-tile boundary = 1024 elements
# (Mosaic: "tile index in dimension 0 divisible by the tiling (1024)"), so
# per-unit output offsets are 1024-padded.  The sentinel waste is bounded by
# n_units * 1023 and sorts to the end like any sentinel.
ALIGN = 1024

# rect word bit layout (must match ops/preprocess.py packed emission)
TX0_BITS = 7
TY0_BITS = 7
WT_BITS = 4
MASK_SHIFT = TX0_BITS + TY0_BITS + WT_BITS  # 18
MAX_SLOTS = 32 - MASK_SHIFT - 6  # 8, keeping headroom


def _flat_roll(x, k: int):
    """out[p] = x[(p - k) mod SPLATS] over the flat row-major order."""
    a, b = divmod(k % SPLATS, 128)
    y = pltpu.roll(x, shift=a, axis=0) if a else x
    if b == 0:
        return y
    z = pltpu.roll(y, shift=b, axis=1)
    w = pltpu.roll(z, shift=1, axis=0)
    lane = lax.broadcasted_iota(jnp.int32, (ROWS, 128), 1)
    return jnp.where(lane < b, w, z)


def _emit_compact_kernel(
    *,
    slots: int,
    tx_tiles: int,
    depth_bits: int,
    capacity_pad: int,
    n_steps: int,
):
    n_units = n_steps * slots

    def kernel(
        offs_ref,  # (n_units + 1,) i32 UNclamped exclusive offsets
        depth_ref, rect_ref, in0, in1, in2, in3,  # (SPLATS,) u32 blocks
        keys_out, out0, out1, out2, out3,  # rank-1 HBM (capacity_pad,)
        st_k, st_0, st_1, st_2, st_3,  # staging VMEM (SPLATS,) u32
        sems,  # DMA sems (5,)
    ):
        s = pl.program_id(0)

        lane = lax.broadcasted_iota(jnp.int32, (ROWS, 128), 1)
        row = lax.broadcasted_iota(jnp.int32, (ROWS, 128), 0)
        flat_pos = row * 128 + lane

        rect = rect_ref[...].reshape(ROWS, 128)
        depth_q = depth_ref[...].reshape(ROWS, 128)
        words_in = tuple(
            r[...].reshape(ROWS, 128) for r in (in0, in1, in2, in3)
        )
        tx0 = (rect & np.uint32((1 << TX0_BITS) - 1)).astype(jnp.int32)
        ty0 = ((rect >> np.uint32(TX0_BITS)) & np.uint32((1 << TY0_BITS) - 1)).astype(
            jnp.int32
        )
        w_t = (
            (rect >> np.uint32(TX0_BITS + TY0_BITS)) & np.uint32((1 << WT_BITS) - 1)
        ).astype(jnp.int32)
        mask = rect >> np.uint32(MASK_SHIFT)

        outs = (keys_out, out0, out1, out2, out3)
        stages = (st_k, st_0, st_1, st_2, st_3)

        def unit_dma(w, off):
            return pltpu.make_async_copy(
                stages[w],
                outs[w].at[pl.ds(off, SPLATS)],
                sems.at[w],
            )

        # rect walk state: dx/dy of slot j in the row-major rect enumeration
        dx = jnp.zeros((ROWS, 128), jnp.int32)
        dy = jnp.zeros((ROWS, 128), jnp.int32)

        for j in range(slots):
            u = s * slots + j
            off_u = offs_ref[u]
            cnt_pad = offs_ref[u + 1] - off_u
            off_clamped = pl.multiple_of(
                jnp.minimum(off_u, capacity_pad - SPLATS), ALIGN
            )

            ok = ((mask >> np.uint32(j)) & 1).astype(jnp.int32)
            tile = (ty0 + dy) * tx_tiles + tx0 + dx
            key = jnp.where(
                ok == 1,
                (tile.astype(jnp.uint32) << np.uint32(depth_bits)) | depth_q,
                jnp.uint32(INVALID_KEY),
            )
            # advance the rect walk (row-major): matches dy=j//w_t, dx=j-dy*w_t
            if j + 1 < slots:
                wrap = dx + 1 >= w_t
                dx = jnp.where(wrap, 0, dx + 1)
                dy = dy + wrap.astype(jnp.int32)

            def do_shuffle(key=key, ok=ok):
                # exclusive prefix count of invalid lanes (flat order)
                inv = 1 - ok
                pre = inv
                for i in range(N_STEPS_LOG2):
                    k = 1 << i
                    pre = pre + jnp.where(flat_pos >= k, _flat_roll(pre, k), 0)
                shift = (pre - inv).astype(jnp.uint32)

                # bit-serial monotone left-shuffle: move each lane down by
                # `shift` (its count of preceding invalids), LSB first
                arrs = [shift, key] + list(words_in)
                for i in range(N_STEPS_LOG2):
                    k = 1 << i
                    rolled = [_flat_roll(a, SPLATS - k) for a in arrs]
                    arrives = (rolled[0] & np.uint32(k)) != 0
                    arrs = [
                        jnp.where(arrives, r, a) for r, a in zip(rolled, arrs)
                    ]
                # sentinel-fill the key tail (garbage copies beyond the
                # compacted prefix could masquerade as valid keys)
                n_valid = jnp.sum(ok)
                key_c = jnp.where(
                    flat_pos >= n_valid, jnp.uint32(INVALID_KEY), arrs[1]
                )
                return (key_c,) + tuple(arrs[2:])

            def no_shuffle(key=key):
                return (jnp.full((ROWS, 128), INVALID_KEY, jnp.uint32),) + tuple(
                    jnp.zeros((ROWS, 128), jnp.uint32) for _ in range(4)
                )

            vals = lax.cond(cnt_pad > 0, do_shuffle, no_shuffle)

            @pl.when(cnt_pad > 0)
            def _write():
                # ordered overlap protocol: wait the previous unit's DMA of
                # each word before overwriting its staging buffer / starting
                # an overlapping write.  `off_u > 0` <=> a previous unit has
                # started a DMA (offsets are monotone from 0).
                @pl.when(off_u > 0)
                def _wait_prev():
                    for w in range(5):
                        unit_dma(w, off_clamped).wait()

                for w in range(5):
                    stages[w][...] = vals[w].reshape(SPLATS)
                for w in range(5):
                    unit_dma(w, off_clamped).start()

        @pl.when(s == n_steps - 1)
        def _drain():
            last_total = offs_ref[n_units]

            @pl.when(last_total > 0)
            def _():
                off = pl.multiple_of(
                    jnp.minimum(
                        offs_ref[n_units - 1], capacity_pad - SPLATS
                    ),
                    ALIGN,
                )
                for w in range(5):
                    unit_dma(w, off).wait()

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("slots", "tx_tiles", "depth_bits", "capacity", "interpret"),
)
def emit_compact(
    depth_q: jnp.ndarray,  # (N_pad,) u32 quantized depth
    rect: jnp.ndarray,  # (N_pad,) u32 packed rect walk + slot mask
    words: Tuple[jnp.ndarray, ...],  # 4 x (N_pad,) u32 packed records
    *,
    slots: int,
    tx_tiles: int,
    depth_bits: int,
    capacity: int,
    interpret: bool = False,
):
    """-> (keys, payload4, num_valid, num_dropped): compacted instance stream.

    Inputs must be padded to a SPLATS multiple with rect=0 (mask 0) padding.
    """
    n = depth_q.shape[0]
    if n % SPLATS != 0:
        raise ValueError(f"N must be a multiple of {SPLATS} (got {n})")
    if slots > MAX_SLOTS:
        raise ValueError(f"tile_slots > {MAX_SLOTS} not supported by rect packing")
    n_steps = n // SPLATS
    n_units = n_steps * slots
    # Unit offsets advance in ALIGN (1024) multiples, so the stream holds up
    # to n_units*(ALIGN-1) interspersed sentinel pads.  `capacity` counts
    # REAL instances: the positional cut must budget for that worst case or
    # align padding would eat into the instance budget (at small N the
    # padding alone can exceed a small capacity).
    limit = capacity + n_units * ALIGN
    capacity_pad = -(-limit // SPLATS) * SPLATS + SPLATS

    # phase 1 (XLA): per-(step, slot) valid counts -> 128-aligned offsets
    mask_bits = rect >> np.uint32(MASK_SHIFT)
    counts = []
    for j in range(slots):
        okj = ((mask_bits >> np.uint32(j)) & 1).astype(jnp.int32)
        counts.append(okj.reshape(n_steps, SPLATS).sum(axis=1))
    cnt = jnp.stack(counts, axis=1).reshape(-1)  # (n_units,) unit-major
    v_pad = -(-cnt // ALIGN) * ALIGN
    offs = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(v_pad)]
    ).astype(jnp.int32)
    total = offs[-1]
    num_valid = jnp.sum(cnt)
    # conservative diagnostic: positions past the cut are mostly real
    # instances once padding is budgeted into `limit`
    num_dropped = jnp.maximum(0, total - limit)

    kernel = _emit_compact_kernel(
        slots=slots,
        tx_tiles=tx_tiles,
        depth_bits=depth_bits,
        capacity_pad=capacity_pad,
        n_steps=n_steps,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec((SPLATS,), lambda s, offs: (s,), memory_space=pltpu.VMEM)
        ]
        * 6,
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 5,
        scratch_shapes=[pltpu.VMEM((SPLATS,), jnp.uint32)] * 5
        + [pltpu.SemaphoreType.DMA((5,))],
    )
    interp = (
        pltpu.InterpretParams()
        if (interpret or jax.default_backend() != "tpu")
        else False
    )
    out_shapes = [jax.ShapeDtypeStruct((capacity_pad,), jnp.uint32)] * 5
    keys, w0, w1, w2, w3 = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interp,
    )(offs, depth_q, rect, *words)

    # sentinel everything at/after min(total, limit) (uninitialized tail +
    # capacity overflow), mirroring ops/compact_pallas.py
    cap_iota = jnp.arange(capacity_pad, dtype=jnp.int32)
    tail = cap_iota >= jnp.minimum(total, limit)
    keys = jnp.where(tail, jnp.uint32(INVALID_KEY), keys)
    return keys, (w0, w1, w2, w3), num_valid, num_dropped
