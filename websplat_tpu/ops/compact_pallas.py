"""Pallas stream compaction: drop invalid instances before the sort.

The reference compacts visible splats with a global atomic counter
(``atomicAdd(&sort_infos.keys_size, 1)``, preprocess.wgsl:262) so its radix
sort only touches visible splats.  TPUs have no global atomics and XLA's
scatter runs at ~50 ms per million rows, but an *unordered* compaction
(order is irrelevant — the stable sort that follows re-orders everything)
can be built from purely vectorized primitives:

  phase 1 (XLA):    per-block valid counts, rounded up to 128 (the HBM lane
                    tile) -> exclusive block offsets, so every block's
                    output lands at a lane-aligned address.
  phase 2 (Pallas): grid over blocks of an (8, M) u32 instance matrix
                    (row 0 = sort key, rows 1-5 = packed record).  Each
                    block moves valid lanes to the front with a bit-serial
                    monotone shuffle — every lane moves left by the number
                    of invalid lanes before it, applied one power of two at
                    a time; valid for monotone shifts — then one DMA writes
                    the whole block at its offset.  The TPU grid executes
                    sequentially, so the next block's write overwrites this
                    block's garbage tail, leaving a contiguous compacted
                    stream (with <=127 interspersed sentinel pads per block,
                    which the sort pushes to the end like any sentinel).

This is what makes large ``tile_slots`` budgets affordable: the sort runs
over the compacted capacity (~ true instance count) instead of N * slots.
Instances past ``capacity`` are dropped and counted (diagnostic).
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

BLOCK = 4096  # instances (lanes) per grid step
ALIGN = 128  # HBM lane tile: per-block output offsets stay 128-aligned


STREAMS = 4  # sub-blocks shuffled with interleaved instruction streams (ILP)


def _compact_kernel(capacity_pad: int, n_pairs: int):
    n_steps = int(np.log2(BLOCK))

    def kernel(offsets_ref, in_ref, out_hbm, staged, sems):
        b = pl.program_id(0)

        def clamped_off(i):
            # offsets are 128-multiples by construction (cumsum of
            # ALIGN-rounded counts; the clamp bound is a BLOCK multiple) —
            # tell Mosaic so it accepts the dynamic lane offset against the
            # (8, 128) HBM tiling
            return pl.multiple_of(
                jnp.minimum(offsets_ref[i], capacity_pad - BLOCK), ALIGN
            )

        def out_copy(slot, block_idx):
            return pltpu.make_async_copy(
                staged.at[slot],
                out_hbm.at[:, pl.ds(clamped_off(block_idx), BLOCK)],
                sems.at[slot],
            )

        # Output DMAs of consecutive sub-blocks OVERLAP in HBM (each writes a
        # full BLOCK; the next sub-block's data begins inside this one's
        # sentinel tail), so their completion must be ORDERED: each DMA is
        # waited before the next one starts (chained below).  This also
        # frees the staging buffer before its reuse.  Letting all four
        # stream DMAs fly concurrently (the original design) left the
        # overlap outcome to the DMA engines — a nondeterministic
        # lost-instance race.

        lane = lax.broadcasted_iota(jnp.int32, (1, BLOCK), 1)
        # STREAMS independent sub-blocks, ops emitted step-interleaved: the
        # VPU retires chained vreg ops at ~0.25/cycle but >2/cycle given
        # independent streams (measured), and each shuffle step is a serial
        # dependency chain
        xs = [in_ref[:, s * BLOCK : (s + 1) * BLOCK] for s in range(STREAMS)]
        invalids = [(x[0:1, :] == INVALID_KEY).astype(jnp.int32) for x in xs]

        # exclusive prefix count of invalid lanes
        pres = list(invalids)
        for k in [1 << i for i in range(n_steps)]:
            rolled = [pltpu.roll(p, shift=k, axis=1) for p in pres]
            pres = [
                p + jnp.where(lane >= k, r, 0) for p, r in zip(pres, rolled)
            ]
        shifts = [p - inv for p, inv in zip(pres, invalids)]

        # stash the shift in scratch row 6 so it travels with the lanes
        xs = [
            jnp.concatenate([x[0:6], s.astype(jnp.uint32), x[7:8]], axis=0)
            for x, s in zip(xs, shifts)
        ]

        # bit-serial monotone left-shuffle (LSB first)
        for bit in range(n_steps):
            k = 1 << bit
            rolled = [pltpu.roll(x, shift=BLOCK - k, axis=1) for x in xs]
            arrives = [(r[6:7, :] & np.uint32(k)) != 0 for r in rolled]
            xs = [jnp.where(a, r, x) for a, r, x in zip(arrives, rolled, xs)]

        # sentinel-fill the pad lanes between v_b and the 128-aligned count
        # (leftover shuffle copies there could masquerade as valid keys),
        # then stage + start each DMA with the chained-order protocol: wait
        # the PREVIOUS sub-block's DMA (sem slot (s-1) % STREAMS; the one
        # from the previous grid step for s == 0) before overwriting staging
        # or starting an overlapping write.
        for s in range(STREAMS):
            prev = (s - 1) % STREAMS

            def _wait_prev(prev=prev):
                # descriptor offset is irrelevant for a wait (sem decrement)
                pltpu.make_async_copy(
                    staged.at[prev],
                    out_hbm.at[:, pl.ds(clamped_off(b * STREAMS + s), BLOCK)],
                    sems.at[prev],
                ).wait()

            if s == 0:
                @pl.when(b > 0)
                def _():
                    _wait_prev()
            else:
                _wait_prev()

            v = jnp.sum(1 - invalids[s])
            key_row = jnp.where(lane >= v, jnp.uint32(INVALID_KEY), xs[s][0:1, :])
            staged[s] = jnp.concatenate([key_row, xs[s][1:8]], axis=0)
            out_copy(s, b * STREAMS + s).start()

        @pl.when(b == n_pairs - 1)
        def _():
            # only the final DMA is still outstanding under the chain
            pltpu.make_async_copy(
                staged.at[STREAMS - 1],
                out_hbm.at[:, pl.ds(clamped_off(b * STREAMS + STREAMS - 1), BLOCK)],
                sems.at[STREAMS - 1],
            ).wait()

    return kernel


@functools.partial(jax.jit, static_argnames=("capacity", "interpret"))
def compact_instances(
    keys: jnp.ndarray,
    payload: Tuple[jnp.ndarray, ...],
    *,
    capacity: int,
    interpret: bool = False,
):
    """Compact (keys, 5-word payload) by key != INVALID -> static capacity.

    Returns (keys', payload', num_valid, num_dropped); keys' has all valid
    instances in the first ~num_valid slots (plus <=127 sentinels interleaved
    per source block) and sentinels elsewhere.
    """
    m = keys.shape[0]
    pair = BLOCK * STREAMS
    if m % pair != 0:
        pad = -(-m // pair) * pair - m
        keys = jnp.concatenate([keys, jnp.full((pad,), INVALID_KEY, jnp.uint32)])
        payload = tuple(
            jnp.concatenate([w, jnp.zeros((pad,), jnp.uint32)]) for w in payload
        )
        m += pad
    capacity_pad = -(-capacity // BLOCK) * BLOCK + BLOCK
    n_blocks = m // BLOCK
    n_pairs = n_blocks // STREAMS

    n_payload = len(payload)
    if n_payload > 5:
        raise ValueError("at most 5 payload words (row 6 is shift scratch)")
    zeros = jnp.zeros_like(keys)
    x = jnp.stack(
        (keys,) + tuple(payload) + (zeros,) * (7 - n_payload), axis=0
    )  # (8, M): key, payload..., zeros; row 6 doubles as shift scratch

    # phase 1: block offsets (XLA)
    valid = (keys != INVALID_KEY).reshape(n_blocks, BLOCK)
    v_b = jnp.sum(valid.astype(jnp.int32), axis=1)
    v_pad = -(-v_b // ALIGN) * ALIGN
    offsets = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(v_pad)[:-1]]).astype(
        jnp.int32
    )
    total = jnp.sum(v_pad)
    num_valid = jnp.sum(v_b)
    num_dropped = jnp.maximum(0, total - capacity)

    interp = pltpu.InterpretParams() if (interpret or jax.default_backend() != "tpu") else False
    out = pl.pallas_call(
        _compact_kernel(capacity_pad, n_pairs),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_pairs,),
            in_specs=[
                pl.BlockSpec(
                    (8, BLOCK * STREAMS), lambda b, offs: (0, b), memory_space=pltpu.VMEM
                )
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM((STREAMS, 8, BLOCK), jnp.uint32),
                pltpu.SemaphoreType.DMA((STREAMS,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((8, capacity_pad), jnp.uint32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interp,
    )(offsets, x)

    # tail beyond the last block's write is uninitialized -> sentinel it;
    # also sentinel anything past the requested capacity
    cap_iota = jnp.arange(capacity_pad, dtype=jnp.int32)
    tail = (cap_iota >= jnp.minimum(total, capacity)) | (cap_iota >= capacity)
    out_keys = jnp.where(tail, jnp.uint32(INVALID_KEY), out[0])
    out_payload = tuple(out[i] for i in range(1, 1 + n_payload))
    return out_keys, out_payload, num_valid, num_dropped
