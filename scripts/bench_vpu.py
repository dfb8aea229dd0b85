#!/usr/bin/env python
"""VPU throughput microbench: f32 vs bf16 elementwise chains in Pallas.

Decides whether a bf16 blend path in the rasterizer can halve vreg traffic
(bf16 packs 2 elements per 32-bit lane; if Mosaic issues packed bf16 ALU ops
on v5e, a chain of dependent-ish ops should run ~2x the f32 rate).

Each kernel runs STREAMS independent chains of CHAIN fused mul-adds over an
(8, 512) block per grid step, mirroring the rasterizer's interleaved group
evaluation.  Reported: ns per (vreg-equivalent f32) op.

MEASURED (TPU v5e, 2026-08-20): bf16 is a DEAD END for the blend path —
Mosaic issues NO packed bf16 ALU ops on v5e; bf16 chains run at the same
wall time as f32 for the same ELEMENT count, i.e. the same ns per f32-vreg
equivalent (fori_loop: f32 7.15 vs bf16 7.27 ns/vreg; fully unrolled
(--unroll): f32 7.18 vs bf16 6.91 — identical within noise), and
`pltpu.roll` on bf16 (which the scan composite's sublane prefix needs)
fails Mosaic compilation outright.  VERDICT r3 lever 1(a) closed with
numbers: halving vreg traffic via bf16 buys nothing because the VPU retires
one vector op per LANE-GROUP regardless of element width here.
"""

import functools
import sys
import time

sys.path.insert(0, ".")

import jax

from websplat_tpu.utils import compile_cache

compile_cache.enable()
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

STREAMS = 4
CHAIN = 64
SHAPE = (8, 512)
STEPS = 512


def _make(dtype, with_roll=False, with_exp=False, unroll=False):
    def kernel(x_ref, o_ref):
        xs = [x_ref[...] * (1.0 + 0.001 * i) for i in range(STREAMS)]
        c = jnp.asarray(1.0009765625, dtype)

        def body(i, xs):
            out = []
            for x in xs:
                y = x * c + c
                if with_roll:
                    y = pltpu.roll(y, shift=1, axis=0)
                if with_exp:
                    y = jnp.exp(-y)
                out.append(y)
            return out

        if unroll:
            # fully Python-unrolled chain: no fori_loop scalar overhead, the
            # body is one straight-line block of STREAMS*CHAIN vector ops —
            # isolates pure VPU issue throughput
            for i in range(CHAIN):
                xs = body(i, xs)
        else:
            xs = lax.fori_loop(0, CHAIN, body, xs)
        acc = xs[0]
        for x in xs[1:]:
            acc = acc + x
        o_ref[...] = acc

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            grid=(STEPS,),
            in_specs=[pl.BlockSpec(SHAPE, lambda s: (0, 0))],
            out_specs=pl.BlockSpec(SHAPE, lambda s: (0, 0)),
            out_shape=jax.ShapeDtypeStruct(SHAPE, dtype),
        )(x)

    return run


def _sweep(unroll):
    for label, dtype in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        for roll in (False, True):
            for expo in (False, True):
                x = jnp.asarray(
                    np.random.default_rng(0).random(SHAPE) * 0.5 + 0.25, dtype
                )
                try:
                    t = timed(_make(dtype, roll, expo, unroll), x)
                except Exception as e:  # noqa: BLE001
                    print(f"{label} roll={roll} exp={expo}: FAILED "
                          f"{type(e).__name__}: {str(e)[:120]}")
                    continue
                # ops per step: STREAMS*CHAIN fused (mul+add) (+roll/+exp)
                nops = STEPS * STREAMS * CHAIN
                vregs32 = np.prod(SHAPE) / (8 * 128)  # f32 vreg equivalents
                print(f"{label} unroll={unroll} roll={roll} exp={expo}: "
                      f"{t*1e3:7.3f} ms "
                      f"-> {t / nops * 1e9:6.2f} ns/op "
                      f"({t / (nops * vregs32) * 1e9:5.2f} ns per f32-vreg)")


def timed(run, x, reps=8):
    float(jnp.sum(run(x).astype(jnp.float32)))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            r = run(x)
        float(jnp.sum(r.astype(jnp.float32)))
        ts.append((time.perf_counter() - t0) / reps)
    return min(ts)


def main():
    unrolls = (False, True) if "--unroll" in sys.argv else (False,)
    for unroll in unrolls:
        _sweep(unroll)


if __name__ == "__main__":
    main()
