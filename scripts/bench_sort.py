#!/usr/bin/env python
"""Micro-benchmark lax.sort variants for the instance sort on TPU.

Variants: operand packing (5xu32 vs u64-packed) and stability.  Informs
ops/sort.py's backend choice; run standalone (competes with nothing else on
the chip or the timings are noise).
"""

import sys
import time

sys.path.insert(0, ".")

import jax

from websplat_tpu.utils import compile_cache

compile_cache.enable()
import jax.numpy as jnp
import numpy as np
from jax import lax


def timed(f, *args, n1=1, n2=5):
    def loop(n):
        @jax.jit
        def g(*a):
            def body(i, acc):
                r = f(*a, salt=i.astype(jnp.uint32))
                return acc + r
            return lax.fori_loop(0, n, body, jnp.float32(0.0))
        return g

    f1, f2 = loop(n1), loop(n2)
    float(f1(*args)); float(f2(*args))
    t0 = time.perf_counter(); float(f1(*args)); t1 = time.perf_counter()
    float(f2(*args)); t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / (n2 - n1) * 1e3


def main():
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 1_703_936  # ~1.4 * bonsai
    rng = np.random.default_rng(0)
    keys = jnp.asarray(rng.integers(0, 1 << 32, m, dtype=np.uint64).astype(np.uint32))
    words = [
        jnp.asarray(rng.integers(0, 1 << 32, m, dtype=np.uint64).astype(np.uint32))
        for _ in range(4)
    ]

    def live(outs):
        return sum(o[::65536].astype(jnp.float32).sum() for o in outs)

    def sort5(k, w0, w1, w2, w3, salt):
        out = lax.sort((k ^ salt, w0, w1, w2, w3), num_keys=1, is_stable=True)
        return live(out)

    def sort5u(k, w0, w1, w2, w3, salt):
        out = lax.sort((k ^ salt, w0, w1, w2, w3), num_keys=1, is_stable=False)
        return live(out)

    def sort2(k, w0, salt):
        out = lax.sort((k ^ salt, w0), num_keys=1, is_stable=False)
        return live(out)

    def sort_u64(k, w0, w1, w2, w3, salt):
        # enable_x64 is trace-scoped (gates array creation): without it the
        # astype silently truncates to u32 and this measures a 3xu32 sort
        with jax.enable_x64(True):
            kw = (k ^ salt).astype(jnp.uint64) << 32 | w0.astype(jnp.uint64)
            p0 = w1.astype(jnp.uint64) << 32 | w2.astype(jnp.uint64)
            out = lax.sort((kw, p0, w3), num_keys=1, is_stable=False)
        return live(out)

    def sort3u32(k, w0, w1, salt):
        # the hypothetical 3-operand u32 sort (what sort_u64 accidentally
        # measured before the enable_x64 fix) kept for comparison
        out = lax.sort((k ^ salt, w0, w1), num_keys=1, is_stable=False)
        return live(out)

    def sort4u32(k, w0, w1, w2, salt):
        # key + 3 payload words (the record-shrink target of VERDICT r3 #2)
        out = lax.sort((k ^ salt, w0, w1, w2), num_keys=1, is_stable=False)
        return live(out)

    def sort_u64_payload(k, w0, w1, w2, w3, salt):
        # u32 KEY (native compare — unlike sort_u64's emulated 64-bit key
        # compare) + the 4 payload words packed into TWO u64 operands, which
        # the sort only PERMUTES, never compares.  If per-operand overhead
        # dominates payload cost (bytes moved are identical), this should
        # approach the 3xu32 time while carrying the full 128-bit record.
        with jax.enable_x64(True):
            p0 = w0.astype(jnp.uint64) << 32 | w1.astype(jnp.uint64)
            p1 = w2.astype(jnp.uint64) << 32 | w3.astype(jnp.uint64)
            out = lax.sort((k ^ salt, p0, p1), num_keys=1, is_stable=False)
            lo = lambda x: x.astype(jnp.uint32)
            hi = lambda x: (x >> 32).astype(jnp.uint32)
            outs = (out[0], hi(out[1]), lo(out[1]), hi(out[2]), lo(out[2]))
        return live(outs)

    def sort_u64_payload1(k, w0, w1, w2, w3, salt):
        # same but only w0/w1 packed: key + u64 + 2xu32 = 4 operands
        with jax.enable_x64(True):
            p0 = w0.astype(jnp.uint64) << 32 | w1.astype(jnp.uint64)
            out = lax.sort((k ^ salt, p0, w2, w3), num_keys=1, is_stable=False)
            lo = lambda x: x.astype(jnp.uint32)
            hi = lambda x: (x >> 32).astype(jnp.uint32)
            outs = (out[0], hi(out[1]), lo(out[1]), out[2], out[3])
        return live(outs)

    print(f"m={m}")
    print(f"5xu32 stable   : {timed(sort5, keys, *words):7.2f} ms")
    print(f"5xu32 unstable : {timed(sort5u, keys, *words):7.2f} ms")
    print(f"2xu32 unstable : {timed(sort2, keys, words[0]):7.2f} ms")
    print(f"3xu32 unstable : {timed(sort3u32, keys, words[0], words[1]):7.2f} ms")
    print(f"4xu32 unstable : {timed(sort4u32, keys, words[0], words[1], words[2]):7.2f} ms")
    print(f"u64-packed (3) : {timed(sort_u64, keys, *words):7.2f} ms")
    print(f"u64 payload (3): {timed(sort_u64_payload, keys, *words):7.2f} ms")
    print(f"u64 payload (4): {timed(sort_u64_payload1, keys, *words):7.2f} ms")


def extra():
    """Batched-rows + size-scaling variants (run: bench_sort.py extra).

    Measured (v5e, 2026-08-19, 5xu32 unstable):
        m=1M:  flat 1.98 ms/M | rows=8 1.84 | rows=32 1.36 | rows=128 0.76 | rows=512 1.76
        m=2M:  flat 2.08 ms/M | rows=8 2.22 | rows=32 1.48 | rows=128 0.90 | rows=512 1.04
        m=3M:  flat 2.56 ms/M | rows=8 2.42 | rows=32 2.34 | rows=128 1.67 | rows=512 1.56
    The row win needs ~8-16k-element rows (VMEM-resident per-row sorts), i.e.
    ~128 key-range regions at bonsai scale.  A region-partitioned sort is
    still a measured DEAD END: TPU has no scatter, so partitioning must go
    through the per-region mask+compact machinery whose cost is linear in
    the region count — ~1.4 ms per 8-way pass over the stream (extrapolated
    from the fused frontend's measured compaction cost), so reaching 64-128
    regions costs >= 2 passes ~ 2.9 ms and eats the entire ~2.5 ms sort
    saving.  rows=8 (reachable in one cheap pass) shows no sort win at all
    (2.22 vs 2.08 ms/M at m=2M)."""
    rng = np.random.default_rng(0)

    def live(outs):
        return sum(o[:, ::65536].astype(jnp.float32).sum() if o.ndim == 2
                   else o[::65536].astype(jnp.float32).sum() for o in outs)

    def make(m):
        keys = jnp.asarray(rng.integers(0, 1 << 32, m, dtype=np.uint64).astype(np.uint32))
        words = [jnp.asarray(rng.integers(0, 1 << 32, m, dtype=np.uint64).astype(np.uint32))
                 for _ in range(4)]
        return keys, words

    def sort5_flat(k, w0, w1, w2, w3, salt):
        out = lax.sort((k ^ salt, w0, w1, w2, w3), num_keys=1, is_stable=False)
        return live(out)

    def sort5_rows(rows):
        def f(k, w0, w1, w2, w3, salt):
            ops = tuple(x.reshape(rows, -1) for x in (k ^ salt, w0, w1, w2, w3))
            out = lax.sort(ops, dimension=1, num_keys=1, is_stable=False)
            return live(out)
        return f

    for m in (1_048_576, 2_097_152, 3_145_728):
        k, w = make(m)
        t = timed(sort5_flat, k, *w)
        print(f"m={m:9d} flat      : {t:7.2f} ms  ({t / (m/1e6):.2f} ms/M)")
        for rows in (8, 32, 128, 512):
            t = timed(sort5_rows(rows), k, *w)
            print(f"m={m:9d} rows={rows:4d} : {t:7.2f} ms  ({t / (m/1e6):.2f} ms/M)")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "extra":
        sys.argv.pop(1)
        extra()
    else:
        main()
