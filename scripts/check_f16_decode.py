#!/usr/bin/env python
"""Exhaustive check: multiply-trick f16 decode vs the integer reference.

The candidate decode shifts the f16 exponent+mantissa into f32 position and
rescales with ONE f32 multiply by 2^112:

    f32 = bitcast(sign<<16 | (h & 0x7FFF) << 13) * 0x1p112

For f16 NORMALS this is exact by construction.  For f16 SUBNORMALS the
intermediate bitcast is an f32 subnormal, and exactness depends on the
hardware honoring subnormal multiply INPUTS (the product is normal).  This
script checks all 65536 bit patterns on whatever backend is active — run it
once on TPU before trusting the trick in kernels (CPU honors subnormals).

Exit 0 = bit-identical on all finite patterns (inf/NaN patterns never occur
in our streams; they are reported separately for completeness).
"""

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from websplat_tpu.ops.packing import f16_bits_to_f32


def decode_fast(bits):
    h = bits & np.uint32(0xFFFF)
    shifted = ((h & np.uint32(0x8000)) << np.uint32(16)) | (
        (h & np.uint32(0x7FFF)) << np.uint32(13)
    )
    return lax.bitcast_convert_type(shifted, jnp.float32) * np.float32(
        5.192296858534827628e33  # 0x1p112
    )


def main():
    print("backend:", jax.default_backend())
    bits = jnp.arange(65536, dtype=jnp.uint32)
    ref = jax.jit(f16_bits_to_f32)(bits)
    fast = jax.jit(decode_fast)(bits)
    ref_b = np.asarray(
        jax.jit(lambda x: lax.bitcast_convert_type(x, jnp.uint32))(ref)
    )
    fast_b = np.asarray(
        jax.jit(lambda x: lax.bitcast_convert_type(x, jnp.uint32))(fast)
    )
    h = np.arange(65536, dtype=np.uint32)
    exp = (h >> 10) & 0x1F
    finite = exp != 31
    sub = (exp == 0) & ((h & 0x3FF) != 0)
    mism_fin = np.nonzero((ref_b != fast_b) & finite)[0]
    mism_sub = np.nonzero((ref_b != fast_b) & sub)[0]
    mism_inf = np.nonzero((ref_b != fast_b) & ~finite)[0]
    print(f"finite mismatches: {len(mism_fin)} (subnormal: {len(mism_sub)})")
    print(f"inf/nan-pattern mismatches: {len(mism_inf)}")
    if len(mism_fin):
        k = mism_fin[0]
        print(f"  first: h={k:#06x} ref={ref_b[k]:#010x} fast={fast_b[k]:#010x}")
    sys.exit(0 if len(mism_fin) == 0 else 1)


if __name__ == "__main__":
    main()
