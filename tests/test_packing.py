"""Record codec unit tests: e5m12 conic minifloat, op12, PSD guarantee.

The conic codec is round 4's replacement for f16 (packing.py header): the
full-scale PSNR attribution showed f16 conic rounding capped the pipeline
at ~53 dB, and independently-rounded (a, b, c) could break PSD-ness on
diagonal needles (alpha explodes into the 0.99 clamp along the needle).
"""

import jax
import numpy as np
import pytest

import jax.numpy as jnp

from websplat_tpu.ops import packing as P


def test_e5m12_roundtrip_precision():
    rng = np.random.default_rng(0)
    # in-range draws: the CONIC_SCALE-scaled conic halves stay <= ~5120
    # (l2 eigenvalue clamp 0.1 -> conic <= 10), far from E5M12_MAX
    x = np.float32(np.minimum(rng.lognormal(-2, 3, 50000), 3e4))
    dec = np.asarray(P.e5m12_bits_to_f32(P.f32_to_e5m12_bits(jnp.asarray(x))))
    normal = x > 6.2e-5
    rel = np.abs(dec - x) / x
    # RTNE with a 12-bit mantissa: half-ulp = 2^-13 ~ 1.221e-4
    assert rel[normal].max() <= 2.0 ** -13 * 1.001
    # strictly better than f16 on the same values
    relf16 = np.abs(x.astype(np.float16).astype(np.float32) - x) / x
    assert rel[normal].max() < relf16[normal].max()


def test_e5m12_hand_fixture():
    # independent hand-computed patterns: e5 bias 15, 12-bit mantissa.
    # 1.0 -> exp field 15, mantissa 0 -> bits 15<<12 = 61440
    # 1.5 -> mantissa 0x800 -> 61440 + 2048
    # 2^-14 (min normal) -> exp 1, man 0 -> 4096
    # 2^-26 (min subnormal) -> bits 1
    vals = np.float32([1.0, 1.5, 2.0 ** -14, 2.0 ** -26])
    bits = np.asarray(P.f32_to_e5m12_bits(jnp.asarray(vals)))
    assert bits.tolist() == [61440, 61440 + 2048, 4096, 1]
    back = np.asarray(P.e5m12_bits_to_f32(jnp.asarray(bits)))
    np.testing.assert_array_equal(back, vals)


def test_e5m12_max_clamp_stays_in_exp30():
    # E5M12_MAX is the largest exponent-field-30 value; the clamp + RTNE
    # must never carry into exponent field 31 (ADVICE r4: the old 65532
    # clamp rounded up to a field-31 code)
    vals = np.float32([65528.0, 65530.0, 1e9, np.float32(P.E5M12_MAX)])
    bits = np.asarray(P.f32_to_e5m12_bits(jnp.asarray(vals)))
    assert ((bits >> 12) <= 30).all()
    back = np.asarray(P.e5m12_bits_to_f32(jnp.asarray(bits)))
    assert (back == 65528.0).all()


def test_op12_codec():
    op = np.float32(np.linspace(0.0, 1.0, 4097))
    dec = np.asarray(P.op12_bits_to_f32(P.f32_to_op12_bits(jnp.asarray(op))))
    assert dec[0] == 0.0
    assert abs(dec[-1] - 1.0) < 1e-6
    assert np.abs(dec - op).max() < 3e-4
    assert (np.diff(dec) >= 0).all()  # monotone


def test_record_psd_guarantee_on_needles():
    """Decoded quadratic form must be STRICTLY PSD even for rho -> +-1
    diagonal needles: the rho16 codec rebuilds B from the DECODED diagonal
    with |rho| <= 1 - 2^-15 strictly (packing.pack_record), so
    disc = 4 A'C'(1 - rho^2) > 0 by construction."""
    rng = np.random.default_rng(2)
    n = 50000
    # production conic range: eigenvalue clamp 0.1 bounds entries by 10
    a = np.float32(np.minimum(rng.lognormal(-6, 3, n), 10.0))
    c = np.float32(np.minimum(rng.lognormal(-6, 3, n), 10.0))
    rho = np.clip(
        np.float32(np.sign(rng.normal(size=n)) * (1 - rng.lognormal(-18, 4, n))),
        -1, 1,
    )
    b = rho * 2 * np.sqrt(a * c)
    cq = P.CenterQuant.for_viewport(1200, 799)
    z = jnp.zeros(n)
    w0, w1, w2, w3 = P.pack_record(
        z + 5, z + 5, jnp.asarray(a), jnp.asarray(b), jnp.asarray(c),
        z + 0.5, (z + 1, z + 1, z + 1), cq,
    )
    _, _, ha, bb, hc, op, _, _, _ = P.unpack_record(w0, w1, w2, w3, cq)
    ha, bb, hc = np.asarray(ha), np.asarray(bb), np.asarray(hc)
    disc = 4 * ha * hc - bb * bb
    assert (disc > 0).all(), f"non-PSD decodes: {(disc <= 0).sum()}"
    # precision on the diagonal is e5m12-grade (normal range; scaled
    # subnormals below 6e-8 carry the fixed 2^-26 step instead)
    nrm = a * float(P.CONIC_SCALE) > 6.2e-5
    assert (np.abs(ha - a) / a)[nrm].max() < 3e-4
    assert np.abs(np.asarray(op) - 0.5).max() < 3e-4


def test_record_decode_matches_pallas_decoder():
    """packing.unpack_record and the Pallas kernel's _decode_conic_op must
    agree bit-for-bit on the same words (single source of truth check)."""
    from websplat_tpu.ops.rasterize_pallas import _decode_conic_op

    rng = np.random.default_rng(3)
    n = 8 * 128
    a = np.float32(rng.lognormal(-6, 3, n))
    c = np.float32(rng.lognormal(-6, 3, n))
    b = np.float32(rng.normal(0, 1, n)) * np.sqrt(a * c)
    op = np.float32(rng.uniform(0, 1, n))
    cq = P.CenterQuant.for_viewport(1200, 799)
    z = jnp.zeros(n)
    w0, w1, w2, w3 = P.pack_record(
        z + 5, z + 5, jnp.asarray(a), jnp.asarray(b), jnp.asarray(c),
        jnp.asarray(op), (z + 1, z + 1, z + 1), cq,
    )
    _, _, ha, bb, hc, oo, _, _, _ = P.unpack_record(w0, w1, w2, w3, cq)
    # the kernel decoder uses pltpu.bitcast -> run it through an
    # interpret-mode pallas_call
    from jax.experimental import pallas as pl

    def k(w1_ref, w2_ref, o0, o1, o2, o3):
        ha_, bb_, hc_, oo_ = _decode_conic_op(w1_ref[...], w2_ref[...])
        o0[...], o1[...], o2[...], o3[...] = ha_, bb_, hc_, oo_

    outs = pl.pallas_call(
        k,
        out_shape=[jax.ShapeDtypeStruct((8, 128), jnp.float32)] * 4,
        interpret=True,
    )(jnp.asarray(w1).reshape(8, 128), jnp.asarray(w2).reshape(8, 128))
    ha2, bb2, hc2, oo2 = outs
    np.testing.assert_array_equal(np.asarray(ha), np.asarray(ha2).reshape(-1))
    # bb is a 3-multiply chain; XLA may contract differently inside the
    # interpreted pallas_call — allow 1 ulp
    np.testing.assert_allclose(
        np.asarray(bb), np.asarray(bb2).reshape(-1), rtol=3e-5, atol=1e-30
    )
    np.testing.assert_array_equal(np.asarray(hc), np.asarray(hc2).reshape(-1))
    np.testing.assert_array_equal(np.asarray(oo), np.asarray(oo2).reshape(-1))
