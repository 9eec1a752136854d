"""Differential tests: device complete-formula curve kernels vs host."""

import pytest

import jax

from ripp_tpu.host.curves import bls12_381
from ripp_tpu.ops.points import dev_ctx
from ripp_tpu.utils.fiat_shamir import SeededRng, rand_field, rand_sw_point

N = 4


@pytest.fixture(scope="module")
def ctx():
    return dev_ctx("bls12_381")


@pytest.fixture(scope="module")
def rng():
    return SeededRng(77)


@pytest.mark.parametrize("grp", ["g1", "g2"])
def test_group_ops(ctx, rng, grp):
    host = ctx.host
    curve = getattr(host, grp)
    dcurve = getattr(ctx, grp)
    to_dev = getattr(ctx, f"{grp}_to_dev")
    from_dev = getattr(ctx, f"{grp}_from_dev")
    P = [rand_sw_point(rng, curve) for _ in range(N)]
    Q = [rand_sw_point(rng, curve) for _ in range(N)]
    dP, dQ = to_dev(P), to_dev(Q)
    # roundtrip
    assert all(curve.eq(a, b) for a, b in zip(from_dev(dP), P))
    # add / double vs host
    assert all(
        curve.eq(a, curve.add(p, q))
        for a, p, q in zip(from_dev(dcurve.add(dP, dQ)), P, Q)
    )
    assert all(
        curve.eq(a, curve.double(p))
        for a, p in zip(from_dev(dcurve.double(dP)), P)
    )
    # completeness edge cases: P+(-P)=inf, P+inf=P, inf+inf=inf, P+P=2P
    assert all(z is None for z in from_dev(dcurve.add(dP, dcurve.neg(dP))))
    dinf = to_dev([None] * N)
    assert all(
        curve.eq(a, p) for a, p in zip(from_dev(dcurve.add(dP, dinf)), P)
    )
    assert all(z is None for z in from_dev(dcurve.add(dinf, dinf)))
    assert all(
        curve.eq(a, curve.double(p))
        for a, p in zip(from_dev(dcurve.add(dP, dP)), P)
    )


def test_scalar_mul_and_reduce(ctx, rng):
    host = ctx.host
    curve = host.g1
    P = [rand_sw_point(rng, curve) for _ in range(N)]
    dP = ctx.g1_to_dev(P)
    # shared scalar
    k = rand_field(rng, host.r)
    got = ctx.g1_from_dev(ctx.g1.scalar_mul_bits(dP, ctx.scalar_bits(k, 128)))
    assert all(
        curve.eq(a, curve.scalar_mul(p, k % (1 << 128)))
        for a, p in zip(got, P)
    )
    # per-element scalars
    ks = [rand_field(rng, host.r) for _ in range(N)]
    got2 = ctx.g1_from_dev(
        ctx.g1.scalar_mul_bits(dP, ctx.scalars_to_bits(ks, 255))
    )
    assert all(
        curve.eq(a, curve.scalar_mul(p, kk)) for a, p, kk in zip(got2, P, ks)
    )
    # sum reduce (non power of two length exercised via N=4 plus a slice of 3)
    red = ctx.g1.sum_reduce(dP)
    red_h = ctx.g1_from_dev(jax.tree.map(lambda x: x[None], red))[0]
    expect = None
    for p in P:
        expect = curve.add(expect, p)
    assert curve.eq(red_h, expect)
    dP3 = jax.tree.map(lambda x: x[:3], dP)
    red3 = ctx.g1.sum_reduce(dP3)
    red3_h = ctx.g1_from_dev(jax.tree.map(lambda x: x[None], red3))[0]
    expect3 = None
    for p in P[:3]:
        expect3 = curve.add(expect3, p)
    assert curve.eq(red3_h, expect3)


def test_fr_limbs_to_bits(ctx, rng):
    host = ctx.host
    ks = [rand_field(rng, host.r) for _ in range(N)]
    fr_dev = ctx.t.fr_to_dev(ks)
    bits = ctx.fr_limbs_to_bits(fr_dev)
    import numpy as np

    b = np.asarray(bits)
    nbits = b.shape[-1]
    for j, k in enumerate(ks):
        v = 0
        for i in range(nbits):
            v = (v << 1) | int(b[j, i])
        assert v == k
