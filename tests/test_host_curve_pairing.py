"""Host curve group law + pairing tests."""

import pytest

from ripp_tpu.host import pairing as hp
from ripp_tpu.host.curves import bls12_377, bls12_381, jubjub
from ripp_tpu.utils.fiat_shamir import SeededRng, rand_field, rand_sw_point

CURVES = [bls12_381, bls12_377]


@pytest.mark.parametrize("mk", CURVES)
@pytest.mark.parametrize("grp", ["g1", "g2"])
def test_group_law(mk, grp):
    c = mk()
    curve = getattr(c, grp)
    gen = c.g1_gen if grp == "g1" else c.g2_gen
    rng = SeededRng(5)
    assert curve.is_on_curve(gen) and curve.in_subgroup(gen)
    P = rand_sw_point(rng, curve)
    Q = rand_sw_point(rng, curve)
    assert curve.is_on_curve(P) and curve.in_subgroup(P)
    # commutativity, associativity
    assert curve.eq(curve.add(P, Q), curve.add(Q, P))
    R = curve.add(P, gen)
    assert curve.eq(curve.add(R, Q), curve.add(P, curve.add(gen, Q)))
    # identity / inverse
    assert curve.eq(curve.add(P, None), P)
    assert curve.add(P, curve.neg(P)) is None
    # doubling == add self
    assert curve.eq(curve.double(P), curve.add(P, P))
    # scalar mul distributes
    a, b = 1234567, 891011
    assert curve.eq(
        curve.scalar_mul(P, a + b),
        curve.add(curve.scalar_mul(P, a), curve.scalar_mul(P, b)),
    )


@pytest.mark.parametrize("mk", CURVES)
def test_host_msm(mk):
    c = mk()
    rng = SeededRng(9)
    pts = [rand_sw_point(rng, c.g1) for _ in range(8)]
    scalars = [rand_field(rng, c.r) for _ in range(8)]
    expect = None
    for p, s in zip(pts, scalars):
        expect = c.g1.add(expect, c.g1.scalar_mul(p, s))
    got = c.g1.msm(pts, scalars)
    assert c.g1.eq(got, expect)


@pytest.mark.parametrize("mk", CURVES)
def test_pairing_bilinearity(mk):
    c = mk()
    F = c.tower.fp12
    e = hp.pairing(c, c.g1_gen, c.g2_gen)
    assert not F.eq(e, F.one())
    assert F.eq(c.tower.cyclotomic_pow(e, c.r), F.one())
    a, b = 0xDEADBEEF, 0xCAFEBABE
    lhs = hp.pairing(
        c, c.g1.scalar_mul(c.g1_gen, a), c.g2.scalar_mul(c.g2_gen, b)
    )
    rhs = c.tower.cyclotomic_pow(e, (a * b) % c.r)
    assert F.eq(lhs, rhs)
    # additivity in the left slot via multi_pairing
    P2 = c.g1.scalar_mul(c.g1_gen, 7)
    lhs2 = hp.multi_pairing(c, [c.g1_gen, P2], [c.g2_gen, c.g2_gen])
    rhs2 = hp.pairing(c, c.g1.add(c.g1_gen, P2), c.g2_gen)
    assert F.eq(lhs2, rhs2)


def test_jubjub_group():
    j = jubjub()
    cur = j.curve
    rng = SeededRng(4)
    g = j.gen
    assert cur.is_on_curve(g)
    a, b = 123456789, 987654321
    assert cur.eq(
        cur.scalar_mul(g, a + b),
        cur.add(cur.scalar_mul(g, a), cur.scalar_mul(g, b)),
    )
    assert cur.is_identity(cur.scalar_mul(g, j.r))
