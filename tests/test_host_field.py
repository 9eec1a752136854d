"""Host tower arithmetic tests (ground-truth layer)."""

import pytest

from ripp_tpu.host.curves import bls12_377, bls12_381
from ripp_tpu.utils.fiat_shamir import SeededRng, rand_field

CURVES = [bls12_381, bls12_377]


def rand_elem(F, rng):
    return F.fromlist([rand_field(rng, F.p) for _ in range(F.degree)])


@pytest.mark.parametrize("mk", CURVES)
@pytest.mark.parametrize("level", ["fp", "fp2", "fp6", "fp12"])
def test_field_axioms(mk, level):
    c = mk()
    F = getattr(c.tower, level)
    rng = SeededRng(7)
    for _ in range(5):
        a, b, d = (rand_elem(F, rng) for _ in range(3))
        # commutativity / associativity / distributivity
        assert F.eq(F.mul(a, b), F.mul(b, a))
        assert F.eq(F.mul(F.mul(a, b), d), F.mul(a, F.mul(b, d)))
        assert F.eq(F.mul(a, F.add(b, d)), F.add(F.mul(a, b), F.mul(a, d)))
        # sqr consistency
        assert F.eq(F.sqr(a), F.mul(a, a))
        # inverse
        if not F.is_zero(a):
            assert F.eq(F.mul(a, F.inv(a)), F.one())
        # sub/neg
        assert F.is_zero(F.add(a, F.neg(a)))
        assert F.eq(F.sub(a, b), F.add(a, F.neg(b)))


@pytest.mark.parametrize("mk", CURVES)
def test_frobenius(mk):
    c = mk()
    T = c.tower
    rng = SeededRng(11)
    p = c.p
    a2 = rand_elem(T.fp2, rng)
    assert T.fp2.eq(T.frob_fp2(a2), T.fp2.pow(a2, p))
    a6 = rand_elem(T.fp6, rng)
    assert T.fp6.eq(T.frob_fp6(a6, 1), T.fp6.pow(a6, p))
    a12 = rand_elem(T.fp12, rng)
    f1 = T.frob_fp12(a12, 1)
    assert T.fp12.eq(f1, T.fp12.pow(a12, p))
    # frob composed twice == frob_fp12(.., 2)
    assert T.fp12.eq(T.frob_fp12(f1, 1), T.frob_fp12(a12, 2))
    # p^6 frobenius is conjugation
    a = a12
    for _ in range(6):
        a = T.frob_fp12(a, 1)
    assert T.fp12.eq(a, T.fp12_conj(a12))


@pytest.mark.parametrize("mk", CURVES)
def test_batch_inv(mk):
    c = mk()
    F = c.tower.fp
    rng = SeededRng(3)
    xs = [rand_field(rng, F.p) for _ in range(9)]
    xs[4] = 0
    out = F.batch_inv(xs)
    for x, y in zip(xs, out):
        if x == 0:
            assert y == 0
        else:
            assert F.mul(x, y) == 1
