"""Differential tests: device Montgomery limb kernels vs host ints."""

import pytest

import jax.numpy as jnp

from ripp_tpu.host.curves import bls12_381
from ripp_tpu.ops.fp import DevFp, make_spec
from ripp_tpu.ops.tower import dev_tower
from ripp_tpu.utils.fiat_shamir import SeededRng, rand_field

N = 4  # tiny batch: correctness only; perf is measured in bench.py


@pytest.fixture(scope="module")
def setup():
    c = bls12_381()
    t = dev_tower("bls12_381")
    rng = SeededRng(123)
    return c, t, rng


def test_fp_ops(setup):
    c, t, rng = setup
    F = t.fp
    spec = t.spec_fp
    xs = [rand_field(rng, c.p) for _ in range(N)] + [0, 1, c.p - 1]
    ys = [rand_field(rng, c.p) for _ in range(N)] + [c.p - 1, 0, c.p - 1]
    a = jnp.asarray(spec.to_mont_limbs(xs))
    b = jnp.asarray(spec.to_mont_limbs(ys))
    assert spec.from_mont_limbs(F.add(a, b)) == [
        (x + y) % c.p for x, y in zip(xs, ys)
    ]
    assert spec.from_mont_limbs(F.sub(a, b)) == [
        (x - y) % c.p for x, y in zip(xs, ys)
    ]
    assert spec.from_mont_limbs(F.mul(a, b)) == [
        (x * y) % c.p for x, y in zip(xs, ys)
    ]
    assert spec.from_mont_limbs(F.neg(a)) == [(-x) % c.p for x in xs]
    got_inv = spec.from_mont_limbs(F.inv(a))
    for x, g in zip(xs, got_inv):
        assert g == (pow(x, -1, c.p) if x else 0)


def test_fr_ops(setup):
    c, t, rng = setup
    F = t.fr
    spec = t.spec_fr
    xs = [rand_field(rng, c.r) for _ in range(N)]
    ys = [rand_field(rng, c.r) for _ in range(N)]
    a = jnp.asarray(spec.to_mont_limbs(xs))
    b = jnp.asarray(spec.to_mont_limbs(ys))
    assert spec.from_mont_limbs(F.mul(a, b)) == [
        (x * y) % c.r for x, y in zip(xs, ys)
    ]


def test_fp2_fp12_ops(setup):
    c, t, rng = setup
    h2, h12 = c.tower.fp2, c.tower.fp12
    xs2 = [(rand_field(rng, c.p), rand_field(rng, c.p)) for _ in range(N)]
    ys2 = [(rand_field(rng, c.p), rand_field(rng, c.p)) for _ in range(N)]
    a = t.fp2_to_dev(xs2)
    b = t.fp2_to_dev(ys2)
    got = t.fp2_from_dev(t.fp2.mul(a, b))
    assert got == [h2.mul(x, y) for x, y in zip(xs2, ys2)]
    got_inv = t.fp2_from_dev(t.fp2.inv(a))
    assert got_inv == [h2.inv(x) for x in xs2]
    # fp12
    def r12():
        return h12.fromlist([rand_field(rng, c.p) for _ in range(12)])
    xs12 = [r12() for _ in range(N)]
    ys12 = [r12() for _ in range(N)]
    a12 = t.fp12_to_dev(xs12)
    b12 = t.fp12_to_dev(ys12)
    got12 = t.fp12_from_dev(t.fp12.mul(a12, b12))
    assert got12 == [h12.mul(x, y) for x, y in zip(xs12, ys12)]
    gots = t.fp12_from_dev(t.fp12.sqr(a12))
    assert gots == [h12.sqr(x) for x in xs12]
