"""Differential tests for the native (C) host-math backend against plain
python-int ground truth, plus fallback behavior.

The native library (ripp_tpu/native) is the framework's analog of the
arkworks ark-ff/ark-ec host arithmetic (SURVEY.md section 2.3); it must be
bit-exact with the pure-Python host model since Fiat-Shamir transcripts
hash its outputs.
"""

import random

import pytest

from ripp_tpu.host.curves import get_curve
from ripp_tpu.native.hostmath import NativeFp, NativeSW, load

pytestmark = pytest.mark.skipif(load() is None,
                                reason="native toolchain unavailable")

P381 = get_curve("bls12_381").p


def test_fp_ops_match_python_ints():
    f = NativeFp(P381)
    rng = random.Random(10)
    for _ in range(100):
        a, b = rng.randrange(P381), rng.randrange(P381)
        assert f.mul(a, b) == a * b % P381
        assert f.inv(a) == pow(a, -1, P381)
        e = rng.randrange(1 << 300)
        assert f.pow(a, e) == pow(a, e, P381)


def test_fp_batch_inv_zero_safe():
    f = NativeFp(P381)
    rng = random.Random(11)
    xs = [rng.randrange(P381) for _ in range(17)] + [0, 1, P381 - 1]
    out = f.batch_inv(xs)
    for x, o in zip(xs, out):
        assert o == (0 if x == 0 else pow(x, -1, P381))


@pytest.mark.parametrize("curve_name", ["bls12_381", "bls12_377",
                                        "bls12_toy"])
def test_scalar_mul_matches_python_group_law(curve_name):
    c = get_curve(curve_name)
    f = NativeFp(c.p)
    g1 = NativeSW(f, 1)
    g2 = NativeSW(f, 2, beta=c.tower.beta)
    rng = random.Random(12)
    for _ in range(4):
        k = rng.randrange(c.r)
        # python path forced by calling the affine double-and-add directly
        acc = None
        for bit in bin(k)[2:]:
            acc = c.g1.double(acc)
            if bit == "1":
                acc = c.g1.add(acc, c.g1_gen)
        assert g1.scalar_mul(c.g1_gen, k) == acc
    k = rng.randrange(c.r)
    acc = None
    for bit in bin(k)[2:]:
        acc = c.g2.double(acc)
        if bit == "1":
            acc = c.g2.add(acc, c.g2_gen)
    assert g2.scalar_mul(c.g2_gen, k) == acc


def test_scalar_mul_edge_cases():
    c = get_curve("bls12_toy")
    f = NativeFp(c.p)
    g1 = NativeSW(f, 1)
    assert g1.scalar_mul(c.g1_gen, 0) is None
    assert g1.scalar_mul(None, 5) is None
    assert g1.scalar_mul(c.g1_gen, 1) == c.g1_gen
    # r * gen = identity
    assert g1.scalar_mul_batch(c.g1_gen, [c.r])[0] is None
    # k and k + r agree after the host layer's reduction
    assert (c.g1.scalar_mul(c.g1_gen, 7)
            == c.g1.scalar_mul(c.g1_gen, 7 + c.r))


def test_msm_matches_naive():
    c = get_curve("bls12_toy")
    f = NativeFp(c.p)
    g1 = NativeSW(f, 1)
    rng = random.Random(13)
    pts = g1.scalar_mul_batch(c.g1_gen, [rng.randrange(1, c.r)
                                         for _ in range(40)])
    ks = [rng.randrange(c.r) for _ in range(40)]
    want = None
    for p, k in zip(pts, ks):
        q = g1.scalar_mul(p, k)
        want = q if want is None else c.g1.add(want, q)
    assert g1.msm(pts, ks) == want
    # identity points and zero scalars are skipped
    assert g1.msm([None, pts[0]], [5, 0]) is None


def test_sw_curve_native_binding_active():
    """The host SWCurve should transparently bind the native backend for
    a=0 curves (and produce identical points either way)."""
    c = get_curve("bls12_381")
    nat = c.g1._native_group()
    assert nat is not None
    k = 0x1234567890ABCDEF
    want = nat.scalar_mul(c.g1_gen, k)
    assert c.g1.scalar_mul(c.g1_gen, k) == want


def test_in_subgroup_nonvacuous():
    """Regression: in_subgroup must not reduce the scalar mod the order
    (it used to, making the check vacuously true)."""
    c = get_curve("bls12_381")
    assert c.g1.in_subgroup(c.g1_gen)
    # a point on the curve but outside the r-subgroup (cofactor != 1)
    pt = None
    i = 1
    while pt is None:
        cand = c.g1.point_from_x(c.g1.F.from_int(i), greatest=True)
        if cand is not None and not c.g1.in_subgroup(cand):
            pt = cand
        i += 1
    assert c.g1.is_on_curve(pt) and not c.g1.in_subgroup(pt)
