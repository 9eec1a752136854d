"""Differential tests for the RNS-Montgomery MXU multiplier prototype.

Checks ops/fp_rns.py against host Python-int arithmetic: single products,
chained products (the < 4p representative invariant must be closed under
chaining), and the redundant-channel/base-B residue consistency that the
Shenoy-Kumaresan extension relies on.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from ripp_tpu.ops.fp_rns import (
    MR_MASK,
    from_rns_base_a,
    make_rns_mul,
    rns_spec,
    to_rns,
)

P381 = 0x1A0111EA397FE69A4B1BA7B6434BACD764774B84F38512BF6730D2A0F6B0F6241EABFFFEB153FFFFB9FEFFFFFFFFAAAB


def _rng_vals(n, bound, seed):
    rng = np.random.default_rng(seed)
    return [int.from_bytes(rng.bytes(64), "little") % bound for _ in range(n)]


def test_rns_mul_matches_host_single():
    s = rns_spec(P381)
    MA = s["MA"]
    n = 32
    a = _rng_vals(n, P381, 1)
    b = _rng_vals(n, P381, 2)
    mul = jax.jit(make_rns_mul(P381))
    out = mul(to_rns(P381, a), to_rns(P381, b))
    got = from_rns_base_a(P381, np.asarray(out[0]))
    MAinv = pow(MA, -1, P381)
    want = [(x * y * MAinv) % P381 for x, y in zip(a, b)]
    assert got == want


def test_rns_mul_edge_values():
    """0/1/p-1 operands — a zero operand gives q=0, all sigma=0 and an
    alpha estimate of floor(-2^-10) = -1, the deterministic trigger of
    the negative-float alpha cast (ADVICE r4): must stay exact."""
    a = [0, 1, P381 - 1, 0, 7, P381 - 1, 1, 0]
    b = [5, 0, P381 - 1, 0, 0, 1, 1, P381 - 1]
    s = rns_spec(P381)
    MAinv = pow(s["MA"], -1, P381)
    mul = jax.jit(make_rns_mul(P381))
    out = mul(to_rns(P381, a), to_rns(P381, b))
    got = from_rns_base_a(P381, np.asarray(out[0]))
    want = [(x * y * MAinv) % P381 for x, y in zip(a, b)]
    assert got == want


def test_rns_mul_residue_consistency():
    """Base-B and redundant-channel residues agree with the base-A value."""
    s = rns_spec(P381)
    n = 8
    a = _rng_vals(n, 4 * P381, 3)
    b = _rng_vals(n, 4 * P381, 4)
    mul = jax.jit(make_rns_mul(P381))
    rA, rB, rr = mul(to_rns(P381, a), to_rns(P381, b))
    rA, rB, rr = np.asarray(rA), np.asarray(rB), np.asarray(rr)
    # reconstruct the actual integer representative from base A (exact: < MA)
    MA = s["MA"]
    for i in range(n):
        v = 0
        for m, r in zip(s["mA"], rA[:, i]):
            Mi = MA // m
            v += int(r) * Mi * pow(Mi % m, -1, m)
        v %= MA
        assert v < 4 * P381, "representative bound violated"
        for m, r in zip(s["mB"], rB[:, i]):
            assert v % m == int(r)
        assert v & MR_MASK == int(rr[i])


def test_rns_mul_chain_stability():
    """200 chained muls: invariant holds and the value tracks host math."""
    s = rns_spec(P381)
    MA = s["MA"]
    MAinv = pow(MA, -1, P381)
    n = 4
    xs = _rng_vals(n, P381, 5)
    ys = _rng_vals(n, P381, 6)
    mul = jax.jit(make_rns_mul(P381))
    acc_dev = to_rns(P381, xs)
    y_dev = to_rns(P381, ys)
    acc_host = list(xs)
    for _ in range(200):
        acc_dev = mul(acc_dev, y_dev)
        acc_host = [(x * y * MAinv) % P381 for x, y in zip(acc_host, ys)]
    got = from_rns_base_a(P381, np.asarray(acc_dev[0]))
    assert got == acc_host


def test_rns_spec_sanity():
    s = rns_spec(P381)
    assert len(set(s["mA"]) | set(s["mB"])) == 2 * s["k"]
    assert s["MA"] > 16 * P381 * (s["k"] + 2)
    assert s["MB"] > 4 * P381
    # all int8 matrix entries are 7-bit digits
    assert s["W1"].min() >= 0 and s["W1"].max() <= 127
    assert s["W2"].min() >= 0 and s["W2"].max() <= 127
