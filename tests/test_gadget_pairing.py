"""In-circuit pairing gadget tests (host-only, no JAX).

The gadget tower is built from the same generic extension classes as the
host tower, so every level is checked for exact value parity against the
host ground truth on BLS12-377 (the olr inner curve: its base field is
BW6-761's scalar field, making all gadget arithmetic native)."""

from ripp_tpu.applications import groth16 as g16
from ripp_tpu.applications.gadget_pairing import (
    CircuitBuilder,
    PairingGadget,
)
from ripp_tpu.applications.groth16_recursion import build_verifier_circuit
from ripp_tpu.host import pairing as hp
from ripp_tpu.host.curves import bls12_377
from ripp_tpu.utils.fiat_shamir import SeededRng


def _pg():
    cv = bls12_377()
    bld = CircuitBuilder(cv.p, 0)
    bld.set_publics([])
    return cv, bld, PairingGadget(cv, bld)


def test_gadget_tower_matches_host():
    cv, bld, pg = _pg()
    t = pg.t
    host_t = cv.tower
    a = host_t.fp12.fromlist([3 * i + 7 for i in range(12)])
    b = host_t.fp12.fromlist([5 * i + 11 for i in range(12)])
    ga, gb = t.witness_fp12(a), t.witness_fp12(b)
    assert t.value_fp12(t.fp12.mul(ga, gb)) == host_t.fp12.mul(a, b)
    assert t.value_fp12(t.fp12.sqr(ga)) == host_t.fp12.sqr(a)
    assert t.value_fp12(t.fp12.inv(ga)) == host_t.fp12.inv(a)
    for power in (1, 2, 3):  # the powers the final exp uses (the shared
        # frob6_c1/c2 tables only cover i < 6, as in the host tower)
        assert t.value_fp12(t.frob_fp12(ga, power)) == \
            host_t.frob_fp12(a, power)
    cs, z = bld.finish()
    assert cs.is_satisfied(z, cv.p)


def test_gadget_miller_and_final_exp_match_host():
    cv, bld, pg = _pg()
    P = cv.g1.scalar_mul(cv.g1_gen, 5)
    Q = cv.g2.scalar_mul(cv.g2_gen, 7)
    gp, gq = pg.witness_g1(P), pg.witness_g2(Q)
    f = pg.miller_loop(gp, gq)
    expect_f = hp.miller_loop(cv, P, Q)
    assert pg.t.value_fp12(f) == expect_f
    e = pg.final_exponentiation(f)
    expect_e = hp.final_exponentiation(cv, expect_f)
    assert pg.t.value_fp12(e) == expect_e
    pg.enforce_fp12_eq(e, pg.t.embed_fp12(expect_e))
    cs, z = bld.finish()
    assert cs.is_satisfied(z, cv.p)


def test_gadget_on_curve_checks_reject():
    cv, bld, pg = _pg()
    P = cv.g1.scalar_mul(cv.g1_gen, 5)
    bad = (P[0], (P[1] + 1) % cv.p)
    try:
        pg.witness_g1(bad)
    except AssertionError:
        pass
    cs, z = bld.finish()
    # the on-curve constraint for the bad point must fail
    assert not cs.is_satisfied(z, cv.p)


def test_verifier_circuit_roundtrip():
    """The olr inner building block: the circuit accepts a valid inner
    proof and rejects a tampered public input."""
    cv = bls12_377()
    cs_in = g16.sum_circuit(4)
    pk = g16.setup(cv, cs_in, SeededRng(31))
    z = g16.sum_circuit_assignment(cs_in, [3, 4, 5, 6], 18, cv.r)
    prf = g16.prove(cv, pk, cs_in, z, SeededRng(32))
    pubs = z[1:cs_in.num_public + 1]
    assert g16.verify(cv, pk.vk, pubs, prf)

    cs, zz = build_verifier_circuit(pk.vk, [pubs], [prf], 32, cv)
    assert cs.is_satisfied(zz, cv.p)

    bad = list(pubs)
    bad[0] = (bad[0] + 1) % cv.r
    cs2, zz2 = build_verifier_circuit(pk.vk, [bad], [prf], 32, cv)
    assert not cs2.is_satisfied(zz2, cv.p)
