"""Application-layer round-trips: KZG, two-tier polynomial commitments
(trusted + transparent), Groth16 aggregation end-to-end.

Runs on the toy BLS12 parameterization — identical code paths to
BLS12-381 at ~20x lower kernel-compile cost (tests/parallel_check.py
rationale); the real-curve path is covered by test_protocols.py."""

import pytest

from ripp_tpu.applications import (
    groth16,
    groth16_aggregation as agg,
    kzg,
    poly_commit as pc,
    poly_commit_transparent as tpc,
)
from ripp_tpu.ops.points import dev_ctx
from ripp_tpu.utils.fiat_shamir import SeededRng, rand_field
from ripp_tpu.utils.poly import poly_eval


@pytest.fixture(scope="module")
def ctx():
    return dev_ctx("bls12_toy")


def test_kzg(ctx):
    rng = SeededRng(20)
    r = ctx.host.r
    degree = 15
    coeffs = [rand_field(rng, r) for _ in range(degree + 1)]
    powers, v_srs = kzg.setup(ctx, rng, degree)
    com = kzg.commit(powers, coeffs)
    z = rand_field(rng, r)
    proof = kzg.open(powers, coeffs, z)
    ev = poly_eval(coeffs, z, r)
    assert kzg.verify(ctx, v_srs, com, z, ev, proof)
    assert not kzg.verify(ctx, v_srs, com, z, (ev + 1) % r, proof)


def test_bivariate_poly_commit_trusted(ctx):
    rng = SeededRng(21)
    r = ctx.host.r
    x_deg, y_deg = 3, 3
    poly = pc.BivariatePolynomial([
        [rand_field(rng, r) for _ in range(y_deg + 1)]
        for _ in range(x_deg + 1)
    ])
    srs = pc.setup(ctx, rng, x_deg, y_deg)
    v_srs = srs.ip_srs.get_verifier_key()
    com, y_coms = pc.commit(ctx, srs, poly)
    point = (rand_field(rng, r), rand_field(rng, r))
    proof = pc.open(ctx, srs, poly, y_coms, point)
    ev = poly.evaluate(point, r)
    assert pc.verify(ctx, v_srs, com, point, ev, proof)
    assert not pc.verify(ctx, v_srs, com, point, (ev + 1) % r, proof)


def test_univariate_poly_commit_trusted(ctx):
    rng = SeededRng(22)
    r = ctx.host.r
    degree = 15
    coeffs = [rand_field(rng, r) for _ in range(degree + 1)]
    srs = pc.setup_univariate(ctx, rng, degree)
    v_srs = srs.ip_srs.get_verifier_key()
    com, y_coms = pc.commit_univariate(ctx, srs, coeffs)
    z = rand_field(rng, r)
    proof = pc.open_univariate(ctx, srs, coeffs, y_coms, z)
    ev = poly_eval(coeffs, z, r)
    assert pc.verify_univariate(ctx, v_srs, degree, com, z, ev, proof)


def test_bivariate_poly_commit_transparent(ctx):
    rng = SeededRng(23)
    r = ctx.host.r
    x_deg, y_deg = 3, 3
    poly = pc.BivariatePolynomial([
        [rand_field(rng, r) for _ in range(y_deg + 1)]
        for _ in range(x_deg + 1)
    ])
    ck = tpc.setup(ctx, rng, x_deg, y_deg)
    com, y_coms = tpc.commit(ctx, ck, poly)
    point = (rand_field(rng, r), rand_field(rng, r))
    proof = tpc.open(ctx, ck, poly, y_coms, point)
    ev = poly.evaluate(point, r)
    assert tpc.verify(ctx, ck, com, point, ev, proof)
    assert not tpc.verify(ctx, ck, com, point, (ev + 1) % r, proof)


def test_univariate_poly_commit_transparent(ctx):
    rng = SeededRng(24)
    r = ctx.host.r
    degree = 15
    coeffs = [rand_field(rng, r) for _ in range(degree + 1)]
    ck = tpc.setup_univariate(ctx, rng, degree)
    com, y_coms = tpc.commit_univariate(ctx, ck, coeffs)
    z = rand_field(rng, r)
    proof = tpc.open_univariate(ctx, ck, coeffs, y_coms, z)
    ev = poly_eval(coeffs, z, r)
    assert tpc.verify_univariate(ctx, ck, com, z, ev, proof)


def test_groth16_aggregation(ctx):
    """End-to-end: generate n proofs of the sum circuit, aggregate, verify
    (benches/examples/groth16_aggregation.rs shape at n=4)."""
    rng = SeededRng(25)
    host = ctx.host
    n = 4
    num_inputs = 4
    cs = groth16.sum_circuit(num_inputs)
    pk = groth16.setup(host, cs, rng)
    srs = agg.setup_inner_product(ctx, rng, n)
    v_srs = srs.get_verifier_key()

    proofs, publics = [], []
    for _ in range(n):
        inputs = [rand_field(rng, host.r) for _ in range(num_inputs)]
        witness = rand_field(rng, host.r)
        z = groth16.sum_circuit_assignment(cs, inputs, witness, host.r)
        proofs.append(groth16.prove(host, pk, cs, z, rng))
        publics.append(z[1:cs.num_public + 1])
        assert groth16.verify(host, pk.vk, publics[-1], proofs[-1])

    aproof = agg.aggregate_proofs(ctx, srs, proofs)
    assert agg.verify_aggregate_proof(ctx, v_srs, pk.vk, publics, aproof)

    # serialization round-trip: bytes -> proof -> verifies (reference gap:
    # AggregateProof lacks serialization derives, SURVEY.md section 5.4)
    from ripp_tpu.utils import proof_io

    blob = proof_io.ser_aggregate_proof(ctx, aproof)
    aproof2 = proof_io.deser_aggregate_proof(ctx, blob)
    assert agg.verify_aggregate_proof(ctx, v_srs, pk.vk, publics, aproof2)
    # SRS round-trip
    srs2 = proof_io.deser_srs(ctx, proof_io.ser_srs(srs))
    assert srs2.h_beta_powers.n == srs.h_beta_powers.n

    # tampering with the aggregated MSM must be rejected
    aproof.agg_c = host.g1.double(aproof.agg_c)
    assert not agg.verify_aggregate_proof(
        ctx, v_srs, pk.vk, publics, aproof
    )


def test_groth16_prove_batch(ctx):
    """Vectorized fixture prover: device-batched proofs must verify
    individually (spot check) and aggregate end-to-end via the
    device-resident path."""
    rng = SeededRng(31)
    host = ctx.host
    n = 8
    num_inputs = 3
    cs = groth16.sum_circuit(num_inputs)
    pk = groth16.setup(host, cs, rng)

    zs, publics = [], []
    for _ in range(n):
        inputs = [rand_field(rng, host.r) for _ in range(num_inputs)]
        witness = rand_field(rng, host.r)
        z = groth16.sum_circuit_assignment(cs, inputs, witness, host.r)
        zs.append(z)
        publics.append(z[1:cs.num_public + 1])

    A, B2, C = groth16.prove_batch(ctx, pk, cs, zs, rng)
    a_host, b_host, c_host = A.to_host(), B2.to_host(), C.to_host()
    for j in (0, n - 1):
        pf = groth16.Proof(a=a_host[j], b=b_host[j], c=c_host[j])
        assert groth16.verify(host, pk.vk, publics[j], pf)

    srs = agg.setup_inner_product(ctx, rng, n)
    aproof = agg.aggregate_proofs_vec(ctx, srs, A, B2, C)
    assert agg.verify_aggregate_proof(
        ctx, srs.get_verifier_key(), pk.vk, publics, aproof
    )
