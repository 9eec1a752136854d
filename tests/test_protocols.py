"""Protocol round-trips: GIPA (3 configs), TIPA (incl. SRS shift), SSM
variants, SIPP — mirroring the reference's test matrix
(gipa.rs:470-561, tipa/mod.rs:450-579, structured_scalar_message.rs:360-423,
sipp/src/lib.rs:232-254) at TEST_SIZE=8, plus tamper-rejection tests the
reference lacks (SURVEY.md section 4 gap)."""

import copy

import pytest

from ripp_tpu.host import pairing as hp
from ripp_tpu.models import gipa, sipp, ssm, tipa
from ripp_tpu.models.instances import (
    mipp_config,
    mipp_ssm_config,
    scalar_ipa_config,
    scalar_ssm_config,
    tipp_config,
)
from ripp_tpu.models.vectors import FrVec, PointVec
from ripp_tpu.ops.points import dev_ctx
from ripp_tpu.utils.fiat_shamir import SeededRng, rand_field, rand_sw_point

TEST_SIZE = 8


@pytest.fixture(scope="module")
def ctx():
    return dev_ctx("bls12_381")


def _rand_g1(ctx, rng, n):
    return PointVec.from_host(
        ctx, "g1", [rand_sw_point(rng, ctx.host.g1) for _ in range(n)]
    )


def _rand_g2(ctx, rng, n):
    return PointVec.from_host(
        ctx, "g2", [rand_sw_point(rng, ctx.host.g2) for _ in range(n)]
    )


def _rand_fr(ctx, rng, n):
    return FrVec.from_ints(
        ctx, [rand_field(rng, ctx.host.r) for _ in range(n)]
    )


def _gipa_roundtrip(cfg, m_a, m_b, rng):
    ck_a = cfg.lmc.setup(rng, TEST_SIZE)
    ck_b = cfg.rmc.setup(rng, TEST_SIZE)
    ck_t = cfg.ipc.setup(rng, 1)
    t = cfg.ip.compute(m_a, m_b)
    com = (
        cfg.lmc.commit(ck_a, m_a),
        cfg.rmc.commit(ck_b, m_b),
        cfg.ipc.commit(ck_t, [t]),
    )
    proof = gipa.prove(cfg, (m_a, m_b, t), (ck_a, ck_b, ck_t), com)
    assert gipa.verify(cfg, (ck_a, ck_b, ck_t), com, proof)
    return com, (ck_a, ck_b, ck_t), proof


def test_gipa_tipp(ctx):
    rng = SeededRng(0)
    cfg = tipp_config(ctx)
    m_a, m_b = _rand_g1(ctx, rng, TEST_SIZE), _rand_g2(ctx, rng, TEST_SIZE)
    com, ck, proof = _gipa_roundtrip(cfg, m_a, m_b, rng)
    # tampered proof must be rejected (swap the two base elements' roles)
    bad = copy.deepcopy(proof)
    a0, b0 = bad.r_base
    bad.r_base = (ctx.host.g1.double(a0), b0)
    assert not gipa.verify(cfg, ck, com, bad)


def test_gipa_mipp(ctx):
    rng = SeededRng(1)
    cfg = mipp_config(ctx)
    m_a, m_b = _rand_g1(ctx, rng, TEST_SIZE), _rand_fr(ctx, rng, TEST_SIZE)
    _gipa_roundtrip(cfg, m_a, m_b, rng)


def test_gipa_scalar(ctx):
    rng = SeededRng(2)
    cfg = scalar_ipa_config(ctx)
    m_a, m_b = _rand_fr(ctx, rng, TEST_SIZE), _rand_fr(ctx, rng, TEST_SIZE)
    _gipa_roundtrip(cfg, m_a, m_b, rng)


def test_tipa_tipp(ctx):
    rng = SeededRng(3)
    cfg = tipp_config(ctx)
    srs = tipa.setup_srs(ctx, rng, TEST_SIZE)
    ck_a, ck_b = srs.get_commitment_keys()
    ck_t = cfg.ipc.setup(rng, 1)
    v_srs = srs.get_verifier_key()
    m_a, m_b = _rand_g1(ctx, rng, TEST_SIZE), _rand_g2(ctx, rng, TEST_SIZE)
    t = cfg.ip.compute(m_a, m_b)
    com = (
        cfg.lmc.commit(ck_a, m_a),
        cfg.rmc.commit(ck_b, m_b),
        cfg.ipc.commit(ck_t, [t]),
    )
    proof = tipa.prove(cfg, srs, (m_a, m_b), (ck_a, ck_b, ck_t))
    assert tipa.verify(cfg, v_srs, ck_t, com, proof)
    # tampered proofs must be rejected through the batched pairing check
    # (models/pairing_check.py): a doubled base message breaks the base
    # commitment equation; a doubled final ck breaks the KZG opening.
    bad = copy.deepcopy(proof)
    a0, b0 = bad.gipa_proof.r_base
    bad.gipa_proof.r_base = (ctx.host.g1.double(a0), b0)
    assert not tipa.verify(cfg, v_srs, ck_t, com, bad)
    bad2 = copy.deepcopy(proof)
    cka_f, ckb_f = bad2.final_ck
    bad2.final_ck = (ctx.host.g2.double(cka_f), ckb_f)
    assert not tipa.verify(cfg, v_srs, ck_t, com, bad2)


def test_tipa_mipp(ctx):
    """MIPP-TIPA round-trip (tipa/mod.rs:474-497
    multiexponentiation_inner_product_test shape)."""
    rng = SeededRng(7)
    cfg = mipp_config(ctx)
    srs = tipa.setup_srs(ctx, rng, TEST_SIZE)
    ck_a, ck_b = srs.get_commitment_keys()
    ck_t = cfg.ipc.setup(rng, 1)
    v_srs = srs.get_verifier_key()
    m_a, m_b = _rand_g1(ctx, rng, TEST_SIZE), _rand_fr(ctx, rng, TEST_SIZE)
    t = cfg.ip.compute(m_a, m_b)
    com = (
        cfg.lmc.commit(ck_a, m_a),
        cfg.rmc.commit(ck_b, m_b),
        cfg.ipc.commit(ck_t, [t]),
    )
    proof = tipa.prove(cfg, srs, (m_a, m_b), (ck_a, ck_b, ck_t))
    assert tipa.verify(cfg, v_srs, ck_t, com, proof)


def test_tipa_scalar(ctx):
    """Scalar-TIPA round-trip (tipa/mod.rs:500-526
    scalar_inner_product_test shape: Pedersen-G2 LMC, Pedersen-G1 RMC)."""
    from ripp_tpu.models.instances import scalar_tipa_config

    rng = SeededRng(8)
    cfg = scalar_tipa_config(ctx)
    srs = tipa.setup_srs(ctx, rng, TEST_SIZE)
    ck_a, ck_b = srs.get_commitment_keys()
    ck_t = cfg.ipc.setup(rng, 1)
    v_srs = srs.get_verifier_key()
    m_a, m_b = _rand_fr(ctx, rng, TEST_SIZE), _rand_fr(ctx, rng, TEST_SIZE)
    t = cfg.ip.compute(m_a, m_b)
    com = (
        cfg.lmc.commit(ck_a, m_a),
        cfg.rmc.commit(ck_b, m_b),
        cfg.ipc.commit(ck_t, [t]),
    )
    proof = tipa.prove(cfg, srs, (m_a, m_b), (ck_a, ck_b, ck_t))
    assert tipa.verify(cfg, v_srs, ck_t, com, proof)


def test_tipa_tipp_with_srs_shift(ctx):
    """tipa/mod.rs pairing_inner_product_with_srs_shift test shape."""
    rng = SeededRng(4)
    cfg = tipp_config(ctx)
    host = ctx.host
    srs = tipa.setup_srs(ctx, rng, TEST_SIZE)
    ck_a, ck_b = srs.get_commitment_keys()
    ck_t = cfg.ipc.setup(rng, 1)
    v_srs = srs.get_verifier_key()
    m_a, m_b = _rand_g1(ctx, rng, TEST_SIZE), _rand_g2(ctx, rng, TEST_SIZE)
    com_a = cfg.lmc.commit(ck_a, m_a)
    com_b = cfg.rmc.commit(ck_b, m_b)

    r_shift = rand_field(rng, host.r)
    r_inv = pow(r_shift, -1, host.r)
    r_pows = [pow(r_shift, i, host.r) for i in range(TEST_SIZE)]
    r_inv_pows = [pow(r_inv, i, host.r) for i in range(TEST_SIZE)]
    m_a_r = m_a.hadamard_scale(FrVec.from_ints(ctx, r_pows))
    ck_a_r = ck_a.hadamard_scale(FrVec.from_ints(ctx, r_inv_pows))
    # invariant (groth16_aggregation.rs:133-136): com unchanged
    assert cfg.lmc.out_alg.eq(cfg.lmc.commit(ck_a_r, m_a_r), com_a)

    t = cfg.ip.compute(m_a_r, m_b)
    com_t = cfg.ipc.commit(ck_t, [t])
    proof = tipa.prove_with_srs_shift(
        cfg, srs, (m_a_r, m_b), (ck_a_r, ck_b, ck_t), r_shift
    )
    assert tipa.verify_with_srs_shift(
        cfg, v_srs, ck_t, (com_a, com_b, com_t), proof, r_shift
    )


def test_tipa_mipp_ssm(ctx):
    """structured_scalar_message.rs:360-391 shape: MIPP where the right
    vector is public powers of b."""
    rng = SeededRng(5)
    cfg = mipp_ssm_config(ctx)
    host = ctx.host
    srs = tipa.setup_srs(ctx, rng, TEST_SIZE)
    ck_a, _ = srs.get_commitment_keys()
    ck_t = cfg.ipc.setup(rng, 1)
    v_srs = srs.get_verifier_key()
    m_a = _rand_g1(ctx, rng, TEST_SIZE)
    b = rand_field(rng, host.r)
    m_b = FrVec.from_ints(
        ctx, [pow(b, i, host.r) for i in range(TEST_SIZE)]
    )
    com_a = cfg.lmc.commit(ck_a, m_a)
    t = cfg.ip.compute(m_a, m_b)
    com_t = cfg.ipc.commit(ck_t, [t])
    proof = ssm.prove_tipa_ssm(cfg, srs, m_a, m_b, ck_a, ck_t)
    assert ssm.verify_tipa_ssm(cfg, v_srs, ck_t, com_a, com_t, b, proof)


def test_gipa_scalar_ssm(ctx):
    """structured_scalar_message.rs:393-423 shape: scalar IP with public
    powers on the right, Pedersen on the left."""
    rng = SeededRng(6)
    cfg = scalar_ssm_config(ctx)
    host = ctx.host
    ck_a = cfg.lmc.setup(rng, TEST_SIZE)
    ck_t = cfg.ipc.setup(rng, 1)
    m_a = _rand_fr(ctx, rng, TEST_SIZE)
    b = rand_field(rng, host.r)
    m_b = FrVec.from_ints(
        ctx, [pow(b, i, host.r) for i in range(TEST_SIZE)]
    )
    com_a = cfg.lmc.commit(ck_a, m_a)
    t = cfg.ip.compute(m_a, m_b)
    com_t = cfg.ipc.commit(ck_t, [t])
    proof = ssm.prove_gipa_ssm(cfg, m_a, m_b, ck_a, ck_t)
    assert ssm.verify_gipa_ssm(cfg, ck_a, ck_t, com_a, com_t, b, proof)


def test_sipp(ctx):
    """sipp/src/lib.rs:232-254 shape at the reference's n=32."""
    n = 32
    rng = SeededRng(7)
    host = ctx.host
    A = [rand_sw_point(rng, host.g1) for _ in range(n)]
    B = [rand_sw_point(rng, host.g2) for _ in range(n)]
    r = [rand_field(rng, host.r) for _ in range(n)]
    value = sipp.product_of_pairings_with_coeffs(
        ctx,
        PointVec.from_host(ctx, "g1", A),
        PointVec.from_host(ctx, "g2", B),
        FrVec.from_ints(ctx, r),
    )
    proof = sipp.prove(ctx, A, B, r, value)
    assert sipp.verify(ctx, A, B, r, value, proof)
    # wrong claimed value must fail
    bad = hp.gt_mul(host, value, value)
    assert not sipp.verify(ctx, A, B, r, bad, proof)
