"""Groth16 proof aggregation (groth16_aggregation.rs capability).

Aggregate n Groth16 proofs into one O(log n) proof: AFGHO commitments to the
A/B/C columns (batched pairing products on device), a Fiat-Shamir challenge
r, a TIPP proof with SRS shift on (A o r_vec, B), a MIPP-SSM proof on
(C, r_vec), and the final aggregated pairing-product equation.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, List, Sequence

from ..host import pairing as hp
from ..models import ssm, tipa
from ..models.algebra import HostAlg, IdentityOutput
from ..models.instances import mipp_ssm_config, tipp_config
from ..models.vectors import FrVec, PointVec
from ..ops.points import DevCurveCtx
from ..utils.fiat_shamir import blake2b_digest
from ..utils.poly import structured_scalar_power
from ..utils.serialize import nonce_bytes
from .groth16 import Proof, VerifyingKey, prepare_inputs


@dataclass
class AggregateProof:
    com_a: Any  # GT
    com_b: Any
    com_c: Any
    ip_ab: Any  # GT
    agg_c: Any  # host G1
    tipa_proof_ab: tipa.TIPAProof
    tipa_proof_c: ssm.TIPAWithSSMProof


def setup_inner_product(ctx: DevCurveCtx, rng, size: int) -> tipa.SRS:
    return tipa.setup_srs(ctx, rng, size)


def _challenge_r(ctx: DevCurveCtx, com_a, com_b, com_c) -> int:
    """Fiat-Shamir r = H(nonce || com_a || com_b || com_c)
    (groth16_aggregation.rs:105-118); ark-ff from_random_bytes semantics
    (top-limb shave + reject) via challenge_field."""
    from ..utils.fiat_shamir import challenge_field

    host = ctx.host
    gt = HostAlg(host, "gt")
    base = gt.ser(com_a) + gt.ser(com_b) + gt.ser(com_c)
    return challenge_field(
        blake2b_digest, lambda counter: nonce_bytes(counter) + base, host.r
    )


def aggregate_proofs(ctx: DevCurveCtx, ip_srs: tipa.SRS,
                     proofs: Sequence[Proof], mesh=None) -> AggregateProof:
    a = PointVec.from_host(ctx, "g1", [p.a for p in proofs])
    b = PointVec.from_host(ctx, "g2", [p.b for p in proofs])
    c = PointVec.from_host(ctx, "g1", [p.c for p in proofs])
    return aggregate_proofs_vec(ctx, ip_srs, a, b, c, mesh=mesh)


def aggregate_proofs_vec(ctx: DevCurveCtx, ip_srs: tipa.SRS,
                         a: PointVec, b: PointVec, c: PointVec,
                         mesh=None) -> AggregateProof:
    """Aggregate from device-resident proof columns (the batched fixture
    prover's output feeds this directly, no host round-trip).

    mesh: optional jax.sharding.Mesh - when given, the proof columns,
    commitment keys and r-power vectors become mesh-resident
    (parallel/vectors.py cyclic sharding), so the three AFGHO column
    commitments, ip_ab, agg_c and BOTH TIPA proves run as per-device
    partials + ICI all-reduces with device-local folds.  Proof bytes are
    identical to the single-device path (exact commutative reductions;
    tests/parallel_check.py)."""
    host = ctx.host
    r_mod = host.r
    n = len(a)
    cfg_ab = tipp_config(ctx)
    cfg_c = mipp_ssm_config(ctx)

    ck_1, ck_2 = ip_srs.get_commitment_keys()
    if mesh is not None:
        from ..parallel.vectors import ShardedFrVec, ShardedPointVec

        a = ShardedPointVec.from_dense(mesh, a)
        b = ShardedPointVec.from_dense(mesh, b)
        c = ShardedPointVec.from_dense(mesh, c)
        ck_1 = ShardedPointVec.from_dense(mesh, ck_1)
        ck_2 = ShardedPointVec.from_dense(mesh, ck_2)

        def fr_vec(ints):
            return ShardedFrVec.from_ints(ctx, mesh, ints)
    else:
        def fr_vec(ints):
            return FrVec.from_ints(ctx, ints)

    com_a = cfg_ab.lmc.commit(ck_1, a)
    com_b = cfg_ab.rmc.commit(ck_2, b)
    com_c = cfg_ab.lmc.commit(ck_1, c)

    r = _challenge_r(ctx, com_a, com_b, com_c)
    r_vec = structured_scalar_power(n, r, r_mod)
    r_inv_vec = [pow(x, -1, r_mod) for x in r_vec]

    a_r = a.hadamard_scale(fr_vec(r_vec))
    ip_ab = cfg_ab.ip.compute(a_r, b)
    agg_c = c.msm(fr_vec(r_vec))
    ck_1_r = ck_1.hadamard_scale(fr_vec(r_inv_vec))

    ck_t = cfg_ab.ipc.setup(None, 1)
    tipa_proof_ab = tipa.prove_with_srs_shift(
        cfg_ab, ip_srs, (a_r, b), (ck_1_r, ck_2, ck_t), r
    )
    tipa_proof_c = ssm.prove_tipa_ssm(
        cfg_c, ip_srs, c, fr_vec(r_vec), ck_1,
        cfg_c.ipc.setup(None, 1),
    )
    return AggregateProof(
        com_a=com_a, com_b=com_b, com_c=com_c, ip_ab=ip_ab, agg_c=agg_c,
        tipa_proof_ab=tipa_proof_ab, tipa_proof_c=tipa_proof_c,
    )


def batch_verify_proofs(ctx: DevCurveCtx, vk: VerifyingKey,
                        public_inputs: Sequence[Sequence[int]],
                        a: PointVec, b: PointVec, c: PointVec,
                        rng) -> bool:
    """Random-linear-combination batched Groth16 verification (the
    reference's standalone `batch_verify_proof`, bench.rs:528-595): one
    (n+3)-pair pairing product instead of n full verifications.

    Proof columns come in as device PointVecs; the A-rescale by the random
    128-bit challenges and the big pairing product run on device.
    """
    host = ctx.host
    r_mod = host.r
    n = len(a)
    r_powers = [rng.next_u128() for _ in range(n)]

    # combined_inputs = sum_j r_j * (gamma_abc[0] + sum_i in_ji * abc[i+1])
    g1h = host.g1
    sum_r = sum(r_powers) % r_mod
    combined_inputs = g1h.scalar_mul(vk.gamma_abc_g1[0], sum_r)
    for i, base in enumerate(vk.gamma_abc_g1[1:]):
        coeff = sum(
            public_inputs[j][i] * r_powers[j] for j in range(n)
        ) % r_mod
        combined_inputs = g1h.add(combined_inputs, g1h.scalar_mul(base, coeff))

    a_r = a.hadamard_scale(FrVec.from_ints(ctx, r_powers))
    combined_c = c.msm(FrVec.from_ints(ctx, r_powers))

    # product of e(r_j A_j, B_j) * e(-sum_r alpha, beta)
    #   * e(combined_inputs, -gamma) * e(combined_c, -delta) == 1
    extra_g1 = PointVec.from_host(ctx, "g1", [
        g1h.scalar_mul(vk.alpha_g1, (-sum_r) % r_mod),
        combined_inputs,
        combined_c,
    ])
    extra_g2 = PointVec.from_host(ctx, "g2", [
        vk.beta_g2,
        host.g2.neg(vk.gamma_g2),
        host.g2.neg(vk.delta_g2),
    ])
    import jax

    all_g1 = PointVec(ctx, "g1", jax.tree.map(
        lambda x, y: jnp_concat(x, y), a_r.pts, extra_g1.pts), n + 3)
    all_g2 = PointVec(ctx, "g2", jax.tree.map(
        lambda x, y: jnp_concat(x, y), b.pts, extra_g2.pts), n + 3)
    from ..models.commitments import PairingIP

    total = PairingIP(ctx).compute(all_g1, all_g2)
    return total == host.tower.fp12.one()


def jnp_concat(x, y):
    import jax.numpy as jnp

    return jnp.concatenate([x, y], axis=0)


def verify_aggregate_proof(ctx: DevCurveCtx, v_srs: tipa.VerifierSRS,
                           vk: VerifyingKey,
                           public_inputs: Sequence[Sequence[int]],
                           proof: AggregateProof) -> bool:
    host = ctx.host
    r_mod = host.r
    n = len(public_inputs)
    cfg_ab = tipp_config(ctx)
    cfg_c = mipp_ssm_config(ctx)

    r = _challenge_r(ctx, proof.com_a, proof.com_b, proof.com_c)

    # One batched PairingCheck spans ALL three sub-verifications: the
    # TIPP-AB proof (KZG openings + base commitments), the MIPP-SSM-C
    # proof, and the aggregated product equation below — a single device
    # Miller batch + final exponentiation instead of ~10 host pairings
    # (models/pairing_check.py; RIPP_BATCH_VERIFY=0 restores the
    # reference's per-equation shape).
    import os as _os

    batch = _os.environ.get("RIPP_BATCH_VERIFY", "1") != "0"
    if batch:
        from ..models.pairing_check import PairingCheck

        pc = PairingCheck(ctx)
    else:
        pc = None

    ab_valid = tipa.verify_with_srs_shift(
        cfg_ab, v_srs, cfg_ab.ipc.setup(None, 1),
        (proof.com_a, proof.com_b, IdentityOutput([proof.ip_ab], "gt")),
        proof.tipa_proof_ab, r, pc=pc,
    )
    c_valid = ssm.verify_tipa_ssm(
        cfg_c, v_srs, cfg_c.ipc.setup(None, 1), proof.com_c,
        IdentityOutput([proof.agg_c], "g1"), r, proof.tipa_proof_c,
        pc=pc,
    )

    # aggregated pairing-product equation (groth16_aggregation.rs:208-228)
    r_sum = (pow(r, n, r_mod) - 1) * pow(r - 1, -1, r_mod) % r_mod
    alpha_r = host.g1.scalar_mul(vk.alpha_g1, r_sum)
    assert len(vk.gamma_abc_g1) == len(public_inputs[0]) + 1
    r_vec = structured_scalar_power(n, r, r_mod)
    g_ic = host.g1.scalar_mul(vk.gamma_abc_g1[0], r_sum)
    for i, base in enumerate(vk.gamma_abc_g1[1:]):
        col_ip = sum(
            public_inputs[k][i] * r_vec[k] for k in range(n)
        ) % r_mod
        g_ic = host.g1.add(g_ic, host.g1.scalar_mul(base, col_ip))
    if pc is not None:
        pc.add([(alpha_r, vk.beta_g2), (g_ic, vk.gamma_g2),
                (proof.agg_c, vk.delta_g2)], rhs=proof.ip_ab)
        return ab_valid and c_valid and pc.verify()
    p1 = hp.pairing(host, alpha_r, vk.beta_g2)
    p2 = hp.pairing(host, g_ic, vk.gamma_g2)
    p3 = hp.pairing(host, proof.agg_c, vk.delta_g2)
    ppe_valid = proof.ip_ab == hp.gt_mul(host, hp.gt_mul(host, p1, p2), p3)

    return ab_valid and c_valid and ppe_valid
