"""Structured scalar message (SSM) variants of GIPA/TIPA.

Re-implementation of ip_proofs/src/tipa/structured_scalar_message.rs: the
right vector is public powers (1, b, b^2, ...) so it needs no commitment
(SSM placeholder commits to 0); the verifier recomputes the folded scalar
b_base in O(log n) product form.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, List, Sequence, Tuple

from ..utils.serialize import CurveSerializer
from . import gipa, tipa
from .algebra import PLACEHOLDER
from .vectors import PlaceholderVec


def prove_gipa_ssm(cfg: gipa.GIPAConfig, m_a, m_b, ck_a, ck_t
                   ) -> gipa.GIPAProof:
    """GIPAWithSSM::prove_with_structured_scalar_message (:70-84)."""
    proof, _ = gipa.prove_with_aux(
        cfg, m_a, m_b, ck_a, PlaceholderVec(len(m_b)), ck_t
    )
    return proof


def ssm_final_scalar(transcript: Sequence[int], scalar_b: int, r: int) -> int:
    """b_base = prod_i (1 + c_i^{-1} * b^(2^i)) over the reversed transcript
    (:110-117)."""
    power = scalar_b % r
    acc = 1
    for c in transcript:
        acc = acc * (1 + pow(c, -1, r) * power) % r
        power = power * power % r
    return acc


def verify_gipa_ssm(cfg: gipa.GIPAConfig, ck_a, ck_t, com_a, com_t,
                    scalar_b: int, proof: gipa.GIPAProof) -> bool:
    """GIPAWithSSM::verify_with_structured_scalar_message (:86-127)."""
    host = cfg.ctx.host
    base_com, transcript = gipa.compute_recursive_challenges(
        cfg, (com_a, 0, com_t), proof
    )
    ck_a_base, _ = gipa.compute_final_commitment_keys(
        cfg, ck_a, PlaceholderVec(len(ck_a)), transcript
    )
    gipa_valid = gipa.verify_base_commitment(
        cfg, (ck_a_base, PLACEHOLDER, ck_t), base_com, proof
    )
    b_base = ssm_final_scalar(transcript, scalar_b, host.r)
    com_a_f, _, com_t_f = base_com
    a_base = proof.r_base[0]
    t_base = cfg.ip_single(a_base, b_base)
    base_valid = (
        cfg.lmc.verify_single(ck_a_base, a_base, com_a_f)
        and cfg.ipc.verify_single(PLACEHOLDER, t_base, com_t_f)
    )
    return gipa_valid and base_valid


@dataclass
class TIPAWithSSMProof:
    gipa_proof: gipa.GIPAProof
    final_ck: Any        # host G2 point
    final_ck_proof: Any  # host G2 point (KZG opening)


def prove_tipa_ssm(cfg: gipa.GIPAConfig, srs: tipa.SRS, m_a, m_b, ck_a, ck_t
                   ) -> TIPAWithSSMProof:
    """TIPAWithSSM::prove_with_structured_scalar_message (:211-268)."""
    host = cfg.ctx.host
    proof, aux = gipa.prove_with_aux(
        cfg, m_a, m_b, ck_a, PlaceholderVec(len(m_b)), ck_t
    )
    ck_a_final = aux.ck_base[0]
    transcript = aux.transcript
    transcript_inverse = [pow(c, -1, host.r) for c in transcript]

    s = CurveSerializer(host)
    c = tipa.kzg_challenge(cfg.ctx, transcript[0], [s.g2(ck_a_final)])
    opening = tipa.prove_commitment_key_kzg_opening(
        srs.h_beta_powers, transcript_inverse, 1, c
    )
    return TIPAWithSSMProof(
        gipa_proof=proof, final_ck=ck_a_final, final_ck_proof=opening
    )


def verify_tipa_ssm(cfg: gipa.GIPAConfig, v_srs: tipa.VerifierSRS, ck_t,
                    com_a, com_t, scalar_b: int, proof: TIPAWithSSMProof,
                    pc=None) -> bool:
    """TIPAWithSSM::verify_with_structured_scalar_message (:270-331).

    Note: the com_b slot of the recursive fold is seeded with scalar_b itself
    (commitments on that side are all 0, so it rides through unchanged).

    With `pc` supplied, the KZG opening + AFGHO base check accumulate into
    the caller's batched PairingCheck (see tipa.verify_with_srs_shift)."""
    import os

    host = cfg.ctx.host
    base_com, transcript = gipa.compute_recursive_challenges(
        cfg, (com_a, scalar_b % host.r, com_t), proof.gipa_proof
    )
    transcript_inverse = [pow(c, -1, host.r) for c in transcript]

    s = CurveSerializer(host)
    c = tipa.kzg_challenge(cfg.ctx, transcript[0], [s.g2(proof.final_ck)])

    b_base = ssm_final_scalar(transcript, scalar_b, host.r)
    com_a_f, _, com_t_f = base_com
    a_base = proof.gipa_proof.r_base[0]

    from .commitments import AFGHOCommitmentG1

    if (os.environ.get("RIPP_BATCH_VERIFY", "1") != "0"
            and isinstance(cfg.lmc, AFGHOCommitmentG1)):
        from .pairing_check import PairingCheck

        own = pc is None
        if own:
            pc = PairingCheck(cfg.ctx)
        tipa.add_commitment_key_g2_kzg_check(
            pc, cfg.ctx, v_srs, proof.final_ck, proof.final_ck_proof,
            transcript_inverse, 1, c,
        )
        pc.add([(a_base, proof.final_ck)], rhs=com_a_f)
        t_base = cfg.ip_single(a_base, b_base)
        if not cfg.ipc.verify_single(PLACEHOLDER, t_base, com_t_f):
            return False
        return pc.verify() if own else True

    ck_a_valid = tipa.verify_commitment_key_g2_kzg_opening(
        cfg.ctx, v_srs, proof.final_ck, proof.final_ck_proof,
        transcript_inverse, 1, c,
    )
    t_base = cfg.ip_single(a_base, b_base)
    base_valid = (
        cfg.lmc.verify_single(proof.final_ck, a_base, com_a_f)
        and cfg.ipc.verify_single(PLACEHOLDER, t_base, com_t_f)
    )
    return ck_a_valid and base_valid
