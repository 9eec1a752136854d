"""Two-tier polynomial commitment, transparent flavor (no trusted setup)
(poly_commit/transparent.rs capability).

Tier 1: Pedersen commitment per y-polynomial row + a scalar-IPA (GIPAWithSSM)
to open the partial evaluation.  Tier 2: AFGHO over the row commitments +
MIPP GIPAWithSSM.  Keys are independent random generators, so no KZG
well-formedness proofs are needed; the univariate split skews 4:1
(transparent.rs:224-230).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, List, Sequence, Tuple

from ..models import gipa, ssm
from ..models.algebra import IdentityOutput
from ..models.instances import mipp_ssm_config, scalar_ssm_config
from ..models.vectors import FrVec, PointVec
from ..ops.points import DevCurveCtx
from ..utils.poly import structured_scalar_power
from .poly_commit import BivariatePolynomial, _padded_rows, bivariate_form


@dataclass
class TransparentOpeningProof:
    second_tier_ip_proof: gipa.GIPAProof  # MIPP-SSM over row commitments
    y_eval_comm: Any                      # host G1 (Pedersen of y_eval_coeffs)
    first_tier_ip_proof: gipa.GIPAProof   # scalar-SSM over y_eval_coeffs


@dataclass
class TransparentCK:
    first_tier: PointVec   # G1 generators, len y_degree+1
    second_tier: PointVec  # G2 generators, len x_degree+1

    @property
    def x_degree(self) -> int:
        return self.second_tier.n - 1

    @property
    def y_degree(self) -> int:
        return self.first_tier.n - 1


def setup(ctx: DevCurveCtx, rng, x_degree: int, y_degree: int
          ) -> TransparentCK:
    first_cfg = scalar_ssm_config(ctx)
    second_cfg = mipp_ssm_config(ctx)
    return TransparentCK(
        first_tier=first_cfg.lmc.setup(rng, y_degree + 1),
        second_tier=second_cfg.lmc.setup(rng, x_degree + 1),
    )


def commit(ctx: DevCurveCtx, ck: TransparentCK, poly: BivariatePolynomial
           ) -> Tuple[Any, List[Any]]:
    """Returns (GT commitment, per-row Pedersen commitments)."""
    first_cfg = scalar_ssm_config(ctx)
    second_cfg = mipp_ssm_config(ctx)
    assert ck.second_tier.n >= len(poly.y_polynomials)
    rows = _padded_rows(poly, ck.second_tier.n, ck.first_tier.n, ctx.host.r)
    y_coms = [
        first_cfg.lmc.commit(ck.first_tier, FrVec.from_ints(ctx, row))
        for row in rows
    ]
    com = second_cfg.lmc.commit(
        ck.second_tier, PointVec.from_host(ctx, "g1", y_coms)
    )
    return com, y_coms


def open(ctx: DevCurveCtx, ck: TransparentCK, poly: BivariatePolynomial,
         y_coms: List[Any], point: Tuple[int, int]) -> TransparentOpeningProof:
    x, y = point
    r = ctx.host.r
    first_cfg = scalar_ssm_config(ctx)
    second_cfg = mipp_ssm_config(ctx)
    n_rows, n_cols = ck.second_tier.n, ck.first_tier.n

    powers_of_x = structured_scalar_power(n_rows, x, r)
    rows = _padded_rows(poly, n_rows, n_cols, r)
    y_eval_coeffs = [
        sum(powers_of_x[i] * rows[i][j] for i in range(n_rows)) % r
        for j in range(n_cols)
    ]
    y_eval_comm = first_cfg.lmc.commit(
        ck.first_tier, FrVec.from_ints(ctx, y_eval_coeffs)
    )

    second_proof = ssm.prove_gipa_ssm(
        second_cfg,
        PointVec.from_host(ctx, "g1", y_coms),
        FrVec.from_ints(ctx, powers_of_x),
        ck.second_tier,
        second_cfg.ipc.setup(None, 1),
    )
    powers_of_y = structured_scalar_power(n_cols, y, r)
    first_proof = ssm.prove_gipa_ssm(
        first_cfg,
        FrVec.from_ints(ctx, y_eval_coeffs),
        FrVec.from_ints(ctx, powers_of_y),
        ck.first_tier,
        first_cfg.ipc.setup(None, 1),
    )
    return TransparentOpeningProof(
        second_tier_ip_proof=second_proof,
        y_eval_comm=y_eval_comm,
        first_tier_ip_proof=first_proof,
    )


def verify(ctx: DevCurveCtx, ck: TransparentCK, com,
           point: Tuple[int, int], evaluation: int,
           proof: TransparentOpeningProof) -> bool:
    x, y = point
    r = ctx.host.r
    first_cfg = scalar_ssm_config(ctx)
    second_cfg = mipp_ssm_config(ctx)
    second_valid = ssm.verify_gipa_ssm(
        second_cfg, ck.second_tier, second_cfg.ipc.setup(None, 1),
        com, IdentityOutput([proof.y_eval_comm], "g1"), x,
        proof.second_tier_ip_proof,
    )
    first_valid = ssm.verify_gipa_ssm(
        first_cfg, ck.first_tier, first_cfg.ipc.setup(None, 1),
        proof.y_eval_comm, IdentityOutput([evaluation % r], "fr"), y,
        proof.first_tier_ip_proof,
    )
    return second_valid and first_valid


# --------------------------------------------------------------------------
# univariate wrapper (transparent.rs:215-305)
# --------------------------------------------------------------------------

def bivariate_degrees(univariate_degree: int) -> Tuple[int, int]:
    """sqrt split, 4:1 skew (transparent.rs:224-230)."""
    import math

    n = univariate_degree + 1
    c = math.isqrt(n - 1) + 1 if n > 1 else 1
    sqrt = 1 << (c - 1).bit_length()
    skew = 4 if sqrt >= 8 else max(1, sqrt // 2)
    return sqrt // skew - 1, sqrt * skew - 1


def setup_univariate(ctx: DevCurveCtx, rng, degree: int) -> TransparentCK:
    x_deg, y_deg = bivariate_degrees(degree)
    return setup(ctx, rng, x_deg, y_deg)


def commit_univariate(ctx: DevCurveCtx, ck: TransparentCK,
                      coeffs: Sequence[int]):
    return commit(ctx, ck, bivariate_form((ck.x_degree, ck.y_degree), coeffs))


def open_univariate(ctx: DevCurveCtx, ck: TransparentCK,
                    coeffs: Sequence[int], y_coms: List[Any], point: int
                    ) -> TransparentOpeningProof:
    r = ctx.host.r
    y = point % r
    x = pow(y, ck.y_degree + 1, r)
    return open(
        ctx, ck, bivariate_form((ck.x_degree, ck.y_degree), coeffs),
        y_coms, (x, y),
    )


def verify_univariate(ctx: DevCurveCtx, ck: TransparentCK, com, point: int,
                      evaluation: int, proof: TransparentOpeningProof) -> bool:
    r = ctx.host.r
    y = point % r
    x = pow(y, ck.y_degree + 1, r)
    return verify(ctx, ck, com, (x, y), evaluation, proof)
