"""Two-tier bivariate/univariate polynomial commitment, trusted-setup flavor
(poly_commit/mod.rs:120-377 capability).

Commit: KZG commitment per y-polynomial row + one AFGHO (pairing-product)
commitment over the row commitments.  Open: partial evaluation at x (host
bigint row combine), a MIPP-SSM proof that y_eval_comm is consistent with
the committed rows, and one KZG opening at y.  Univariate wrapper splits
degree ~sqrt with a 16:1 skew toward KZG (mod.rs:292-298).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, List, Sequence, Tuple

from ..models import ssm, tipa
from ..models.algebra import IdentityOutput
from ..models.instances import mipp_ssm_config
from ..models.vectors import FrVec, PointVec
from ..ops.points import DevCurveCtx
from ..utils.fiat_shamir import rand_field
from ..utils.poly import poly_eval, structured_scalar_power
from . import kzg


@dataclass
class BivariatePolynomial:
    """y_polynomials[i][j] = coefficient of x^i y^j (host Fr ints)."""

    y_polynomials: List[List[int]]

    def evaluate(self, point: Tuple[int, int], r: int) -> int:
        x, y = point
        acc, xp = 0, 1
        for row in self.y_polynomials:
            acc = (acc + xp * poly_eval(row, y, r)) % r
            xp = xp * x % r
        return acc


@dataclass
class OpeningProof:
    ip_proof: ssm.TIPAWithSSMProof
    y_eval_comm: Any  # host G1
    kzg_proof: Any    # host G1


@dataclass
class BivariateSRS:
    ip_srs: tipa.SRS
    kzg_powers: PointVec  # g^alpha^j, j = 0..y_degree

    @property
    def x_degree(self) -> int:
        return (self.ip_srs.h_beta_powers.n - 1) // 2

    @property
    def y_degree(self) -> int:
        return self.kzg_powers.n - 1


def setup(ctx: DevCurveCtx, rng, x_degree: int, y_degree: int) -> BivariateSRS:
    """mod.rs:152-174: h_beta powers sized for the MIPP tier, alpha powers
    for KZG (the TIPA g-side SRS degenerates to [g])."""
    host = ctx.host
    alpha = rand_field(rng, host.r)
    beta = rand_field(rng, host.r)
    g, h = host.g1_gen, host.g2_gen
    kzg_powers = tipa.structured_generators_scalar_power(
        ctx, "g1", y_degree + 1, g, alpha
    )
    ip_srs = tipa.SRS(
        ctx=ctx,
        g_alpha_powers=PointVec.from_host(ctx, "g1", [g]),
        h_beta_powers=tipa.structured_generators_scalar_power(
            ctx, "g2", 2 * x_degree + 1, h, beta
        ),
        g_beta=host.g1.scalar_mul(g, beta),
        h_alpha=host.g2.scalar_mul(h, alpha),
    )
    return BivariateSRS(ip_srs=ip_srs, kzg_powers=kzg_powers)


def _padded_rows(poly: BivariatePolynomial, n_rows: int, n_cols: int, r: int
                 ) -> List[List[int]]:
    rows = []
    for i in range(n_rows):
        row = poly.y_polynomials[i] if i < len(poly.y_polynomials) else []
        assert len(row) <= n_cols
        rows.append([c % r for c in row] + [0] * (n_cols - len(row)))
    return rows


def commit(ctx: DevCurveCtx, srs: BivariateSRS, poly: BivariatePolynomial
           ) -> Tuple[Any, List[Any]]:
    """Returns (GT commitment, per-row KZG commitments)."""
    cfg = mipp_ssm_config(ctx)
    ck_1, _ = srs.ip_srs.get_commitment_keys()
    assert ck_1.n >= len(poly.y_polynomials)
    rows = _padded_rows(poly, ck_1.n, srs.y_degree + 1, ctx.host.r)
    y_coms = [kzg.commit(srs.kzg_powers, row) for row in rows]
    com = cfg.lmc.commit(ck_1, PointVec.from_host(ctx, "g1", y_coms))
    return com, y_coms


def open(ctx: DevCurveCtx, srs: BivariateSRS, poly: BivariatePolynomial,
         y_coms: List[Any], point: Tuple[int, int]) -> OpeningProof:
    x, y = point
    r = ctx.host.r
    cfg = mipp_ssm_config(ctx)
    ck_1, _ = srs.ip_srs.get_commitment_keys()
    n_rows, n_cols = ck_1.n, srs.y_degree + 1

    powers_of_x = structured_scalar_power(n_rows, x, r)
    rows = _padded_rows(poly, n_rows, n_cols, r)
    # partial evaluation at x (mod.rs:230-236)
    y_eval_coeffs = [
        sum(powers_of_x[i] * rows[i][j] for i in range(n_rows)) % r
        for j in range(n_cols)
    ]
    y_eval_comm = kzg.commit(srs.kzg_powers, y_eval_coeffs)

    m_a = PointVec.from_host(ctx, "g1", y_coms)
    m_b = FrVec.from_ints(ctx, powers_of_x)
    ck_t = cfg.ipc.setup(None, 1)
    ip_proof = ssm.prove_tipa_ssm(cfg, srs.ip_srs, m_a, m_b, ck_1, ck_t)
    kzg_proof = kzg.open(srs.kzg_powers, y_eval_coeffs, y)
    return OpeningProof(
        ip_proof=ip_proof, y_eval_comm=y_eval_comm, kzg_proof=kzg_proof
    )


def verify(ctx: DevCurveCtx, v_srs: tipa.VerifierSRS, com,
           point: Tuple[int, int], evaluation: int, proof: OpeningProof
           ) -> bool:
    x, y = point
    cfg = mipp_ssm_config(ctx)
    ck_t = cfg.ipc.setup(None, 1)
    ip_valid = ssm.verify_tipa_ssm(
        cfg, v_srs, ck_t, com,
        IdentityOutput([proof.y_eval_comm], "g1"), x, proof.ip_proof,
    )
    kzg_valid = kzg.verify(
        ctx, v_srs, proof.y_eval_comm, y, evaluation, proof.kzg_proof
    )
    return ip_valid and kzg_valid


# --------------------------------------------------------------------------
# univariate wrapper (mod.rs:286-377)
# --------------------------------------------------------------------------

def bivariate_degrees(univariate_degree: int) -> Tuple[int, int]:
    """sqrt split with 16:1 skew toward KZG (mod.rs:292-298):
    sqrt = next_power_of_two(ceil(sqrt(degree+1)))."""
    import math

    n = univariate_degree + 1
    c = math.isqrt(n - 1) + 1 if n > 1 else 1  # ceil(sqrt(n))
    sqrt = 1 << (c - 1).bit_length()
    skew = 16 if sqrt >= 32 else max(1, sqrt // 2)
    return sqrt // skew - 1, sqrt * skew - 1


def bivariate_form(degrees: Tuple[int, int], coeffs: Sequence[int]
                   ) -> BivariatePolynomial:
    x_deg, y_deg = degrees
    total = (x_deg + 1) * (y_deg + 1)
    padded = list(coeffs) + [0] * (total - len(coeffs))
    rows = [
        padded[i * (y_deg + 1):(i + 1) * (y_deg + 1)] for i in range(x_deg + 1)
    ]
    return BivariatePolynomial(rows)


def setup_univariate(ctx: DevCurveCtx, rng, degree: int) -> BivariateSRS:
    x_deg, y_deg = bivariate_degrees(degree)
    return setup(ctx, rng, x_deg, y_deg)


def commit_univariate(ctx: DevCurveCtx, srs: BivariateSRS,
                      coeffs: Sequence[int]):
    return commit(
        ctx, srs, bivariate_form((srs.x_degree, srs.y_degree), coeffs)
    )


def open_univariate(ctx: DevCurveCtx, srs: BivariateSRS,
                    coeffs: Sequence[int], y_coms: List[Any], point: int
                    ) -> OpeningProof:
    r = ctx.host.r
    y = point % r
    x = pow(y, srs.y_degree + 1, r)
    return open(
        ctx, srs, bivariate_form((srs.x_degree, srs.y_degree), coeffs),
        y_coms, (x, y),
    )


def verify_univariate(ctx: DevCurveCtx, v_srs: tipa.VerifierSRS,
                      max_degree: int, com, point: int, evaluation: int,
                      proof: OpeningProof) -> bool:
    r = ctx.host.r
    _, y_deg = bivariate_degrees(max_degree)
    y = point % r
    x = pow(y, y_deg + 1, r)
    return verify(ctx, v_srs, com, (x, y), evaluation, proof)
