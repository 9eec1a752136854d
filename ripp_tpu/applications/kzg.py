"""KZG polynomial commitment (poly_commit/mod.rs:50-118 capability).

Polynomials are host lists of Fr ints (little-endian coefficients); the
commit/open MSMs run on device (Pippenger), verification is two host
pairings.
"""

from __future__ import annotations

from typing import Any, List, Sequence, Tuple

from ..host import pairing as hp
from ..models.tipa import VerifierSRS, structured_generators_scalar_power
from ..models.vectors import FrVec, PointVec
from ..ops.points import DevCurveCtx
from ..utils.fiat_shamir import rand_field
from ..utils.poly import poly_eval, quotient_by_linear


def setup(ctx: DevCurveCtx, rng, degree: int) -> Tuple[PointVec, VerifierSRS]:
    """Returns (g_alpha_powers[0..degree], verifier key)."""
    host = ctx.host
    alpha = rand_field(rng, host.r)
    beta = rand_field(rng, host.r)
    g, h = host.g1_gen, host.g2_gen
    powers = structured_generators_scalar_power(ctx, "g1", degree + 1, g, alpha)
    v_srs = VerifierSRS(
        g=g, h=h,
        g_beta=host.g1.scalar_mul(g, beta),
        h_alpha=host.g2.scalar_mul(h, alpha),
    )
    return powers, v_srs


def _padded(ctx: DevCurveCtx, coeffs: Sequence[int], n: int) -> FrVec:
    assert len(coeffs) <= n, "polynomial degree exceeds SRS"
    r = ctx.host.r
    return FrVec.from_ints(ctx, [c % r for c in coeffs] + [0] * (n - len(coeffs)))


def commit(powers: PointVec, coeffs: Sequence[int]):
    """MSM(powers, coeffs) -> host G1 point."""
    return powers.msm(_padded(powers.ctx, coeffs, powers.n))


def open(powers: PointVec, coeffs: Sequence[int], point: int):
    """Witness for f(point): MSM over the quotient (f - f(z)) / (X - z).
    Like the reference, the remainder is ignored (same quotient either way)."""
    r = powers.ctx.host.r
    quotient = quotient_by_linear([c % r for c in coeffs], point % r, r)
    return powers.msm(_padded(powers.ctx, quotient, powers.n))


def verify(ctx: DevCurveCtx, v_srs: VerifierSRS, com, point: int, evaluation: int,
           proof) -> bool:
    """e(com - g*eval, h) == e(proof, h_alpha - h*point)."""
    host = ctx.host
    lhs = hp.pairing(
        host, host.g1.sub(com, host.g1.scalar_mul(v_srs.g, evaluation)), v_srs.h
    )
    rhs = hp.pairing(
        host, proof,
        host.g2.sub(v_srs.h_alpha, host.g2.scalar_mul(v_srs.h, point)),
    )
    return lhs == rhs
