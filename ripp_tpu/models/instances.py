"""The GIPA instantiation matrix (SURVEY.md section 2.2) as config factories.

| protocol    | IP        | LMC          | RMC          | IPC            |
|-------------|-----------|--------------|--------------|----------------|
| TIPP        | pairing   | AFGHO G1     | AFGHO G2     | Identity (GT)  |
| MIPP        | multiexp  | AFGHO G1     | Pedersen G1  | Identity (G1)  |
| scalar IPA  | scalar    | Pedersen G2  | Pedersen G2  | Identity (Fr)  |
| scalar TIPA | scalar    | Pedersen G2  | Pedersen G1  | Identity (Fr)  |
| MIPP-SSM    | multiexp  | AFGHO G1     | SSM          | Identity (G1)  |
| scalar-SSM  | scalar    | Pedersen G1  | SSM          | Identity (Fr)  |

TIPA-compatible configs (TIPP, MIPP, scalar TIPA) keep LMC keys in G2 and
RMC keys in G1 -- the structured SRS's h^beta / g^alpha even powers, the
reference's trait bound (tipa/mod.rs:130-148).
"""

from __future__ import annotations

from typing import Tuple

from ..ops.points import DevCurveCtx, dev_ctx
from .commitments import (
    AFGHOCommitmentG1,
    AFGHOCommitmentG2,
    IdentityCommitment,
    MultiexpIP,
    PairingIP,
    PedersenCommitment,
    ScalarIP,
    SSMPlaceholderCommitment,
)
from .gipa import GIPAConfig


def tipp_config(ctx: DevCurveCtx) -> GIPAConfig:
    return GIPAConfig(
        name="tipp",
        ctx=ctx,
        ip=PairingIP(ctx),
        lmc=AFGHOCommitmentG1(ctx),
        rmc=AFGHOCommitmentG2(ctx),
        ipc=IdentityCommitment(ctx, "gt"),
    )


def mipp_config(ctx: DevCurveCtx) -> GIPAConfig:
    return GIPAConfig(
        name="mipp",
        ctx=ctx,
        ip=MultiexpIP(ctx, "g1"),
        lmc=AFGHOCommitmentG1(ctx),
        rmc=PedersenCommitment(ctx, "g1"),
        ipc=IdentityCommitment(ctx, "g1"),
    )


def scalar_ipa_config(ctx: DevCurveCtx) -> GIPAConfig:
    return GIPAConfig(
        name="scalar_ipa",
        ctx=ctx,
        ip=ScalarIP(ctx),
        lmc=PedersenCommitment(ctx, "g2"),
        rmc=PedersenCommitment(ctx, "g2"),
        ipc=IdentityCommitment(ctx, "fr"),
    )


def scalar_tipa_config(ctx: DevCurveCtx) -> GIPAConfig:
    """Scalar IPA in the TIPA key layout: LMC keys in G2, RMC keys in G1 so
    the structured SRS (h^beta even powers / g^alpha even powers) serves as
    commitment keys (reference ScalarTIPA = TIPA<IP, SC2, SC1, ...>,
    /root/reference/ip_proofs/src/tipa/mod.rs:500-526)."""
    return GIPAConfig(
        name="scalar_tipa",
        ctx=ctx,
        ip=ScalarIP(ctx),
        lmc=PedersenCommitment(ctx, "g2"),
        rmc=PedersenCommitment(ctx, "g1"),
        ipc=IdentityCommitment(ctx, "fr"),
    )


def mipp_ssm_config(ctx: DevCurveCtx) -> GIPAConfig:
    return GIPAConfig(
        name="mipp_ssm",
        ctx=ctx,
        ip=MultiexpIP(ctx, "g1"),
        lmc=AFGHOCommitmentG1(ctx),
        rmc=SSMPlaceholderCommitment(ctx),
        ipc=IdentityCommitment(ctx, "g1"),
    )


def scalar_ssm_config(ctx: DevCurveCtx) -> GIPAConfig:
    return GIPAConfig(
        name="scalar_ssm",
        ctx=ctx,
        ip=ScalarIP(ctx),
        lmc=PedersenCommitment(ctx, "g1"),
        rmc=SSMPlaceholderCommitment(ctx),
        ipc=IdentityCommitment(ctx, "fr"),
    )
