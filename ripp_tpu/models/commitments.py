"""Doubly homomorphic commitments and inner products (device-backed).

Mirrors the reference component inventory (SURVEY.md section 2.1 rows 1-9):
  AFGHO16 (G1/G2 flavors)  - pairing-product commitment to group vectors
  Pedersen                 - MSM commitment to scalar vectors
  Identity                 - pass-through (message in the clear)
  SSM placeholder          - commits to nothing (structured scalar message)
plus the three inner products (pairing / multiexponentiation / scalar).

Bulk commits run on device (batched Miller loops / Pippenger MSM); the
single-element `commit_single` used by verifier base checks runs on host.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, List, Sequence

from ..host import pairing as hp
from ..ops.pairing import dev_pairing
from ..ops.points import DevCurveCtx
from ..errors import InnerProductError, check_same_length
from ..utils.fiat_shamir import random_generators
from .algebra import (
    PLACEHOLDER,
    HostAlg,
    IdentityAlg,
    IdentityOutput,
    Placeholder,
)
from .vectors import FrVec, PlaceholderVec, PointVec


# --------------------------------------------------------------------------
# inner products (trait InnerProduct, inner_products/src/lib.rs:40-49)
# --------------------------------------------------------------------------

class PairingIP:
    """prod_i e(A_i, B_i) (TIPP kernel). Dispatches through the vector
    method, so mesh-sharded vectors (parallel/vectors.py) ride per-device
    Miller partials + an ICI Fq12 all-reduce transparently."""

    out_kind = "gt"

    def __init__(self, ctx: DevCurveCtx):
        self.ctx = ctx

    def compute(self, a: PointVec, b: PointVec):
        check_same_length(a, b)
        return a.pair_product(b)


class MultiexpIP:
    """sum_i b_i * A_i (MIPP kernel = Pippenger MSM)."""

    def __init__(self, ctx: DevCurveCtx, grp: str = "g1"):
        self.ctx = ctx
        self.grp = grp
        self.out_kind = grp

    def compute(self, a: PointVec, b: FrVec):
        check_same_length(a, b)
        return a.msm(b)


class ScalarIP:
    """sum_i a_i b_i in Fr."""

    out_kind = "fr"

    def __init__(self, ctx: DevCurveCtx):
        self.ctx = ctx

    def compute(self, a: FrVec, b: FrVec):
        check_same_length(a, b)
        return a.inner_product(b)


# --------------------------------------------------------------------------
# commitments (trait DoublyHomomorphicCommitment)
# --------------------------------------------------------------------------

class AFGHOCommitmentG1:
    """com = prod_i e(M_i, K_i), M in G1, K in G2, output GT
    (dh_commitments/src/afgho16/mod.rs:20-34 capability)."""

    name = "afgho_g1"
    msg_kind = "g1"
    key_kind = "g2"

    def __init__(self, ctx: DevCurveCtx):
        self.ctx = ctx
        self.out_alg = HostAlg(ctx.host, "gt")

    def setup(self, rng, size: int) -> PointVec:
        return PointVec.from_host(
            self.ctx, "g2", random_generators(rng, self.ctx.host.g2, size)
        )

    def commit(self, keys: PointVec, msgs: PointVec):
        check_same_length(keys, msgs)
        return msgs.pair_product(keys)

    def commit_single(self, key, msg):
        return hp.pairing(self.ctx.host, msg, key)

    def verify_single(self, key, msg, com) -> bool:
        return self.out_alg.eq(self.commit_single(key, msg), com)


class AFGHOCommitmentG2:
    """com = prod_i e(K_i, M_i), M in G2, K in G1, output GT."""

    name = "afgho_g2"
    msg_kind = "g2"
    key_kind = "g1"

    def __init__(self, ctx: DevCurveCtx):
        self.ctx = ctx
        self.out_alg = HostAlg(ctx.host, "gt")

    def setup(self, rng, size: int) -> PointVec:
        return PointVec.from_host(
            self.ctx, "g1", random_generators(rng, self.ctx.host.g1, size)
        )

    def commit(self, keys: PointVec, msgs: PointVec):
        check_same_length(keys, msgs)
        return keys.pair_product(msgs)

    def commit_single(self, key, msg):
        return hp.pairing(self.ctx.host, key, msg)

    def verify_single(self, key, msg, com) -> bool:
        return self.out_alg.eq(self.commit_single(key, msg), com)


class PedersenCommitment:
    """com = sum_i m_i * K_i over group `grp`
    (dh_commitments/src/pedersen/mod.rs:14-27 capability)."""

    msg_kind = "fr"

    def __init__(self, ctx: DevCurveCtx, grp: str = "g1"):
        self.ctx = ctx
        self.grp = grp
        self.name = f"pedersen_{grp}"
        self.key_kind = grp
        self.out_alg = HostAlg(ctx.host, grp)

    def setup(self, rng, size: int) -> PointVec:
        curve = self.ctx.host.g1 if self.grp == "g1" else self.ctx.host.g2
        return PointVec.from_host(
            self.ctx, self.grp, random_generators(rng, curve, size)
        )

    def commit(self, keys: PointVec, msgs: FrVec):
        check_same_length(keys, msgs)
        return keys.msm(msgs)

    def commit_single(self, key, msg: int):
        curve = self.ctx.host.g1 if self.grp == "g1" else self.ctx.host.g2
        return curve.scalar_mul(key, msg)

    def verify_single(self, key, msg, com) -> bool:
        return self.out_alg.eq(self.commit_single(key, msg), com)


class IdentityCommitment:
    """Pass-through commitment: output = message vector in the clear."""

    msg_kind = None  # any host element kind
    key_kind = "placeholder"

    def __init__(self, ctx: DevCurveCtx, inner_kind: str):
        self.ctx = ctx
        self.inner_kind = inner_kind
        self.name = f"identity_{inner_kind}"
        self.out_alg = IdentityAlg(HostAlg(ctx.host, inner_kind))

    def setup(self, rng, size: int):
        return PlaceholderVec(size)

    def commit(self, keys, msgs: Sequence) -> IdentityOutput:
        return IdentityOutput(list(msgs), self.inner_kind)

    def commit_single(self, key, msg) -> IdentityOutput:
        return IdentityOutput([msg], self.inner_kind)

    def verify_single(self, key, msg, com) -> bool:
        return self.out_alg.eq(self.commit_single(key, msg), com)


class SSMPlaceholderCommitment:
    """Structured-scalar-message placeholder: commit == 0 in Fr
    (structured_scalar_message.rs:28-47)."""

    name = "ssm_placeholder"
    msg_kind = "fr"
    key_kind = "placeholder"

    def __init__(self, ctx: DevCurveCtx):
        self.ctx = ctx
        self.out_alg = HostAlg(ctx.host, "fr")

    def setup(self, rng, size: int):
        return PlaceholderVec(size)

    def commit(self, keys, msgs) -> int:
        return 0

    def commit_single(self, key, msg) -> int:
        return 0

    def verify_single(self, key, msg, com) -> bool:
        return com == 0
