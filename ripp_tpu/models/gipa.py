"""GIPA: the generalized inner product argument (log-round recursive fold).

Re-implementation of /root/reference/ip_proofs/src/gipa.rs as a host-driven
loop over device kernels: per round, six bulk reductions (two commitments +
one inner product per side, each a batched pairing product or MSM of size
n/2) and four vector folds, then one Fiat-Shamir hash on host.

Exact reference semantics preserved:
  * asymmetric split (gipa.rs:207-217): m_a_1 = m_a[n/2:] pairs with
    ck_a_1 = ck_a[:n/2]; m_b/ck_b mirrored
  * challenge swap (gipa.rs:248-256): the hashed 128-bit value plays c_inv
    (lands on the G2/key side); its inverse is the transcript challenge c
  * transcript/steps stored REVERSED (final round first), gipa.rs:298-299
  * verifier: com <- c*com_1 + com + c_inv*com_2 per round; final commitment
    keys via the challenge-product expansion - here computed per-index and
    contracted with a device MSM (closing the TODO at gipa.rs:383)
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, List, Optional, Sequence, Tuple

from ..errors import InnerProductArgumentError, check_power_of_two
from ..utils.fiat_shamir import blake2b_digest
from ..utils.serialize import nonce_bytes
from ..utils.trace import scope
from .algebra import PLACEHOLDER, HostAlg
from .vectors import FrVec, PlaceholderVec, PointVec


@dataclass
class GIPAConfig:
    """One point of the instantiation matrix (SURVEY.md section 2.2)."""

    name: str
    ctx: Any
    ip: Any    # .compute(m_a, m_b) -> host element, .out_kind
    lmc: Any   # left-message commitment
    rmc: Any   # right-message commitment
    ipc: Any   # inner-product commitment (IdentityCommitment in the matrix)

    @property
    def fr_alg(self) -> HostAlg:
        return HostAlg(self.ctx.host, "fr")


@dataclass
class GIPAProof:
    # steps stored reversed (final round first), matching the reference
    steps: List[Tuple[Tuple, Tuple]]  # ((com_a,com_b,com_t), (com_a,com_b,com_t))
    r_base: Tuple[Any, Any]           # (m_a base, m_b base) host elements


@dataclass
class GIPAAux:
    transcript: List[int]             # challenges, reversed (final round first)
    ck_base: Tuple[Any, Any]


def _ser_com(cfg: GIPAConfig, com) -> bytes:
    a, b, t = com
    return (cfg.lmc.out_alg.ser(a) + cfg.rmc.out_alg.ser(b)
            + cfg.ipc.out_alg.ser(t))


def round_challenge(cfg: GIPAConfig, prev_c: int, com_1, com_2
                    ) -> Tuple[int, int]:
    """Returns (c, c_inv) with c = inverse(hash128), c_inv = hash128
    (the reference's swap, gipa.rs:248-256)."""
    r = cfg.ctx.host.r
    base = _ser_com(cfg, com_1) + _ser_com(cfg, com_2)
    prev = HostAlg(cfg.ctx.host, "fr").ser(prev_c)
    counter = 0
    while True:
        digest = blake2b_digest(nonce_bytes(counter) + prev + base)
        h = int.from_bytes(digest[:16], "big") % r
        if h != 0:
            return pow(h, -1, r), h
        counter += 1


def prove_with_aux(cfg: GIPAConfig, m_a, m_b, ck_a, ck_b, ck_t
                   ) -> Tuple[GIPAProof, GIPAAux]:
    n = len(m_a)
    if not (n == len(m_b) == len(ck_a) == len(ck_b)):
        raise InnerProductArgumentError.message_length_invalid(
            len(m_a), len(m_b)
        )
    check_power_of_two(n)
    steps = []
    transcript: List[int] = []
    prev_c = 0
    while n > 1:
        # asymmetric split (gipa.rs:207-217)
        m_a_1, m_a_2 = m_a.hi(), m_a.lo()
        ck_a_1, ck_a_2 = ck_a.lo(), ck_a.hi()
        m_b_1, m_b_2 = m_b.lo(), m_b.hi()
        ck_b_1, ck_b_2 = ck_b.hi(), ck_b.lo()

        with scope(f"Commit round (size {n // 2})"):  # gipa.rs:219-232
            com_1 = (
                cfg.lmc.commit(ck_a_1, m_a_1),
                cfg.rmc.commit(ck_b_1, m_b_1),
                cfg.ipc.commit(ck_t, [cfg.ip.compute(m_a_1, m_b_1)]),
            )
            com_2 = (
                cfg.lmc.commit(ck_a_2, m_a_2),
                cfg.rmc.commit(ck_b_2, m_b_2),
                cfg.ipc.commit(ck_t, [cfg.ip.compute(m_a_2, m_b_2)]),
            )

        c, c_inv = round_challenge(cfg, prev_c, com_1, com_2)

        with scope(f"Fold round (size {n // 2})"):  # gipa.rs:261-291
            m_a = m_a_1.fold(m_a_2, c)
            m_b = m_b_2.fold(m_b_1, c_inv)
            ck_a = ck_a_2.fold(ck_a_1, c_inv)
            ck_b = ck_b_1.fold(ck_b_2, c)

        steps.append((com_1, com_2))
        transcript.append(c)
        prev_c = c
        n //= 2

    proof = GIPAProof(steps=list(reversed(steps)),
                      r_base=(m_a.first(), m_b.first()))
    aux = GIPAAux(transcript=list(reversed(transcript)),
                  ck_base=(ck_a.first(), ck_b.first()))
    return proof, aux


def prove(cfg: GIPAConfig, values, ck, com) -> GIPAProof:
    """Full prove with the reference's consistency prechecks (gipa.rs:108)."""
    m_a, m_b, t = values
    ck_a, ck_b, ck_t = ck
    com_a, com_b, com_t = com
    if not cfg.ipc.out_alg.eq(
        cfg.ipc.commit(ck_t, [cfg.ip.compute(m_a, m_b)]), com_t
    ):
        raise InnerProductArgumentError.inner_product_invalid()
    check_power_of_two(len(m_a))
    if not cfg.lmc.out_alg.eq(cfg.lmc.commit(ck_a, m_a), com_a):
        raise InnerProductArgumentError("left message commitment mismatch")
    if not cfg.rmc.out_alg.eq(cfg.rmc.commit(ck_b, m_b), com_b):
        raise InnerProductArgumentError("right message commitment mismatch")
    proof, _ = prove_with_aux(cfg, m_a, m_b, ck_a, ck_b, ck_t)
    return proof


def _fold_terms(cfg: GIPAConfig, alg, base, elems, exps):
    """base + sum_i exps[i] * elems[i] in the commitment's abelian group.
    GT terms batch onto the device (one 255-bit scan for the whole list,
    vs ~1 s per host-Python cyclotomic pow); group/scalar terms stay on
    host (native point ops are cheap)."""
    from ..ops.pairing import dev_pairing
    from .algebra import IdentityOutput

    if isinstance(alg, HostAlg) and alg.kind == "gt":
        parts = dev_pairing(cfg.ctx).gt_exp_batch(elems, exps)
        acc = base
        for p in parts:
            acc = alg.add(acc, p)
        return acc
    if (getattr(alg, "kind", None) == "identity"
            and alg.inner.kind == "gt"
            and all(len(e.items) == 1 for e in elems)):
        parts = dev_pairing(cfg.ctx).gt_exp_batch(
            [e.items[0] for e in elems], exps
        )
        acc = base
        for p in parts:
            acc = alg.add(acc, IdentityOutput([p], "gt"))
        return acc
    acc = base
    for e, x in zip(elems, exps):
        acc = alg.add(acc, alg.mul_scalar(e, x))
    return acc


def compute_recursive_challenges(cfg: GIPAConfig, com, proof: GIPAProof
                                 ) -> Tuple[Tuple, List[int]]:
    """Replay Fiat-Shamir and fold the commitments (gipa.rs:322-363).
    Returns (base_com, transcript) with transcript reversed like the
    reference (final round first).  The fold is an abelian sum, so all
    rounds' scalar terms batch together (see _fold_terms)."""
    from ..utils.trace import scope

    transcript: List[int] = []
    prev_c = 0
    with scope("Replay Fiat-Shamir challenges"):
        for com_1, com_2 in reversed(proof.steps):  # prove order
            c, c_inv = round_challenge(cfg, prev_c, com_1, com_2)
            transcript.append(c)
            prev_c = c
    r = cfg.ctx.host.r
    c_invs = [pow(c, -1, r) for c in transcript]

    algs = (cfg.lmc.out_alg, cfg.rmc.out_alg, cfg.ipc.out_alg)
    slot_items = []
    for slot, alg in enumerate(algs):
        elems, exps = [], []
        for (com_1, com_2), c, ci in zip(reversed(proof.steps),
                                         transcript, c_invs):
            elems += [com_1[slot], com_2[slot]]
            exps += [c, ci]
        slot_items.append((alg, elems, exps))

    # GT-kind slots share ONE device exponentiation call: each
    # gt_exp_batch is a fixed 255-step scan whose wall time is
    # step-count-bound, not batch-bound, so 3 calls/verify -> 1 (TIPP's
    # three slots are all GT; measured 380 ms per call on v5e).
    def _gt_kind(alg):
        if isinstance(alg, HostAlg) and alg.kind == "gt":
            return "raw"
        if (getattr(alg, "kind", None) == "identity"
                and alg.inner.kind == "gt"):
            return "identity"
        return None

    with scope("Fold commitments"):
        batch_plan = []
        all_elems, all_exps = [], []
        for si, (alg, elems, exps) in enumerate(slot_items):
            k = _gt_kind(alg)
            if k == "raw":
                batch_plan.append((si, k, len(all_elems), len(elems)))
                all_elems += elems
                all_exps += exps
            elif k == "identity" and all(len(e.items) == 1 for e in elems):
                batch_plan.append((si, k, len(all_elems), len(elems)))
                all_elems += [e.items[0] for e in elems]
                all_exps += exps
        parts_all = []
        if all_elems:
            from ..ops.pairing import dev_pairing

            parts_all = dev_pairing(cfg.ctx).gt_exp_batch(
                all_elems, all_exps)

        from .algebra import IdentityOutput

        folded = [None] * len(slot_items)
        for si, k, off, cnt in batch_plan:
            alg, _, _ = slot_items[si]
            acc = com[si]
            for p in parts_all[off:off + cnt]:
                if k == "identity":
                    acc = alg.add(acc, IdentityOutput([p], "gt"))
                else:
                    acc = alg.add(acc, p)
            folded[si] = acc
        batched = {si for si, _, _, _ in batch_plan}
        for si, (alg, elems, exps) in enumerate(slot_items):
            if si not in batched:
                folded[si] = _fold_terms(cfg, alg, com[si], elems, exps)
    return tuple(folded), list(reversed(transcript))


def final_ck_exponents(r: int, transcript_reversed: Sequence[int]
                       ) -> Tuple[List[int], List[int]]:
    """Challenge-product expansion (gipa.rs:373-381): with the reversed
    transcript, w_a[idx] = prod_{i: bit_i(idx)} c_i^{-1} and w_b uses c_i."""
    w_a = [1]
    w_b = [1]
    for i, c in enumerate(transcript_reversed):
        c_inv = pow(c, -1, r)
        for j in range(1 << i):
            w_a.append(w_a[j] * c_inv % r)
            w_b.append(w_b[j] * c % r)
    return w_a, w_b


def compute_final_commitment_keys(cfg: GIPAConfig, ck_a, ck_b,
                                  transcript: Sequence[int]):
    """Verifier-side folded keys, via device MSM (vs the reference's serial
    fold, gipa.rs:383-397).  The challenge-product expansion itself runs
    device-vectorized (one log(n)-step scan of batch-n muls) instead of the
    reference's host doubling loop (gipa.rs:373-381)."""
    from .vectors import challenge_product_vec

    r = cfg.ctx.host.r
    n = len(ck_a)
    c_invs = [pow(c, -1, r) for c in transcript]

    def contract(ck, xs):
        if isinstance(ck, PlaceholderVec):
            return PLACEHOLDER
        if isinstance(ck, PointVec):
            return ck.msm(challenge_product_vec(cfg.ctx, xs, n))
        raise TypeError(type(ck))

    return contract(ck_a, c_invs), contract(ck_b, list(transcript))


def verify_base_commitment(cfg: GIPAConfig, base_ck, base_com,
                           proof: GIPAProof) -> bool:
    import os

    a_base, b_base = proof.r_base
    if os.environ.get("RIPP_BATCH_VERIFY", "1") != "0":
        # pairing-shaped checks fold into one device Miller product +
        # final exp (models/pairing_check.py); others verify directly
        from .pairing_check import PairingCheck, add_base_commitment_checks

        pc = PairingCheck(cfg.ctx)
        direct = add_base_commitment_checks(
            pc, cfg, base_ck, base_com, a_base, b_base)
        return direct is None and pc.verify()
    ck_a_base, ck_b_base, ck_t = base_ck
    com_a, com_b, com_t = base_com
    t_base = cfg.ip_single(a_base, b_base)
    return (cfg.lmc.verify_single(ck_a_base, a_base, com_a)
            and cfg.rmc.verify_single(ck_b_base, b_base, com_b)
            and cfg.ipc.verify_single(PLACEHOLDER, t_base, com_t))


def verify(cfg: GIPAConfig, ck, com, proof: GIPAProof) -> bool:
    ck_a, ck_b, ck_t = ck
    n = len(ck_a)
    if n != len(ck_b):
        raise InnerProductArgumentError.message_length_invalid(n, len(ck_b))
    check_power_of_two(n)
    base_com, transcript = compute_recursive_challenges(cfg, com, proof)
    ck_a_base, ck_b_base = compute_final_commitment_keys(
        cfg, ck_a, ck_b, transcript
    )
    return verify_base_commitment(
        cfg, (ck_a_base, ck_b_base, ck_t), base_com, proof
    )


# --- single-element inner products (host) ----------------------------------

def _ip_single(cfg: GIPAConfig, a, b):
    host = cfg.ctx.host
    kind = cfg.ip.out_kind
    from ..host import pairing as hp

    if kind == "gt":
        return hp.pairing(host, a, b)
    if kind in ("g1", "g2"):
        curve = host.g1 if kind == "g1" else host.g2
        return curve.scalar_mul(a, b)
    if kind == "fr":
        return (a * b) % host.r
    raise ValueError(kind)


GIPAConfig.ip_single = _ip_single
