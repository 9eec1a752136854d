"""One-layer recursion (`olr`): a BW6-761 Groth16 SNARK whose circuit
verifies BLS12-377 Groth16 proofs in-circuit.

Reference: /root/reference/benches/benches/groth16_aggregation/bench.rs:
84-161 builds the same construction with ark r1cs-std's PairingVar and
ark-bw6-761; here the verifier circuit is assembled from the pairing
gadgets in gadget_pairing.py (native-field Fq12 tower + Miller loop +
seed-ladder final exponentiation) and proven with applications/groth16.py
over the BW6-761 curve (host/{curves,bw6}.py).

Circuit statement (per inner proof): given public inputs x_1..x_k,
there exist points A, B, C on the right curves with

    e(A, B) = e(alpha, beta) * e(ic(x), gamma) * e(C, delta)

checked as FE(miller(A,B) * miller(-ic, gamma) * miller(-C, delta))
== e(alpha, beta) with e(alpha, beta) a precomputed constant.

Scalar multiplications for ic(x) use conditional constant-base additions
in incomplete affine coordinates with a fixed offset point (identity
cases cannot arise; equal-x collisions have negligible probability for
honest fixtures -- this matches the bench-baseline purpose, not a
hardened production verifier)."""

from __future__ import annotations

from typing import List, Sequence, Tuple

from ..host import pairing as hp
from ..host.curves import PairingCurve, bls12_377
from .gadget_pairing import CircuitBuilder, PairingGadget
from .groth16 import Proof, R1CS, VerifyingKey

# fixed offset scalar for the incomplete-add accumulator
_OFFSET_SCALAR = int.from_bytes(b"ripp-tpu olr offset point", "big")


def _add_const_pt(fq, acc, pt, bit_lc):
    """acc + pt (a constant host affine point), taken when bit_lc == 1,
    kept when 0.  Incomplete affine formulas; 6 constraints/bit for a
    non-constant accumulator, free while acc is still constant."""
    ax, ay = acc
    bx, by = fq.from_int(pt[0]), fq.from_int(pt[1])
    lam = fq.mul(fq.sub(ay, by), fq.inv(fq.sub(ax, bx)))
    x3 = fq.sub(fq.sub(fq.mul(lam, lam), ax), bx)
    y3 = fq.sub(fq.mul(lam, fq.sub(bx, x3)), by)
    sx = fq.add(fq.mul(bit_lc, fq.sub(x3, ax)), ax)
    sy = fq.add(fq.mul(bit_lc, fq.sub(y3, ay)), ay)
    return (sx, sy)


def _decompose(fq, lc, value: int, nbits: int):
    """Allocate nbits boolean witnesses summing (base 2) to lc; also
    range-enforces value < 2^nbits."""
    bld = fq.bld
    bits = []
    acc = {}
    for k in range(nbits):
        b = (value >> k) & 1
        idx = bld.alloc(b)
        blc = {idx: 1}
        bld.enforce(blc, blc, blc)  # booleanity
        bits.append(blc)
        acc = fq.add(acc, fq.scale_const(blc, 1 << k))
    fq.enforce_eq(acc, lc)
    return bits


def ic_gadget(pg: PairingGadget, vk: VerifyingKey,
              pub_lcs: Sequence, pub_vals: Sequence[int],
              bits_per_input: int):
    """In-circuit prepare_inputs: gamma_abc[0] + sum_j x_j*gamma_abc[j+1]
    with constant bases and public scalars."""
    curve = pg.curve
    fq = pg.t.fq
    g1 = curve.g1
    S = g1.scalar_mul(curve.g1_gen, _OFFSET_SCALAR)
    acc = (fq.from_int(S[0]), fq.from_int(S[1]))
    one = fq.one()
    for j, (lc, val) in enumerate(zip(pub_lcs, pub_vals)):
        assert val < (1 << bits_per_input), "input exceeds bit budget"
        bits = _decompose(fq, lc, val, bits_per_input)
        base = vk.gamma_abc_g1[j + 1]
        for k, blc in enumerate(bits):
            acc = _add_const_pt(fq, acc, base, blc)
            base = g1.add(base, base)  # 2^(k+1) * gamma_abc[j+1] (host)
    acc = _add_const_pt(fq, acc, vk.gamma_abc_g1[0], one)
    acc = _add_const_pt(fq, acc, g1.neg(S), one)
    return acc


def build_verifier_circuit(
    vk: VerifyingKey,
    publics_list: Sequence[Sequence[int]],
    proofs: Sequence[Proof],
    bits_per_input: int = 32,
    curve: PairingCurve = None,
) -> Tuple[R1CS, List[int]]:
    """R1CS (over BW6-761's scalar field = BLS12-377's base field) that
    verifies the given BLS12-377 Groth16 proofs, plus its satisfying
    assignment.  Outer publics = the inner publics, flattened."""
    curve = curve or bls12_377()
    n = len(proofs)
    assert n == len(publics_list)
    k = len(publics_list[0])
    bld = CircuitBuilder(curve.p, n * k)
    bld.set_publics([v for pubs in publics_list for v in pubs])
    pg = PairingGadget(curve, bld)
    F = pg.t.fp12
    fq = pg.t.fq

    e_ab = hp.pairing(curve, vk.alpha_g1, vk.beta_g2)
    e_ab_const = pg.t.embed_fp12(e_ab)
    gamma = (pg.t.const_fp2(vk.gamma_g2[0]), pg.t.const_fp2(vk.gamma_g2[1]))
    delta = (pg.t.const_fp2(vk.delta_g2[0]), pg.t.const_fp2(vk.delta_g2[1]))

    for i, (pubs, prf) in enumerate(zip(publics_list, proofs)):
        A = pg.witness_g1(prf.a)
        B = pg.witness_g2(prf.b)
        C = pg.witness_g1(prf.c)
        pub_lcs = [{1 + i * k + j: 1} for j in range(k)]
        ic = ic_gadget(pg, vk, pub_lcs, list(pubs), bits_per_input)
        neg_ic = (ic[0], fq.neg(ic[1]))
        neg_C = (C[0], fq.neg(C[1]))
        M = F.mul(
            F.mul(pg.miller_loop(A, B), pg.miller_loop(neg_ic, gamma)),
            pg.miller_loop(neg_C, delta),
        )
        e = pg.final_exponentiation(M)
        pg.enforce_fp12_eq(e, e_ab_const)

    return bld.finish()
