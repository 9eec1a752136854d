"""RNS executor: run kprog field programs over the RNS-Montgomery form.

Round-5 follow-through on the round-4 MXU decision record (BASELINE.md):
the CIOS limb multiplier is VPU-bound at ~650M muls/s/chip; parity with
the 64-core reference needs the multiplier itself several times faster.
In a residue number system the product is elementwise per 14-bit channel
and the two base extensions per Montgomery reduction are constant-matrix
linear maps that lower to int8 MXU matmuls (ops/fp_rns.py implements the
multiplier; this module makes it EXECUTE whole field programs).

Execution model
---------------
A value x lives as x~ = x*MA mod p (+ a bounded multiple of p) in three
channel-major residue arrays: rA [k, B], rB [k, B] (14-bit prime bases)
and rr [B] (redundant 2^16 channel). All kprog ops map onto this state:

  mul      -> ops/fp_rns.make_rns_mul (elementwise channels + two int8
              MXU base-extension matmuls); computes a*b*MA^{-1}, i.e.
              Montgomery semantics with R_rns = MA.
  add      -> channelwise add mod m (value bounds add).
  sub(a,b) -> a + (ceil(bound(b)/p)*p - b) channelwise: RNS cannot
              compare magnitudes, so a STATIC multiple of p keeps the
              representative nonnegative. Bounds are tracked per register
              at trace time (analyze_bounds); values stay congruent.
  neg(a)   -> ceil(bound(a)/p)*p - a, same discipline.
  sel      -> channelwise select (both sides congruent mod p).
  movc(c)  -> residues of c*MA mod p (RNS-Montgomery constant).

Bounds only matter statically: a mul output is < 2p + ba*bb/(p*MA)*p, so
with MA ~ 2^400 and p ~ 2^381 even inputs of several hundred p reduce
back below ~2.1p; add/sub chains between muls grow bounds by small
factors. analyze_bounds() verifies a program maps input bound B* to
output bounds <= B* (the scan-carry invariant for the Miller loop).

Domain conversions (device-side, so whole pipelines stay in one jit):
  in : 16-bit limbs x*R (Montgomery limb form, ops/fp.py) -> 8-bit digit
       matmul against (2^(8d) mod m_j) -> residues of x*R -> one RNS mul
       by MA^2*R^{-1} mod p => x*MA.
  out: Garner/mixed-radix digits (k sequential channel steps), digit
       matmul against 8-bit digit rows of the MRC weights (exact mod
       2^(16*nl) because the true value < 4p), two conditional
       subtracts, then one limb-Montgomery mul by R^2*MA^{-1} mod p
       => canonical x*R limbs, bit-compatible with the CIOS path.

Replaces (as an alternative backend) the arkworks ark-ff Montgomery
backend the reference consumes at
/root/reference/inner_products/src/lib.rs:77-116. No counterpart in the
reference: this is TPU-first design (MXU contraction for the O(k^2)
carry work).
"""

from __future__ import annotations

import functools
from typing import Dict, List, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from .fp import LIMB_BITS, LIMB_MASK, FieldSpec
from .fp_rns import (
    DIGIT,
    MR,
    MR_BITS,
    MR_MASK,
    _mod_barrett,
    make_rns_mul,
    rns_spec,
)
from .kprog import Scheduled

# conversion-digit width for limb<->residue matmuls (int32 accumulation:
# 2*nl terms of 2^8 * 2^14 < 2^28 — exact)
CDIG = 8
CMASK = (1 << CDIG) - 1


# ---------------------------------------------------------------------------
# static bound analysis
# ---------------------------------------------------------------------------

def mul_out_bound(p: int, MA: int, ba: int, bb: int) -> int:
    """Exact bound of the RNS-Montgomery product of values < ba, < bb:
    r = (c + q'p)/MA with c < ba*bb and q' < 2*MA."""
    return (ba * bb) // MA + 2 * p + 1


def analyze_bounds(sched: Scheduled, p: int, MA: int, MB: int,
                   in_bound: int) -> List[int]:
    """Propagate static value bounds through a scheduled program.

    Returns the per-output bounds; raises if any multiplication operand
    pair would push the product representative past MB/2 (the safety
    margin for the exact Shenoy-Kumaresan extension, which needs
    r < MB)."""
    bound: Dict[int, int] = {}
    for r in sched.inputs:
        bound[r] = in_bound
    for r in sched.mask_inputs:
        bound[r] = 1
    for kind, items in sched.segments:
        if kind == "muls":
            for d, a, b in items:
                out = mul_out_bound(p, MA, bound[a], bound[b])
                if out >= MB // 2:
                    raise ValueError(
                        f"{sched.name}: mul bound overflow {out} >= MB/2")
                bound[d] = out
            continue
        for op in items:
            if op.kind == "movc":
                bound[op.dst] = p
            elif op.kind == "add":
                bound[op.dst] = bound[op.a] + bound[op.b]
            elif op.kind == "sub":
                mult = -(-bound[op.b] // p)  # ceil(bound(b)/p)
                bound[op.dst] = bound[op.a] + mult * p
            elif op.kind == "neg":
                bound[op.dst] = -(-bound[op.a] // p) * p
            elif op.kind == "sel":
                bound[op.dst] = max(bound[op.a], bound[op.b])
            else:
                raise ValueError(op.kind)
    return [bound[r] for r in sched.outputs]


# ---------------------------------------------------------------------------
# the RNS field-ops object
# ---------------------------------------------------------------------------

class RnsField:
    """Device ops on (rA [k,...,B], rB [k,...,B], rr [...,B]) channel-major
    residue state for one prime p. The batch rides the minor (lane) axis;
    the channel axis k rides sublanes."""

    def __init__(self, spec: FieldSpec, k: int = 29):
        self.spec = spec
        self.p = spec.p
        self.k = k
        s = rns_spec(spec.p, k)
        self.s = s
        self.MA, self.MB = s["MA"], s["MB"]
        self.mul = make_rns_mul(spec.p, k)
        # numpy constants throughout: RnsField may be constructed inside
        # an outer jit trace (first dispatch), where jnp array creation
        # would stage tracers into this cache (see _residues)
        col = lambda a: np.asarray(a[:, None])
        self._mA, self._mB = col(s["mA_a"]), col(s["mB_a"])
        self._invA, self._invB = col(s["inv_mA_f"]), col(s["inv_mB_f"])
        self._np_cache: Dict[int, tuple] = {}
        self._const_cache: Dict[int, tuple] = {}
        # limb->residue conversion matrix: rows = 2*nl 8-bit digit slots
        # (nl lows then nl highs), cols = 2k channels (A then B)
        nl = spec.nl
        mods = list(s["mA"]) + list(s["mB"])
        Win = np.zeros((2 * nl, 2 * k), dtype=np.int32)
        for i in range(nl):
            for j, m in enumerate(mods):
                Win[i, j] = pow(2, LIMB_BITS * i, m)
                Win[nl + i, j] = pow(2, LIMB_BITS * i + CDIG, m)
        self._Win = np.ascontiguousarray(Win.T)  # [2k, 2nl]
        # Montgomery-domain glue constants
        R = spec.r
        self._ma2_rinv = self.const_plain(
            (self.MA * self.MA % spec.p) * pow(R, -1, spec.p) % spec.p)
        # Garner constants: step i eliminates channel i from channels > i
        mA = s["mA"]
        inv_step = np.zeros((k, k), dtype=np.uint32)
        for i in range(k):
            for j in range(i + 1, k):
                inv_step[i, j] = pow(mA[i], -1, mA[j])
        self._garner_inv = inv_step
        # MRC weights P_i = prod_{j<i} mA_j as 8-bit digit rows, exact
        # mod 2^(16 nl) (true reconstructed value < 4p < 2^(16 nl))
        ndig = 2 * nl
        P8 = np.zeros((k, ndig), dtype=np.int32)
        Pi = 1
        for i in range(k):
            w = Pi % (1 << (LIMB_BITS * nl))
            for d in range(ndig):
                P8[i, d] = (w >> (CDIG * d)) & CMASK
            Pi *= mA[i]
        self._P8 = np.ascontiguousarray(P8.T)  # [2nl, k]

    # --- constants ---------------------------------------------------------
    def _residues(self, v: int):
        """NUMPY arrays on purpose: these are built lazily, possibly
        inside a jit/scan trace, and caching a jnp array created there
        would leak a tracer. numpy operands stage as constants."""
        s = self.s
        rA = np.asarray([[v % m] for m in s["mA"]], dtype=np.uint32)
        rB = np.asarray([[v % m] for m in s["mB"]], dtype=np.uint32)
        rr = np.asarray([v & MR_MASK], dtype=np.uint32)
        return rA, rB, rr

    def const_plain(self, v: int):
        """Residues of the literal integer v (no Montgomery factor)."""
        return self._residues(v % self.p)

    def const_mont(self, v: int):
        """RNS-Montgomery constant: residues of v*MA mod p."""
        key = v % self.p
        if key not in self._const_cache:
            self._const_cache[key] = self._residues(key * self.MA % self.p)
        return self._const_cache[key]

    def _np_residues(self, mult: int):
        """Residues of mult*p (the static sub/neg offset)."""
        if mult not in self._np_cache:
            self._np_cache[mult] = self._residues(mult * self.p)
        return self._np_cache[mult]

    # --- ring ops ----------------------------------------------------------
    def add(self, a, b):
        aA, aB, ar = a
        bA, bB, br = b
        return (_mod_barrett(aA + bA, self._mA, self._invA),
                _mod_barrett(aB + bB, self._mB, self._invB),
                (ar + br) & MR_MASK)

    def sub(self, a, b, b_bound_mult: int):
        """a - b + b_bound_mult*p (b_bound_mult*p >= bound(b) statically)."""
        aA, aB, ar = a
        bA, bB, br = b
        nA, nB, nr = self._np_residues(b_bound_mult)
        # aA + (np - bA) stays < 2^15 + 2^14 per channel before reduction
        return (_mod_barrett(aA + (nA + self._mA - bA), self._mA, self._invA),
                _mod_barrett(aB + (nB + self._mB - bB), self._mB, self._invB),
                (ar + nr - br) & MR_MASK)

    def neg(self, a, bound_mult: int):
        aA, aB, ar = a
        nA, nB, nr = self._np_residues(bound_mult)
        return (_mod_barrett(nA + self._mA - aA, self._mA, self._invA),
                _mod_barrett(nB + self._mB - aB, self._mB, self._invB),
                (nr - ar) & MR_MASK)

    def sel(self, m, a, b):
        """m: [..., B] uint32/bool mask (1 -> a)."""
        cond = m > 0
        return tuple(
            jnp.where(cond[None] if x.ndim > cond.ndim else cond, x, y)
            for x, y in zip(a, b)
        )

    # --- conversions --------------------------------------------------------
    def from_mont_limbs(self, x):
        """[B, nl] 16-bit Montgomery limbs (integer value x*R mod p) ->
        RNS state of x*MA (channel-major [k, B]). Batch rank must be 1."""
        assert x.ndim == 2, x.shape
        lo = (x & CMASK).astype(jnp.int32)
        hi = (x >> CDIG).astype(jnp.int32)
        D = jnp.concatenate([lo, hi], axis=-1)       # [B, 2nl]
        z = jax.lax.dot_general(
            self._Win, D, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # [2k, B]
        zu = z.astype(jnp.uint32)
        k = self.k
        rA = _mod_barrett(zu[:k], self._mA, self._invA)
        rB = _mod_barrett(zu[k:], self._mB, self._invB)
        rr = x[..., 0] & MR_MASK
        xr = (rA, rB, rr)
        # x*R * (MA^2 R^{-1}) * MA^{-1} = x*MA   (bound < 2p + eps)
        return self.mul(xr, self._ma2_rinv)

    def to_mont_limbs(self, fp_dev, a):
        """RNS state of x*MA (any in-bounds representative) -> canonical
        x*R Montgomery limbs [B, nl] (bit-compatible with the CIOS path).

        A multiplication by const_mont(1) first squashes the
        representative below 2p + p/(k+2) (add/sub chains can leave it at
        several p); then Garner/MRC over base A (k sequential channel
        steps), digit-matmul reconstruction exact mod 2^(16 nl), two
        conditional subtracts, and one limb-domain Montgomery mul by
        MA^{-1}*R mod p restore the limb representation."""
        spec = self.spec
        a = self.mul(a, self.const_mont(1))
        rA = a[0]
        k = self.k
        t = rA
        digits = []
        for i in range(k):
            d = t[i]                       # [..., B]
            digits.append(d)
            inv = self._garner_inv[i][:, None]  # [k, 1]
            # (t - d) * inv mod m, channels > i (others become garbage but
            # are never read again)
            t = _mod_barrett((t + self._mA - d[None]) * inv,
                             self._mA, self._invA)
        D = jnp.stack(digits)              # [k, ..., B] values < 2^14
        z8 = jax.lax.dot_general(
            self._P8, D.astype(jnp.int32), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # [2nl, ..., B]; each < k * 2^8 * 2^14 < 2^27
        z8 = jnp.moveaxis(z8, 0, -1).astype(jnp.uint32)  # [..., B, 2nl]
        # 8-bit-position sums -> 16-bit limbs with carries, mod 2^(16 nl)
        lo8 = z8[..., 0::2]
        hi8 = z8[..., 1::2]
        t16 = lo8 + ((hi8 & CMASK) << CDIG)            # < 2^28
        carry16 = hi8 >> CDIG                          # into next limb
        t16 = t16.at[..., 1:].add(carry16[..., :-1])
        limbs = fp_dev._carry_norm(t16)                # drops 2^(16nl) wrap
        # squashed value < 2p + p/(k+2): two conditional subtracts
        limbs = fp_dev._cond_sub_p(limbs)
        limbs = fp_dev._cond_sub_p(limbs)
        # limbs now hold the integer y = x*MA mod p; DevFp.mul(y, const(v))
        # computes y * v (const stores v*R; the R factors cancel), so
        # v = MA^{-1}*R mod p yields x*R — canonical Montgomery limbs.
        c = fp_dev.const(pow(self.MA, -1, spec.p) * spec.r % spec.p)
        return fp_dev.mul(limbs, c)

    # --- host I/O (tests) ---------------------------------------------------
    def to_ints_host(self, a) -> list:
        """Device RNS state -> canonical ints (host CRT; strips the MA
        Montgomery factor). Flattens leading axes."""
        s = self.s
        rA = np.asarray(jax.device_get(a[0]), dtype=np.uint64)
        k, shape = rA.shape[0], rA.shape[1:]
        flat = rA.reshape(k, -1)
        MA = self.MA
        MAinv = pow(MA, -1, self.p)
        out = []
        for col in flat.T:
            v = 0
            for m, r in zip(s["mA"], col):
                Mi = MA // m
                v += int(r) * Mi * pow(Mi % m, -1, m)
            out.append(v % MA % self.p * MAinv % self.p)
        return out


# ---------------------------------------------------------------------------
# program execution
# ---------------------------------------------------------------------------

def run_rns(sched: Scheduled, rns: RnsField, inputs: Sequence,
            masks: Sequence = (), in_bound: int | None = None):
    """Execute a scheduled kprog over RNS register states.

    inputs: RNS states (rA [k, ..., B], rB, rr) per input register.
    Independent-mul groups run as ONE stacked RNS multiplication
    ([k, g, ..., B] reshaped channel-major), so the int8 extension
    matmuls see g*B-wide batches. Returns output states.
    """
    p, MA = rns.p, rns.MA
    in_bound = in_bound if in_bound is not None else 4 * p
    bound: Dict[int, int] = {}
    regs: Dict[int, tuple] = {}
    for r, x in zip(sched.inputs, inputs):
        regs[r] = x
        bound[r] = in_bound
    for r, m in zip(sched.mask_inputs, masks):
        regs[r] = m
        bound[r] = 1

    for kind, items in sched.segments:
        if kind == "muls":
            # group batch shape: the widest operand's [B]
            B = 1
            for _, a, b in items:
                for r in (a, b):
                    B = max(B, regs[r][2].shape[-1])

            def bc(x):
                rA, rB, rr = x
                if rr.shape[-1] == B:
                    return x
                return (jnp.broadcast_to(rA, rA.shape[:1] + (B,)),
                        jnp.broadcast_to(rB, rB.shape[:1] + (B,)),
                        jnp.broadcast_to(rr, (B,)))

            g = len(items)
            astk = [bc(regs[a]) for _, a, _ in items]
            bstk = [bc(regs[b]) for _, _, b in items]
            k = rns.k

            def stack(parts):
                # [k, g*B] channel-major; rr -> [g*B]
                rA = jnp.stack([q[0] for q in parts], axis=1)
                rB = jnp.stack([q[1] for q in parts], axis=1)
                rr = jnp.stack([q[2] for q in parts], axis=0)
                return (rA.reshape(k, g * B), rB.reshape(k, g * B),
                        rr.reshape(g * B))

            oA, oB, orr = rns.mul(stack(astk), stack(bstk))
            oA = oA.reshape(k, g, B)
            oB = oB.reshape(k, g, B)
            orr = orr.reshape(g, B)
            for idx, (d, a, b) in enumerate(items):
                regs[d] = (oA[:, idx], oB[:, idx], orr[idx])
                bound[d] = mul_out_bound(p, MA, bound[a], bound[b])
                assert bound[d] < rns.MB // 2, (sched.name, bound[d])
            continue
        for op in items:
            if op.kind == "movc":
                regs[op.dst] = rns.const_mont(sched.consts[op.a])
                bound[op.dst] = p
            elif op.kind == "add":
                regs[op.dst] = rns.add(regs[op.a], regs[op.b])
                bound[op.dst] = bound[op.a] + bound[op.b]
            elif op.kind == "sub":
                mult = -(-bound[op.b] // p)
                regs[op.dst] = rns.sub(regs[op.a], regs[op.b], mult)
                bound[op.dst] = bound[op.a] + mult * p
            elif op.kind == "neg":
                mult = -(-bound[op.a] // p)
                regs[op.dst] = rns.neg(regs[op.a], mult)
                bound[op.dst] = mult * p
            elif op.kind == "sel":
                regs[op.dst] = rns.sel(regs[op.m], regs[op.a], regs[op.b])
                bound[op.dst] = max(bound[op.a], bound[op.b])
            else:
                raise ValueError(op.kind)
    return [regs[r] for r in sched.outputs]
