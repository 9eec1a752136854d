"""Device (JAX) prime-field arithmetic: limb-sliced Montgomery kernels.

Representation: an Fp element batch is a uint32 array [..., NL] of 16-bit
limbs (little-endian), always in Montgomery form (value * R mod p with
R = 2^(16*NL)) and fully reduced (< p, limbs < 2^16).

Why 16-bit limbs in uint32 lanes: the TPU VPU has native 32-bit integer
multiply; 16x16 partial products fit exactly in uint32 and can be hi/lo
split immediately, so schoolbook accumulation of up to ~4*NL terms stays
far below 2^32 (bounds documented inline). This is the standard TPU/SIMD
big-int layout; the MXU is not useful here because every element pair has
distinct operands (no shared matrix).

Replaces the arkworks ark-ff backend consumed by the reference
(SURVEY.md section 2.3 row 1).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

LIMB_BITS = 16
LIMB_MASK = 0xFFFF


def int_to_limbs(v: int, nl: int) -> np.ndarray:
    out = np.zeros((nl,), dtype=np.uint32)
    for i in range(nl):
        out[i] = (v >> (LIMB_BITS * i)) & LIMB_MASK
    return out


def limbs_to_int(limbs) -> int:
    v = 0
    arr = np.asarray(limbs, dtype=np.uint64)
    for i in reversed(range(arr.shape[-1])):
        v = (v << LIMB_BITS) | int(arr[..., i])
    return v


@dataclass(frozen=True)
class FieldSpec:
    """Static per-modulus constants (hashable; used as a jit static arg)."""

    name: str
    p: int
    nl: int

    @functools.cached_property
    def r(self) -> int:
        return pow(2, LIMB_BITS * self.nl, self.p)

    @functools.cached_property
    def r2(self) -> int:
        return pow(2, 2 * LIMB_BITS * self.nl, self.p)

    @functools.cached_property
    def n0inv(self) -> int:
        # -p^-1 mod 2^16
        return (-pow(self.p, -1, 1 << LIMB_BITS)) % (1 << LIMB_BITS)

    @functools.cached_property
    def p_limbs(self) -> np.ndarray:
        return int_to_limbs(self.p, self.nl)

    @functools.cached_property
    def one_mont(self) -> np.ndarray:
        return int_to_limbs(self.r % self.p, self.nl)

    # --- host <-> device conversion ----------------------------------------
    def to_mont_limbs(self, ints: Sequence[int]) -> np.ndarray:
        """Host ints -> Montgomery limb array [n, NL]."""
        r = self.r
        return np.stack(
            [int_to_limbs((v % self.p) * r % self.p, self.nl) for v in ints]
        )

    def from_mont_limbs(self, arr) -> list:
        """Device Montgomery limbs [..., NL] -> canonical host ints (list with
        the leading shape flattened)."""
        a = np.asarray(arr, dtype=np.uint32).reshape(-1, self.nl)
        rinv = pow(self.r, -1, self.p)
        return [limbs_to_int(row) * rinv % self.p for row in a]

    def __hash__(self):
        return hash((self.name, self.p, self.nl))


def make_spec(name: str, p: int) -> FieldSpec:
    nl = ((p.bit_length() + LIMB_BITS - 1) // LIMB_BITS + 7) // 8 * 8
    return FieldSpec(name=name, p=p, nl=nl)


class DevFp:
    """Device field-ops object; same interface shape as host FieldOps so the
    generic tower classes (host/field.py QuadExtOps, CubicExtOps) can be
    reused verbatim on device arrays."""

    degree = 1

    def __init__(self, spec: FieldSpec):
        self.spec = spec
        self.p = spec.p
        self.name = spec.name
        self.nl = spec.nl
        self._p_dev = jnp.asarray(spec.p_limbs)
        self._one_dev = jnp.asarray(spec.one_mont)
        self._zero_dev = jnp.zeros((spec.nl,), dtype=jnp.uint32)

    # --- constants ----------------------------------------------------------
    def zero(self):
        return self._zero_dev

    def one(self):
        return self._one_dev

    def const(self, v: int):
        """Montgomery-form constant from a host int."""
        return jnp.asarray(
            int_to_limbs((v % self.p) * self.spec.r % self.p, self.nl)
        )

    # --- carry helpers ------------------------------------------------------
    def _carry_norm(self, t):
        """Propagate carries so limbs < 2^16. Input limbs may be up to ~2^26.
        Returns (normalized [..., n], carry_out [...])."""
        n = t.shape[-1]
        outs = []
        carry = jnp.zeros(t.shape[:-1], dtype=jnp.uint32)
        for i in range(n):
            v = t[..., i] + carry
            outs.append(v & LIMB_MASK)
            carry = v >> LIMB_BITS
        return jnp.stack(outs, axis=-1), carry

    def _sub_p(self, a):
        """a - p with borrow; returns (diff [..., nl], borrow [...] in {0,1})."""
        outs = []
        borrow = jnp.zeros(a.shape[:-1], dtype=jnp.uint32)
        for i in range(self.nl):
            d = a[..., i] + jnp.uint32(0x10000) - jnp.uint32(
                int(self.spec.p_limbs[i])
            ) - borrow
            outs.append(d & LIMB_MASK)
            borrow = jnp.uint32(1) - (d >> LIMB_BITS)
        return jnp.stack(outs, axis=-1), borrow

    def _cond_sub_p(self, a, force=None):
        """Reduce a (< 2p) into [0, p). `force` (optional bool array) marks
        lanes known to need the subtraction (overflow limb set)."""
        diff, borrow = self._sub_p(a)
        need = borrow == 0  # a >= p
        if force is not None:
            need = jnp.logical_or(need, force)
        return jnp.where(need[..., None], diff, a)

    # --- ring ops -----------------------------------------------------------
    def add(self, a, b):
        s, carry = self._carry_norm(a + b)
        return self._cond_sub_p(s, force=carry > 0)

    def neg(self, a):
        # p - a, with 0 -> 0
        outs = []
        borrow = jnp.zeros(a.shape[:-1], dtype=jnp.uint32)
        for i in range(self.nl):
            d = jnp.uint32(int(self.spec.p_limbs[i])) + jnp.uint32(0x10000) \
                - a[..., i] - borrow
            outs.append(d & LIMB_MASK)
            borrow = jnp.uint32(1) - (d >> LIMB_BITS)
        r = jnp.stack(outs, axis=-1)
        is_zero = self.is_zero(a)
        return jnp.where(is_zero[..., None], a, r)

    def sub(self, a, b):
        # a - b mod p: compute a + (p - b) ... cheaper: a - b with borrow,
        # then add p when borrowed.
        outs = []
        borrow = jnp.zeros(jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1]),
                           dtype=jnp.uint32)
        for i in range(self.nl):
            d = a[..., i] + jnp.uint32(0x10000) - b[..., i] - borrow
            outs.append(d & LIMB_MASK)
            borrow = jnp.uint32(1) - (d >> LIMB_BITS)
        diff = jnp.stack(outs, axis=-1)
        # if borrow: diff += p  (wraps exactly once)
        addp = diff + self._p_dev
        addp, _ = self._carry_norm(addp)
        return jnp.where((borrow > 0)[..., None], addp, diff)

    def mul(self, a, b):
        """Montgomery product: schoolbook with immediate hi/lo split, then
        interleaved Montgomery reduction.

        Bound analysis: t limbs accumulate <= 2*NL 16-bit terms from the
        product phase plus <= 2*NL from the reduction phase plus small
        carries: < 4*NL*2^16 + eps < 2^23 for NL<=48. Safe in uint32.
        """
        nl = self.nl
        a, b = jnp.broadcast_arrays(a, b)
        batch = a.shape[:-1]
        t = jnp.zeros(batch + (2 * nl + 1,), dtype=jnp.uint32)
        # product phase
        for i in range(nl):
            p_full = a[..., i : i + 1] * b  # [..., nl] each < 2^32
            lo = p_full & LIMB_MASK
            hi = p_full >> LIMB_BITS
            t = t.at[..., i : i + nl].add(lo)
            t = t.at[..., i + 1 : i + nl + 1].add(hi)
        # reduction phase
        n0inv = jnp.uint32(self.spec.n0inv)
        p_dev = self._p_dev
        for i in range(nl):
            m = (t[..., i] * n0inv) & LIMB_MASK
            p_full = m[..., None] * p_dev
            lo = p_full & LIMB_MASK
            hi = p_full >> LIMB_BITS
            t = t.at[..., i : i + nl].add(lo)
            t = t.at[..., i + 1 : i + nl + 1].add(hi)
            # limb i is now 0 mod 2^16; push its carry upward and retire it
            t = t.at[..., i + 1].add(t[..., i] >> LIMB_BITS)
        res = t[..., nl : 2 * nl]
        res, carry = self._carry_norm(res)
        overflow = carry + t[..., 2 * nl]  # top limb beyond nl after shift
        return self._cond_sub_p(res, force=overflow > 0)

    def sqr(self, a):
        return self.mul(a, a)

    def mul_small(self, a, k: int):
        """Multiply by a small non-negative integer constant (double-and-add,
        full reduction each step)."""
        if k == 0:
            return jnp.broadcast_to(self.zero(), a.shape)
        bits = bin(k)[2:]
        acc = a
        for bit in bits[1:]:
            acc = self.add(acc, acc)
            if bit == "1":
                acc = self.add(acc, a)
        return acc

    def mul_int(self, a, n: int):
        return self.mul_small(a, n % self.p)

    def pow(self, a, e: int):
        """a^e for a static python-int exponent, via lax.scan over bits."""
        if e < 0:
            return self.pow(self.inv(a), -e)
        if e == 0:
            return jnp.broadcast_to(self.one(), a.shape)
        bits = jnp.asarray(
            [int(b) for b in bin(e)[2:]], dtype=jnp.uint32
        )

        def body2(acc, bit):
            sq = self.sqr(acc)
            withmul = self.mul(sq, a)
            out = jnp.where(bit > 0, withmul, sq)
            return out, None

        # initialize with a (consume the leading 1 bit)
        acc, _ = jax.lax.scan(body2, a, bits[1:])
        return acc

    def inv(self, a):
        """Fermat inversion a^(p-2). Maps 0 -> 0 (callers guard)."""
        return self.pow(a, self.p - 2)

    # --- predicates ---------------------------------------------------------
    def is_zero(self, a):
        return jnp.all(a == 0, axis=-1)

    def eq(self, a, b):
        return jnp.all(a == b, axis=-1)

    def select(self, mask, a, b):
        """mask [...] bool -> elementwise select of limb arrays."""
        return jnp.where(mask[..., None], a, b)

    # --- conversions --------------------------------------------------------
    def from_int(self, v: int):
        return self.const(v)

    def tolist(self, a):
        # host-side only (used by serialization paths on host objects)
        raise NotImplementedError("device elements: use spec.from_mont_limbs")
