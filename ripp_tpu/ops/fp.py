"""Device (JAX) prime-field arithmetic: limb-sliced Montgomery kernels.

Representation: an Fp element batch is a uint32 array [..., NL] of 16-bit
limbs (little-endian), always in Montgomery form (value * R mod p with
R = 2^(16*NL)) and fully reduced (< p, limbs < 2^16).

Why 16-bit limbs in uint32 lanes: the TPU VPU has native 32-bit integer
multiply; 16x16 partial products fit exactly in uint32 and can be hi/lo
split immediately so schoolbook accumulation stays far below 2^32.

Kernel-shape decisions (these matter as much as FLOPs here):
  * XLA compile time scales with the number of HLO ops; a naive unrolled
    Montgomery mul is ~670 ops and compiles in seconds PER INSTANCE. This
    implementation keeps a mul to ~100 ops: the schoolbook product is ONE
    gather (static shift-index matrix) + ONE multiply + two reductions; the
    Montgomery reduction is a lax.scan over limbs (body traced once); all
    carry/borrow chains are log-depth Kogge-Stone networks instead of
    sequential ripples.
  * Measured on TPU v5e: the scan/gather form is also slightly FASTER at
    fused op chains than the unrolled form (30.9 vs 27.1 M muls/s at batch
    16384 for 12-chains).

Replaces the arkworks ark-ff backend consumed by the reference
(SURVEY.md section 2.3 row 1).
"""

from __future__ import annotations

import functools
import os
from dataclasses import dataclass
from typing import Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

LIMB_BITS = 16
LIMB_MASK = 0xFFFF


@functools.lru_cache(maxsize=1)
def _pallas_available() -> bool:
    """Pallas Montgomery kernels need a real TPU backend (axon included).
    Env override RIPP_FP_BACKEND=xla|pallas forces one path for A/B runs."""
    forced = os.environ.get("RIPP_FP_BACKEND")
    if forced == "xla":
        return False
    if forced == "pallas":
        return True
    try:
        plat = jax.default_backend()
    except Exception:
        return False
    return plat in ("tpu", "axon")


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

    @functools.cached_property
    def conv_idx(self) -> np.ndarray:
        """Static gather matrix: IDX[i, k] = k - i when a valid limb index of
        the second operand, else NL (a zero-pad slot)."""
        nl = self.nl
        idx = np.full((nl, 2 * nl), nl, dtype=np.int32)
        for i in range(nl):
            for k in range(2 * nl):
                if 0 <= k - i < nl:
                    idx[i, k] = k - i
        return idx

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
    # Limb count rounded up to a multiple of 4 (sublane-friendly tiling).
    # Production curves (381/377/761-bit) land on multiples of 8 either
    # way; the rounding only matters for the tiny test curves, where a
    # smaller nl directly shrinks every compiled limb-kernel graph (the
    # 1-core XLA:CPU compile wall - see __graft_entry__.dryrun_multichip).
    nl = ((p.bit_length() + LIMB_BITS - 1) // LIMB_BITS + 3) // 4 * 4
    # the fused ripple ring ops (DevFp.add/sub/_cond_sub_p) need one
    # headroom bit: a+b < 2^(16 nl) requires p < 2^(16 nl - 1)
    assert p.bit_length() < nl * LIMB_BITS, (name, p.bit_length(), nl)
    return FieldSpec(name=name, p=p, nl=nl)


def _shift_up(x, s: int):
    """[..., n] -> element i becomes element i+s (zeros below)."""
    return jnp.concatenate(
        [jnp.zeros(x.shape[:-1] + (s,), x.dtype), x[..., :-s]], axis=-1
    )


def _ks_carry(g, p):
    """Carry resolve: given per-limb generate g (uint32 0/1) and propagate
    p (bool), return carry-out per limb (c_k = g_k | (p_k & c_{k-1})).

    Implemented as a plain ripple over the (static, small) limb axis.
    A Kogge-Stone log-depth form was used through round 3; its
    where/concat ladder made XLA:CPU compile time EXPLODE in long op
    chains (measured: 100 chained fp.adds = 30 s compile for the KS
    carry alone, >8 min for a full kprog step program; the ripple form
    compiles ~100x faster and its linear limb-axis depth is irrelevant
    at runtime - the VPU vectorizes over the batch axis, and nl <= 48)."""
    n = g.shape[-1]
    pu = p.astype(jnp.uint32)
    outs = [g[..., 0]]
    for k in range(1, n):
        outs.append(g[..., k] | (pu[..., k] & outs[-1]))
    return jnp.stack(outs, axis=-1)


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
        self._idx = jnp.asarray(spec.conv_idx)

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

    # --- carry machinery ------------------------------------------------------
    # All carry handling is single-pass RIPPLE over the (static, small)
    # limb axis: plain uint32 arithmetic, no boolean-predicate ladders,
    # no concat/where chains.  The round-1..3 Kogge-Stone forms made
    # XLA:CPU compile time blow up SUPERLINEARLY in op-chain length
    # (measured: 40 chained fp.adds = 107 s to compile with the KS carry
    # + select-based cond-sub, ~2 s with these ripples); the linear limb
    # depth is irrelevant at runtime because the VPU/CPU vectorizes over
    # the batch axis.  Relies on p.bit_length() < 16*nl (one headroom bit,
    # true for every spec the rounding in make_spec produces), so a+b and
    # a-b+p never overflow nl limbs.

    def _carry_norm(self, t):
        """Normalize limbs (any uint32 values with headroom) to < 2^16:
        one ripple pass; the carry into each limb is bounded so the
        running value stays in uint32."""
        nl_t = t.shape[-1]
        outs = []
        c = jnp.zeros_like(t[..., 0])
        for k in range(nl_t):
            v = t[..., k] + c
            outs.append(v & LIMB_MASK)
            c = v >> LIMB_BITS
        return jnp.stack(outs, axis=-1)

    def _cond_sub_p(self, a, force=None):
        """Reduce a (< 2p, normalized limbs) into [0, p): one ripple
        computing d = a - p (two's complement add of 2^W - p); select d
        when it did not borrow (carry-out 1 <=> a >= p)."""
        p_limbs = self.spec.p_limbs
        nl = self.nl
        diffs = []
        c = None
        for k in range(nl):
            v = a[..., k] + np.uint32(LIMB_MASK - int(p_limbs[k]))
            v = v + 1 if k == 0 else v + c
            diffs.append(v & LIMB_MASK)
            c = v >> LIMB_BITS
        need = c > 0  # a >= p
        if force is not None:
            need = jnp.logical_or(need, force)
        d = jnp.stack(diffs, axis=-1)
        return jnp.where(need[..., None], d, a)

    # --- ring ops -----------------------------------------------------------
    def add(self, a, b):
        """(a + b) mod p in one fused ripple: accumulate s = a + b and
        d = a + b - p simultaneously; a,b < p < 2^(16nl - 1) so s never
        overflows the limb span and the d carry-out decides the select."""
        a, b = jnp.broadcast_arrays(a, b)
        p_limbs = self.spec.p_limbs
        sums, diffs = [], []
        c1 = c2 = None
        for k in range(self.nl):
            v = a[..., k] + b[..., k]
            v = v if k == 0 else v + c1
            s = v & LIMB_MASK
            c1 = v >> LIMB_BITS
            sums.append(s)
            w = s + np.uint32(LIMB_MASK - int(p_limbs[k]))
            w = w + 1 if k == 0 else w + c2
            diffs.append(w & LIMB_MASK)
            c2 = w >> LIMB_BITS
        need = (c2 > 0)[..., None]  # a + b >= p
        return jnp.where(need, jnp.stack(diffs, axis=-1),
                         jnp.stack(sums, axis=-1))

    def sub(self, a, b):
        """(a - b) mod p in one fused ripple: d1 = a - b (borrow flag) and
        d2 = a - b + p computed together."""
        a, b = jnp.broadcast_arrays(a, b)
        p_limbs = self.spec.p_limbs
        d1s, d2s = [], []
        c1 = c2 = None
        for k in range(self.nl):
            nb = np.uint32(LIMB_MASK) - b[..., k]
            v = a[..., k] + nb
            v = v + 1 if k == 0 else v + c1
            d1s.append(v & LIMB_MASK)
            c1 = v >> LIMB_BITS
            w = a[..., k] + nb + np.uint32(int(p_limbs[k]))
            w = w + 1 if k == 0 else w + c2
            d2s.append(w & LIMB_MASK)
            c2 = w >> LIMB_BITS
        no_borrow = (c1 > 0)[..., None]  # a >= b
        return jnp.where(no_borrow, jnp.stack(d1s, axis=-1),
                         jnp.stack(d2s, axis=-1))

    def neg(self, a):
        """(-a) mod p: one ripple d = p - a (a <= p so no borrow), with
        the a == 0 lanes passed through."""
        p_limbs = self.spec.p_limbs
        ds = []
        c = None
        for k in range(self.nl):
            v = np.uint32(int(p_limbs[k]) + LIMB_MASK) - a[..., k]
            v = v + 1 if k == 0 else v + c
            ds.append(v & LIMB_MASK)
            c = v >> LIMB_BITS
        d = jnp.stack(ds, axis=-1)
        return jnp.where(self.is_zero(a)[..., None], a, d)

    def mul(self, a, b):
        """Montgomery product.

        On TPU backends, batches >= MIN_PALLAS_BATCH go to the Pallas CIOS
        kernel (ops/fp_pallas.py, ~8-20x the XLA form); everything else
        (CPU meshes in tests, tiny batches) uses the XLA kernel below."""
        if _pallas_available():
            from . import fp_pallas

            bshape = jnp.broadcast_shapes(a.shape, b.shape)
            batch = int(np.prod(bshape[:-1], dtype=np.int64)) if len(bshape) > 1 else 1
            if batch >= fp_pallas.MIN_PALLAS_BATCH:
                return fp_pallas.fp_mul(self.spec, a, b)
        return self._mul_xla(a, b)

    def _mul_xla(self, a, b):
        """Pure-XLA Montgomery product. See module docstring for the kernel
        shape."""
        nl = self.nl
        a, b = jnp.broadcast_arrays(a, b)
        # schoolbook product via one gather + one multiply
        b_pad = jnp.concatenate(
            [b, jnp.zeros(b.shape[:-1] + (1,), b.dtype)], axis=-1
        )
        bm = b_pad[..., self._idx]                 # [..., NL, 2NL]
        prod = a[..., :, None] * bm                # each < 2^32
        lo = (prod & LIMB_MASK).sum(-2)            # [..., 2NL] < 2^20.6
        hi = (prod >> LIMB_BITS).sum(-2)
        t = jnp.concatenate(
            [lo, jnp.zeros(lo.shape[:-1] + (1,), lo.dtype)], axis=-1
        )
        t = t.at[..., 1:].add(hi)                  # [..., 2NL+1] < 2^22

        # Montgomery reduction: scan over limbs, shifting one limb per step
        n0 = jnp.uint32(self.spec.n0inv)
        p_dev = self._p_dev

        def body(t, _):
            m = (t[..., 0] * n0) & LIMB_MASK
            pf = m[..., None] * p_dev
            t = t.at[..., :nl].add(pf & LIMB_MASK)
            t = t.at[..., 1 : nl + 1].add(pf >> LIMB_BITS)
            t = t.at[..., 1].add(t[..., 0] >> LIMB_BITS)
            t = jnp.concatenate(
                [t[..., 1:], jnp.zeros_like(t[..., :1])], axis=-1
            )
            return t, None

        t, _ = jax.lax.scan(body, t, None, length=nl)
        t = self._carry_norm(t[..., : nl + 1])
        return self._cond_sub_p(t[..., :nl], force=t[..., nl] > 0)

    def sqr(self, a):
        return self.mul(a, a)

    def mul_small(self, a, k: int):
        """Multiply by a small non-negative integer constant."""
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
        n = n % self.p
        if n.bit_length() <= 4:
            return self.mul_small(a, n)
        return self.mul(a, self.const(n))

    def pow(self, a, e: int):
        """a^e for a static python-int exponent, via lax.scan over bits."""
        if e < 0:
            return self.pow(self.inv(a), -e)
        if e == 0:
            return jnp.broadcast_to(self.one(), a.shape)
        bits = jnp.asarray([int(b) for b in bin(e)[2:]], dtype=jnp.uint32)

        def body(acc, bit):
            sq = self.sqr(acc)
            withmul = self.mul(sq, a)
            out = jnp.where(bit > 0, withmul, sq)
            return out, None

        acc, _ = jax.lax.scan(body, a, bits[1:])
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
