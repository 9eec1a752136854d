"""Device elliptic curve kernels: branchless complete formulas.

Points are homogeneous projective (X:Y:Z) pytrees of limb arrays; identity
is (0:1:0). Addition/doubling use the Renes-Costello-Batina complete
formulas for a=0 short-Weierstrass curves (Algorithms 7 and 9 of
eprint 2015/1060) - total, so no data-dependent branches anywhere: exactly
what the TPU VPU wants (SURVEY.md section 7.3 "divergent control flow").

Generic over a field-ops object (DevFp for G1, device Fp2 for G2) plus the
curve constant b3 = 3*b, so one kernel serves G1/G2 on every curve. Twisted
Edwards (JubJub) gets its own complete-addition kernel.
"""

from __future__ import annotations

import os
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from .tower import tree_select


def use_fused() -> bool:
    """Dispatch policy for the one-launch Pallas kernels (ops/pairing_fused,
    ops/curve_fused): on by default on the TPU backend, off elsewhere (the
    register-machine kernels only run under Pallas-TPU; the CPU/mesh paths
    keep the scan kernels). RIPP_FUSED=0 forces the scan path everywhere.
    Read at trace time: jitted callers bake the decision into each compiled
    shape family."""
    if os.environ.get("RIPP_FUSED", "1") == "0":
        return False
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:
        return False


# Reductions (MSM, multi-pairing) pad their batch up to this size so every
# protocol tail round (n = 1, 2, 4, ...) reuses ONE compiled executable -
# XLA compile time for the limb kernels dwarfs the wasted lanes.
MIN_REDUCE_BATCH = 8

# Shape tiers for chunked execution: every bulk op runs at one of these
# batch sizes (pad up to the smallest tier that fits, or loop over
# top-tier chunks).  Round-2 measurement: a 2^14 TIPP prove spent ~95% of
# 3278 s compiling fresh executables for every halving-round size; with
# tiers the whole protocol stack shares three executables per kernel.
CHUNK_TIERS = (MIN_REDUCE_BATCH, 256, 2048)


def chunk_plan(n: int):
    """Return (chunk_size, n_chunks, padded_n) for a batch of n."""
    for t in CHUNK_TIERS:
        if n <= t:
            return t, 1, t
    top = CHUNK_TIERS[-1]
    n_chunks = -(-n // top)
    return top, n_chunks, n_chunks * top


def pad_with_identity(curve: "DevSWCurve", pts, m: int):
    """Pad a projective point tree [n, ...] to [m, ...] with identity."""
    n = jax.tree.leaves(pts)[0].shape[0]
    if m <= n:
        return pts
    tail_x = jax.tree.map(
        lambda x: jnp.zeros((m - n,) + x.shape[1:], x.dtype), pts[0]
    )
    ident = curve.identity_like(tail_x)
    return jax.tree.map(
        lambda a, b: jnp.concatenate([a, b], axis=0), pts, ident
    )


class DevSWCurve:
    """a=0 short Weierstrass group kernels over field ops F."""

    def __init__(self, F, b3, name: str = "dev_curve", jit: bool = True):
        self.F = F
        self.b3 = b3  # 3*b as a device field element
        self.name = name
        # set by DevCurveCtx for g1/g2 of tower curves: () -> FusedLadder
        # (ops/curve_fused.py); scalar_mul_bits dispatches to it on TPU
        self._fused_ladder_factory = None
        if jit:
            # jit the hot kernels once per instance; jax caches per shape.
            # The ladder/normalize pipelines additionally go through the
            # AOT export cache (utils/aotcache.py): their scan bodies
            # trace ~10^4 ops per fresh process (VERDICT r4 item 4).
            from ..utils.aotcache import aot_jit

            self.add = jax.jit(self.add)
            self.double = jax.jit(self.double)
            self._scalar_mul_bits_scan = aot_jit(
                f"ladder-{name}", self._scalar_mul_bits_impl)
            self.normalize = aot_jit(f"normalize-{name}", self.normalize)
            self.sum_reduce = jax.jit(self.sum_reduce, static_argnames="axis")
        else:
            self._scalar_mul_bits_scan = self._scalar_mul_bits_impl

    # --- identities ----------------------------------------------------------
    def identity_like(self, x):
        """Identity point (0:1:0) broadcast to the batch shape of limb array
        tree x (a field element tree)."""
        F = self.F
        zero = jax.tree.map(jnp.zeros_like, x)
        one = jax.tree.map(
            lambda z, o: jnp.broadcast_to(o, z.shape), zero,
            self._bcast_const(F.one(), zero),
        )
        return (zero, one, jax.tree.map(jnp.zeros_like, x))

    @staticmethod
    def _bcast_const(c, like):
        # broadcast a constant element tree to the structure of `like`
        if isinstance(like, tuple):
            return tuple(DevSWCurve._bcast_const(ci, li) for ci, li in zip(c, like))
        return c

    def is_identity(self, P):
        Z = P[2]
        leaves = jax.tree.leaves(Z)
        acc = jnp.all(leaves[0] == 0, axis=-1)
        for l in leaves[1:]:
            acc = jnp.logical_and(acc, jnp.all(l == 0, axis=-1))
        return acc

    # --- complete group law (RCB15 algorithms 7 & 9, a = 0) ------------------
    def _stack_mul(self, pairs):
        """k independent base-field products in ONE stacked mul call.
        Kernel-launch overhead inside scan ladders (scalar_mul_bits runs
        one add+double per bit) costs more than the arithmetic of these
        small products; the stacked form turns the 12-mul RCB15 add into
        3 launches (dependency levels)."""
        from .tower import tree_bcast, tree_idx, tree_stack

        F = self.F
        ls, rs = zip(*[tree_bcast(a, b) for a, b in pairs])
        V = F.mul(tree_stack(list(ls)), tree_stack(list(rs)))
        return [tree_idx(V, i) for i in range(len(pairs))]

    def add(self, P, Q):
        F = self.F
        X1, Y1, Z1 = P
        X2, Y2, Z2 = Q
        b3 = self.b3
        # level 1: the six cross products
        m_xx, m_yy, m_zz, m_xy, m_yz, m_xz = self._stack_mul([
            (X1, X2), (Y1, Y2), (Z1, Z2),
            (F.add(X1, Y1), F.add(X2, Y2)),
            (F.add(Y1, Z1), F.add(Y2, Z2)),
            (F.add(X1, Z1), F.add(X2, Z2)),
        ])
        t3 = F.sub(m_xy, F.add(m_xx, m_yy))      # X1Y2 + X2Y1
        t4 = F.sub(m_yz, F.add(m_yy, m_zz))      # Y1Z2 + Y2Z1
        ty = F.sub(m_xz, F.add(m_xx, m_zz))      # X1Z2 + X2Z1
        t0 = F.add(F.add(m_xx, m_xx), m_xx)      # 3 X1X2
        # level 2: the two b3 scalings
        t2, y3b = self._stack_mul([(b3, m_zz), (b3, ty)])
        z3s = F.add(m_yy, t2)
        t1s = F.sub(m_yy, t2)
        # level 3: the six output products
        p_a, p_b, p_c, p_d, p_e, p_f = self._stack_mul([
            (t4, y3b), (t3, t1s), (y3b, t0),
            (t1s, z3s), (t0, t3), (z3s, t4),
        ])
        return (F.sub(p_b, p_a), F.add(p_d, p_c), F.add(p_f, p_e))

    def double(self, P):
        F = self.F
        X, Y, Z = P
        b3 = self.b3
        t0, t1, t2m, txy = self._stack_mul([
            (Y, Y), (Y, Z), (Z, Z), (X, Y),
        ])
        z3a = F.add(t0, t0)
        z3a = F.add(z3a, z3a)
        z3a = F.add(z3a, z3a)                    # 8 Y^2
        t2 = F.mul(b3, t2m)
        y3a = F.add(t0, t2)
        t0b = F.sub(t0, F.add(F.add(t2, t2), t2))
        x3m, y3m, z3, x3b = self._stack_mul([
            (t2, z3a), (t0b, y3a), (t1, z3a), (t0b, txy),
        ])
        return (F.add(x3b, x3b), F.add(x3m, y3m), z3)

    def neg(self, P):
        X, Y, Z = P
        return (X, self.F.neg(Y), Z)

    def select(self, mask, P, Q):
        return tree_select(mask, P, Q)

    # --- scalar multiplication ------------------------------------------------
    def scalar_mul_bits(self, P, bits):
        """P * k where bits is a uint32 array of k's bits, MSB first, shape
        [nbits] (shared scalar) or [batch..., nbits] (per-element scalars).

        RIPP_FUSED_LADDER=1 dispatches to the one-launch fused Pallas
        ladder on TPU (ops/curve_fused.py, bit-identical outputs).
        OPT-IN, unlike the fused Miller: ladders are a small share of
        protocol time (the pairing products dominate), but the fused
        ladder's one-time costs are large - minutes of per-process kernel
        trace plus tens of minutes of first Mosaic compile per
        (batch, nbits) family (round-4 measurement: they dominated a 2^12
        aggregation end-to-end at 3634 s). The lax.scan ladder below
        amortizes better at every scale measured so far."""
        if (self._fused_ladder_factory is not None
                and os.environ.get("RIPP_FUSED_LADDER") == "1"
                and use_fused()):
            return self._fused_ladder_factory().scalar_mul_bits(P, bits)
        return self._scalar_mul_bits_scan(P, bits)

    def _scalar_mul_bits_impl(self, P, bits):
        """lax.scan double-and-add; completeness of add makes the ladder
        branch-free."""
        shared = bits.ndim == 1
        nbits = bits.shape[-1]
        acc = self.identity_like(P[0])

        def body(acc, bit):
            acc = self.double(acc)
            added = self.add(acc, P)
            if shared:
                mask = bit > 0  # scalar
                acc = jax.tree.map(
                    lambda a, b: jnp.where(mask, a, b), added, acc
                )
            else:
                acc = self.select(bit > 0, added, acc)
            return acc, None

        xs = bits if shared else jnp.moveaxis(bits, -1, 0)
        acc, _ = jax.lax.scan(body, acc, xs)
        return acc

    # --- normalization ---------------------------------------------------------
    def normalize(self, P):
        """(X:Y:Z) -> (x, y, is_inf): affine coordinates via field inversion.
        Identity lanes return x = y = 0 with is_inf = True."""
        F = self.F
        X, Y, Z = P
        inf = self.is_identity(P)
        safe_z = tree_select(inf, self._bcast_like(F.one(), Z), Z)
        zi = F.inv(safe_z)
        x = F.mul(X, zi)
        y = F.mul(Y, zi)
        zero = jax.tree.map(jnp.zeros_like, x)
        x = tree_select(inf, zero, x)
        y = tree_select(inf, zero, y)
        return (x, y, inf)

    def _bcast_like(self, c, like):
        return jax.tree.map(
            lambda l, cc: jnp.broadcast_to(cc, l.shape), like,
            self._bcast_const(c, like),
        )

    def from_affine(self, x, y, inf):
        """(x, y, is_inf[batch]) -> projective with identity encoded (0:1:0)."""
        F = self.F
        one = self._bcast_like(F.one(), x)
        zero = jax.tree.map(jnp.zeros_like, x)
        X = tree_select(inf, zero, x)
        Y = tree_select(inf, one, y)
        Z = tree_select(inf, zero, one)
        return (X, Y, Z)

    def eq(self, P, Q):
        """Projective equality: X1 Z2 == X2 Z1 and Y1 Z2 == Y2 Z1 (with both-
        identity handling)."""
        F = self.F
        x_eq = self._tree_feq(F.mul(P[0], Q[2]), F.mul(Q[0], P[2]))
        y_eq = self._tree_feq(F.mul(P[1], Q[2]), F.mul(Q[1], P[2]))
        both_inf = jnp.logical_and(self.is_identity(P), self.is_identity(Q))
        one_inf = jnp.logical_xor(self.is_identity(P), self.is_identity(Q))
        return jnp.logical_and(
            jnp.logical_not(one_inf),
            jnp.logical_or(both_inf, jnp.logical_and(x_eq, y_eq)),
        )

    @staticmethod
    def _tree_feq(a, b):
        leaves_a, leaves_b = jax.tree.leaves(a), jax.tree.leaves(b)
        acc = jnp.all(leaves_a[0] == leaves_b[0], axis=-1)
        for x, y in zip(leaves_a[1:], leaves_b[1:]):
            acc = jnp.logical_and(acc, jnp.all(x == y, axis=-1))
        return acc

    # --- reductions -------------------------------------------------------------
    def sum_reduce(self, P, axis: int = 0):
        """Sum a batch of points along `axis` to a single point.

        Implemented as a lax.scan over log2(n) shift-and-add steps so the
        jaxpr contains exactly ONE point-add instance - XLA compile time for
        these limb kernels scales with the number of inlined field
        multiplications, so unrolled halving trees are unaffordable."""
        assert axis == 0, "sum_reduce currently supports axis 0"
        n = jax.tree.leaves(P)[0].shape[0]
        if n == 1:
            return jax.tree.map(lambda x: x[0], P)
        steps = max(1, (n - 1).bit_length())
        shifts = jnp.asarray([1 << s for s in range(steps)], dtype=jnp.int32)
        idx = jnp.arange(n, dtype=jnp.int32)

        def body(vals, shift):
            shifted = jax.tree.map(lambda x: jnp.roll(x, -shift, axis=0), vals)
            valid = (idx + shift) < n
            combined = self.add(vals, shifted)
            return tree_select(valid, combined, vals), None

        vals, _ = jax.lax.scan(body, P, shifts)
        return jax.tree.map(lambda x: x[0], vals)


class DevEdwardsCurve:
    """Twisted Edwards (a x^2 + y^2 = 1 + d x^2 y^2) complete addition over
    DevFp; affine coordinates (complete => no special cases). For JubJub
    Pedersen parity."""

    def __init__(self, F, a_const, d_const, name="dev_edwards", jit=True):
        self.F = F
        self.a = a_const
        self.d = d_const
        self.name = name
        if jit:
            self.add = jax.jit(self.add)
            self.scalar_mul_bits = jax.jit(self.scalar_mul_bits)

    def identity_like(self, x):
        zero = jnp.zeros_like(x)
        one = jnp.broadcast_to(self.F.one(), x.shape)
        return (zero, one)

    def add(self, P, Q):
        F = self.F
        x1, y1 = P
        x2, y2 = Q
        x1y2 = F.mul(x1, y2)
        x2y1 = F.mul(x2, y1)
        y1y2 = F.mul(y1, y2)
        x1x2 = F.mul(x1, x2)
        dxy = F.mul(self.d, F.mul(x1y2, x2y1))
        one = jnp.broadcast_to(F.one(), dxy.shape)
        inv1 = F.inv(F.add(one, dxy))
        inv2 = F.inv(F.sub(one, dxy))
        x3 = F.mul(F.add(x1y2, x2y1), inv1)
        y3 = F.mul(F.sub(y1y2, F.mul(self.a, x1x2)), inv2)
        return (x3, y3)

    def scalar_mul_bits(self, P, bits):
        shared = bits.ndim == 1
        acc = self.identity_like(P[0])

        def body(acc, bit):
            acc = self.add(acc, acc)
            added = self.add(acc, P)
            if shared:
                sel = lambda a, b: jnp.where(bit > 0, a, b)
            else:
                sel = lambda a, b: jnp.where((bit > 0)[..., None], a, b)
            return tuple(sel(a, b) for a, b in zip(added, acc)), None

        xs = bits if shared else jnp.moveaxis(bits, -1, 0)
        acc, _ = jax.lax.scan(body, acc, xs)
        return acc
