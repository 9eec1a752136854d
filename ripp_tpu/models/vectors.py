"""Device-backed protocol vectors (Fr scalars, G1/G2 points, placeholders).

These are the protocol layer's working objects: big vectors stay resident on
device as limb pytrees; the log-round GIPA/SIPP folds, hadamard rescales and
inner-product reductions all run as jitted kernels; only single elements
cross to host (for Fiat-Shamir).

Fold conventions follow gipa.rs:261-291: `fold(self, other, c)` computes
c * self + other, with the scalar bit-width chosen from c (the reference's
128-bit-challenge optimization falls out automatically).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any, List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from ..ops import msm as msm_mod
from ..ops.points import DevCurveCtx
from ..ops.tower import tree_select


def _nbits_for(ctx: DevCurveCtx, c: int) -> int:
    rbits = ctx.host.r.bit_length()
    return min(128, rbits) if c < (1 << 128) else rbits


# Jitted Fr kernels (module-level so jax caches per shape): the eager forms
# dispatched ~100 single-op XLA programs per call, which dominates
# wall-clock on the axon TPU.

@functools.partial(jax.jit, static_argnames=("fr",))
def _fr_fold(fr, a, b, c):
    """c * a + b elementwise."""
    return fr.add(fr.mul(a, c), b)


@functools.partial(jax.jit, static_argnames=("fr",))
def _fr_mul(fr, a, b):
    return fr.mul(a, b)


@functools.partial(jax.jit, static_argnames=("fr",))
def _challenge_products(fr, xs, mask):
    """prod over the L challenge axis of (xs[j] if mask[i, j] else 1):
    xs [L, NL] Montgomery limbs, mask [n, L] bool -> [n, NL].
    One executable: an L-step scan of batch-n muls (replaces the host
    Python O(n log n) doubling expansions of gipa.rs:373-381 and
    sipp/src/lib.rs:163-171)."""
    one = fr.one()

    def body(acc, xs_j_and_col):
        xs_j, col = xs_j_and_col
        sel = jnp.where(col[:, None], xs_j[None, :], one[None, :])
        return fr.mul(acc, sel), None

    n = mask.shape[0]
    acc0 = jnp.broadcast_to(one, (n,) + one.shape)
    acc, _ = jax.lax.scan(body, acc0, (xs, jnp.moveaxis(mask, 0, 1)))
    return acc


def challenge_product_vec(ctx: DevCurveCtx, xs: Sequence[int], n: int,
                          bit_of=lambda i, j: (i >> j) & 1) -> "FrVec":
    """FrVec of w_i = prod_j xs[j]^{bit_of(i, j)} for i in 0..n-1.

    Default bit order: xs[j] contributes when bit j (LSB-first) of the
    index is set -- GIPA's final-ck expansion with the reversed transcript.
    SIPP passes bit_of=lambda i, j: (i >> (L-1-j)) & 1 (MSB-first)."""
    L = len(xs)
    mask = np.zeros((n, L), dtype=bool)
    for j in range(L):
        for i in range(n):
            mask[i, j] = bool(bit_of(i, j))
    fr = ctx.t.fr
    xs_dev = ctx.t.fr_to_dev([x % ctx.host.r for x in xs])
    arr = _challenge_products(fr, xs_dev, jnp.asarray(mask))
    return FrVec(ctx, arr, n)


@functools.partial(jax.jit, static_argnames=("fr",))
def _fr_dot(fr, a, b):
    from ..ops.reduce import scan_reduce

    prods = fr.mul(a, b)
    red = scan_reduce(fr.add, prods, prods.shape[0])
    return jax.tree.map(lambda x: x[None], red)


def _chunked_fr_op(op, arrs, n: int):
    """Run an elementwise Fr kernel at shape-tier batch sizes (zero
    padding; values beyond n are sliced off)."""
    from ..ops.curve import chunk_plan

    chunk, n_chunks, padded = chunk_plan(n)
    if padded > n:
        arrs = [jnp.concatenate(
            [a, jnp.zeros((padded - n,) + a.shape[1:], a.dtype)], axis=0)
            for a in arrs]
    outs = []
    for c in range(n_chunks):
        sl = slice(c * chunk, (c + 1) * chunk)
        outs.append(op(*[a[sl] for a in arrs]))
    out = outs[0] if n_chunks == 1 else jnp.concatenate(outs, axis=0)
    return out[:n] if padded > n else out


class FrVec:
    """Vector of Fr scalars: Montgomery limbs [n, NL] on device."""

    kind = "fr"

    def __init__(self, ctx: DevCurveCtx, arr, n: int):
        self.ctx = ctx
        self.arr = arr
        self.n = n

    @classmethod
    def from_ints(cls, ctx: DevCurveCtx, ints: Sequence[int]) -> "FrVec":
        return cls(ctx, ctx.t.fr_to_dev([i % ctx.host.r for i in ints]),
                   len(ints))

    def to_ints(self) -> List[int]:
        return self.ctx.t.fr_from_dev(self.arr)

    def __len__(self):
        return self.n

    def lo(self) -> "FrVec":
        return FrVec(self.ctx, self.arr[: self.n // 2], self.n // 2)

    def hi(self) -> "FrVec":
        return FrVec(self.ctx, self.arr[self.n // 2 :], self.n - self.n // 2)

    def fold(self, other: "FrVec", c: int) -> "FrVec":
        """c * self + other (elementwise)."""
        fr = self.ctx.t.fr
        cc = fr.const(c % self.ctx.host.r)
        out = _chunked_fr_op(
            lambda a, b: _fr_fold(fr, a, b, cc), [self.arr, other.arr],
            self.n,
        )
        return FrVec(self.ctx, out, self.n)

    def scale(self, c: int) -> "FrVec":
        fr = self.ctx.t.fr
        cc = fr.const(c % self.ctx.host.r)
        out = _chunked_fr_op(
            lambda a: _fr_mul(fr, a, cc), [self.arr], self.n
        )
        return FrVec(self.ctx, out, self.n)

    def hadamard(self, other: "FrVec") -> "FrVec":
        fr = self.ctx.t.fr
        out = _chunked_fr_op(
            lambda a, b: _fr_mul(fr, a, b), [self.arr, other.arr], self.n
        )
        return FrVec(self.ctx, out, self.n)

    def first(self) -> int:
        return self.ctx.t.fr_from_dev(self.arr[:1])[0]

    def inner_product(self, other: "FrVec") -> int:
        """Scalar inner product: chunked device dots, host int combine."""
        from ..ops.curve import chunk_plan

        fr = self.ctx.t.fr
        chunk, n_chunks, padded = chunk_plan(self.n)
        a, b = self.arr, other.arr
        if padded > self.n:
            pad = lambda x: jnp.concatenate(
                [x, jnp.zeros((padded - self.n,) + x.shape[1:], x.dtype)],
                axis=0)
            a, b = pad(a), pad(b)
        total = 0
        r = self.ctx.host.r
        for c in range(n_chunks):
            sl = slice(c * chunk, (c + 1) * chunk)
            red = _fr_dot(fr, a[sl], b[sl])
            total = (total + self.ctx.t.fr_from_dev(red)[0]) % r
        return total


def _padded_point_op(curve, pts_list, n: int, op):
    """Run an elementwise point kernel at shape-tier batch sizes
    (ops/curve.py CHUNK_TIERS): pad up to the smallest tier, or loop over
    top-tier chunks, then slice back to n.  Every protocol round at every
    size reuses at most three compiled executables per kernel (XLA
    compile time >> the wasted lanes)."""
    from ..ops.curve import chunk_plan, pad_with_identity

    chunk, n_chunks, padded = chunk_plan(n)
    if padded > n:
        pts_list = [pad_with_identity(curve, p, padded) for p in pts_list]
    if n_chunks == 1:
        out = op(*pts_list)
    else:
        outs = []
        for c in range(n_chunks):
            sl = slice(c * chunk, (c + 1) * chunk)
            outs.append(op(*[jax.tree.map(lambda x: x[sl], p)
                             for p in pts_list]))
        out = jax.tree.map(
            lambda *xs: jnp.concatenate(xs, axis=0), *outs
        )
    if padded > n:
        out = jax.tree.map(lambda x: x[:n], out)
    return out


class PointVec:
    """Vector of curve points (projective limb pytree) on device."""

    def __init__(self, ctx: DevCurveCtx, grp: str, pts, n: int):
        self.ctx = ctx
        self.grp = grp  # 'g1' | 'g2'
        self.pts = pts
        self.n = n

    @property
    def kind(self):
        return self.grp

    @property
    def dcurve(self):
        return self.ctx.g1 if self.grp == "g1" else self.ctx.g2

    @classmethod
    def from_host(cls, ctx: DevCurveCtx, grp: str, points: Sequence):
        to_dev = ctx.g1_to_dev if grp == "g1" else ctx.g2_to_dev
        return cls(ctx, grp, to_dev(list(points)), len(points))

    def to_host(self) -> List:
        from_dev = (self.ctx.g1_from_dev if self.grp == "g1"
                    else self.ctx.g2_from_dev)
        return from_dev(self.pts)

    def __len__(self):
        return self.n

    def _slice(self, sl) -> "PointVec":
        pts = jax.tree.map(lambda x: x[sl], self.pts)
        n = len(range(*sl.indices(self.n)))
        return PointVec(self.ctx, self.grp, pts, n)

    def lo(self) -> "PointVec":
        return self._slice(slice(0, self.n // 2))

    def hi(self) -> "PointVec":
        return self._slice(slice(self.n // 2, self.n))

    def fold(self, other: "PointVec", c: int) -> "PointVec":
        """c * self + other (elementwise, shared scalar)."""
        bits = self.ctx.scalar_bits(c % self.ctx.host.r,
                                    _nbits_for(self.ctx, c))
        out = _padded_point_op(
            self.dcurve, [self.pts, other.pts], self.n,
            lambda a, b: self.dcurve.add(
                self.dcurve.scalar_mul_bits(a, bits), b
            ),
        )
        return PointVec(self.ctx, self.grp, out, self.n)

    def scale(self, c: int) -> "PointVec":
        bits = self.ctx.scalar_bits(c % self.ctx.host.r,
                                    _nbits_for(self.ctx, c))
        out = _padded_point_op(
            self.dcurve, [self.pts], self.n,
            lambda a: self.dcurve.scalar_mul_bits(a, bits),
        )
        return PointVec(self.ctx, self.grp, out, self.n)

    def hadamard_scale(self, scalars: FrVec) -> "PointVec":
        """Per-element rescale: out_i = scalars_i * self_i (e.g. A o r_vec).
        Chunked to the shape tiers like every bulk op; the per-element bits
        matrix pads with zero rows (scalar 0) alongside identity points."""
        from ..ops.curve import chunk_plan, pad_with_identity

        chunk, n_chunks, padded = chunk_plan(self.n)
        pts = self.pts
        arr = scalars.arr
        if padded > self.n:
            pts = pad_with_identity(self.dcurve, pts, padded)
            arr = jnp.concatenate(
                [arr, jnp.zeros((padded - self.n,) + arr.shape[1:],
                                arr.dtype)], axis=0)
        outs = []
        for c in range(n_chunks):
            sl = slice(c * chunk, (c + 1) * chunk)
            bits = self.ctx.fr_limbs_to_bits(arr[sl])
            outs.append(self.dcurve.scalar_mul_bits(
                jax.tree.map(lambda x: x[sl], pts), bits))
        out = outs[0] if n_chunks == 1 else jax.tree.map(
            lambda *xs: jnp.concatenate(xs, axis=0), *outs)
        if padded > self.n:
            out = jax.tree.map(lambda x: x[: self.n], out)
        return PointVec(self.ctx, self.grp, out, self.n)

    def pair_product(self, other: "PointVec"):
        """prod_i e(self_i, other_i) -> host GT; self in G1, other in G2
        (PairingIP / AFGHO commit kernel, inner_products/src/lib.rs:51-74).
        The sharded twin (parallel/vectors.py ShardedPointVec) overrides
        this with per-device Miller partials + an Fq12 all-reduce."""
        from ..ops.pairing import dev_pairing

        assert self.grp == "g1" and other.grp == "g2", (self.grp, other.grp)
        assert isinstance(other, PointVec), \
            "mixed dense/sharded pairing product: shard both operands"
        return dev_pairing(self.ctx).multi_pairing(self.pts, other.pts)

    def first(self):
        # pad the single element up to MIN_REDUCE_BATCH so the normalize
        # executable is shared with the bulk paths (no per-[1] compile)
        from ..ops.curve import MIN_REDUCE_BATCH, pad_with_identity

        one = jax.tree.map(lambda x: x[:1], self.pts)
        padded = pad_with_identity(self.dcurve, one, MIN_REDUCE_BATCH)
        from_dev = (self.ctx.g1_from_dev if self.grp == "g1"
                    else self.ctx.g2_from_dev)
        return from_dev(padded)[0]

    def sum(self):
        """Host point = sum of all elements."""
        from ..ops.curve import MIN_REDUCE_BATCH, pad_with_identity

        pts = self.pts
        if self.n < MIN_REDUCE_BATCH:
            pts = pad_with_identity(self.dcurve, pts, MIN_REDUCE_BATCH)
        red = self.dcurve.sum_reduce(pts)
        return self._single_to_host(red)

    def msm(self, scalars: FrVec):
        """MSM against an Fr vector -> host point (MIPP kernel,
        inner_products/src/lib.rs:118-142 analog).

        Chunked to the shape tiers: each chunk runs one of three cached
        MSM executables; per-chunk partial points combine on host (host
        point adds are microseconds with the native backend)."""
        from ..ops.curve import chunk_plan

        chunk, n_chunks, _ = chunk_plan(self.n)
        if n_chunks == 1:
            res = msm_mod.msm(self.dcurve, self.ctx.t.fr, self.pts,
                              scalars.arr, pad_to=chunk)
            return self._single_to_host(res)
        hcurve = (self.ctx.host.g1 if self.grp == "g1"
                  else self.ctx.host.g2)
        acc = None
        for c in range(n_chunks):
            sl = slice(c * chunk, min((c + 1) * chunk, self.n))
            res = msm_mod.msm(
                self.dcurve, self.ctx.t.fr,
                jax.tree.map(lambda x: x[sl], self.pts),
                scalars.arr[sl], pad_to=chunk,
            )
            pt = self._single_to_host(res)
            acc = pt if acc is None else hcurve.add(acc, pt)
        return acc

    def _single_to_host(self, pt):
        """Batchless projective point tree -> host, via the shared
        MIN_REDUCE_BATCH normalize executable."""
        from ..ops.curve import MIN_REDUCE_BATCH, pad_with_identity

        one = jax.tree.map(lambda x: x[None], pt)
        padded = pad_with_identity(self.dcurve, one, MIN_REDUCE_BATCH)
        from_dev = (self.ctx.g1_from_dev if self.grp == "g1"
                    else self.ctx.g2_from_dev)
        return from_dev(padded)[0]


class PlaceholderVec:
    """Vector of HomomorphicPlaceholderValue keys (no data, no folds)."""

    kind = "placeholder"

    def __init__(self, n: int):
        self.n = n

    def __len__(self):
        return self.n

    def lo(self):
        return PlaceholderVec(self.n // 2)

    def hi(self):
        return PlaceholderVec(self.n - self.n // 2)

    def fold(self, other, c):
        return PlaceholderVec(self.n)

    def first(self):
        from .algebra import PLACEHOLDER
        return PLACEHOLDER
