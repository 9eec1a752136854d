"""Mesh-resident protocol vectors: the sharded twins of models/vectors.py.

Round-4: GIPA/TIPA provers ride the mesh the way ShardedSIPP already did
(round-3 verdict item 6).  A ShardedPointVec/ShardedFrVec holds its data
CYCLICALLY sharded across a 1-D device mesh: leaf shape [D, m, ...] with
(device d, slot k) = logical element k*D + d, NamedSharding over axis 0.

Why cyclic (same argument as parallel/sipp.py): GIPA's asymmetric splits
(gipa.rs:207-217) and halving folds (gipa.rs:261-291) pair logical index i
with i +/- n/2; under the cyclic layout the logical lo/hi halves are the
LOCAL slot ranges [:m/2] / [m/2:], so splits and folds are device-local
with ZERO communication for the first log(n) - log(D) rounds.  Per-round
commitments (two pairing products / MSMs of size n/2, gipa.rs:219-232) are
per-device partials + ONE small collective over ICI (multiplicative Fq12
all-reduce / additive EC all-reduce).  When m hits 1 the vectors gather to
the default device and the remaining log(D) rounds run through the dense
models/vectors.py code - by then they are D elements total.

Bit-neutrality (SURVEY.md section 4): Fq12 products, EC sums and Fr sums
are exact and commutative, so sharded reductions equal the single-device
values and the Fiat-Shamir transcript - hence the proof bytes - are
IDENTICAL to a 1-device prove (asserted by tests/parallel_check.py).

Compile discipline: every mesh kernel runs at LOCAL-axis tier widths
(ops/curve.py CHUNK_TIERS), looping over fixed-width chunks - one compiled
executable per (kernel, tier), NOT one per round size (the round-2/3
compile blowup this module exists to avoid).
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.vectors import FrVec, PointVec, _nbits_for
from ..ops.curve import CHUNK_TIERS, MIN_REDUCE_BATCH
from ..ops.pairing import dev_pairing
from ..ops.reduce import scan_reduce
from .mesh import replicated_spec, shard_spec
from .sipp import from_cyclic, to_cyclic


def _tier(m: int) -> int:
    for t in CHUNK_TIERS:
        if m <= t:
            return t
    return CHUNK_TIERS[-1]


def _local_chunks(m: int):
    """Chunk plan along the LOCAL slot axis: (width, n_chunks)."""
    w = _tier(m)
    return w, -(-m // w)


def _pad_local(curve, tree, m: int, w: int):
    """Pad the local slot axis (axis 1) from m to w with identity points."""
    if m >= w:
        return tree
    pad_x = jax.tree.map(
        lambda x: jnp.zeros((x.shape[0], w - m) + x.shape[2:], x.dtype),
        tree[0],
    )
    ident = curve.identity_like(pad_x)
    return jax.tree.map(
        lambda a, b: jnp.concatenate([a, b], axis=1), tree, ident
    )


def _pad_local_zeros(arr, m: int, w: int):
    if m >= w:
        return arr
    return jnp.concatenate(
        [arr, jnp.zeros((arr.shape[0], w - m) + arr.shape[2:], arr.dtype)],
        axis=1,
    )


class ShardedOps:
    """Cached mesh executables for one (ctx, mesh): cross pairing product,
    MSM, Fr dot, and the pointwise fold/rescale kernels - each compiled
    once per local tier width."""

    def __init__(self, ctx, mesh: Mesh):
        self.ctx = ctx
        self.mesh = mesh
        self.axis = mesh.axis_names[0]
        self.ndev = int(mesh.devices.size)
        self._jits = {}

    # ---- reductions --------------------------------------------------------
    def _cross_jit(self, w: int):
        key = ("cross", w)
        fn = self._jits.get(key)
        if fn is not None:
            return fn
        ctx, axis, ndev = self.ctx, self.axis, self.ndev
        dp = dev_pairing(ctx)

        def local_fn(a_blk, b_blk):
            a_loc = jax.tree.map(
                lambda x: x.reshape(w, *x.shape[2:]), a_blk)
            b_loc = jax.tree.map(
                lambda x: x.reshape(w, *x.shape[2:]), b_blk)
            f = dp.miller_batch(ctx.g1.normalize(a_loc),
                                ctx.g2.normalize(b_loc))
            part = dp.product_reduce(f)
            gathered = jax.tree.map(
                lambda x: jax.lax.all_gather(x, axis, axis=0, tiled=True),
                part,
            )
            red = scan_reduce(dp.fp12.mul, gathered, ndev)
            return jax.tree.map(lambda x: x[None], red)

        fn = jax.jit(shard_map(
            local_fn, mesh=self.mesh,
            in_specs=(P(self.axis), P(self.axis)), out_specs=P(),
            check_vma=False,
        ))
        self._jits[key] = fn
        return fn

    def pair_product(self, a_pts, b_pts, m: int):
        """Cyclic [D, m] G1/G2 trees -> host GT (full pairing product).
        Chunks the local axis at tier widths; chunk Miller partials
        combine on host (host Fq12 mul + final exp are microseconds)."""
        from ..host import pairing as hp

        host = self.ctx.host
        w, n_chunks = _local_chunks(m)
        acc = None
        for c in range(n_chunks):
            lo, hi = c * w, min((c + 1) * w, m)
            a_c = jax.tree.map(lambda x: x[:, lo:hi], a_pts)
            b_c = jax.tree.map(lambda x: x[:, lo:hi], b_pts)
            if hi - lo < w:
                a_c = _pad_local(self.ctx.g1, a_c, hi - lo, w)
                b_c = _pad_local(self.ctx.g2, b_c, hi - lo, w)
            prod = self._cross_jit(w)(a_c, b_c)
            f = self.ctx.t.fp12_from_dev(jax.tree.map(
                lambda x: jnp.asarray(jax.device_get(x)), prod))[0]
            acc = f if acc is None else host.tower.fp12.mul(acc, f)
        if host.x < 0:
            acc = host.tower.fp12_conj(acc)
        return hp.final_exponentiation(host, acc)

    def _msm_jit(self, grp: str, w: int):
        key = ("msm", grp, w)
        fn = self._jits.get(key)
        if fn is not None:
            return fn
        ctx, axis, ndev = self.ctx, self.axis, self.ndev
        curve = ctx.g1 if grp == "g1" else ctx.g2
        fr = ctx.t.fr
        from ..ops import msm as msm_mod

        def local_fn(p_blk, s_blk):
            p_loc = jax.tree.map(
                lambda x: x.reshape(w, *x.shape[2:]), p_blk)
            s_loc = s_blk.reshape(w, *s_blk.shape[2:])
            part = msm_mod.msm(curve, fr, p_loc, s_loc, pad_to=w)
            part = jax.tree.map(lambda x: x[None], part)
            gathered = jax.tree.map(
                lambda x: jax.lax.all_gather(x, axis, axis=0, tiled=True),
                part,
            )
            return scan_reduce(curve.add, gathered, ndev)

        fn = jax.jit(shard_map(
            local_fn, mesh=self.mesh,
            in_specs=(P(self.axis), P(self.axis)), out_specs=P(),
            check_vma=False,
        ))
        self._jits[key] = fn
        return fn

    def msm(self, grp: str, pts, arr, m: int):
        """Cyclic [D, m] point tree x [D, m, NL] Fr limbs -> host point."""
        host = self.ctx.host
        hcurve = host.g1 if grp == "g1" else host.g2
        curve = self.ctx.g1 if grp == "g1" else self.ctx.g2
        w, n_chunks = _local_chunks(m)
        acc = None
        for c in range(n_chunks):
            lo, hi = c * w, min((c + 1) * w, m)
            p_c = jax.tree.map(lambda x: x[:, lo:hi], pts)
            s_c = arr[:, lo:hi]
            if hi - lo < w:
                p_c = _pad_local(curve, p_c, hi - lo, w)
                s_c = _pad_local_zeros(s_c, hi - lo, w)
            res = self._msm_jit(grp, w)(p_c, s_c)
            pt = self._proj_to_host(grp, res)
            acc = pt if acc is None else hcurve.add(acc, pt)
        return acc

    def _proj_to_host(self, grp: str, pt_tree):
        """Batchless projective device tree -> host affine point, entirely
        host-side (no normalize executable on the mesh)."""
        host = self.ctx.host
        t = self.ctx.t
        fp2 = isinstance(pt_tree[0], tuple)

        def to_int(el):
            if fp2:
                return t.fp2_from_dev(jax.tree.map(
                    lambda x: jnp.asarray(jax.device_get(x))[None], el))[0]
            return t.fp_from_dev(
                jnp.asarray(jax.device_get(el))[None])[0]

        F = host.tower.fp2 if fp2 else host.tower.fp
        X, Y, Z = (to_int(c) for c in pt_tree)
        if Z == F.zero():
            return None
        zi = F.inv(Z)
        return (F.mul(X, zi), F.mul(Y, zi))

    def _dot_jit(self, w: int):
        key = ("dot", w)
        fn = self._jits.get(key)
        if fn is not None:
            return fn
        fr = self.ctx.t.fr
        axis, ndev = self.axis, self.ndev

        def local_fn(a_blk, b_blk):
            a_loc = a_blk.reshape(w, *a_blk.shape[2:])
            b_loc = b_blk.reshape(w, *b_blk.shape[2:])
            prods = fr.mul(a_loc, b_loc)
            red = scan_reduce(fr.add, prods, w)
            part = jax.tree.map(lambda x: x[None], red)
            gathered = jax.lax.all_gather(part, axis, axis=0, tiled=True)
            return scan_reduce(fr.add, gathered, ndev)

        fn = jax.jit(shard_map(
            local_fn, mesh=self.mesh,
            in_specs=(P(self.axis), P(self.axis)), out_specs=P(),
            check_vma=False,
        ))
        self._jits[key] = fn
        return fn

    def fr_dot(self, a, b, m: int) -> int:
        r = self.ctx.host.r
        w, n_chunks = _local_chunks(m)
        total = 0
        for c in range(n_chunks):
            lo, hi = c * w, min((c + 1) * w, m)
            a_c = _pad_local_zeros(a[:, lo:hi], hi - lo, w)
            b_c = _pad_local_zeros(b[:, lo:hi], hi - lo, w)
            red = self._dot_jit(w)(a_c, b_c)
            total = (total + self.ctx.t.fr_from_dev(
                jnp.asarray(jax.device_get(red))[None])[0]) % r
        return total

    # ---- pointwise ---------------------------------------------------------
    def _point_fold_jit(self, grp: str, w: int, nbits: int):
        key = ("pfold", grp, w, nbits)
        fn = self._jits.get(key)
        if fn is not None:
            return fn
        curve = self.ctx.g1 if grp == "g1" else self.ctx.g2

        @jax.jit
        def fold(hi_pts, lo_pts, bits):
            return curve.add(curve.scalar_mul_bits(hi_pts, bits), lo_pts)

        self._jits[key] = fold
        return fold

    def point_fold(self, grp: str, self_pts, other_pts, m: int, c: int,
                   nbits: int):
        """c * self + other on cyclic [D, m] trees, device-local."""
        curve = self.ctx.g1 if grp == "g1" else self.ctx.g2
        bits = jax.device_put(
            self.ctx.scalar_bits(c % self.ctx.host.r, nbits),
            replicated_spec(self.mesh),
        )
        w, n_chunks = _local_chunks(m)
        outs = []
        for ci in range(n_chunks):
            lo, hi = ci * w, min((ci + 1) * w, m)
            s_c = jax.tree.map(lambda x: x[:, lo:hi], self_pts)
            o_c = jax.tree.map(lambda x: x[:, lo:hi], other_pts)
            if hi - lo < w:
                s_c = _pad_local(curve, s_c, hi - lo, w)
                o_c = _pad_local(curve, o_c, hi - lo, w)
            out = self._point_fold_jit(grp, w, nbits)(s_c, o_c, bits)
            if hi - lo < w:
                out = jax.tree.map(lambda x: x[:, : hi - lo], out)
            outs.append(out)
        if n_chunks == 1:
            return outs[0]
        return jax.tree.map(
            lambda *xs: jnp.concatenate(xs, axis=1), *outs)

    def _fr_fold_jit(self, w: int):
        key = ("frfold", w)
        fn = self._jits.get(key)
        if fn is not None:
            return fn
        fr = self.ctx.t.fr

        @jax.jit
        def fold(a, b, cc):
            return fr.add(fr.mul(a, cc), b)

        self._jits[key] = fold
        return fold

    def fr_fold(self, a, b, m: int, c: int):
        fr = self.ctx.t.fr
        cc = jax.device_put(
            fr.const(c % self.ctx.host.r), replicated_spec(self.mesh))
        w, n_chunks = _local_chunks(m)
        outs = []
        for ci in range(n_chunks):
            lo, hi = ci * w, min((ci + 1) * w, m)
            a_c = _pad_local_zeros(a[:, lo:hi], hi - lo, w)
            b_c = _pad_local_zeros(b[:, lo:hi], hi - lo, w)
            out = self._fr_fold_jit(w)(a_c, b_c, cc)
            outs.append(out[:, : hi - lo])
        return outs[0] if n_chunks == 1 else jnp.concatenate(outs, axis=1)


_OPS = {}


def sharded_ops(ctx, mesh: Mesh) -> ShardedOps:
    key = (id(ctx), tuple(d.id for d in mesh.devices.flat))
    if key not in _OPS:
        _OPS[key] = ShardedOps(ctx, mesh)
    return _OPS[key]


# ---------------------------------------------------------------------------
# Sharded vector classes (duck-typed twins of models/vectors.py)
# ---------------------------------------------------------------------------


class ShardedFrVec:
    """Fr vector cyclically resident on a mesh: limbs [D, m, NL]."""

    kind = "fr"

    def __init__(self, ctx, mesh: Mesh, arr, n: int):
        self.ctx = ctx
        self.mesh = mesh
        self.arr = arr
        self.n = n
        self.ops = sharded_ops(ctx, mesh)

    @property
    def m(self) -> int:
        return self.n // self.ops.ndev

    @classmethod
    def from_dense(cls, mesh: Mesh, vec: FrVec) -> "ShardedFrVec":
        D = int(mesh.devices.size)
        assert vec.n % D == 0 and (vec.n // D) > 0
        arr = jax.device_put(to_cyclic(vec.arr, D), shard_spec(mesh))
        return cls(vec.ctx, mesh, arr, vec.n)

    @classmethod
    def from_ints(cls, ctx, mesh: Mesh, ints: Sequence[int]):
        return cls.from_dense(mesh, FrVec.from_ints(ctx, list(ints)))

    def gather(self) -> FrVec:
        arr = jnp.asarray(jax.device_get(from_cyclic(self.arr)))
        return FrVec(self.ctx, arr, self.n)

    def __len__(self):
        return self.n

    def lo(self):
        if self.m == 1:
            return self.gather().lo()
        return ShardedFrVec(
            self.ctx, self.mesh, self.arr[:, : self.m // 2], self.n // 2)

    def hi(self):
        if self.m == 1:
            return self.gather().hi()
        return ShardedFrVec(
            self.ctx, self.mesh, self.arr[:, self.m // 2 :], self.n // 2)

    def fold(self, other, c: int):
        if isinstance(other, FrVec):  # degraded tail: gather and go dense
            return self.gather().fold(other, c)
        out = self.ops.fr_fold(self.arr, other.arr, self.m, c)
        return ShardedFrVec(self.ctx, self.mesh, out, self.n)

    def inner_product(self, other) -> int:
        if isinstance(other, FrVec):
            return self.gather().inner_product(other)
        return self.ops.fr_dot(self.arr, other.arr, self.m)

    def first(self) -> int:
        return self.ctx.t.fr_from_dev(
            jnp.asarray(jax.device_get(self.arr[:1, 0])))[0]

    def to_ints(self) -> List[int]:
        return self.gather().to_ints()


class ShardedPointVec:
    """Point vector cyclically resident on a mesh: leaves [D, m, ...]."""

    def __init__(self, ctx, mesh: Mesh, grp: str, pts, n: int):
        self.ctx = ctx
        self.mesh = mesh
        self.grp = grp
        self.pts = pts
        self.n = n
        self.ops = sharded_ops(ctx, mesh)

    @property
    def kind(self):
        return self.grp

    @property
    def m(self) -> int:
        return self.n // self.ops.ndev

    @classmethod
    def from_dense(cls, mesh: Mesh, vec: PointVec) -> "ShardedPointVec":
        D = int(mesh.devices.size)
        assert vec.n % D == 0 and (vec.n // D) > 0
        pts = jax.device_put(to_cyclic(vec.pts, D), shard_spec(mesh))
        return cls(vec.ctx, mesh, vec.grp, pts, vec.n)

    @classmethod
    def from_host(cls, ctx, mesh: Mesh, grp: str, points: Sequence):
        return cls.from_dense(
            mesh, PointVec.from_host(ctx, grp, list(points)))

    def gather(self) -> PointVec:
        pts = jax.tree.map(
            lambda x: jnp.asarray(jax.device_get(x)),
            from_cyclic(self.pts),
        )
        return PointVec(self.ctx, self.grp, pts, self.n)

    def to_host(self) -> List:
        return self.gather().to_host()

    def __len__(self):
        return self.n

    def _local_slice(self, sl) -> "ShardedPointVec":
        pts = jax.tree.map(lambda x: x[:, sl], self.pts)
        n = len(range(*sl.indices(self.m))) * self.ops.ndev
        return ShardedPointVec(self.ctx, self.mesh, self.grp, pts, n)

    def lo(self):
        if self.m == 1:
            return self.gather().lo()
        return self._local_slice(slice(0, self.m // 2))

    def hi(self):
        if self.m == 1:
            return self.gather().hi()
        return self._local_slice(slice(self.m // 2, self.m))

    def fold(self, other, c: int):
        if isinstance(other, PointVec):  # degraded tail: go dense
            return self.gather().fold(other, c)
        nbits = _nbits_for(self.ctx, c)
        out = self.ops.point_fold(
            self.grp, self.pts, other.pts, self.m, c, nbits)
        return ShardedPointVec(self.ctx, self.mesh, self.grp, out, self.n)

    def hadamard_scale(self, scalars: "ShardedFrVec"):
        """Per-element rescale out_i = scalars_i * self_i, device-local
        (per-element bits computed on device from the sharded limbs)."""
        curve = self.ctx.g1 if self.grp == "g1" else self.ctx.g2
        ops = self.ops
        key = ("hscale", self.grp)
        fn = ops._jits.get(key)
        if fn is None:
            ctx = self.ctx

            @jax.jit
            def hs(pts, arr):
                bits = ctx.fr_limbs_to_bits(arr)
                return curve.scalar_mul_bits(pts, bits)

            ops._jits[key] = fn = hs
        m = self.m
        w, n_chunks = _local_chunks(m)
        outs = []
        for ci in range(n_chunks):
            lo, hi = ci * w, min((ci + 1) * w, m)
            p_c = jax.tree.map(lambda x: x[:, lo:hi], self.pts)
            s_c = scalars.arr[:, lo:hi]
            if hi - lo < w:
                p_c = _pad_local(curve, p_c, hi - lo, w)
                s_c = _pad_local_zeros(s_c, hi - lo, w)
            out = fn(p_c, s_c)
            if hi - lo < w:
                out = jax.tree.map(lambda x: x[:, : hi - lo], out)
            outs.append(out)
        pts = outs[0] if n_chunks == 1 else jax.tree.map(
            lambda *xs: jnp.concatenate(xs, axis=1), *outs)
        return ShardedPointVec(self.ctx, self.mesh, self.grp, pts, self.n)

    def msm(self, scalars):
        if isinstance(scalars, FrVec):
            return self.gather().msm(scalars)
        return self.ops.msm(self.grp, self.pts, scalars.arr, self.m)

    def pair_product(self, other):
        """prod_i e(self_i, other_i) -> host GT (self G1, other G2)."""
        assert self.grp == "g1" and other.grp == "g2"
        if isinstance(other, PointVec):  # dense partner: go dense
            return self.gather().pair_product(other)
        return self.ops.pair_product(self.pts, other.pts, self.m)

    def first(self):
        one = jax.tree.map(
            lambda x: jnp.asarray(jax.device_get(x[:1, 0])), self.pts)
        vec = PointVec(self.ctx, self.grp, one, 1)
        return vec.first()
