"""Mesh-sharded SIPP prover: protocol vectors resident across devices.

Round-1 left only the bulk reductions sharded; here the PROTOCOL runs on
the mesh (round-2 verdict "shard the protocols, not just the reductions"):
the (a, b) vectors live cyclically sharded across all devices for the whole
prove, each round's two cross pairing-products are per-device partial Miller
loops + one multiplicative Fq12 all-reduce over ICI, and the halving folds
are purely device-local.  Reference dataflow: /root/reference/sipp/src/
lib.rs:69-101.

Cyclic layout [D, m] (device d, slot k) holds logical element k*D + d.
Because n/2 = D * (m/2), the logical lo/hi halves are the LOCAL slot
ranges [:m/2] / [m/2:] on every device -- so splits, cross-pairings
(a_hi[i] with b_lo[i]) and folds all stay device-local with ZERO
communication until m == 1 (SURVEY.md section 5.7's block-cyclic design:
no ppermute needed at all for the first log(n)-log(D) rounds).  The last
log(D) rounds run on gathered data through the same models/sipp.py round
loop -- by then the vectors are D elements total, communication-trivial.

Bit-neutrality contract (SURVEY.md section 4): Fq12 products are exact and
commutative, so the sharded z_l/z_r equal the single-device values and the
Fiat-Shamir transcript -- hence the proof bytes -- are IDENTICAL.
"""

from __future__ import annotations

import functools
from typing import List, Sequence

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.sipp import SIPPProof, _instance_seed, prove_rounds
from ..models.vectors import PointVec
from ..ops.pairing import dev_pairing
from ..ops.reduce import scan_reduce
from ..utils.fiat_shamir import FiatShamirRng
from ..utils.serialize import CurveSerializer


def to_cyclic(tree, ndev: int):
    """[n, ...] tree -> [D, m, ...] with (d, k) = logical k*D + d."""
    def rs(x):
        n = x.shape[0]
        m = n // ndev
        return jnp.moveaxis(x.reshape(m, ndev, *x.shape[1:]), 0, 1)

    return jax.tree.map(rs, tree)


def from_cyclic(tree):
    """Inverse of to_cyclic."""
    def rs(x):
        d, m = x.shape[:2]
        return jnp.moveaxis(x, 0, 1).reshape(d * m, *x.shape[2:])

    return jax.tree.map(rs, tree)


class ShardedSIPP:
    """SIPP prover over a 1-D device mesh."""

    def __init__(self, ctx, mesh: Mesh):
        self.ctx = ctx
        self.mesh = mesh
        self.axis = mesh.axis_names[0]
        self.ndev = mesh.devices.size
        self._cross_jits = {}
        self._fold_jit = None

    # --- sharded cross pairing product -------------------------------------
    def _pad_cols(self, grp: str, tree, mm: int, width: int):
        """Pad the local slot axis (axis 1) from mm to `width` with identity
        points (Miller value 1 -> the product is unchanged).  Done OUTSIDE
        the shard_map so every small round shares ONE compiled executable
        -- compiling a separate full-Miller module per round size blew
        tens of GB of XLA:CPU compile memory on the virtual mesh."""
        if mm >= width:
            return tree
        curve = self.ctx.g1 if grp == "g1" else self.ctx.g2
        pad_x = jax.tree.map(
            lambda x: jnp.zeros(
                (x.shape[0], width - mm) + x.shape[2:], x.dtype
            ),
            tree[0],
        )
        ident = curve.identity_like(pad_x)
        return jax.tree.map(
            lambda a, b: jnp.concatenate([a, b], axis=1), tree, ident
        )

    def _cross_product(self, mm: int):
        """Jitted shard_map fn: ([D, mm'] a-tree, [D, mm'] b-tree) ->
        replicated [1, ...] Fp12 Miller-product tree, where mm' is mm
        padded up to MIN_REDUCE_BATCH (shared executable for all tail
        rounds)."""
        from ..ops.curve import MIN_REDUCE_BATCH

        mm = max(mm, MIN_REDUCE_BATCH)
        fn = self._cross_jits.get(mm)
        if fn is not None:
            return fn
        ctx = self.ctx
        dp = dev_pairing(ctx)
        axis = self.axis
        ndev = self.ndev

        def local_fn(a_blk, b_blk):
            a_loc = jax.tree.map(lambda x: x.reshape(mm, *x.shape[2:]),
                                 a_blk)
            b_loc = jax.tree.map(lambda x: x.reshape(mm, *x.shape[2:]),
                                 b_blk)
            f = dp.miller_batch(ctx.g1.normalize(a_loc),
                                ctx.g2.normalize(b_loc))
            part = dp.product_reduce(f)  # [1, ...] local partial
            gathered = jax.tree.map(
                lambda x: jax.lax.all_gather(x, axis, axis=0, tiled=True),
                part,
            )
            red = scan_reduce(dp.fp12.mul, gathered, ndev)
            return jax.tree.map(lambda x: x[None], red)

        fn = jax.jit(shard_map(
            local_fn, mesh=self.mesh,
            in_specs=(P(self.axis), P(self.axis)),
            out_specs=P(),
            check_vma=False,
        ))
        self._cross_jits[mm] = fn
        return fn

    # --- device-local pointwise phase --------------------------------------
    def _fold(self):
        """Jitted fold on pre-split, pre-padded halves: a <- x*a_hi + a_lo,
        b <- x_inv*b_hi + b_lo; device-local SPMD, no communication.
        Inputs are padded to a fixed [D, MIN_REDUCE_BATCH] so every tail
        round reuses one executable (caller slices the result back)."""
        if self._fold_jit is not None:
            return self._fold_jit
        g1, g2 = self.ctx.g1, self.ctx.g2

        @jax.jit
        def fold(a_lo, a_hi, b_lo, b_hi, x_bits, xinv_bits):
            a_f = g1.add(g1.scalar_mul_bits(a_hi, x_bits), a_lo)
            b_f = g2.add(g2.scalar_mul_bits(b_hi, xinv_bits), b_lo)
            return a_f, b_f

        self._fold_jit = fold
        return fold

    # --- full prove ---------------------------------------------------------
    def prove(self, a_host: Sequence, b_host: Sequence, r: Sequence[int],
              value) -> SIPPProof:
        ctx = self.ctx
        host = ctx.host
        n = len(a_host)
        D = self.ndev
        assert n & (n - 1) == 0 and n >= 2
        assert n % D == 0 and (n // D) & (n // D - 1) == 0, (n, D)
        s = CurveSerializer(host)
        rng = FiatShamirRng(_instance_seed(ctx, a_host, b_host, r, value))

        # a <- a o r on the single default device (one-time setup cost),
        # then scatter cyclically across the mesh.
        from ..models.vectors import FrVec

        a0 = PointVec.from_host(ctx, "g1", a_host).hadamard_scale(
            FrVec.from_ints(ctx, list(r))
        )
        b0 = PointVec.from_host(ctx, "g2", b_host)
        spec = NamedSharding(self.mesh, P(self.axis))
        rep = NamedSharding(self.mesh, P())
        a = jax.device_put(to_cyclic(a0.pts, D), spec)
        b = jax.device_put(to_cyclic(b0.pts, D), spec)

        gt_elems: List = []
        m = n // D
        fold = self._fold()
        while m != 1:
            m //= 2
            a_lo = jax.tree.map(lambda t: t[:, :m], a)
            a_hi = jax.tree.map(lambda t: t[:, m:], a)
            b_lo = jax.tree.map(lambda t: t[:, :m], b)
            b_hi = jax.tree.map(lambda t: t[:, m:], b)
            from ..ops.curve import MIN_REDUCE_BATCH

            w = max(m, MIN_REDUCE_BATCH)
            cross = self._cross_product(m)
            z_l_f = cross(self._pad_cols("g1", a_hi, m, w),
                          self._pad_cols("g2", b_lo, m, w))
            z_r_f = cross(self._pad_cols("g1", a_lo, m, w),
                          self._pad_cols("g2", b_hi, m, w))
            z_l = self._to_gt(z_l_f)
            z_r = self._to_gt(z_r_f)
            gt_elems.append((z_l, z_r))
            rng.absorb(s.gt(z_l) + s.gt(z_r))
            x = rng.next_u128()
            x_inv = pow(x, -1, host.r)
            x_bits = jax.device_put(ctx.scalar_bits(x, 128), rep)
            xinv_bits = jax.device_put(
                ctx.scalar_bits(x_inv, host.r.bit_length()), rep
            )
            a, b = fold(
                self._pad_cols("g1", a_lo, m, w),
                self._pad_cols("g1", a_hi, m, w),
                self._pad_cols("g2", b_lo, m, w),
                self._pad_cols("g2", b_hi, m, w),
                x_bits, xinv_bits,
            )
            if w > m:
                a = jax.tree.map(lambda t: t[:, :m], a)
                b = jax.tree.map(lambda t: t[:, :m], b)

        # m == 1: the vector is one element per device (logical index = d).
        # Gather to the default device and finish through the shared
        # single-device round loop (identical transcript framing).
        a_g = jax.device_get(from_cyclic(a))
        b_g = jax.device_get(from_cyclic(b))
        a_tail = PointVec(ctx, "g1", jax.tree.map(jnp.asarray, a_g), D)
        b_tail = PointVec(ctx, "g2", jax.tree.map(jnp.asarray, b_g), D)
        prove_rounds(ctx, a_tail, b_tail, rng, gt_elems)
        return SIPPProof(gt_elems=gt_elems)

    def _to_gt(self, fp12_tree):
        """Replicated [1, ...] Miller value -> host GT (conjugation +
        final exponentiation on device, as in ops/pairing.py).  Pull the
        replicated mesh value onto the default device first -- the final
        exp executable is single-device."""
        local = jax.tree.map(
            lambda x: jnp.asarray(jax.device_get(x)), fp12_tree
        )
        return dev_pairing(self.ctx).finalize_product(local)
