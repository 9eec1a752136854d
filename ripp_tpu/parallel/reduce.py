"""Mesh-sharded protocol reductions (multi-pairing, MSM, folds).

Mirrors the reference's rayon chunking (`cfg_multi_pairing`,
inner_products/src/lib.rs:77-116; `product_of_pairings_with_coeffs`,
sipp/src/lib.rs:184-217) as shard_map kernels:

  * multi-pairing: each device Miller-loops its element shard and reduces
    the local Fq12 product; a one-element all_gather + log(ndev) product
    replicates the global Miller value (multiplicative all-reduce over ICI).
  * MSM: per-device Pippenger partial, then an additive EC all-reduce
    (all_gather of ndev points + complete-formula adds).

Pointwise work (folds, hadamard rescales) needs no shard_map at all — the
kernels in ops/ are shape-polymorphic, so jit over sharded operands keeps
them device-local with zero communication.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from ..ops.pairing import dev_pairing
from ..ops import msm as msm_mod
from ..ops.reduce import scan_reduce
from .mesh import shard_tree


def make_sharded_miller_product(ctx, mesh):
    """Returns a jitted fn (P_proj, Q_proj) -> replicated Fp12 Miller-product
    tree with a leading [1] axis; inputs sharded on their element axis."""
    dp = dev_pairing(ctx)
    axis = mesh.axis_names[0]
    ndev = mesh.devices.size

    def local_fn(P_proj, Q_proj):
        from ..ops.curve import MIN_REDUCE_BATCH, pad_with_identity

        n_loc = jax.tree.leaves(P_proj)[0].shape[0]
        if n_loc < MIN_REDUCE_BATCH:
            # pad the local shard so every mesh size shares the cached
            # [MIN_REDUCE_BATCH]-local executable (identity pairs have
            # Miller value 1)
            P_proj = pad_with_identity(ctx.g1, P_proj, MIN_REDUCE_BATCH)
            Q_proj = pad_with_identity(ctx.g2, Q_proj, MIN_REDUCE_BATCH)
        g1a = ctx.g1.normalize(P_proj)
        g2a = ctx.g2.normalize(Q_proj)
        f = dp.miller_batch(g1a, g2a)
        part = dp.product_reduce(f)  # [1, ...] local Fq12 partial
        gathered = jax.tree.map(
            lambda x: jax.lax.all_gather(x, axis, axis=0, tiled=True), part
        )  # [ndev, ...]
        red = scan_reduce(dp.fp12.mul, gathered, ndev)
        return jax.tree.map(lambda x: x[None], red)

    fn = shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(fn)


def make_sharded_msm(ctx, grp, mesh):
    """Returns a jitted fn (points_proj, scalars_mont) -> replicated single
    projective point tree; inputs sharded on the element axis."""
    curve = ctx.g1 if grp == "g1" else ctx.g2
    fr = ctx.t.fr
    axis = mesh.axis_names[0]
    ndev = mesh.devices.size

    def local_fn(points, scalars):
        # msm() itself pads the local shard to MIN_REDUCE_BATCH, so every
        # mesh size shares the cached local executable
        part = msm_mod.msm(curve, fr, points, scalars)
        part = jax.tree.map(lambda x: x[None], part)
        gathered = jax.tree.map(
            lambda x: jax.lax.all_gather(x, axis, axis=0, tiled=True), part
        )
        return scan_reduce(curve.add, gathered, ndev)

    fn = shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(fn)


def make_lean_miller_product(ctx, mesh):
    """Compile-lean sharded pairing product for compile-starved hosts
    (the 1-core-CPU dryrun gate): the heavy Miller graph compiles ONCE as
    a single-device executable and runs per shard; only the multiplicative
    Fq12 all-reduce - a tiny graph - compiles as a mesh (shard_map)
    module.  Mathematically identical to make_sharded_miller_product
    (commutative exact Fq12 products); the one-module variant stays the
    TPU production path.  Measured on the 1-core box: one-module compile
    7m51s vs ~80s for this decomposition (round-4; the rc=124 fix).

    Returns fn(P_cyclic [D, w], Q_cyclic [D, w]) -> replicated [1, ...]
    Miller-product tree."""
    dp = dev_pairing(ctx)
    axis = mesh.axis_names[0]
    ndev = int(mesh.devices.size)
    from .mesh import shard_spec

    @jax.jit
    def partial(P_loc, Q_loc):
        from ..ops.curve import MIN_REDUCE_BATCH, pad_with_identity

        n_loc = jax.tree.leaves(P_loc)[0].shape[0]
        if n_loc < MIN_REDUCE_BATCH:
            P_loc = pad_with_identity(ctx.g1, P_loc, MIN_REDUCE_BATCH)
            Q_loc = pad_with_identity(ctx.g2, Q_loc, MIN_REDUCE_BATCH)
        f = dp.miller_batch(ctx.g1.normalize(P_loc),
                            ctx.g2.normalize(Q_loc))
        return dp.product_reduce(f)

    def combine_local(parts):
        # parts: [1, ...] local partial -> replicated global product
        gathered = jax.tree.map(
            lambda x: jax.lax.all_gather(x, axis, axis=0, tiled=True),
            parts,
        )
        red = scan_reduce(dp.fp12.mul, gathered, ndev)
        return jax.tree.map(lambda x: x[None], red)

    combine = jax.jit(shard_map(
        combine_local, mesh=mesh,
        in_specs=(P(axis),), out_specs=P(),
        check_vma=False,
    ))

    def run(P_cyc, Q_cyc):
        parts = []
        for d in range(ndev):
            Pd = jax.tree.map(
                lambda x: jnp.asarray(jax.device_get(x[d])), P_cyc)
            Qd = jax.tree.map(
                lambda x: jnp.asarray(jax.device_get(x[d])), Q_cyc)
            parts.append(partial(Pd, Qd))
        stacked = jax.tree.map(
            lambda *xs: jnp.concatenate(xs, axis=0), *parts)
        return combine(jax.device_put(stacked, shard_spec(mesh)))

    return run


def make_lean_msm(ctx, grp, mesh):
    """Compile-lean sharded MSM (additive EC all-reduce twin of
    make_lean_miller_product): per-shard Pippenger partials through one
    single-device executable, small shard_map module for the all-reduce.

    Returns fn(points_cyclic [D, w], scalars_cyclic [D, w, NL]) ->
    replicated projective point tree (no batch axis)."""
    curve = ctx.g1 if grp == "g1" else ctx.g2
    fr = ctx.t.fr
    axis = mesh.axis_names[0]
    ndev = int(mesh.devices.size)
    from .mesh import shard_spec

    @jax.jit
    def partial(points, scalars):
        res = msm_mod.msm(curve, fr, points, scalars)
        return jax.tree.map(lambda x: x[None], res)

    def combine_local(parts):
        gathered = jax.tree.map(
            lambda x: jax.lax.all_gather(x, axis, axis=0, tiled=True),
            parts,
        )
        return scan_reduce(curve.add, gathered, ndev)

    combine = jax.jit(shard_map(
        combine_local, mesh=mesh,
        in_specs=(P(axis),), out_specs=P(),
        check_vma=False,
    ))

    def run(p_cyc, s_cyc):
        parts = []
        for d in range(ndev):
            pd = jax.tree.map(
                lambda x: jnp.asarray(jax.device_get(x[d])), p_cyc)
            sd = jnp.asarray(jax.device_get(s_cyc[d]))
            parts.append(partial(pd, sd))
        stacked = jax.tree.map(
            lambda *xs: jnp.concatenate(xs, axis=0), *parts)
        return combine(jax.device_put(stacked, shard_spec(mesh)))

    return run


def sharded_multi_pairing(ctx, mesh, P_proj, Q_proj):
    """Full sharded pairing product -> host GT element (conjugation +
    final exponentiation on device, as in ops/pairing.py)."""
    fn = make_sharded_miller_product(ctx, mesh)
    prod = fn(shard_tree(mesh, P_proj), shard_tree(mesh, Q_proj))
    # replicate to the default device before the single-device final exp
    prod = jax.tree.map(lambda x: jnp.asarray(jax.device_get(x)), prod)
    return dev_pairing(ctx).finalize_product(prod)


def sharded_msm_host(ctx, grp, mesh, points_proj, scalars_mont):
    """Sharded Pippenger MSM -> host affine point."""
    fn = make_sharded_msm(ctx, grp, mesh)
    res = fn(shard_tree(mesh, points_proj), shard_tree(mesh, scalars_mont))
    from_dev = ctx.g1_from_dev if grp == "g1" else ctx.g2_from_dev
    return from_dev(jax.tree.map(lambda x: x[None], res))[0]
