"""Batched field inversion via the Montgomery product trick.

Work: ~5n multiplications + ONE Fermat inversion, vs n Fermat inversions -
the FLOP saver that makes the affine batched Miller loop competitive
(ark_ff::batch_inversion analog, used at /root/reference/sipp/src/lib.rs:149).
Prefix/suffix products use jax.lax.associative_scan (log-depth, vectorized).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .tower import tree_select


def _tree_is_zero(F, a):
    leaves = jax.tree.leaves(a)
    acc = jnp.all(leaves[0] == 0, axis=-1)
    for l in leaves[1:]:
        acc = jnp.logical_and(acc, jnp.all(l == 0, axis=-1))
    return acc


def _bcast_one(F, like_leaf_shape, a):
    one = F.one()
    return jax.tree.map(
        lambda l, o: jnp.broadcast_to(o, l.shape), a,
        _const_tree(one, a),
    )


def _const_tree(c, like):
    if isinstance(like, tuple):
        return tuple(_const_tree(ci, li) for ci, li in zip(c, like))
    return c


def batch_inv(F, a, axis: int = 0):
    """Elementwise inverse of a field-element batch (pytree of [n, ...]).
    Zero entries map to zero (matching arkworks batch_inversion)."""
    zero_mask = _tree_is_zero(F, a)
    one = _bcast_one(F, None, a)
    safe = tree_select(zero_mask, one, a)

    prefix = jax.lax.associative_scan(F.mul, safe, axis=axis)
    # total product and its single Fermat inverse
    total = jax.tree.map(lambda x: jnp.take(x, -1, axis=axis), prefix)
    total_inv = F.inv(total)

    # suffix products: scan reversed
    rev = jax.tree.map(lambda x: jnp.flip(x, axis=axis), safe)
    suffix_rev = jax.lax.associative_scan(F.mul, rev, axis=axis)
    suffix = jax.tree.map(lambda x: jnp.flip(x, axis=axis), suffix_rev)

    n = jax.tree.leaves(a)[0].shape[axis]

    def shifted(tree, by):
        # shift along axis filling with identity(one)
        def sh(x, o):
            pad = jnp.broadcast_to(
                o, x.shape[:axis] + (abs(by),) + x.shape[axis + 1 :]
            )
            if by > 0:
                return jnp.concatenate(
                    [pad, jax.lax.slice_in_dim(x, 0, n - by, axis=axis)],
                    axis=axis,
                )
            return jnp.concatenate(
                [jax.lax.slice_in_dim(x, -by, n, axis=axis), pad], axis=axis
            )
        return jax.tree.map(sh, tree, _const_tree(F.one(), tree))

    prefix_before = shifted(prefix, 1)   # product of elements < i
    suffix_after = shifted(suffix, -1)   # product of elements > i
    out = F.mul(F.mul(prefix_before, suffix_after), total_inv)
    zero = jax.tree.map(jnp.zeros_like, a)
    return tree_select(zero_mask, zero, out)
