"""Generic log-depth scans/reductions over element pytrees.

Every helper is a lax.scan over shift amounts whose body contains exactly
ONE instance of the combine op - essential because XLA compile time for the
limb kernels scales with the number of inlined field multiplications.
Work is n*log2(n) lane-ops (vs 2n for a halving tree); acceptable because
these reductions are a small fraction of protocol FLOPs, and the fixed
[n, ...] shapes avoid per-size recompilation inside bigger kernels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .tower import tree_select


def _shifts(n: int):
    steps = max(1, (n - 1).bit_length())
    return jnp.asarray([1 << s for s in range(steps)], dtype=jnp.int32)


def scan_reduce(combine, vals, n: int):
    """Combine all n elements along axis 0 -> tree with axis 0 removed."""
    if n == 1:
        return jax.tree.map(lambda x: x[0], vals)
    idx = jnp.arange(n, dtype=jnp.int32)

    def body(v, shift):
        shifted = jax.tree.map(lambda x: jnp.roll(x, -shift, axis=0), v)
        combined = combine(v, shifted)
        return tree_select((idx + shift) < n, combined, v), None

    vals, _ = jax.lax.scan(body, vals, _shifts(n))
    return jax.tree.map(lambda x: x[0], vals)


def scan_prefix(combine, vals, n: int):
    """Inclusive prefix combine along axis 0."""
    if n == 1:
        return vals
    idx = jnp.arange(n, dtype=jnp.int32)

    def body(v, shift):
        shifted = jax.tree.map(lambda x: jnp.roll(x, shift, axis=0), v)
        combined = combine(v, shifted)
        return tree_select(idx >= shift, combined, v), None

    vals, _ = jax.lax.scan(body, vals, _shifts(n))
    return vals


def scan_suffix(combine, vals, n: int):
    """Inclusive suffix combine along axis 0."""
    if n == 1:
        return vals
    idx = jnp.arange(n, dtype=jnp.int32)

    def body(v, shift):
        shifted = jax.tree.map(lambda x: jnp.roll(x, -shift, axis=0), v)
        combined = combine(v, shifted)
        return tree_select((idx + shift) < n, combined, v), None

    vals, _ = jax.lax.scan(body, vals, _shifts(n))
    return vals
