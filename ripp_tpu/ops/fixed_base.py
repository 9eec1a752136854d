"""Fixed-base windowed MSM: shared-base scalar multiplication via tables.

Replaces the per-element full-width double-and-add ladder for SRS generation
(reference capability: ark-ec FixedBase::get_window_table / windowed_mul,
consumed at /root/reference/ip_proofs/src/tipa/mod.rs:385-390).

TPU-native shape:
  * table build: one lax.scan of c doublings per window base (W steps),
    then one lax.scan of batch-[W] adds over the 2^c digit multiples --
    exactly TWO point-op instances in the jaxpr regardless of table size.
  * evaluation: one lax.scan over windows; each step gathers the digit'd
    table row for all n outputs and does ONE batch-n complete add.  Total
    point work: W = ceil(nbits/c) batch-n adds, vs ~2*nbits ladder steps
    (~16x fewer point ops at c=8 for 255-bit scalars).

Scalars are host ints here (SRS powers are generated on host), so digit
matrices are built in numpy -- no de-Montgomery kernel needed.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import numpy as np

import jax
import jax.numpy as jnp

from .curve import DevSWCurve


@partial(jax.jit, static_argnames=("curve", "window_bits", "n_windows"))
def build_table(curve: DevSWCurve, base, window_bits: int, n_windows: int):
    """base: projective point tree with NO batch dim.
    Returns table tree [n_windows, 2^window_bits, ...] with
    table[w, d] = d * 2^(window_bits*w) * base."""
    K = 1 << window_bits

    def next_base(b, _):
        nb = jax.lax.fori_loop(
            0, window_bits, lambda _, p: curve.double(p), b
        )
        return nb, b

    _, bases = jax.lax.scan(next_base, base, None, length=n_windows)
    # bases: tree [W, ...]

    # identity_like takes a FIELD-element tree (the X coordinate), not the
    # whole point tuple
    ident = curve.identity_like(bases[0])

    def next_mult(t, _):
        nt = curve.add(t, bases)  # batch [W]
        return nt, t

    _, mults = jax.lax.scan(next_mult, ident, None, length=K)
    # mults: tree [K, W, ...] with mults[d, w] = d * bases[w]
    return jax.tree.map(lambda x: jnp.moveaxis(x, 0, 1), mults)


@partial(jax.jit, static_argnames=("curve",))
def eval_table(curve: DevSWCurve, table, digits):
    """table: tree [W, K, ...]; digits: int32 [n, W] (LSB-first windows).
    Returns projective point batch [n] with out_i = sum_w table[w, d_iw]."""
    digits_t = jnp.moveaxis(digits, 0, 1)  # [W, n]
    n = digits.shape[0]
    first_x = jax.tree.map(lambda x: x[0], table[0])  # X-coord tree [K,...]
    ident = curve.identity_like(
        jax.tree.map(
            lambda x: jnp.zeros((n,) + x.shape[1:], x.dtype), first_x
        )
    )

    def body(acc, xs):
        table_w, dig = xs
        sel = jax.tree.map(lambda x: jnp.take(x, dig, axis=0), table_w)
        return curve.add(acc, sel), None

    acc, _ = jax.lax.scan(body, ident, (table, digits_t))
    return acc


def scalars_to_digit_matrix(scalars: Sequence[int], window_bits: int,
                            nbits: int) -> np.ndarray:
    """Host ints -> [n, W] int32 digit matrix, LSB-first windows."""
    W = (nbits + window_bits - 1) // window_bits
    mask = (1 << window_bits) - 1
    out = np.zeros((len(scalars), W), dtype=np.int32)
    for i, s in enumerate(scalars):
        s = int(s)
        for w in range(W):
            out[i, w] = (s >> (w * window_bits)) & mask
    return out


def fixed_base_msm(curve: DevSWCurve, base, scalars: Sequence[int],
                   nbits: int, window_bits: int = 8):
    """base: projective tree, batch [1]; scalars: host ints.
    Returns a projective device batch [n] of scalars[i] * base.

    Chunked to the shape tiers (ops/curve.py CHUNK_TIERS; digit 0 ->
    identity padding) so every SRS/fixture size shares at most three
    compiled eval executables."""
    from .curve import chunk_plan

    n = len(scalars)
    W = (nbits + window_bits - 1) // window_bits
    base_single = jax.tree.map(lambda x: x[0], base)
    table = build_table(curve, base_single, window_bits, W)
    chunk, n_chunks, padded = chunk_plan(n)
    digits = scalars_to_digit_matrix(
        list(scalars) + [0] * (padded - n), window_bits, nbits
    )
    outs = []
    for c in range(n_chunks):
        outs.append(eval_table(
            curve, table, jnp.asarray(digits[c * chunk:(c + 1) * chunk])
        ))
    out = outs[0] if n_chunks == 1 else jax.tree.map(
        lambda *xs: jnp.concatenate(xs, axis=0), *outs)
    if padded > n:
        out = jax.tree.map(lambda x: x[:n], out)
    return out
