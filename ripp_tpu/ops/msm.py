"""Pippenger multi-scalar multiplication on TPU.

Replaces ark-ec VariableBaseMSM (reference call sites:
/root/reference/inner_products/src/lib.rs:140, sipp/src/lib.rs:174-175).

TPU-native formulation - no data-dependent branching, no serial bucket
walk (SURVEY.md section 7.3): per window,

  1. digits <- 16/8-bit slices of the (de-Montgomeryized) scalars
  2. sort points by digit (argsort + gather)
  3. segmented inclusive scan (Hillis-Steele) with the complete point-add:
     log2(n) vectorized steps; sorted keys make the segment rule exact
  4. segment-end sums scattered to buckets with *unique* indices (non-ends
     write to private dummy slots, so XLA scatter stays deterministic)
  5. bucket combine sum_k k*S_k = sum_t suffix_t via a reversed scan, then a
     log-depth tree reduction
  6. windows combined MSB->LSB with c doublings per window

All stages are vectorized adds over n or 2^c lanes; wall-clock depth is
windows * (log2 n + c) point-add steps.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from .curve import DevSWCurve
from .fp import LIMB_BITS
from .tower import tree_select


def _tree_take(tree, idx, axis=0):
    return jax.tree.map(lambda x: jnp.take(x, idx, axis=axis), tree)


def scalars_to_digits(fr, scalars_mont, window_bits: int, nbits: int):
    """Device Fr Montgomery limbs [n, NL] -> digit matrix [n, n_windows]
    (least-significant window first)."""
    one_plain = jnp.zeros((fr.nl,), dtype=jnp.uint32).at[0].set(1)
    canon = fr.mul(scalars_mont, one_plain)  # de-Montgomeryize
    n_windows = (nbits + window_bits - 1) // window_bits
    digits = []
    for w in range(n_windows):
        lo_bit = w * window_bits
        acc = jnp.zeros(canon.shape[:-1], dtype=jnp.uint32)
        # gather the window's bits from the 16-bit limbs (window may straddle)
        for b in range(window_bits):
            bit = lo_bit + b
            if bit >= nbits + window_bits:
                break
            limb = bit // LIMB_BITS
            if limb >= canon.shape[-1]:
                continue
            off = bit % LIMB_BITS
            acc = acc | (((canon[..., limb] >> off) & 1) << b)
        digits.append(acc)
    return jnp.stack(digits, axis=-1)  # [n, n_windows]


def _segmented_scan_add(curve: DevSWCurve, pts, keys):
    """Inclusive segmented scan with point addition over axis 0.
    keys must be sorted ascending; pts is a projective point tree [n, ...].
    lax.scan over shifts: ONE point-add instance in the jaxpr (compile time
    scales with inlined field-mul count)."""
    n = keys.shape[0]
    if n == 1:
        return pts
    steps = (n - 1).bit_length()
    shifts = jnp.asarray([1 << s for s in range(steps)], dtype=jnp.int32)
    idx = jnp.arange(n, dtype=jnp.int32)

    def body(vals, shift):
        prev = jax.tree.map(lambda x: jnp.roll(x, shift, axis=0), vals)
        prev_keys = jnp.roll(keys, shift, axis=0)
        same = jnp.logical_and(idx >= shift, prev_keys == keys)
        combined = curve.add(vals, prev)
        return tree_select(same, combined, vals), None

    pts, _ = jax.lax.scan(body, pts, shifts)
    return pts


def _suffix_weighted_sum(curve: DevSWCurve, buckets):
    """Given bucket sums S_k for k = 0..K-1 ([K, ...] tree), return
    sum_{k>=1} k * S_k = sum_{t>=1} (sum_{k>=t} S_k). One add instance per
    scan (see _segmented_scan_add note)."""
    K = jax.tree.leaves(buckets)[0].shape[0]
    # drop bucket 0, reverse so suffix sums become prefix sums
    b = jax.tree.map(lambda x: x[1:][::-1], buckets)  # [K-1]
    n = K - 1
    steps = (n - 1).bit_length()
    shifts = jnp.asarray([1 << s for s in range(steps)], dtype=jnp.int32)
    idx = jnp.arange(n, dtype=jnp.int32)

    def body(vals, shift):
        prev = jax.tree.map(lambda x: jnp.roll(x, shift, axis=0), vals)
        combined = curve.add(vals, prev)
        return tree_select(idx >= shift, combined, vals), None

    b, _ = jax.lax.scan(body, b, shifts)
    # b[i] = S_{K-1} + ... + S_{K-1-i} (prefix of reversed) = suffix sums
    return curve.sum_reduce(b, axis=0)


@partial(jax.jit, static_argnames=("curve", "window_bits", "nbits"))
def _msm_windows(curve: DevSWCurve, points, digits, window_bits: int,
                 nbits: int):
    """Compute all window sums W_w. Returns a point tree [n_windows, ...].
    The per-window body is traced ONCE (lax.map over window columns) - the
    unrolled version made jaxprs explode."""
    n = digits.shape[0]
    K = 1 << window_bits

    def one_window(keys):
        order = jnp.argsort(keys)
        keys_s = jnp.take(keys, order)
        pts_s = _tree_take(points, order)
        scanned = _segmented_scan_add(curve, pts_s, keys_s)
        # segment ends: last position of each key run
        next_keys = jnp.concatenate(
            [keys_s[1:], jnp.full((1,), K + 1, dtype=keys_s.dtype)]
        )
        is_end = keys_s != next_keys
        # unique scatter indices: ends -> their bucket, others -> dummy slots
        # (unique indices keep the XLA scatter deterministic)
        idx = jnp.where(is_end, keys_s, K + jnp.arange(n, dtype=keys_s.dtype))
        # untouched bucket slots must hold the IDENTITY point (0:1:0), not
        # all-zeros, or later adds would be poisoned
        buckets0 = curve.identity_like(
            jax.tree.map(
                lambda x: jnp.zeros((K + n,) + x.shape[1:], x.dtype), pts_s[0]
            )
        )
        buckets = jax.tree.map(
            lambda dst, src: dst.at[idx].set(src), buckets0, scanned
        )
        buckets = jax.tree.map(lambda x: x[:K], buckets)
        return _suffix_weighted_sum(curve, buckets)

    return jax.lax.map(one_window, jnp.moveaxis(digits, 0, 1))


# Above this size the bucket-serial schedule wins (work-optimal n*W adds
# instead of the sorted-scan's n*log(n) per window); below it the scan
# formulation's executables are already cached by the protocol tail rounds.
BUCKET_SERIAL_MIN = 2048


def msm(curve: DevSWCurve, fr, points, scalars_mont, window_bits: int = 8,
        nbits: int = None, pad_to: int = None):
    """points: projective tree [n, ...]; scalars_mont: Fr limbs [n, NL].
    Returns a single projective point (no batch dim). The batch is padded
    with (identity, 0) OUTSIDE the jit boundary up to max(pad_to,
    MIN_REDUCE_BATCH) so callers can pin the executable shape (chunked
    execution: PointVec.msm passes its shape tier)."""
    from .curve import MIN_REDUCE_BATCH, pad_with_identity

    n = scalars_mont.shape[0]
    target = max(pad_to or 0, MIN_REDUCE_BATCH)
    if n < target:
        points = pad_with_identity(curve, points, target)
        scalars_mont = jnp.concatenate(
            [scalars_mont,
             jnp.zeros((target - n,) + scalars_mont.shape[1:],
                       scalars_mont.dtype)],
            axis=0,
        )
        n = target
    if n >= BUCKET_SERIAL_MIN:
        return _msm_bucket_serial(curve, fr, points, scalars_mont,
                                  window_bits, nbits or fr.p.bit_length())
    return _msm_impl(curve, fr, points, scalars_mont, window_bits,
                     nbits or fr.p.bit_length())


@partial(jax.jit, static_argnames=("curve", "fr", "window_bits", "nbits"))
def _msm_bucket_serial(curve: DevSWCurve, fr, points, scalars_mont,
                       window_bits: int, nbits: int):
    """Work-optimal Pippenger: every (window, digit) bucket accumulates its
    own elements serially while all W*2^c buckets run in parallel lanes.

    The sorted-segmented-scan formulation (_msm_windows) costs
    W * n * log2(n) point-adds; this one costs n * W adds total -- at
    n=2^16 that is ~16x less point work.  Schedule: sort the n*W
    (window, digit) entries by bucket once (cheap integer sort), then a
    lax.while_loop where step k adds element k of every bucket (a [W*2^c]
    gather + one batched complete add).  The trip count is the MAXIMUM
    bucket occupancy -- a traced scalar, so the executable is shape-static
    and exact for ANY scalar distribution (adversarial distributions just
    run more iterations).
    """
    n = scalars_mont.shape[0]
    K = 1 << window_bits
    digits = scalars_to_digits(fr, scalars_mont, window_bits, nbits)
    W = digits.shape[1]
    NB = W * K

    # entry (w, i) at flat id w*n + i, key = w*K + digit[i, w]
    keys_flat = (
        jnp.moveaxis(digits, 0, 1)
        + (jnp.arange(W, dtype=jnp.uint32) * K)[:, None]
    ).reshape(-1)
    order = jnp.argsort(keys_flat)
    sorted_keys = jnp.take(keys_flat, order)
    point_idx = (order % n).astype(jnp.int32)
    starts = jnp.searchsorted(
        sorted_keys, jnp.arange(NB + 1, dtype=jnp.uint32)
    ).astype(jnp.int32)
    lens = starts[1:] - starts[:-1]          # [NB]
    max_len = jnp.max(lens)

    first = jax.tree.map(lambda x: x[0], points[0])
    acc0 = curve.identity_like(
        jax.tree.map(
            lambda x: jnp.zeros((NB,) + x.shape, x.dtype), first
        )
    )

    def cond(state):
        return state[0] < max_len

    def body(state):
        k, acc = state
        pos = jnp.clip(starts[:NB] + k, 0, W * n - 1)
        pi = jnp.take(point_idx, pos)
        pts = _tree_take(points, pi)
        combined = curve.add(acc, pts)
        acc = tree_select(k < lens, combined, acc)
        return k + 1, acc

    _, acc = jax.lax.while_loop(cond, body, (jnp.int32(0), acc0))

    # [NB] -> [W, K, ...]; weighted bucket combine vmapped per window
    # (_suffix_weighted_sum's select masks assume [K, ...] leaves)
    buckets = jax.tree.map(lambda x: x.reshape(W, K, *x.shape[1:]), acc)
    windows = jax.vmap(lambda b: _suffix_weighted_sum(curve, b))(buckets)
    return _combine_windows(curve, windows, window_bits)


@partial(jax.jit, static_argnames=("curve", "fr", "window_bits", "nbits"))
def _msm_impl(curve: DevSWCurve, fr, points, scalars_mont, window_bits: int,
              nbits: int):
    digits = scalars_to_digits(fr, scalars_mont, window_bits, nbits)
    windows = _msm_windows(curve, points, digits, window_bits, nbits)
    return _combine_windows(curve, windows, window_bits)


@partial(jax.jit, static_argnames=("curve", "window_bits"))
def _combine_windows(curve: DevSWCurve, windows, window_bits: int):
    n_windows = jax.tree.leaves(windows)[0].shape[0]

    def body(acc, w):
        # fori_loop keeps ONE double instance in the jaxpr (vs window_bits
        # inlined copies - XLA compile time scales with inlined field muls)
        acc = jax.lax.fori_loop(
            0, window_bits, lambda _, a: curve.double(a), acc
        )
        return curve.add(acc, w), None

    # windows are LSB-first; combine from MSB
    rev = jax.tree.map(lambda x: x[::-1], windows)
    init = curve.identity_like(jax.tree.map(lambda x: x[0], rev)[0])
    acc, _ = jax.lax.scan(body, init, rev)
    return acc
