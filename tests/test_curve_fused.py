"""Fused ladder programs == DevSWCurve.scalar_mul_bits, bit for bit."""

import os

import numpy as np
import pytest

from ripp_tpu.ops.curve_fused import FusedLadder, _build_point_progs
from ripp_tpu.ops.points import dev_ctx


def _replay(ctx, group, P, bits_int, nbits):
    """Host-loop replay of the dbl/add programs with the XLA executor."""
    import jax.numpy as jnp

    from ripp_tpu.ops.kprog import run_xla

    d = 1 if group == "g1" else 2
    dbl_s, add_s = _build_point_progs(ctx.host, group)
    fp = ctx.t.fp
    flat = []
    for coord in P:
        flat.extend(coord if d == 2 else [coord])
    one = jnp.broadcast_to(fp.one(), flat[0].shape)
    zero = jnp.zeros_like(flat[0])
    # acc = identity, then base
    acc = [zero] * d + [one] + [zero] * (d - 1) + [zero] * d
    state = acc + flat
    for i in range(nbits):
        out = run_xla(dbl_s, fp, state)
        state[:3 * d] = out
        bit = (bits_int >> (nbits - 1 - i)) & 1
        if bit:
            out = run_xla(add_s, fp, state)
            state[:3 * d] = out
    return state[:3 * d]


@pytest.mark.parametrize("group", ["g1", "g2"])
def test_ladder_programs_match_scan_path(group):
    import jax

    ctx = dev_ctx("bls12_toy")
    host = ctx.host
    n = 3
    if group == "g1":
        pts = [host.g1.scalar_mul(host.g1_gen, i + 2) for i in range(n)]
        P = ctx.g1_to_dev(pts)
        curve = ctx.g1
    else:
        pts = [host.g2.scalar_mul(host.g2_gen, i + 2) for i in range(n)]
        P = ctx.g2_to_dev(pts)
        curve = ctx.g2
    k = 0b1011001
    nbits = 7
    bits = ctx.scalar_bits(k, nbits)

    want = jax.tree.leaves(curve.scalar_mul_bits(P, bits))
    got = _replay(ctx, group, P, k, nbits)
    for w, g in zip(want, got):
        np.testing.assert_array_equal(np.asarray(w), np.asarray(g))


@pytest.mark.skipif(
    os.environ.get("RIPP_BIG_TESTS") != "1",
    reason="interpret-mode kernel run is slow (RIPP_BIG_TESTS=1)",
)
@pytest.mark.parametrize("group", ["g1", "g2"])
def test_fused_ladder_kernel_interpret(group):
    import jax
    import jax.numpy as jnp

    ctx = dev_ctx("bls12_toy")
    host = ctx.host
    n = 3
    if group == "g1":
        pts = [host.g1.scalar_mul(host.g1_gen, i + 2) for i in range(n)]
        P = ctx.g1_to_dev(pts)
        curve = ctx.g1
    else:
        pts = [host.g2.scalar_mul(host.g2_gen, i + 2) for i in range(n)]
        P = ctx.g2_to_dev(pts)
        curve = ctx.g2
    nbits = 9
    scalars = [23 + 5 * i for i in range(n)]
    rows = np.zeros((n, nbits), dtype=np.uint32)
    for e, s in enumerate(scalars):
        for j in range(nbits):
            rows[e, j] = (s >> (nbits - 1 - j)) & 1
    bits = jnp.asarray(rows)

    want = jax.tree.leaves(curve.scalar_mul_bits(P, bits))
    fl = FusedLadder(ctx, group, interpret=True)
    got = jax.tree.leaves(fl.scalar_mul_bits(P, bits))
    for w, g in zip(want, got):
        np.testing.assert_array_equal(np.asarray(w), np.asarray(g))
