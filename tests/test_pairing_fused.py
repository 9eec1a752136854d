"""Fused one-launch Miller loop == scan-path Miller loop, bit for bit.

The fused kernel (ops/pairing_fused.py) traces the exact formulas of
ops/pairing.py into kprog programs, so outputs must be IDENTICAL limb
arrays, not just equal GT values after the final exponentiation.

The quick test replays the step programs with the XLA reference executor
(covers the traced formulas + scheduler); the interpret-mode kernel test
(covers the Pallas register machine end-to-end) takes ~13 min on CPU and
is gated with the big-test knob.

On TPU the kernel path IS the default dispatch since round 4:
DevPairing.miller_batch routes to FusedMiller when use_fused() is true
(ops/pairing.py), so bench.py and every protocol exercise it on-chip;
round-4 on-chip differential: fused == scan limb-identical at n=256
(BASELINE.md round-4 notes).
"""

import os

import numpy as np
import pytest

from ripp_tpu.ops.pairing import dev_pairing
from ripp_tpu.ops.pairing_fused import FusedMiller, _build_step_progs
from ripp_tpu.ops.points import dev_ctx


def _fixture(ctx, n=3):
    host = ctx.host
    A = [host.g1.scalar_mul(host.g1_gen, 2 * i + 3) for i in range(n)]
    B = [host.g2.scalar_mul(host.g2_gen, 3 * i + 5) for i in range(n)]
    g1a = ctx.g1.normalize(ctx.g1_to_dev(A))
    g2a = ctx.g2.normalize(ctx.g2_to_dev(B))
    return g1a[0], g1a[1], g2a[0], g2a[1]


def test_step_programs_match_scan_path():
    """Replay the dbl/add programs with run_xla over the whole bit ladder
    and compare against DevPairing._miller_impl limb-for-limb."""
    import jax
    import jax.numpy as jnp

    from ripp_tpu.ops.kprog import run_xla

    ctx = dev_ctx("bls12_toy")
    host = ctx.host
    xP, yP, qx, qy = _fixture(ctx)

    dbl_s, add_s = _build_step_progs(host)
    fp = ctx.t.fp

    # state layout per _build_step_progs: f(12), X,Y,Z(6), qx,qy(4), xP,yP(2)
    one = jnp.broadcast_to(fp.one(), xP.shape)
    zero = jnp.zeros_like(xP)
    state = [one] + [zero] * 11 + [qx[0], qx[1], qy[0], qy[1], one, zero,
                                   qx[0], qx[1], qy[0], qy[1], xP, yP]
    bits = tuple(int(b) for b in bin(abs(host.x))[3:])
    for b in bits:
        out = run_xla(dbl_s, fp, state)
        state[:18] = out
        if b:
            out = run_xla(add_s, fp, state)
            state[:18] = out

    dp = dev_pairing(ctx)
    want = jax.tree.leaves(dp._miller_jit(xP, yP, qx, qy))
    for w, g in zip(want, state[:12]):
        np.testing.assert_array_equal(np.asarray(w), np.asarray(g))


@pytest.mark.skipif(
    os.environ.get("RIPP_BIG_TESTS") != "1",
    reason="interpret-mode kernel run takes ~13 min (RIPP_BIG_TESTS=1)",
)
def test_fused_miller_kernel_interpret_matches_scan_path():
    import jax

    ctx = dev_ctx("bls12_toy")
    xP, yP, qx, qy = _fixture(ctx)
    dp = dev_pairing(ctx)
    want = dp._miller_jit(xP, yP, qx, qy)
    got = FusedMiller(ctx, interpret=True).miller(xP, yP, qx, qy)
    for w, g in zip(jax.tree.leaves(want), jax.tree.leaves(got)):
        np.testing.assert_array_equal(np.asarray(w), np.asarray(g))
