"""kexec Pallas program kernels (interpret mode) vs the XLA reference
executor and the device tower. Real-TPU coverage lives in test_big.py /
bench paths; interpret mode checks the kernel logic on CPU CI."""

import random

import numpy as np
import pytest

from ripp_tpu.host.curves import bls12_toy
from ripp_tpu.ops.kexec import ProgramKernel
from ripp_tpu.ops.kprog import KProg, prog_tower, run_xla, schedule
from ripp_tpu.ops.tower import DevTower, dev_tower


def _fp2_mul_sched():
    curve = bls12_toy()
    prog = KProg("fp2_mul")
    fp, fp2, _, _, _ = prog_tower(prog, curve)
    a = (prog.inp(), prog.inp())
    b = (prog.inp(), prog.inp())
    c = fp2.mul(a, b)
    # exercise every op kind: d = (c0 - c1, -(c0 + 5)) selected by mask
    d0 = fp.sub(c[0], c[1])
    d1 = fp.neg(fp.add(c[0], fp.const(5)))
    m = prog.mask_inp()
    prog.out([prog.sel(m, d0, d1), c[0], c[1]])
    return curve, schedule(prog)


def test_program_kernel_interpret_matches_xla():
    curve, sched = _fp2_mul_sched()
    t = dev_tower("bls12_toy")
    rng = random.Random(3)
    n = 1500  # spans two 1024-tiles with padding
    ints = [[rng.randrange(curve.p) for _ in range(n)] for _ in range(4)]
    arrs = [t.fp.spec.to_mont_limbs(v) for v in ints]
    import jax.numpy as jnp

    arrs = [jnp.asarray(a) for a in arrs]
    mask = jnp.asarray([i % 3 == 0 for i in range(n)])

    want = run_xla(sched, t.fp, arrs, masks=[mask])
    got = ProgramKernel(t.fp.spec, sched, interpret=True)(arrs, masks=[mask])
    for w, g in zip(want, got):
        np.testing.assert_array_equal(np.asarray(w), np.asarray(g))


def test_fused_gtexp_interpret_matches_host():
    """FusedGtExp (interpret mode) == host fp12 pow on bls12_nano.

    Covers the round-5 verifier-latency kernel (ops/pairing_fused
    _build_gtexp_prog + FusedGtExp): per-element exponent bits drive the
    in-kernel select; MSB-first square-and-multiply must match the host
    tower's pow exactly (same canonical Montgomery limb encoding)."""
    from ripp_tpu.ops.pairing_fused import FusedGtExp
    from ripp_tpu.ops.points import dev_ctx

    import jax.numpy as jnp

    ctx = dev_ctx("bls12_nano")
    host = ctx.host
    F12 = host.tower.fp12
    rng = random.Random(11)

    # random GT-shaped elements (any fp12 works for the exp circuit)
    def rand_fp12():
        return tuple(
            tuple(
                tuple(rng.randrange(host.p) for _ in range(2))
                for _ in range(3)
            )
            for _ in range(2)
        )

    k = 5
    gs = [rand_fp12() for _ in range(k)]
    nbits = host.r.bit_length()
    es = [rng.randrange(1 << nbits) for _ in range(k)]

    bits = np.zeros((k, nbits), dtype=np.uint32)
    for i, e in enumerate(es):
        for j in range(nbits):
            bits[i, j] = (e >> (nbits - 1 - j)) & 1

    f = ctx.t.fp12_to_dev(gs)
    gt = FusedGtExp(ctx, interpret=True)
    out = gt(f, jnp.asarray(bits))
    got = ctx.t.fp12_from_dev(out)
    want = [F12.pow(g, e) for g, e in zip(gs, es)]
    assert got == want
