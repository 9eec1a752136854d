"""kprog IR: scheduled programs reproduce the device tower exactly.

Differential ground truth: ops/tower.py stacked device tower (itself
differentially tested against the host tower in test_device_field.py).
"""

import numpy as np
import pytest

from ripp_tpu.host.curves import bls12_toy
from ripp_tpu.ops.kprog import KProg, prog_tower, run_xla, schedule
from ripp_tpu.ops.tower import dev_tower


def _rand_fp12(host, rng, n):
    return [
        host.tower.fp12.fromlist([rng.randrange(host.p) for _ in range(12)])
        for _ in range(n)
    ]


def test_fp12_mul_program_matches_tower():
    curve = bls12_toy()
    t = dev_tower("bls12_toy")

    prog = KProg("fp12_mul")
    fp, fp2, fp6, fp12, _ = prog_tower(prog, curve)
    a = tuple(
        tuple(tuple(prog.inp() for _ in range(2)) for _ in range(3))
        for _ in range(2)
    )
    b = tuple(
        tuple(tuple(prog.inp() for _ in range(2)) for _ in range(3))
        for _ in range(2)
    )
    c = fp12.mul(a, b)
    flat = [x for h in c for p2 in h for x in p2]
    prog.out(flat)
    sched = schedule(prog)

    # sanity on the schedule shape: Karatsuba fp12 = 54 base muls in
    # a few dependency levels, registers reused
    assert sum(sched.mul_groups()) == prog.stats()["mul"] == 54
    assert len(sched.mul_groups()) <= 6
    assert sched.n_regs < prog.n_vals

    import random
    rng = random.Random(7)
    n = 5
    av = _rand_fp12(curve, rng, n)
    bv = _rand_fp12(curve, rng, n)
    A = t.fp12_to_dev(av)
    B = t.fp12_to_dev(bv)

    def flatten(tree):
        from ripp_tpu.ops.tower import DevTower

        return DevTower._flatten(tree)

    outs = run_xla(sched, t.fp, flatten(A) + flatten(B))
    ref = flatten(t.fp12.mul(A, B))
    for o, r in zip(outs, ref):
        np.testing.assert_array_equal(np.asarray(o), np.asarray(r))


def test_sel_and_consts():
    curve = bls12_toy()
    t = dev_tower("bls12_toy")
    prog = KProg("sel")
    fp = prog_tower(prog, curve)[0]
    x = prog.inp()
    m = prog.mask_inp()
    y = fp.add(x, fp.const(5))
    z = fp.mul_small(x, 3)
    prog.out([prog.sel(m, y, z)])
    sched = schedule(prog)

    import jax.numpy as jnp

    xs = t.fp.const(11)[None, :].repeat(4, axis=0)
    mask = jnp.asarray([True, False, True, False])
    (out,) = run_xla(sched, t.fp, [xs], masks=[mask])
    vals = t.spec_fp.from_mont_limbs(out)
    assert vals == [16, 33, 16, 33]
