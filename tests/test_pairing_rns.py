"""Differential tests for the RNS-MXU executor and Miller pipeline.

Ground truth is kprog.run_host (pure python-int replay of the SAME
scheduled step programs), so every comparison is exact: the RNS path
must reproduce the device Miller values limb-for-limb after conversion
back to Montgomery form.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from ripp_tpu.ops.kprog import run_host
from ripp_tpu.ops.pairing_rns import RnsMiller, _build_f12_mul_prog
from ripp_tpu.ops.points import dev_ctx
from ripp_tpu.ops.rns_exec import RnsField, run_rns


def _ctx(name):
    return dev_ctx(name)


def _rand_fp(host, n, seed):
    rng = np.random.default_rng(seed)
    return [int.from_bytes(rng.bytes(64), "little") % host.p
            for _ in range(n)]


# ---------------------------------------------------------------------------
# conversion round-trip
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("curve", ["bls12_nano", "bls12_381"])
def test_rns_limb_roundtrip(curve):
    ctx = _ctx(curve)
    host, t = ctx.host, ctx.t
    rns = RnsField(t.spec_fp)
    vals = _rand_fp(host, 8, 11) + [0, 1, host.p - 1]
    limbs = jnp.asarray(t.spec_fp.to_mont_limbs(vals))
    state = rns.from_mont_limbs(limbs)
    # host CRT agrees with the original values
    assert rns.to_ints_host(state) == [v % host.p for v in vals]
    # device Garner/MRC conversion back to Montgomery limbs is canonical
    back = rns.to_mont_limbs(t.fp, state)
    assert t.spec_fp.from_mont_limbs(np.asarray(back)) == \
        [v % host.p for v in vals]


# ---------------------------------------------------------------------------
# one program: Miller doubling step over RNS vs python-int replay
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("curve", ["bls12_nano", "bls12_381"])
def test_rns_step_program_matches_run_host(curve):
    ctx = _ctx(curve)
    host, t = ctx.host, ctx.t
    rm = RnsMiller(ctx)
    rns = rm.rns
    sched = rm.dbl_sched
    n = 4
    n_in = len(sched.inputs)
    rng = np.random.default_rng(7)
    ints = [[int.from_bytes(rng.bytes(64), "little") % host.p
             for _ in range(n)] for _ in range(n_in)]
    want = run_host(sched, host.p, ints)

    def conv_in(col):
        return rns.from_mont_limbs(
            jnp.asarray(t.spec_fp.to_mont_limbs(col)))

    inputs = [conv_in(col) for col in ints]
    outs = run_rns(sched, rns, inputs, in_bound=rm.bstar)
    for got_state, want_col in zip(outs, want):
        assert rns.to_ints_host(got_state) == [v % host.p
                                               for v in want_col]


def test_rns_f12_mul_matches_host_tower():
    ctx = _ctx("bls12_nano")
    host, t = ctx.host, ctx.t
    rns = RnsField(t.spec_fp)
    sched = _build_f12_mul_prog(host)
    n = 2
    rng = np.random.default_rng(13)
    a_cols = [[int.from_bytes(rng.bytes(16), "little") % host.p
               for _ in range(n)] for _ in range(24)]
    want = run_host(sched, host.p, a_cols)
    inputs = [
        rns.from_mont_limbs(jnp.asarray(t.spec_fp.to_mont_limbs(col)))
        for col in a_cols
    ]
    outs = run_rns(sched, rns, inputs, in_bound=4 * host.p)
    for got_state, want_col in zip(outs, want):
        assert rns.to_ints_host(got_state) == [v % host.p
                                               for v in want_col]


# ---------------------------------------------------------------------------
# full pipeline: RNS Miller product == python-int replay of the same loop
# ---------------------------------------------------------------------------

def _host_miller_product(ctx, rm, A, B):
    """Replay the exact step programs with python ints and product-reduce
    with the host tower (bit-exact ground truth for RnsMiller.product)."""
    host = ctx.host
    n = len(A)
    one = [1] * n
    zero = [0] * n
    qx0 = [b[0][0] for b in B]
    qx1 = [b[0][1] for b in B]
    qy0 = [b[1][0] for b in B]
    qy1 = [b[1][1] for b in B]
    xs = [a[0] for a in A]
    ys = [a[1] for a in A]
    state = ([one] + [zero] * 11
             + [qx0, qx1, qy0, qy1, one, zero])
    fixed = [qx0, qx1, qy0, qy1, xs, ys]
    for bit in rm.x_bits:
        state = run_host(rm.dbl_sched, host.p, state + fixed)
        if bit:
            state = run_host(rm.add_sched, host.p, state + fixed)
    F12 = host.tower.fp12
    prod = F12.one()
    for i in range(n):
        fi = (((state[0][i], state[1][i]), (state[2][i], state[3][i]),
               (state[4][i], state[5][i])),
              ((state[6][i], state[7][i]), (state[8][i], state[9][i]),
               (state[10][i], state[11][i])))
        prod = F12.mul(prod, fi)
    return prod


@pytest.mark.parametrize("curve,n", [("bls12_nano", 8), ("bls12_381", 2)])
def test_rns_miller_product_matches_host_replay(curve, n):
    ctx = _ctx(curve)
    host, t = ctx.host, ctx.t
    rm = RnsMiller(ctx)
    A = [host.g1.scalar_mul(host.g1_gen, 2 * i + 3) for i in range(n)]
    B = [host.g2.scalar_mul(host.g2_gen, 3 * i + 5) for i in range(n)]
    xP = jnp.asarray(t.spec_fp.to_mont_limbs([a[0] for a in A]))
    yP = jnp.asarray(t.spec_fp.to_mont_limbs([a[1] for a in A]))
    qx = tuple(jnp.asarray(t.spec_fp.to_mont_limbs(
        [b[0][i] for b in B])) for i in range(2))
    qy = tuple(jnp.asarray(t.spec_fp.to_mont_limbs(
        [b[1][i] for b in B])) for i in range(2))
    skip = jnp.zeros((n,), dtype=bool)
    got_tree = rm.product(xP, yP, qx, qy, skip)
    got = t.fp12_from_dev(got_tree)[0]
    want = _host_miller_product(ctx, rm, A, B)
    assert got == want
