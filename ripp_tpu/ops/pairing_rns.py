"""RNS-MXU Miller loop: the batched pairing product over the RNS form.

Executes the SAME Miller step programs as the fused Pallas kernel
(ops/pairing_fused._build_step_progs — CLN combined doubling+line,
sparse line mul, RCB15 addition) through the RNS executor
(ops/rns_exec.run_rns): multiplications become elementwise 14-bit
channel work plus two int8 MXU base-extension matmuls, and the whole
loop runs as a lax.scan with the f/T state held in residue form. The
per-pair Miller values are product-reduced IN RNS (a traced Fq12-mul
program applied in a log-depth tree) and only the single product is
converted back to Montgomery limb form (device-side Garner/MRC), so the
output is bit-compatible with DevPairing.product_reduce(miller_batch(.)).

Why: the CIOS limb multiplier is VPU-bound (~650M muls/s/chip measured);
the RNS form moves the O(nl^2) carry work onto the MXU (round-4 decision
record, BASELINE.md). Enabled with RIPP_RNS=1 on TPU backends.

Reference analog: the multi_miller_loop half of ark-ec
Pairing::multi_miller_loop as consumed at
/root/reference/inner_products/src/lib.rs:110-115.
"""

from __future__ import annotations

import functools
import os

import numpy as np

import jax
import jax.numpy as jnp

from .kprog import KProg, prog_tower, schedule
from .pairing_fused import _build_step_progs
from .rns_exec import RnsField, analyze_bounds, run_rns


def use_rns() -> bool:
    """RNS Miller path opt-in: RIPP_RNS=1 (TPU-oriented; works anywhere
    XLA int8 matmuls do)."""
    return os.environ.get("RIPP_RNS") == "1"


def _build_f12_mul_prog(curve):
    """Trace one dense Fp12 mul as a kprog: 24 inputs (a then b, flat
    w-slot order h/s/c as in pairing_fused), 12 outputs."""
    prog = KProg("f12_mul")
    fp, F2, F6, F12, _ = prog_tower(prog, curve)

    def declare():
        return tuple(
            tuple(tuple(prog.inp() for _ in range(2)) for _ in range(3))
            for _ in range(2)
        )

    a = declare()
    b = declare()
    c = F12.mul(a, b)
    prog.out([x for h in c for p2 in h for x in p2])
    return schedule(prog)


def _flatten12(f):
    return [x for h in f for p2 in h for x in p2]


def _unflatten12(rows):
    return (
        ((rows[0], rows[1]), (rows[2], rows[3]), (rows[4], rows[5])),
        ((rows[6], rows[7]), (rows[8], rows[9]), (rows[10], rows[11])),
    )


class RnsMiller:
    """Batched Miller product for a DevCurveCtx over the RNS form."""

    def __init__(self, ctx):
        self.ctx = ctx
        host = ctx.host
        self.spec = ctx.t.spec_fp
        self.rns = RnsField(self.spec)
        self.x_bits = tuple(int(b) for b in bin(abs(host.x))[3:])
        self.dbl_sched, self.add_sched = _build_step_progs(host)
        self.f12_sched = _build_f12_mul_prog(host)
        self.n_state = 18  # carried: f 12 + X,Y,Z 6; fixed: qx,qy,xP,yP
        # static bound fixpoint: input bound B* must dominate every
        # program's output bounds (the scan-carry invariant)
        p, MA, MB = self.rns.p, self.rns.MA, self.rns.MB
        bstar = 4 * p
        for _ in range(8):
            worst = max(
                max(analyze_bounds(self.dbl_sched, p, MA, MB, bstar)),
                max(analyze_bounds(self.add_sched, p, MA, MB, bstar)),
                max(analyze_bounds(self.f12_sched, p, MA, MB, bstar)),
                4 * p,
            )
            if worst <= bstar:
                break
            # round up to a whole multiple of p: the B*^2/MA term in the
            # mul bound otherwise creeps by an epsilon every iteration
            # and the exact fixpoint is approached asymptotically
            bstar = -(-worst // p) * p
        else:
            raise ValueError("RNS bound fixpoint did not converge")
        self.bstar = bstar
        self._jit_cache = {}

    # --- pipeline pieces ---------------------------------------------------
    def _stack_states(self, states):
        return (jnp.stack([s[0] for s in states]),
                jnp.stack([s[1] for s in states]),
                jnp.stack([s[2] for s in states]))

    def _unstack_states(self, packed, n):
        SA, SB, SR = packed
        return [(SA[i], SB[i], SR[i]) for i in range(n)]

    def _bcast_const(self, c, B):
        k = self.rns.k
        return (jnp.broadcast_to(c[0], (k, B)),
                jnp.broadcast_to(c[1], (k, B)),
                jnp.broadcast_to(c[2], (B,)))

    def product(self, xP, yP, qx, qy, skip):
        """Masked batched Miller + in-RNS product tree -> fp12 limb tree
        [1, ...] (same contract as product_reduce(miller_batch(...)) up
        to the identity handling already applied by the caller's mask).

        xP, yP: [B, nl] Fp limbs; qx, qy: fp2 pairs of [B, nl];
        skip: [B] bool (identity pairs -> contribute 1 to the product).
        """
        B = xP.shape[0]
        fn = self._jit_cache.get(B)
        if fn is None:
            fn = self._build_jit(B)
            self._jit_cache[B] = fn
        return fn(xP, yP, qx, qy, skip)

    def _build_jit(self, B):
        assert B & (B - 1) == 0, f"batch must be a power of two, got {B}"
        rns = self.rns
        dbl_s, add_s, f12_s = self.dbl_sched, self.add_sched, self.f12_sched
        bits = jnp.asarray(self.x_bits, dtype=jnp.uint32)
        bstar = self.bstar
        n_state = self.n_state
        fp_dev = self.ctx.t.fp
        one_c = rns.const_mont(1)
        zero_c = rns.const_mont(0)

        def impl(xP, yP, qx, qy, skip):
            conv = rns.from_mont_limbs
            qx0, qx1 = conv(qx[0]), conv(qx[1])
            qy0, qy1 = conv(qy[0]), conv(qy[1])
            xPr, yPr = conv(xP), conv(yP)
            one_b = self._bcast_const(one_c, B)
            zero_b = self._bcast_const(zero_c, B)
            # state regs 0..17: f = fp12 one, (X, Y) = (qx, qy), Z = one2
            init = ([one_b] + [zero_b] * 11
                    + [qx0, qx1, qy0, qy1, one_b, zero_b])
            fixed = [qx0, qx1, qy0, qy1, xPr, yPr]

            def run_step(sched, carry):
                regs = self._unstack_states(carry, n_state) + fixed
                outs = run_rns(sched, rns, regs, in_bound=bstar)
                return self._stack_states(outs)

            def body(carry, bit):
                carry = run_step(dbl_s, carry)
                carry = jax.lax.cond(
                    bit > 0, lambda c: run_step(add_s, c), lambda c: c,
                    carry)
                return carry, None

            carry, _ = jax.lax.scan(
                body, self._stack_states(init), bits)
            f_states = self._unstack_states(carry, 12)
            # identity pairs contribute 1
            f_states = [
                rns.sel(jnp.logical_not(skip), s,
                        one_b if i == 0 else zero_b)
                for i, s in enumerate(f_states)
            ]
            # in-RNS product tree over the batch axis
            width = B
            packed = self._stack_states(f_states)  # [12, k|_, B]
            while width > 1:
                half = width // 2
                lhs = self._unstack_states(
                    jax.tree.map(lambda x: x[..., :half], packed), 12)
                rhs = self._unstack_states(
                    jax.tree.map(lambda x: x[..., half:width], packed), 12)
                outs = run_rns(f12_s, rns, lhs + rhs, in_bound=bstar)
                packed = self._stack_states(outs)
                width = half
            # single product -> canonical Montgomery limbs, [1, nl] slots
            prodA, prodB, prodR = packed  # [12, k, 1], [12, k, 1], [12, 1]
            flat = (jnp.moveaxis(prodA[..., 0], 0, -1),
                    jnp.moveaxis(prodB[..., 0], 0, -1),
                    prodR[..., 0])        # [k, 12], [k, 12], [12]
            limbs = rns.to_mont_limbs(fp_dev, flat)  # [12, nl]
            rows = [limbs[i][None] for i in range(12)]
            return _unflatten12(rows)

        return jax.jit(impl)


_RNS_MILLERS = {}


def rns_miller(ctx) -> RnsMiller:
    key = id(ctx)
    if key not in _RNS_MILLERS:
        _RNS_MILLERS[key] = RnsMiller(ctx)
    return _RNS_MILLERS[key]
