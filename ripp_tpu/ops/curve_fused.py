"""Fused Pallas double-and-add ladder: a whole scalar multiplication in
ONE kernel launch.

DevSWCurve.scalar_mul_bits runs a lax.scan with ~6 Pallas mul launches +
XLA glue per bit (~255 bits for Fr scalars) - launch-bound at every
protocol size. Here the accumulator, base point and per-element scalar
bits stay resident in VMEM across the whole ladder.

Uses the SAME RCB15 complete add/double formulas as ops/curve.py
(eprint 2015/1060 algorithms 7 & 9, a = 0), traced into kprog programs -
outputs are bit-identical to the scan path. Generic over the base field
degree: G1 ladders run over Fp, G2 ladders over Fp2 (same code, the
program is traced over the symbolic tower).

Replaces the per-element scalar-multiplication half of ark-ec as
consumed by the reference's fold/rescale steps
(/root/reference/ip_proofs/src/gipa.rs:262-291,
 /root/reference/sipp/src/lib.rs:87-100).
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .kexec import TILE, exec_segments, k_sel, mul_table, read_reg, write_reg
from .kprog import KProg, ProgFp, prog_tower, schedule


def _build_point_progs(curve, group: str):
    """Trace RCB15 double and add programs for g1 (over Fp) or g2 (over
    the Fp2 twist). Pinned input layout: acc X,Y,Z (3d regs), base
    X2,Y2,Z2 (3d regs); outputs: new acc (3d)."""
    d = 1 if group == "g1" else 2

    def build(name, body):
        prog = KProg(name)
        fp, fp2, _, _, _ = prog_tower(prog, curve)
        F = fp if d == 1 else fp2

        def inp_el():
            if d == 1:
                return prog.inp()
            return (prog.inp(), prog.inp())

        acc = tuple(inp_el() for _ in range(3))
        base = tuple(inp_el() for _ in range(3))
        if group == "g1":
            b3 = F.const(3 * curve.g1.b % curve.p)
        else:
            b3h = curve.tower.fp2.mul_int(curve.g2.b, 3)
            b3 = (fp.const(b3h[0]), fp.const(b3h[1]))
        out = body(F, b3, acc, base)
        flat = []
        for el in out:
            flat.extend(el if d == 2 else [el])
        prog.out(flat)
        return schedule(prog, pin_inputs=True)

    def dbl_body(F, b3, acc, base):
        # ops/curve.py DevSWCurve.double, same op structure
        X, Y, Z = acc
        t0 = F.mul(Y, Y)
        t1 = F.mul(Y, Z)
        t2m = F.mul(Z, Z)
        txy = F.mul(X, Y)
        z3a = F.add(t0, t0)
        z3a = F.add(z3a, z3a)
        z3a = F.add(z3a, z3a)
        t2 = F.mul(b3, t2m)
        y3a = F.add(t0, t2)
        t0b = F.sub(t0, F.add(F.add(t2, t2), t2))
        x3m = F.mul(t2, z3a)
        y3m = F.mul(t0b, y3a)
        z3 = F.mul(t1, z3a)
        x3b = F.mul(t0b, txy)
        return (F.add(x3b, x3b), F.add(x3m, y3m), z3)

    def add_body(F, b3, acc, base):
        # ops/curve.py DevSWCurve.add (RCB15 complete, a = 0)
        X1, Y1, Z1 = acc
        X2, Y2, Z2 = base
        m_xx = F.mul(X1, X2)
        m_yy = F.mul(Y1, Y2)
        m_zz = F.mul(Z1, Z2)
        m_xy = F.mul(F.add(X1, Y1), F.add(X2, Y2))
        m_yz = F.mul(F.add(Y1, Z1), F.add(Y2, Z2))
        m_xz = F.mul(F.add(X1, Z1), F.add(X2, Z2))
        t3 = F.sub(m_xy, F.add(m_xx, m_yy))
        t4 = F.sub(m_yz, F.add(m_yy, m_zz))
        ty = F.sub(m_xz, F.add(m_xx, m_zz))
        t0 = F.add(F.add(m_xx, m_xx), m_xx)
        t2 = F.mul(b3, m_zz)
        y3b = F.mul(b3, ty)
        z3s = F.add(m_yy, t2)
        t1s = F.sub(m_yy, t2)
        p_a = F.mul(t4, y3b)
        p_b = F.mul(t3, t1s)
        p_c = F.mul(y3b, t0)
        p_d = F.mul(t1s, z3s)
        p_e = F.mul(t0, t3)
        p_f = F.mul(z3s, t4)
        return (F.sub(p_b, p_a), F.add(p_d, p_c), F.add(p_f, p_e))

    return (build(f"{group}_dbl", dbl_body), build(f"{group}_add", add_body))


class FusedLadder:
    """One-launch double-and-add ladder for a device curve group."""

    def __init__(self, ctx, group: str, interpret: bool = False):
        self.ctx = ctx
        self.group = group
        self.interpret = interpret
        self.spec = ctx.t.spec_fp
        self.d = 1 if group == "g1" else 2
        self.dbl_sched, self.add_sched = _build_point_progs(ctx.host, group)
        assert (self.dbl_sched.inputs == self.add_sched.inputs
                == list(range(6 * self.d)))
        # jitted end-to-end callables per (batch shape, bits shape):
        # tracing the register-machine kernel costs minutes of pure
        # Python (see FusedMiller._jit_cache note)
        self._jit_cache = {}

    @functools.cached_property
    def _pieces(self):
        dbl_tab = mul_table(self.dbl_sched)
        add_tab = mul_table(self.add_sched)
        return (np.concatenate([dbl_tab, add_tab], axis=0),
                dbl_tab.shape[0])

    def _make_call(self, nb: int, nbits: int):
        spec = self.spec
        nl = spec.nl
        d = self.d
        dbl_s, add_s = self.dbl_sched, self.add_sched
        tab, n_dbl = self._pieces
        n_state = 6 * d
        n_regs = max(dbl_s.n_regs, add_s.n_regs)
        from .fp import int_to_limbs

        one_row = int_to_limbs(spec.r % spec.p, nl)

        def kernel(tab_ref, in_ref, bits_ref, out_ref, reg_ref):
            zero = jnp.zeros((8, 128), jnp.uint32)
            onel = [jnp.full((8, 128), np.uint32(one_row[i]), jnp.uint32)
                    for i in range(nl)]
            zl = [zero] * nl
            # acc = identity (0 : 1 : 0)
            for r in range(d):
                write_reg(reg_ref, r, zl)            # X
                write_reg(reg_ref, 2 * d + r, zl)    # Z
            write_reg(reg_ref, d, onel)              # Y c0 = 1
            for r in range(d + 1, 2 * d):
                write_reg(reg_ref, r, zl)            # Y c1 = 0
            # base point
            for k in range(3 * d):
                write_reg(reg_ref, n_state // 2 + k,
                          [in_ref[k, i, 0] for i in range(nl)])

            def step(i, _):
                exec_segments(spec, dbl_s, reg_ref, tab_ref, 0)
                # doubled -> acc
                for k, r in enumerate(dbl_s.outputs):
                    write_reg(reg_ref, k, read_reg(reg_ref, r))
                exec_segments(spec, add_s, reg_ref, tab_ref, n_dbl)
                m = bits_ref[i, 0]
                for k, r in enumerate(add_s.outputs):
                    write_reg(reg_ref, k, k_sel(
                        nl, m, read_reg(reg_ref, r), read_reg(reg_ref, k)))
                return 0

            jax.lax.fori_loop(0, nbits, step, 0)
            for k in range(3 * d):
                v = read_reg(reg_ref, k)
                for i in range(nl):
                    out_ref[k, i, 0] = v[i]

        in_spec = pl.BlockSpec(
            (3 * d, nl, 1, 8, 128), lambda j: (0, 0, j, 0, 0),
            memory_space=pltpu.VMEM)
        bits_spec = pl.BlockSpec(
            (nbits, 1, 8, 128), lambda j: (0, j, 0, 0),
            memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec(
            (3 * d, nl, 1, 8, 128), lambda j: (0, 0, j, 0, 0),
            memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            grid=(nb,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      in_spec, bits_spec],
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct(
                (3 * d, nl, nb, 8, 128), jnp.uint32),
            scratch_shapes=[pltpu.VMEM((n_regs, nl, 8, 128), jnp.uint32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=self.interpret,
        )

    def scalar_mul_bits(self, P, bits):
        """Same contract as DevSWCurve.scalar_mul_bits (bit-identical):
        P projective tree, bits [nbits] (shared, MSB first) or
        [batch, nbits] per-element uint32.  The full pipeline is jitted
        once per (batch shape, bits shape)."""
        d = self.d
        flat = []
        for coord in P:
            flat.extend(coord if d == 2 else [coord])
        bshape = flat[0].shape[:-1]
        key = (bshape, bits.shape)
        fn = self._jit_cache.get(key)
        if fn is None:
            fn = self._build_jit(bshape, bits.shape)
            self._jit_cache[key] = fn
        return fn(tuple(flat), bits)

    def _build_jit(self, bshape, bits_shape):
        spec = self.spec
        nl = spec.nl
        d = self.d
        B = int(np.prod(bshape)) if bshape else 1
        nb = -(-B // TILE)
        pad = nb * TILE - B
        nbits = bits_shape[-1]
        tab, _ = self._pieces
        tab_arr = jnp.asarray(tab)
        call = self._make_call(nb, nbits)

        def impl(flat, bits):
            def tile(x):
                x = jnp.broadcast_to(x, bshape + (nl,)).reshape(B, nl)
                if pad:
                    x = jnp.concatenate(
                        [x, jnp.zeros((pad, nl), jnp.uint32)], axis=0)
                return x.T.reshape(nl, nb, 8, 128)

            ins = jnp.stack([tile(x) for x in flat])
            if bits.ndim == 1:
                bcol = jnp.broadcast_to(
                    bits.astype(jnp.uint32)[:, None], (nbits, nb * TILE))
            else:
                b2 = bits.astype(jnp.uint32).reshape(B, nbits).T
                if pad:
                    b2 = jnp.concatenate(
                        [b2, jnp.zeros((nbits, pad), jnp.uint32)], axis=1)
                bcol = b2
            bits_arr = bcol.reshape(nbits, nb, 8, 128)
            out = call(tab_arr, ins, bits_arr)

            def untile(k):
                o = out[k].reshape(nl, nb * TILE).T
                if pad:
                    o = o[:B]
                return o.reshape(*bshape, nl)

            rows = [untile(k) for k in range(3 * d)]
            if d == 1:
                return (rows[0], rows[1], rows[2])
            return ((rows[0], rows[1]), (rows[2], rows[3]),
                    (rows[4], rows[5]))

        return jax.jit(impl)


_LADDERS = {}


def fused_ladder(ctx, group: str) -> FusedLadder:
    key = (id(ctx), group)
    if key not in _LADDERS:
        _LADDERS[key] = FusedLadder(ctx, group)
    return _LADDERS[key]
