"""Pallas executor for kprog field programs: whole algebraic blocks as
ONE TPU kernel with a VMEM register file.

Execution model (see ops/kprog.py for why):
  * The scheduled program's registers live in a VMEM scratch array
    [R, NL, 8, 128]; each register is one field element for a tile of
    1024 batch elements (8x128 = the native int32 VPU tile).
  * Cheap ops (add/sub/neg/sel/movc) are unrolled straight-line code with
    STATIC register indices (the program is compile-time data).
  * Each independent-mul group runs as ONE lax.fori_loop over a shared
    CIOS Montgomery-mul body (ops/fp_pallas.mont_mul_limbs); per-mul
    register indices come from a small SMEM table. Kernel code size is
    therefore O(levels x mul_body), not O(muls x mul_body).
  * The grid dimension walks batch tiles; the register file is reused
    per tile.

This replaces, on the TPU hot path, chains of separate Pallas mul calls
+ XLA elementwise glue + layout transposes per protocol step with a
single launch whose intermediates never leave VMEM.
"""

from __future__ import annotations

import functools
from typing import List, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fp import LIMB_BITS, LIMB_MASK, FieldSpec
from .fp_pallas import mont_mul_limbs
from .kprog import Scheduled

# One register tile: [8, 128] uint32 per limb -> 1024 batch elements.
TILE = 1024


# ---------------------------------------------------------------------------
# In-kernel field ops on per-limb lists (exact DevFp semantics: inputs and
# outputs are canonical, fully reduced, 16-bit limbs)
# ---------------------------------------------------------------------------

def k_cond_sub_p(nl, p_limbs, res, force=None):
    """res (< 2p, normalized limbs) -> res mod p via conditional subtract."""
    diff = []
    borrow = jnp.zeros_like(res[0])
    for k in range(nl):
        v = res[k] + ((1 << LIMB_BITS) - int(p_limbs[k])) - borrow
        diff.append(v & LIMB_MASK)
        borrow = 1 - (v >> LIMB_BITS)
    geq = borrow == 0
    if force is not None:
        geq = jnp.logical_or(geq, force)
    return [jnp.where(geq, diff[k], res[k]) for k in range(nl)]


def k_add(nl, p_limbs, a, b):
    out = []
    c = jnp.zeros_like(a[0])
    for k in range(nl):
        v = a[k] + b[k] + c
        out.append(v & LIMB_MASK)
        c = v >> LIMB_BITS
    # a + b < 2p: one conditional subtract restores canonical form.  The
    # ripple carry-out c can only be set when a + b >= 2^(16 nl) > p, in
    # which case subtracting p is mandatory (matches DevFp.add force=carry).
    return k_cond_sub_p(nl, p_limbs, out, force=c > 0)


def k_sub(nl, p_limbs, a, b):
    d = []
    borrow = jnp.zeros_like(a[0])
    for k in range(nl):
        v = a[k] + (1 << LIMB_BITS) - b[k] - borrow
        d.append(v & LIMB_MASK)
        borrow = 1 - (v >> LIMB_BITS)
    under = borrow > 0  # a < b: add p back
    s = []
    c = jnp.zeros_like(a[0])
    for k in range(nl):
        v = d[k] + int(p_limbs[k]) + c
        s.append(v & LIMB_MASK)
        c = v >> LIMB_BITS
    return [jnp.where(under, s[k], d[k]) for k in range(nl)]


def k_neg(nl, p_limbs, a):
    nz = a[0]
    for k in range(1, nl):
        nz = nz | a[k]
    is_zero = nz == 0
    d = []
    borrow = jnp.zeros_like(a[0])
    for k in range(nl):
        v = int(p_limbs[k]) + (1 << LIMB_BITS) - a[k] - borrow
        d.append(v & LIMB_MASK)
        borrow = 1 - (v >> LIMB_BITS)
    return [jnp.where(is_zero, a[k], d[k]) for k in range(nl)]


def k_sel(nl, m, a, b):
    cond = m > 0
    return [jnp.where(cond, a[k], b[k]) for k in range(nl)]


# ---------------------------------------------------------------------------
# Segment execution inside a kernel body
# ---------------------------------------------------------------------------

def read_reg(reg_ref, r):
    """Read register r (static or traced) -> list of nl [8,128] arrays."""
    nl = reg_ref.shape[1]
    if isinstance(r, int):
        return [reg_ref[r, i] for i in range(nl)]
    block = reg_ref[pl.ds(r, 1)]  # [1, nl, 8, 128]
    return [block[0, i] for i in range(nl)]


def write_reg(reg_ref, r, limbs):
    nl = reg_ref.shape[1]
    if isinstance(r, int):
        for i in range(nl):
            reg_ref[r, i] = limbs[i]
    else:
        reg_ref[pl.ds(r, 1)] = jnp.stack(limbs)[None]


def exec_segments(spec: FieldSpec, sched: Scheduled, reg_ref, tab_ref,
                  tab_offset: int):
    """Run a scheduled program's segments against the register file.

    tab_ref: SMEM int32 [*, 3] holding the concatenated (dst, a, b) rows
    of every mul group of this program, starting at tab_offset.
    Returns the next free table offset (static int).
    """
    nl = spec.nl
    p_limbs = spec.p_limbs
    const_cache = {}

    def const_limbs(cid):
        if cid not in const_cache:
            from .fp import int_to_limbs

            v = (sched.consts[cid] % spec.p) * spec.r % spec.p
            row = int_to_limbs(v, nl)
            const_cache[cid] = [
                jnp.full((8, 128), np.uint32(row[i]), jnp.uint32)
                for i in range(nl)
            ]
        return const_cache[cid]

    off = tab_offset
    for kind, items in sched.segments:
        if kind == "muls":
            base = off

            def body(k, _):
                d = tab_ref[k, 0]
                a = tab_ref[k, 1]
                b = tab_ref[k, 2]
                av = read_reg(reg_ref, a)
                bv = read_reg(reg_ref, b)
                write_reg(
                    reg_ref, d,
                    mont_mul_limbs(nl, p_limbs, spec.n0inv, av, bv),
                )
                return 0

            jax.lax.fori_loop(base, base + len(items), body, 0)
            off += len(items)
            continue
        for op in items:
            if op.kind == "movc":
                write_reg(reg_ref, op.dst, const_limbs(op.a))
            elif op.kind == "add":
                write_reg(reg_ref, op.dst, k_add(
                    nl, p_limbs, read_reg(reg_ref, op.a),
                    read_reg(reg_ref, op.b)))
            elif op.kind == "sub":
                write_reg(reg_ref, op.dst, k_sub(
                    nl, p_limbs, read_reg(reg_ref, op.a),
                    read_reg(reg_ref, op.b)))
            elif op.kind == "neg":
                write_reg(reg_ref, op.dst, k_neg(
                    nl, p_limbs, read_reg(reg_ref, op.a)))
            elif op.kind == "sel":
                m = reg_ref[op.m, 0]
                write_reg(reg_ref, op.dst, k_sel(
                    nl, m, read_reg(reg_ref, op.a),
                    read_reg(reg_ref, op.b)))
            else:
                raise ValueError(op.kind)
    return off


def mul_table(sched: Scheduled) -> np.ndarray:
    """Concatenated (dst, a, b) rows of all mul groups, in segment order."""
    rows = []
    for kind, items in sched.segments:
        if kind == "muls":
            rows.extend(items)
    if not rows:
        return np.zeros((1, 3), dtype=np.int32)
    return np.asarray(rows, dtype=np.int32)


# ---------------------------------------------------------------------------
# Straight-line program -> pallas_call
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _program_call(spec: FieldSpec, sched_key, nb: int, interpret: bool):
    sched = _SCHED_REGISTRY[sched_key]
    nl = spec.nl
    n_in = len(sched.inputs)
    n_mask = len(sched.mask_inputs)
    n_out = len(sched.outputs)
    tab = mul_table(sched)

    in_spec = pl.BlockSpec(
        (n_in, nl, 1, 8, 128), lambda j: (0, 0, j, 0, 0),
        memory_space=pltpu.VMEM)
    mask_spec = pl.BlockSpec(
        (max(n_mask, 1), 1, 8, 128), lambda j: (0, j, 0, 0),
        memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec(
        (n_out, nl, 1, 8, 128), lambda j: (0, 0, j, 0, 0),
        memory_space=pltpu.VMEM)
    tab_spec = pl.BlockSpec(memory_space=pltpu.SMEM)

    def kernel_inner(tab_ref, in_ref, mask_ref, out_ref, reg_ref):
        for k, r in enumerate(sched.inputs):
            write_reg(reg_ref, r, [in_ref[k, i, 0] for i in range(nl)])
        for k, r in enumerate(sched.mask_inputs):
            m = mask_ref[k, 0]
            write_reg(reg_ref, r, [m] * nl)
        exec_segments(spec, sched, reg_ref, tab_ref, 0)
        for k, r in enumerate(sched.outputs):
            v = read_reg(reg_ref, r)
            for i in range(nl):
                out_ref[k, i, 0] = v[i]

    call = pl.pallas_call(
        kernel_inner,
        grid=(nb,),
        in_specs=[tab_spec, in_spec, mask_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((n_out, nl, nb, 8, 128), jnp.uint32),
        scratch_shapes=[pltpu.VMEM((sched.n_regs, nl, 8, 128), jnp.uint32)],
        # register file + block double-buffers exceed the conservative
        # 16 MB default scoped-vmem budget; v5e has 128 MB physical VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )

    # jit so repeated invocations hit the shape-keyed trace cache instead
    # of re-tracing the (very large) unrolled kernel body every call
    run = jax.jit(lambda tab_arr, in_arr, mask_arr:
                  call(tab_arr, in_arr, mask_arr))

    return run, tab


_SCHED_REGISTRY = {}


def register_sched(sched: Scheduled) -> str:
    key = f"{sched.name}:{id(sched)}"
    _SCHED_REGISTRY[key] = sched
    return key


class ProgramKernel:
    """Callable wrapper: run a scheduled program on [batch, NL] limb arrays
    (the repo-wide layout), handling the limb-major tiling transposes."""

    def __init__(self, spec: FieldSpec, sched: Scheduled,
                 interpret: bool = False):
        self.spec = spec
        self.sched = sched
        self.key = register_sched(sched)
        self.interpret = interpret

    def __call__(self, inputs: Sequence, masks: Sequence = ()):
        spec = self.spec
        nl = spec.nl
        n_in = len(self.sched.inputs)
        assert len(inputs) == n_in
        bshape = inputs[0].shape[:-1]
        B = int(np.prod(bshape)) if bshape else 1
        nb = -(-B // TILE)
        pad = nb * TILE - B

        def tile(x):
            x = x.reshape(B, nl)
            if pad:
                x = jnp.concatenate(
                    [x, jnp.zeros((pad, nl), jnp.uint32)], axis=0)
            return x.T.reshape(nl, nb, 8, 128)

        in_arr = jnp.stack([tile(jnp.broadcast_to(
            x, bshape + (nl,)).astype(jnp.uint32)) for x in inputs])

        n_mask = len(self.sched.mask_inputs)
        if n_mask:
            ms = []
            for m in masks:
                m = jnp.broadcast_to(m, bshape).reshape(B).astype(jnp.uint32)
                if pad:
                    m = jnp.concatenate(
                        [m, jnp.zeros((pad,), jnp.uint32)], axis=0)
                ms.append(m.reshape(nb, 8, 128))
            mask_arr = jnp.stack(ms)
        else:
            mask_arr = jnp.zeros((1, nb, 8, 128), jnp.uint32)

        run, tab = _program_call(spec, self.key, nb, self.interpret)
        out = run(jnp.asarray(tab), in_arr, mask_arr)
        # [n_out, nl, nb, 8, 128] -> list of [batch, nl]
        outs = []
        for k in range(len(self.sched.outputs)):
            o = out[k].reshape(nl, nb * TILE).T
            if pad:
                o = o[:B]
            outs.append(o.reshape(*bshape, nl))
        return outs
