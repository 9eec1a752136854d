"""Pallas TPU kernel for batched Montgomery multiplication.

This is the round-2 replacement for the pure-XLA `DevFp.mul` hot path
(ripp_tpu/ops/fp.py).  The XLA form keeps every limb op as a separate HLO
instruction, which (a) materializes the [B, NL, 2NL] partial-product tensor
through HBM and (b) inflates compile times of every consumer graph.  Here the
whole CIOS Montgomery product is ONE custom call: inputs stream HBM->VMEM
once, all ~6k limb ops run register/VMEM-resident on the VPU, and consumer
graphs shrink to a single op.

Measured raw VPU rate on v5e (pallas microbench, this repo): ~3.8-4.1 T
uint32 lane-ops/s; the kernel below costs ~6.1k lane-ops per element for
BLS12-381 (24x16-bit limbs), i.e. a ~600M muls/s ceiling vs the XLA form's
measured 30.9M muls/s.

Layout: the public API takes/returns the repo-wide [..., NL] uint32 limb
layout; internally we transpose to limb-major [NL, B] so each limb is a full
[BS, 128] VPU tile (limbs in the lane dimension would idle 104/128 lanes).

Replaces the arkworks ark-ff Montgomery backend consumed by the reference at
/root/reference/inner_products/src/lib.rs:77-116 (field muls inside pairings
and MSMs) -- reimplemented TPU-first, not ported.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fp import LIMB_BITS, LIMB_MASK, FieldSpec

# Each grid step processes BS*128 elements; each limb is a [BS, 128] tile.
# Swept on v5e: BS=8 -> 258 M muls/s, BS=32 -> 180 M (register spill with 48
# live [32,128] accumulators).  Env knob for re-sweeps on other chips.
import os as _os

BS = int(_os.environ.get("RIPP_FP_PALLAS_BS", "8"))
TILE_E = BS * 128

# Batches smaller than this stay on the XLA path (padding waste + pallas
# dispatch overhead beat the win).  Static shape decision at trace time.
MIN_PALLAS_BATCH = 256


def mont_mul_limbs(nl: int, p_limbs, n0inv: int, a, b):
    """Unrolled CIOS Montgomery product on lists of per-limb arrays.

    a, b: length-nl lists of uint32 arrays (any equal shape, limbs < 2^16,
    value < p). Returns the canonical product limbs as a list. This is the
    shared body of the standalone fp_mul kernel AND every fused program
    kernel (ops/kexec.py), so kernel-variant sweeps improve both.
    All limb indices are Python ints, fully unrolled: straight-line VPU
    code with no gathers, scans, or scatters.
    """
    mask = LIMB_MASK
    n0 = int(n0inv)
    pl_consts = [int(v) for v in p_limbs]
    zero = jnp.zeros_like(a[0])

    # Schoolbook product in redundant form: acc[k] holds value*2^(16k),
    # each < 48*(2^16-1) < 2^22 so uint32 never overflows.
    # Interleaved accumulate (NOT pre-computing all products then adding:
    # swept on v5e, holding nl live products raises register pressure and
    # loses ~20% -- 213 vs 258 M muls/s).
    acc = [zero] * (2 * nl)
    for i in range(nl):
        ai = a[i]
        for j in range(nl):
            pr = ai * b[j]
            acc[i + j] = acc[i + j] + (pr & mask)
            acc[i + j + 1] = acc[i + j + 1] + (pr >> LIMB_BITS)

    # Montgomery reduction: nl rounds, each cancels the lowest limb by
    # adding m*p (m = acc0 * -p^-1 mod 2^16) and shifts down one limb
    # (the shift is just list renaming -- free in unrolled code).
    for _ in range(nl):
        m = ((acc[0] & mask) * n0) & mask
        for j in range(nl):
            q = m * pl_consts[j]
            acc[j] = acc[j] + (q & mask)
            acc[j + 1] = acc[j + 1] + (q >> LIMB_BITS)
        acc[1] = acc[1] + (acc[0] >> LIMB_BITS)
        acc = acc[1:]

    # acc now has nl redundant limbs of U = (a*b + m*p)/R < 2p.
    # Sequential carry normalization to 16-bit limbs.
    res = []
    c = zero
    for k in range(nl):
        v = acc[k] + c
        res.append(v & mask)
        c = v >> LIMB_BITS
    # U < 2p < 2^(16*nl) so the final carry is always zero.

    # Conditional subtract p (one pass suffices since U < 2p).
    diff = []
    borrow = zero
    for k in range(nl):
        v = res[k] + ((1 << LIMB_BITS) - pl_consts[k]) - borrow
        diff.append(v & mask)
        borrow = 1 - (v >> LIMB_BITS)
    geq = borrow == 0  # res >= p
    return [jnp.where(geq, diff[k], res[k]) for k in range(nl)]


def _mul_kernel(nl: int, p_limbs, n0inv: int):
    """Standalone batched-mul kernel over the shared CIOS body."""

    def kernel(a_ref, b_ref, o_ref):
        a = [a_ref[i, 0] for i in range(nl)]
        b = [b_ref[i, 0] for i in range(nl)]
        out = mont_mul_limbs(nl, p_limbs, n0inv, a, b)
        for k in range(nl):
            o_ref[k, 0] = out[k]

    return kernel


def _mul_kernel_hybrid(nl: int, p_limbs, n0inv: int):
    """Hybrid 8x16 CIOS: the schoolbook multiplies 8-bit chunks of `a`
    against 16-bit limbs of `b`, so every partial product (< 2^24)
    accumulates DIRECTLY into a redundant 8-bit-position accumulator --
    no per-product hi/lo split (2 ops/product vs 5).  The Montgomery
    reduction keeps radix 2^16 (same serial depth as the classic kernel)
    but splits m into 8-bit halves for the same no-split accumulation.
    ~16% fewer VPU ops than _mul_kernel at equal m-chain latency.

    Bounds: any 8-bit position receives <= 2*nl products of < 2^24 plus
    small carries => < 2^30.7 for nl <= 48 (BW6-761) -- no uint32
    overflow.  m16 reconstruction and the shift-out carry are exact
    because the cancelled 16-bit group is ~ 0 mod 2^16 (so its low byte
    is 0 mod 2^8).
    """
    n0 = int(n0inv)
    p16 = [int(v) for v in p_limbs]

    def kernel(a_ref, b_ref, o_ref):
        a = [a_ref[i, 0] for i in range(nl)]
        b = [b_ref[i, 0] for i in range(nl)]
        zero = jnp.zeros_like(a[0])

        a8 = []
        for i in range(nl):
            a8.append(a[i] & 0xFF)
            a8.append(a[i] >> 8)

        acc = [zero] * (4 * nl - 2)
        for i2 in range(2 * nl):
            ai = a8[i2]
            for j in range(nl):
                acc[i2 + 2 * j] = acc[i2 + 2 * j] + ai * b[j]

        for _ in range(nl):
            t16 = (acc[0] + ((acc[1] & 0xFF) << 8)) & 0xFFFF
            m16 = (t16 * n0) & 0xFFFF
            mlo = m16 & 0xFF
            mhi = m16 >> 8
            for j in range(nl):
                acc[2 * j] = acc[2 * j] + mlo * p16[j]
                acc[2 * j + 1] = acc[2 * j + 1] + mhi * p16[j]
            # shift out the cancelled 16-bit group; exact carry (see doc)
            t = (acc[0] >> 8) + acc[1]
            acc[2] = acc[2] + (t >> 8)
            acc = acc[2:]

        # normalize 8-bit chunks of U < 2p (2*nl chunks after carries)
        acc = acc + [zero] * (2 * nl - len(acc))
        res8 = []
        c = zero
        for k in range(2 * nl):
            v = acc[k] + c
            res8.append(v & 0xFF)
            c = v >> 8
        res = [res8[2 * k] | (res8[2 * k + 1] << 8) for k in range(nl)]

        diff = []
        borrow = zero
        for k in range(nl):
            v = res[k] + ((1 << LIMB_BITS) - p16[k]) - borrow
            diff.append(v & LIMB_MASK)
            borrow = 1 - (v >> LIMB_BITS)
        geq = borrow == 0
        for k in range(nl):
            o_ref[k, 0] = jnp.where(geq, diff[k], res[k])

    return kernel


# Kernel variant knob.  Measured on v5e: cios16 258.4 M muls/s beats
# hybrid8's 201.9 M despite hybrid8 having ~16% fewer ALU ops -- the 94
# live 8-bit-position accumulators (vs 48) cost more in register/VMEM
# pressure than the saved ops.  Lesson recorded; default stays cios16.
KERNEL_VARIANT = _os.environ.get("RIPP_FP_PALLAS_KERNEL", "cios16")


@functools.lru_cache(maxsize=None)
def _mul_call(spec: FieldSpec, nb: int):
    """Cached pallas_call closure for (modulus, grid size)."""
    nl = spec.nl
    if KERNEL_VARIANT == "hybrid8":
        kernel = _mul_kernel_hybrid(nl, spec.p_limbs, spec.n0inv)
    else:
        kernel = _mul_kernel(nl, spec.p_limbs, spec.n0inv)
    spec_in = pl.BlockSpec(
        (nl, 1, BS, 128), lambda j: (0, j, 0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[spec_in, spec_in],
        out_specs=spec_in,
        out_shape=jax.ShapeDtypeStruct((nl, nb, BS, 128), jnp.uint32),
    )


def fp_mul(spec: FieldSpec, a, b):
    """Batched Montgomery product via the Pallas kernel.

    a, b: uint32 [..., NL] Montgomery-form limb arrays (broadcastable).
    Returns the same layout.  Caller guarantees TPU backend.
    """
    a, b = jnp.broadcast_arrays(a, b)
    nl = spec.nl
    batch_shape = a.shape[:-1]
    B = 1
    for d in batch_shape:
        B *= d
    nb = -(-B // TILE_E)
    pad = nb * TILE_E - B

    def to_limb_major(x):
        x = x.reshape(B, nl)
        if pad:
            x = jnp.concatenate(
                [x, jnp.zeros((pad, nl), jnp.uint32)], axis=0
            )
        return x.T.reshape(nl, nb, BS, 128)

    out = _mul_call(spec, nb)(to_limb_major(a), to_limb_major(b))
    out = out.reshape(nl, nb * TILE_E).T
    if pad:
        out = out[:B]
    return out.reshape(*batch_shape, nl)
