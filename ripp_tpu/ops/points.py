"""Device curve contexts: bind towers + curve kernels + host conversions.

`DevCurveCtx` is the device-side counterpart of host `PairingCurve`: G1 over
DevFp, G2 over device Fp2, scalar helpers over Fr, with host<->device point
conversion (affine host tuples <-> projective limb pytrees).
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..host.curves import PairingCurve
from .curve import DevSWCurve
from .fp import LIMB_BITS
from .tower import DevTower, dev_tower, tree_select


class DevCurveCtx:
    def __init__(self, tower: DevTower):
        self.t = tower
        self.host = tower.curve
        self._bits_jits = {}
        c = self.host
        fp, fp2 = tower.fp, tower.fp2

        b3_g1 = fp.const(3 * c.g1.b % c.p)
        self.g1 = DevSWCurve(fp, b3_g1, name=c.name + ".dev.g1")
        b3_g2_host = c.tower.fp2.mul_int(c.g2.b, 3)
        b3_g2 = (fp.const(b3_g2_host[0]), fp.const(b3_g2_host[1]))
        self.g2 = DevSWCurve(fp2, b3_g2, name=c.name + ".dev.g2")

        # fused one-launch ladders (TPU dispatch in scalar_mul_bits)
        def _ladder(group):
            def make():
                from .curve_fused import fused_ladder

                return fused_ladder(self, group)

            return make

        self.g1._fused_ladder_factory = _ladder("g1")
        self.g2._fused_ladder_factory = _ladder("g2")

    # --- host -> device -------------------------------------------------------
    def g1_to_dev(self, pts: Sequence):
        """List of host affine G1 (or None) -> projective device point batch."""
        xs = [p[0] if p is not None else 0 for p in pts]
        ys = [p[1] if p is not None else 1 for p in pts]
        inf = jnp.asarray([p is None for p in pts])
        x = self.t.fp_to_dev(xs)
        y = self.t.fp_to_dev(ys)
        return self.g1.from_affine(x, y, inf)

    def g2_to_dev(self, pts: Sequence):
        f2 = self.host.tower.fp2
        xs = [p[0] if p is not None else f2.zero() for p in pts]
        ys = [p[1] if p is not None else f2.one() for p in pts]
        inf = jnp.asarray([p is None for p in pts])
        x = self.t.fp2_to_dev(xs)
        y = self.t.fp2_to_dev(ys)
        return self.g2.from_affine(x, y, inf)

    # --- device -> host -------------------------------------------------------
    def g1_from_dev(self, P) -> List:
        x, y, inf = self.g1.normalize(P)
        xs = self.t.fp_from_dev(x)
        ys = self.t.fp_from_dev(y)
        infs = np.asarray(inf).reshape(-1)
        return [None if i else (a, b) for a, b, i in zip(xs, ys, infs)]

    def g2_from_dev(self, P) -> List:
        x, y, inf = self.g2.normalize(P)
        xs = self.t.fp2_from_dev(x)
        ys = self.t.fp2_from_dev(y)
        infs = np.asarray(inf).reshape(-1)
        return [None if i else (a, b) for a, b, i in zip(xs, ys, infs)]

    # --- scalars ---------------------------------------------------------------
    def scalar_bits(self, k: int, nbits: int) -> jnp.ndarray:
        """Host int -> MSB-first bit array [nbits] (shared-scalar form)."""
        k = int(k)
        return jnp.asarray(
            [(k >> (nbits - 1 - i)) & 1 for i in range(nbits)], dtype=jnp.uint32
        )

    def scalars_to_bits(self, ks: Sequence[int], nbits: int) -> jnp.ndarray:
        """Host ints -> MSB-first bit matrix [n, nbits]."""
        out = np.zeros((len(ks), nbits), dtype=np.uint32)
        for j, k in enumerate(ks):
            k = int(k)
            for i in range(nbits):
                out[j, i] = (k >> (nbits - 1 - i)) & 1
        return jnp.asarray(out)

    def fr_limbs_to_bits(self, fr_mont, nbits: Optional[int] = None):
        """Device Fr Montgomery limbs [..., NL] -> MSB-first bits
        [..., nbits] (device-side: demontgomerize then bit-slice).
        Jitted per nbits: the eager form dispatched ~160 single-op XLA
        programs per call, which dominates wall-clock on the axon TPU."""
        fr = self.t.fr
        nbits = nbits or fr.p.bit_length()
        fn = self._bits_jits.get(nbits)
        if fn is None:
            def impl(arr):
                # out of Montgomery form: mont-mul by plain 1 (R^0)
                one_plain = (
                    jnp.zeros((fr.nl,), dtype=jnp.uint32).at[0].set(1)
                )
                canon = fr.mul(arr, one_plain)
                bits = []
                for i in range(nbits - 1, -1, -1):
                    limb = i // LIMB_BITS
                    off = i % LIMB_BITS
                    bits.append((canon[..., limb] >> off) & 1)
                return jnp.stack(bits, axis=-1)

            fn = jax.jit(impl)
            self._bits_jits[nbits] = fn
        return fn(fr_mont)


@functools.lru_cache(maxsize=None)
def dev_ctx(curve_name: str) -> DevCurveCtx:
    return DevCurveCtx(dev_tower(curve_name))


class _BW6FieldShim:
    """Minimal DevTower stand-in for BW6-761's group side: both G1 and G2
    live over Fp (761-bit, 48 limbs), scalars over Fr = BLS12-377's base
    field (377-bit, 24 limbs).  No tower — BW6's GT math stays on host
    (host/bw6.py); this shim only feeds the group/MSM kernels."""

    def __init__(self, curve):
        from .fp import DevFp, make_spec

        self.curve = curve
        self.spec_fp = make_spec(curve.name + ".fp", curve.p)
        self.spec_fr = make_spec(curve.name + ".fr", curve.r)
        self.fp = DevFp(self.spec_fp)
        self.fr = DevFp(self.spec_fr)

    def fp_to_dev(self, vals):
        return jnp.asarray(self.spec_fp.to_mont_limbs(
            [v if isinstance(v, int) else int(v) for v in vals]
        ))

    def fp_from_dev(self, tree):
        return self.spec_fp.from_mont_limbs(tree)

    def fr_to_dev(self, ints):
        return jnp.asarray(self.spec_fr.to_mont_limbs(list(ints)))

    def fr_from_dev(self, arr):
        return self.spec_fr.from_mont_limbs(arr)


class BW6DevCtx(DevCurveCtx):
    """Device context for BW6-761's groups (G1 and G2 are both over Fp:
    G2 is a sextic twist over the same base field, host/curves.py:247-264).
    Supports the PointVec/FrVec + fixed-base/Pippenger MSM surface used by
    the device-batched Groth16 prover (applications/groth16.py
    setup_device/prove_batch), so `olr`/`complete_circuit` outer proofs
    can ride the chip.  Pairing-side (GT) ops stay on host."""

    def __init__(self, curve):
        self.t = _BW6FieldShim(curve)
        self.host = curve
        self._bits_jits = {}
        fp = self.t.fp
        self.g1 = DevSWCurve(fp, fp.const(3 * curve.g1.b % curve.p),
                             name=curve.name + ".dev.g1")
        self.g2 = DevSWCurve(fp, fp.const(3 * curve.g2.b % curve.p),
                             name=curve.name + ".dev.g2")

    # G2 affine points are (x, y) host ints, same layout as G1
    g2_to_dev = DevCurveCtx.g1_to_dev
    g2_from_dev = DevCurveCtx.g1_from_dev


@functools.lru_cache(maxsize=None)
def bw6_dev_ctx() -> BW6DevCtx:
    from ..host.curves import bw6_761

    return BW6DevCtx(bw6_761())
