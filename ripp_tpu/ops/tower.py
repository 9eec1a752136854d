"""Device extension towers: Fp2/Fp6/Fp12 on limb arrays.

Elements are pytrees (nested tuples) of uint32 limb arrays, mirroring the
host representation exactly, and the tower algebra REUSES the host generic
QuadExtOps/CubicExtOps classes (ripp_tpu/host/field.py) over a DevFp base -
one source of truth for Karatsuba/Toom formulas, differential-tested anyway.

The non-residue multiplications are specialized per curve (e.g. BLS12-381:
beta = -1 so u-mult is a negation; xi = 1+u so xi-mult is one add/sub pair).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from ..host.curves import PairingCurve, bls12_377, bls12_381, bls12_toy
from ..host.field import CubicExtOps, QuadExtOps
from .fp import DevFp, FieldSpec, make_spec


def tree_select(mask, a, b):
    """Select between two equal-structure limb pytrees with a batch-shaped
    boolean mask (broadcast over the limb axis)."""
    return jax.tree.map(
        lambda x, y: jnp.where(mask[..., None], x, y), a, b
    )


class DevTower:
    """Bundles DevFp + device fp2/fp6/fp12 ops for one pairing curve."""

    def __init__(self, curve: PairingCurve):
        self.curve = curve
        self.spec_fp = make_spec(curve.name + ".fp", curve.p)
        self.spec_fr = make_spec(curve.name + ".fr", curve.r)
        self.fp = DevFp(self.spec_fp)
        self.fr = DevFp(self.spec_fr)

        p = curve.p
        beta = curve.tower.beta  # u^2 = beta
        fp = self.fp

        # --- u-multiplication (Fp2 non-residue) -----------------------------
        if beta == p - 1:
            mul_beta = fp.neg
        else:
            k = (p - beta) % p
            if k < 16:  # beta = -k for small k
                mul_beta = lambda a: fp.neg(fp.mul_small(a, k))
            else:
                beta_c = fp.const(beta)
                mul_beta = lambda a: fp.mul(a, beta_c)
        self.fp2 = QuadExtOps(fp, mul_beta, name=curve.name + ".dev.fp2")

        # --- xi-multiplication (Fp6/Fp12 non-residue, xi in Fp2) ------------
        xi = curve.tower.xi
        fp2 = self.fp2
        if xi == (1, 1):
            # (a0 + a1 u)(1 + u) = (a0 + beta*a1) + (a0 + a1) u
            def mul_xi(a):
                return (fp.add(a[0], mul_beta(a[1])), fp.add(a[0], a[1]))
        elif xi == (0, 1):
            # (a0 + a1 u) * u = beta*a1 + a0 u
            def mul_xi(a):
                return (mul_beta(a[1]), a[0])
        else:
            xi_c = (fp.const(xi[0]), fp.const(xi[1]))

            def mul_xi(a):
                return fp2.mul(a, xi_c)

        self.mul_xi = mul_xi
        self.fp6 = CubicExtOps(fp2, mul_xi, name=curve.name + ".dev.fp6")
        self.fp12 = QuadExtOps(
            self.fp6, self.fp6.mul_by_x, name=curve.name + ".dev.fp12"
        )

    # --- host <-> device conversion (single elements and vectors) -----------
    def _to_dev(self, F_host, F_flat_deg, vals):
        """vals: list of host tower elements for a field of degree d ->
        pytree of [n, NL] arrays."""
        import numpy as np

        spec = self.spec_fp
        flat = [F_host.tolist(v) for v in vals]  # [n][d] ints
        d = F_flat_deg
        arrs = []
        for i in range(d):
            arrs.append(jnp.asarray(spec.to_mont_limbs([row[i] for row in flat])))
        return self._nest(arrs, d)

    @staticmethod
    def _nest(arrs, d):
        if d == 1:
            return arrs[0]
        if d == 2:
            return (DevTower._nest(arrs[: d // 2], d // 2),
                    DevTower._nest(arrs[d // 2 :], d // 2))
        if d == 12:
            # fp12 = (fp6, fp6); fp6 = (fp2, fp2, fp2)
            return (DevTower._nest(arrs[:6], 6), DevTower._nest(arrs[6:], 6))
        if d == 6:
            return (DevTower._nest(arrs[0:2], 2), DevTower._nest(arrs[2:4], 2),
                    DevTower._nest(arrs[4:6], 2))
        raise ValueError(d)

    @staticmethod
    def _flatten(tree):
        if isinstance(tree, tuple):
            out = []
            for t in tree:
                out.extend(DevTower._flatten(t))
            return out
        return [tree]

    def fp_to_dev(self, vals):
        return self._to_dev(self.curve.tower.fp, 1, vals)

    def fp2_to_dev(self, vals):
        return self._to_dev(self.curve.tower.fp2, 2, vals)

    def fp12_to_dev(self, vals):
        return self._to_dev(self.curve.tower.fp12, 12, vals)

    def fr_to_dev(self, ints):
        return jnp.asarray(self.spec_fr.to_mont_limbs(list(ints)))

    def _from_dev(self, F_host, tree):
        arrs = self._flatten(tree)
        cols = [self.spec_fp.from_mont_limbs(a) for a in arrs]
        n = len(cols[0])
        return [F_host.fromlist([c[i] for c in cols]) for i in range(n)]

    def fp_from_dev(self, tree):
        return self.spec_fp.from_mont_limbs(tree)

    def fp2_from_dev(self, tree):
        return self._from_dev(self.curve.tower.fp2, tree)

    def fp12_from_dev(self, tree):
        return self._from_dev(self.curve.tower.fp12, tree)

    def fr_from_dev(self, arr):
        return self.spec_fr.from_mont_limbs(arr)


@functools.lru_cache(maxsize=None)
def dev_tower(curve_name: str) -> DevTower:
    if curve_name == "bls12_381":
        return DevTower(bls12_381())
    if curve_name == "bls12_377":
        return DevTower(bls12_377())
    if curve_name == "bls12_toy":
        return DevTower(bls12_toy())
    raise ValueError(curve_name)
