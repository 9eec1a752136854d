"""R1CS gadgets for in-circuit BLS12-377 pairing verification.

The reference's one-layer-recursion (`olr`) aggregation baseline proves a
BW6-761 Groth16 SNARK whose circuit verifies BLS12-377 Groth16 proofs
in-circuit (/root/reference/benches/benches/groth16_aggregation/bench.rs:
84-161, using ark r1cs-std's PairingVar).  BW6-761 was constructed so its
scalar field equals BLS12-377's base field q, so all Fq arithmetic is
native in the circuit: one R1CS constraint per Fq multiplication.

Design: `GadgetFp` is a FieldOps whose elements are LinCombs over the
circuit's native field and whose mul/inv emit constraints (constants fold
linearly, inverses are witnessed and checked).  The whole Fq2/Fq6/Fq12
tower is then built from the SAME generic QuadExtOps/CubicExtOps classes
the host field layer uses (host/field.py) -- gadget values equal host
tower values by construction, which the tests check at every level.

The Miller loop mirrors host/pairing.py miller_loop line-for-line (affine
arithmetic in E(Fq12)); the final exponentiation uses the same exact BLS12
seed ladder as host/pairing.py hard_part_ladder.  Constraint counts favor
clarity over minimality (full-Fq12 affine arithmetic, ~25k constraints
per Miller loop); a twist-coordinate sparse version is a follow-up.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

from ..host.curves import PairingCurve
from ..host.field import CubicExtOps, FieldOps, QuadExtOps
from .groth16 import LinComb, R1CS

# --------------------------------------------------------------------------
# circuit builder (generic field version of blake2s_circuit._Builder)
# --------------------------------------------------------------------------


class CircuitBuilder:
    """R1CS builder with a witness-assignment trace over a prime field r.

    Variables: z = (1, publics..., witnesses...).  Public values must be
    fully populated (``pub_vals``) before any witness is allocated, since
    witness indices start at 1 + num_public."""

    def __init__(self, r: int, num_public: int):
        self.r = r
        self.num_public = num_public
        self.pub_vals: List[int] = []
        self.wit_vals: List[int] = []
        self.constraints: List[Tuple[LinComb, LinComb, LinComb]] = []
        # incremental assignment mirror: z[i] valid for all allocated i
        # (publics must be set via set_publics before the first alloc)
        self._z: List[int] = [1]

    def set_publics(self, vals: Sequence[int]) -> None:
        assert not self.wit_vals and not self.pub_vals
        self.pub_vals = [v % self.r for v in vals]
        assert len(self.pub_vals) == self.num_public
        self._z.extend(self.pub_vals)

    def alloc(self, value: int) -> int:
        assert len(self._z) == 1 + self.num_public + len(self.wit_vals), \
            "set_publics must run before the first alloc"
        self.wit_vals.append(value % self.r)
        self._z.append(value % self.r)
        return 1 + self.num_public + len(self.wit_vals) - 1

    def enforce(self, a: LinComb, b: LinComb, c: LinComb) -> None:
        self.constraints.append((a, b, c))

    def assignment(self) -> List[int]:
        assert len(self.pub_vals) == self.num_public
        return [1] + self.pub_vals + self.wit_vals

    def eval_lc(self, lc: LinComb) -> int:
        z = self._z
        return sum(co * z[i] for i, co in lc.items()) % self.r

    def finish(self) -> Tuple[R1CS, List[int]]:
        cs = R1CS(num_public=self.num_public,
                  num_witness=len(self.wit_vals),
                  constraints=self.constraints)
        return cs, self.assignment()


# --------------------------------------------------------------------------
# native-field gadget ops
# --------------------------------------------------------------------------


def _lc_axpy(out: Dict[int, int], lc: LinComb, c: int, r: int) -> None:
    for i, v in lc.items():
        nv = (out.get(i, 0) + c * v) % r
        if nv:
            out[i] = nv
        elif i in out:
            del out[i]


class GadgetFp(FieldOps):
    """Prime-field ops over LinComb elements, emitting R1CS constraints.

    add/sub/neg/constant-mul are linear (free); mul of two non-constant
    elements allocates the product as a fresh witness with one constraint;
    inv witnesses the inverse and enforces a * a^-1 = 1."""

    degree = 1

    def __init__(self, bld: CircuitBuilder):
        self.bld = bld
        self.p = bld.r
        self.name = "gadget.Fq"

    # -- helpers -------------------------------------------------------------
    @staticmethod
    def is_const(a: LinComb) -> bool:
        return all(i == 0 for i in a)

    def const_val(self, a: LinComb) -> int:
        return a.get(0, 0) % self.p

    def value(self, a: LinComb) -> int:
        return self.bld.eval_lc(a)

    # -- FieldOps ------------------------------------------------------------
    def zero(self) -> LinComb:
        return {}

    def one(self) -> LinComb:
        return {0: 1}

    def from_int(self, n: int) -> LinComb:
        n %= self.p
        return {0: n} if n else {}

    def add(self, a: LinComb, b: LinComb) -> LinComb:
        out = dict(a)
        _lc_axpy(out, b, 1, self.p)
        return out

    def sub(self, a: LinComb, b: LinComb) -> LinComb:
        out = dict(a)
        _lc_axpy(out, b, -1, self.p)
        return out

    def neg(self, a: LinComb) -> LinComb:
        return {i: (-v) % self.p for i, v in a.items()}

    def scale_const(self, a: LinComb, c: int) -> LinComb:
        c %= self.p
        if c == 0:
            return {}
        return {i: (v * c) % self.p for i, v in a.items()}

    def mul(self, a: LinComb, b: LinComb) -> LinComb:
        if self.is_const(a):
            return self.scale_const(b, self.const_val(a))
        if self.is_const(b):
            return self.scale_const(a, self.const_val(b))
        prod = self.value(a) * self.value(b) % self.p
        idx = self.bld.alloc(prod)
        self.bld.enforce(a, b, {idx: 1})
        return {idx: 1}

    def inv(self, a: LinComb) -> LinComb:
        if self.is_const(a):
            return {0: pow(self.const_val(a), -1, self.p)}
        w = pow(self.value(a), -1, self.p)  # raises if a == 0
        idx = self.bld.alloc(w)
        self.bld.enforce(a, {idx: 1}, {0: 1})
        return {idx: 1}

    def mul_int(self, a: LinComb, n: int) -> LinComb:
        return self.scale_const(a, n)

    def eq(self, a: LinComb, b: LinComb) -> bool:
        # structural equality of LinCombs (used by is_zero on constants)
        return a == b

    def witness(self, value: int) -> LinComb:
        """Allocate an unconstrained witness element."""
        return {self.bld.alloc(value): 1}

    def enforce_eq(self, a: LinComb, b: LinComb) -> None:
        self.bld.enforce(self.sub(a, b), {0: 1}, {})


# --------------------------------------------------------------------------
# gadget tower (same generic extension classes as the host tower)
# --------------------------------------------------------------------------


class GadgetTower:
    """Fq2/Fq6/Fq12 over GadgetFp, mirroring host Tower.build exactly
    (same beta/xi non-residues, Frobenius constants taken from the host
    tower as integers -- Frobenius is linear so it emits no constraints)."""

    def __init__(self, curve: PairingCurve, bld: CircuitBuilder):
        self.curve = curve
        self.host_t = curve.tower
        self.fq = GadgetFp(bld)
        fq = self.fq
        beta = self.host_t.beta

        def mul_beta(a):
            return fq.scale_const(a, beta)

        self.fp2 = QuadExtOps(fq, mul_beta, name="gadget.Fq2")
        xi = self.host_t.xi
        xi_lc = (fq.from_int(xi[0]), fq.from_int(xi[1]))

        def mul_xi(a):
            return self.fp2.mul(a, xi_lc)  # constant -> linear

        self.fp6 = CubicExtOps(self.fp2, mul_xi, name="gadget.Fq6")

        def mul_v(a):
            return self.fp6.mul_by_x(a)

        self.fp12 = QuadExtOps(self.fp6, mul_v, name="gadget.Fq12")

    # -- embed / extract -----------------------------------------------------
    def const_fp2(self, a: Tuple[int, int]):
        return (self.fq.from_int(a[0]), self.fq.from_int(a[1]))

    def embed_fp12(self, a):
        """Host Fq12 value (int tree) -> constant gadget element."""
        return _tree_map_ints(a, self.fq.from_int)

    def witness_fp12(self, a):
        return _tree_map_ints(a, lambda n: self.fq.witness(n))

    def value_fp12(self, a):
        return _tree_map_lcs(a, self.fq.value)

    # -- linear maps ---------------------------------------------------------
    def conj(self, a):
        return (a[0], self.fp6.neg(a[1]))

    def frob_fp2(self, a, power: int = 1):
        if power % 2 == 0:
            return a
        return (a[0], self.fq.scale_const(a[1], self.host_t.frob2_c1[1]))

    def frob_fp6(self, a, power: int = 1):
        i = power % 6
        t = self.host_t
        return (
            self.frob_fp2(a[0], power),
            self.fp2.mul(self.frob_fp2(a[1], power),
                         self.const_fp2(t.frob6_c1[i])),
            self.fp2.mul(self.frob_fp2(a[2], power),
                         self.const_fp2(t.frob6_c2[i])),
        )

    def frob_fp12(self, a, power: int = 1):
        i = power % 12
        t = self.host_t
        c0 = self.frob_fp6(a[0], power)
        g = self.const_fp2(t.frob12_c1[i])
        b = tuple(
            self.fp2.mul(self.frob_fp2(a[1][j], power), g2)
            for j, g2 in (
                (0, g),
                (1, self.fp2.mul(g, self.const_fp2(t.frob6_c1[i]))),
                (2, self.fp2.mul(g, self.const_fp2(t.frob6_c2[i]))),
            )
        )
        return (c0, b)

    # -- cyclotomic exponentiation (static exponent) ------------------------
    def cyc_pow(self, a, e: int):
        F = self.fp12
        if e < 0:
            return self.cyc_pow(self.conj(a), -e)
        if e == 0:
            return F.one()
        acc = a
        for bit in bin(e)[3:]:
            acc = F.sqr(acc)
            if bit == "1":
                acc = F.mul(acc, a)
        return acc


def _tree_map_ints(tree, f):
    if isinstance(tree, tuple):
        return tuple(_tree_map_ints(t, f) for t in tree)
    return f(tree)


def _tree_map_lcs(tree, f):
    if isinstance(tree, tuple):
        return tuple(_tree_map_lcs(t, f) for t in tree)
    return f(tree)


# --------------------------------------------------------------------------
# pairing gadget (mirrors host/pairing.py)
# --------------------------------------------------------------------------


class PairingGadget:
    """In-circuit optimal ate pairing for a BLS12 curve whose base field
    equals the circuit's native field (BLS12-377 inside BW6-761)."""

    def __init__(self, curve: PairingCurve, bld: CircuitBuilder):
        self.curve = curve
        self.t = GadgetTower(curve, bld)

    # G1 points: (x_lc, y_lc); G2 points: ((x0,x1), (y0,y1)) lc pairs
    def witness_g1(self, pt) -> Tuple[LinComb, LinComb]:
        fq = self.t.fq
        x, y = fq.witness(pt[0]), fq.witness(pt[1])
        # on-curve check: y^2 = x^3 + b
        b = self.curve.g1.b
        y2 = fq.mul(y, y)
        x3 = fq.mul(fq.mul(x, x), x)
        fq.enforce_eq(y2, fq.add(x3, fq.from_int(b)))
        return (x, y)

    def witness_g2(self, pt):
        F2 = self.t.fp2
        fq = self.t.fq
        x = (fq.witness(pt[0][0]), fq.witness(pt[0][1]))
        y = (fq.witness(pt[1][0]), fq.witness(pt[1][1]))
        b2 = self.t.const_fp2(self.curve.g2.b)
        y2 = F2.sqr(y)
        x3 = F2.mul(F2.sqr(x), x)
        rhs = F2.add(x3, b2)
        fq.enforce_eq(y2[0], rhs[0])
        fq.enforce_eq(y2[1], rhs[1])
        return (x, y)

    def _embed_g1(self, pt):
        """Gadget G1 point -> E(Fq12) affine (host embed_g1 layout)."""
        t = self.t
        z2 = t.fp2.zero()

        def emb(lc):
            return ((lc, t.fq.zero()), z2, z2), (z2, z2, z2)

        return (emb(pt[0]), emb(pt[1]))

    def _embed_g2(self, pt):
        """Gadget G2 twist point -> E(Fq12) affine (host embed_g2)."""
        t = self.t
        F2 = t.fp2
        z2 = F2.zero()
        x, y = pt
        if self.curve.twist_type == "D":
            X = ((z2, x, z2), (z2, z2, z2))
            Y = ((z2, z2, z2), (z2, y, z2))
        else:
            xi_inv = self.curve.tower.fp2.inv(self.curve.tower.xi)
            ci = t.const_fp2(xi_inv)
            X = ((z2, z2, F2.mul(x, ci)), (z2, z2, z2))
            Y = ((z2, z2, z2), (z2, F2.mul(y, ci), z2))
        return (X, Y)

    def miller_loop(self, p1, q2):
        """f_{|x|,Q}(P), mirroring host/pairing.py miller_loop exactly
        (affine arithmetic in E(Fq12)); returns a gadget Fq12 element
        whose value equals the host Miller value."""
        t = self.t
        F = t.fp12
        xP, yP = self._embed_g1(p1)
        xQ, yQ = self._embed_g2(q2)

        f = F.one()
        Tx, Ty = xQ, yQ
        for bit in bin(abs(self.curve.x))[3:]:
            lam = F.mul(F.mul_int(F.sqr(Tx), 3), F.inv(F.add(Ty, Ty)))
            l = F.sub(F.sub(yP, Ty), F.mul(lam, F.sub(xP, Tx)))
            f = F.mul(F.sqr(f), l)
            x3 = F.sub(F.sqr(lam), F.add(Tx, Tx))
            y3 = F.sub(F.mul(lam, F.sub(Tx, x3)), Ty)
            Tx, Ty = x3, y3
            if bit == "1":
                lam = F.mul(F.sub(yQ, Ty), F.inv(F.sub(xQ, Tx)))
                l = F.sub(F.sub(yP, Ty), F.mul(lam, F.sub(xP, Tx)))
                f = F.mul(f, l)
                x3 = F.sub(F.sub(F.sqr(lam), Tx), xQ)
                y3 = F.sub(F.mul(lam, F.sub(Tx, x3)), Ty)
                Tx, Ty = x3, y3
        if self.curve.x < 0:
            f = t.conj(f)
        return f

    def final_exponentiation(self, f):
        """f^((q^12-1)/r) via the same easy part + exact BLS12 seed
        ladder as host/pairing.py (hard_part_ladder)."""
        t = self.t
        F = t.fp12
        g = F.mul(t.conj(f), F.inv(f))
        g = F.mul(t.frob_fp12(g, 2), g)
        x = self.curve.x
        g0 = t.cyc_pow(g, (x - 1) // 3)
        g1 = t.cyc_pow(g0, x - 1)
        g2 = F.mul(t.cyc_pow(g1, x), t.frob_fp12(g1, 1))
        g3 = F.mul(
            F.mul(t.cyc_pow(t.cyc_pow(g2, x), x), t.frob_fp12(g2, 2)),
            t.conj(g2),
        )
        return F.mul(g3, g)

    def enforce_fp12_eq(self, a, b) -> None:
        """a == b slot-wise (b may be a constant embedding)."""
        fq = self.t.fq
        for la, lb in zip(_flatten(a), _flatten(b)):
            fq.enforce_eq(la, lb)


def _flatten(tree):
    if isinstance(tree, tuple):
        out = []
        for t in tree:
            out.extend(_flatten(t))
        return out
    return [tree]
