"""BW6-761 host pairing (Tate pairing with denominator elimination).

The reference consumes BW6-761 only through ark-bw6-761's `Pairing`
implementation in the one-layer-recursion benchmark
(/root/reference/benches/benches/groth16_aggregation/bench.rs:84-161), where
a BW6-761 Groth16 SNARK verifies BLS12-377 proofs in-circuit.  This module
supplies the host ground-truth pairing for that curve.

Field tower: Fp6 = Fp[z]/(z^6 + 4) as a direct sextic extension (the
published tower Fp3 = Fp[u]/(u^3 + 4), Fp6 = Fp3[v]/(v^2 - u) is the same
field with u = z^2, v = z; the direct form keeps host arithmetic simple).
Irreducibility of z^6 + 4 is asserted at construction (-4 must be a
quadratic and cubic non-residue mod p).

Both G1: y^2 = x^3 - 1 and G2': y^2 = x^3 + 4 are defined over Fp (k = 6
sextic twist).  The untwist psi: G2' -> E(Fp6) is

    psi(x, y) = (x / z^2, y / z^3) = ((-x/4) z^4, (-y/4) z^3)

using 1/z = -z^5/4.  Both coordinates are single-monomial ("sparse"), so
Miller line evaluations touch only the z^0, z^3, z^4 coefficients.

Pairing: reduced Tate, e(P, Q) = f_{r,P}(psi(Q))^((p^6-1)/r), Miller loop
over the 377-bit r with standard denominator elimination — vertical-line
values lie in Fp3 = Fp[z^2] (x-coordinates of psi(Q) are z^4-monomials and
subtraction of Fp constants stays in Fp[z^2]), and every Fp3 element is
killed by the (p^3 - 1) factor of the final exponent.  The loop is the
textbook Tate ladder, not ark's optimal-ate — this is a ground-truth/
fixture component, not a hot path (the reference's own use is inside a
benchmark baseline, not protocol code).
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

from .curves import BW6Curve, bw6_761

Fp6 = Tuple[int, int, int, int, int, int]


class BW6Tower:
    """Fp6 = Fp[z]/(z^6 + 4) arithmetic over python ints."""

    def __init__(self, p: int):
        self.p = p
        # z^6 + 4 irreducible over Fp  <=>  -4 is a non-square and
        # non-cube mod p (classical binomial criterion; 4 does not
        # divide 6 so no extra condition)
        m4 = (-4) % p
        assert pow(m4, (p - 1) // 2, p) != 1, "-4 is a QR: tower invalid"
        assert p % 3 == 1 and pow(m4, (p - 1) // 3, p) != 1, \
            "-4 is a cube: tower invalid"

    def zero(self) -> Fp6:
        return (0, 0, 0, 0, 0, 0)

    def one(self) -> Fp6:
        return (1, 0, 0, 0, 0, 0)

    def add(self, a: Fp6, b: Fp6) -> Fp6:
        p = self.p
        return tuple((x + y) % p for x, y in zip(a, b))

    def sub(self, a: Fp6, b: Fp6) -> Fp6:
        p = self.p
        return tuple((x - y) % p for x, y in zip(a, b))

    def neg(self, a: Fp6) -> Fp6:
        p = self.p
        return tuple((-x) % p for x in a)

    def mul(self, a: Fp6, b: Fp6) -> Fp6:
        p = self.p
        t = [0] * 11
        for i, ai in enumerate(a):
            if ai:
                for j, bj in enumerate(b):
                    t[i + j] += ai * bj
        # z^(6+k) = -4 z^k
        out = [0] * 6
        for k in range(6):
            out[k] = (t[k] - 4 * t[k + 6] if k + 6 < 11 else t[k]) % p
        return tuple(out)

    def sqr(self, a: Fp6) -> Fp6:
        return self.mul(a, a)

    def mul_fp(self, a: Fp6, c: int) -> Fp6:
        p = self.p
        return tuple(x * c % p for x in a)

    def pow(self, a: Fp6, e: int) -> Fp6:
        if e < 0:
            return self.pow(self.inv(a), -e)
        acc = self.one()
        for bit in bin(e)[2:]:
            acc = self.sqr(acc)
            if bit == "1":
                acc = self.mul(acc, a)
        return acc

    def inv(self, a: Fp6) -> Fp6:
        """Inverse via the norm to Fp3 then to Fp.

        Fp3 = Fp[z^2]: even coefficients.  Write a = a_e + z * a_o with
        a_e, a_o in Fp3 (in the z^2 basis).  Then
        a * conj(a) = a_e^2 - z^2 a_o^2 in Fp3 (conj is z -> -z), and the
        Fp3 norm finishes the job.
        """
        p = self.p
        a_e = (a[0], a[2], a[4])  # coefficients of 1, u, u^2 (u = z^2)
        a_o = (a[1], a[3], a[5])  # times z
        n3 = self._fp3_sub(self._fp3_sqr(a_e),
                           self._fp3_mul_u(self._fp3_sqr(a_o)))
        n3_inv = self._fp3_inv(n3)
        c_e = self._fp3_mul(a_e, n3_inv)
        c_o = self._fp3_mul(self._fp3_neg(a_o), n3_inv)
        return (c_e[0], c_o[0], c_e[1], c_o[1], c_e[2], c_o[2])

    # ---- Fp3 = Fp[u]/(u^3 + 4) helpers ------------------------------------
    def _fp3_sub(self, a, b):
        p = self.p
        return tuple((x - y) % p for x, y in zip(a, b))

    def _fp3_neg(self, a):
        p = self.p
        return tuple((-x) % p for x in a)

    def _fp3_mul(self, a, b):
        p = self.p
        t = [0] * 5
        for i, ai in enumerate(a):
            for j, bj in enumerate(b):
                t[i + j] += ai * bj
        return ((t[0] - 4 * t[3]) % p, (t[1] - 4 * t[4]) % p, t[2] % p)

    def _fp3_sqr(self, a):
        return self._fp3_mul(a, a)

    def _fp3_mul_u(self, a):
        # u * (a0 + a1 u + a2 u^2) = -4 a2 + a0 u + a1 u^2
        p = self.p
        return ((-4 * a[2]) % p, a[0], a[1])

    def _fp3_inv(self, a):
        # norm to Fp: N(a) = a * a^sigma * a^sigma^2 where sigma(u) = w u,
        # w a primitive cube root of unity... simpler: solve via the
        # adjugate formula for x^3 = -4:
        # for a = a0 + a1 u + a2 u^2 with u^3 = c (c = -4):
        #   t0 = a0^2 - c a1 a2;  t1 = c a2^2 - a0 a1;  t2 = a1^2 - a0 a2
        #   N  = a0 t0 + c a1 t2 + c a2 t1   (in Fp)
        #   a^{-1} = (t0 + t1 u + t2 u^2) / N
        p = self.p
        c = (-4) % p
        a0, a1, a2 = a
        t0 = (a0 * a0 - c * a1 * a2) % p
        t1 = (c * a2 * a2 - a0 * a1) % p
        t2 = (a1 * a1 - a0 * a2) % p
        n = (a0 * t0 + c * a1 * t2 + c * a2 * t1) % p
        n_inv = pow(n, -1, p)
        return (t0 * n_inv % p, t1 * n_inv % p, t2 * n_inv % p)


class BW6Pairing:
    def __init__(self, curve: BW6Curve):
        self.curve = curve
        self.t6 = BW6Tower(curve.p)
        p = curve.p
        # final exponent split: (p^6-1)/r = (p^3-1) * (p+1) * d,
        # d = (p^2 - p + 1)/r  (r | Phi_6(p) by BW construction)
        assert (p * p - p + 1) % curve.r == 0
        self.hard_exp = (p * p - p + 1) // curve.r
        # z^(p^j) = frob_z[j] * z  (z^6 = -4 => z^(p-1) = (-4)^((p-1)/6))
        self.frob_z = [1, pow((-4) % p, (p - 1) // 6, p)]

    # ---- Miller loop -------------------------------------------------------
    def _miller(self, P, Q) -> Fp6:
        """f_{r,P}(psi(Q)) with denominator elimination; P, Q affine host
        points on G1 / G2' (both over Fp)."""
        curve, t6 = self.curve, self.t6
        p = curve.p
        xp, yp = P
        xq, yq = Q
        inv4 = pow(4, -1, p)
        a = (-xq * inv4) % p  # psi(Q).x = a z^4
        b = (-yq * inv4) % p  # psi(Q).y = b z^3

        def line(xt, yt, lam) -> Fp6:
            # l(psi(Q)) = b z^3 - a*lam z^4 - (yt - lam*xt)
            return ((lam * xt - yt) % p, 0, 0, b, (-a * lam) % p, 0)

        f = t6.one()
        xt, yt = xp, yp
        for bit in bin(curve.r)[3:]:
            # doubling step
            lam = (3 * xt * xt) * pow(2 * yt, -1, p) % p
            f = t6.mul(t6.sqr(f), line(xt, yt, lam))
            x2 = (lam * lam - 2 * xt) % p
            yt = (lam * (xt - x2) - yt) % p
            xt = x2
            if bit == "1":
                if xt == xp:
                    # T = -P (final addition before T reaches O): the
                    # line is vertical => value in Fp3, eliminated
                    xt, yt = None, None  # T = O; loop must end here
                    continue
                lam = (yt - yp) * pow(xt - xp, -1, p) % p
                f = t6.mul(f, line(xt, yt, lam))
                x3 = (lam * lam - xt - xp) % p
                yt = (lam * (xt - x3) - yt) % p
                xt = x3
        return f

    # ---- final exponentiation ---------------------------------------------
    def _frobenius(self, f: Fp6, j: int = 1) -> Fp6:
        """f^(p^j): coefficients are in Fp (fixed); z^i picks up
        (z^(p^j - 1))^i = frob_z^(i*j) since frob_z has order 6 in the
        exponent lattice (z^(p^j) = frob_z(j) z with frob_z(j) = g^j for
        g = (-4)^((p-1)/6) only when g in Fp and p = 1 mod 6)."""
        p = self.curve.p
        g = self.frob_z[1]
        out = []
        for i, c in enumerate(f):
            out.append(c * pow(g, i * j, p) % p)
        return tuple(out)

    def final_exponentiation(self, f: Fp6) -> Fp6:
        t6 = self.t6
        # easy part: f <- f^((p^3-1)(p+1))
        f = t6.mul(self._frobenius(f, 3), t6.inv(f))     # ^(p^3 - 1)
        f = t6.mul(self._frobenius(f, 1), f)             # ^(p + 1)
        # hard part: ^((p^2 - p + 1)/r) by plain square-and-multiply
        return t6.pow(f, self.hard_exp)

    def pairing(self, P, Q) -> Fp6:
        """Reduced Tate pairing e(P, Q), P on G1, Q on G2' (affine host
        tuples); returns a GT element (Fp6, multiplicative notation)."""
        assert P is not None and Q is not None, "pairing with identity"
        return self.final_exponentiation(self._miller(P, Q))

    def multi_pairing(self, Ps: Sequence, Qs: Sequence) -> Fp6:
        assert len(Ps) == len(Qs)
        t6 = self.t6
        acc = t6.one()
        for P, Q in zip(Ps, Qs):
            if P is None or Q is None:
                continue  # e(O, Q) = e(P, O) = 1
            acc = t6.mul(acc, self._miller(P, Q))
        return self.final_exponentiation(acc)

    # ---- GT helpers --------------------------------------------------------
    def gt_exp(self, g: Fp6, e: int) -> Fp6:
        return self.t6.pow(g, e % self.curve.r)

    def gt_mul(self, a: Fp6, b: Fp6) -> Fp6:
        return self.t6.mul(a, b)

    def gt_inv(self, a: Fp6) -> Fp6:
        return self.t6.inv(a)

    def gt_one(self) -> Fp6:
        return self.t6.one()


@functools.lru_cache(maxsize=None)
def bw6_pairing() -> BW6Pairing:
    return BW6Pairing(bw6_761())
