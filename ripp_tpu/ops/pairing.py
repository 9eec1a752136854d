"""Batched optimal ate pairing on TPU.

Replaces ark-ec multi_miller_loop/final_exponentiation (reference call sites
/root/reference/inner_products/src/lib.rs:110-115, sipp/src/lib.rs:210-216).

TPU-native design decisions:
  * PROJECTIVE (homogeneous) Miller loop - no inversions anywhere in the
    loop: line coefficients are denominator-scaled by Fp2 factors that the
    final exponentiation kills. (An earlier affine+batch-inversion variant
    cost one Fermat ladder - a ~2|p|-step sequential scan - per Miller bit,
    dominating both latency and XLA compile time.)
  * Per-pair Miller accumulators f_i (embarrassingly parallel); one log-depth
    Fp12 product tree at the end; the single final exponentiation happens on
    host (one element, host pow is microseconds-scale vs a device round-trip).
  * The BLS parameter's bit pattern is static: the loop is a lax.scan over
    bits with a lax.cond add-step (runs only on the ~6 set bits).
  * Lines are built sparsely in w-coefficients of Fp12 = Fp2[w]/(w^6 - xi)
    through the same twist embedding as the host model (host/pairing.py),
    then multiplied with a (for now) dense Fp12 mul.

Identity-point pairs are masked to the generator during the loop and their
Miller value replaced by 1 afterwards.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from .curve import use_fused
from .points import DevCurveCtx
from .tower import tree_select


class DevPairing:
    def __init__(self, ctx: DevCurveCtx):
        self.ctx = ctx
        host = ctx.host
        self.x_bits = tuple(int(b) for b in bin(abs(host.x))[3:])
        self.x_neg = host.x < 0
        self.twist = host.twist_type
        t = ctx.t
        self.fp, self.fp2, self.fp6, self.fp12 = t.fp, t.fp2, t.fp6, t.fp12
        if self.twist == "M":
            xi_inv = host.tower.fp2.inv(host.tower.xi)
            self.xi_inv = (t.fp.const(xi_inv[0]), t.fp.const(xi_inv[1]))
        else:
            self.xi_inv = None
        from ..utils.aotcache import aot_jit

        self._miller_jit = aot_jit(
            f"miller_scan-{host.name}", self._miller_impl)
        self.product_reduce = jax.jit(self.product_reduce)
        self._finalexp_jit = None
        self._gtexp_jit = None
        self._gtexp_fused = None
        self._mul1_jit = jax.jit(self.fp12.mul)
        self._fused = None
        self._rns = None

    @property
    def fused(self):
        """Lazy one-launch fused Miller kernel (ops/pairing_fused.py);
        trace/schedule cost is paid only when the TPU path dispatches."""
        if self._fused is None:
            from .pairing_fused import fused_miller

            self._fused = fused_miller(self.ctx)
        return self._fused

    # ---- sparse line -> full Fp12 -------------------------------------------
    def _fp12_from_w(self, coeffs):
        """coeffs: list of 6 Fp2 elements (trees) for powers w^0..w^5."""
        a0, a1, a2, a3, a4, a5 = coeffs
        return ((a0, a2, a4), (a1, a3, a5))

    def _line_eval_coeffs(self, cy, cx, c0, xP, yP):
        """Evaluate the line at the embedded G1 point and return the three
        nonzero w-slot coefficients for _mul_by_line:
        D-twist: (w^0, w^1, w^3) = (cy*yP, cx*xP, c0)
        M-twist: (w^0, w^3, w^5) = (xi*cy*yP, c0, cx*xP)."""
        F = self.fp
        cy_yP = (F.mul(cy[0], yP), F.mul(cy[1], yP))
        cx_xP = (F.mul(cx[0], xP), F.mul(cx[1], xP))
        if self.twist == "D":
            return (cy_yP, cx_xP, c0)
        return (self.ctx.t.mul_xi(cy_yP), c0, cx_xP)

    def _line_coeffs_post_eval(self, cy_yP, cx_xP, c0):
        """_line_eval_coeffs when cy*yP and cx*xP were already computed
        (stacked with the step's other Fp2 products in the Miller body)."""
        if self.twist == "D":
            return (cy_yP, cx_xP, c0)
        return (self.ctx.t.mul_xi(cy_yP), c0, cx_xP)

    def _line_to_fp12(self, cy, cx, c0, xP, yP):
        """Line with Fp2 coefficients: l = cy*yP + cx*xP*w + c0*w^3 (D-type)
        evaluated at the embedded G1 point (xP, yP in Fp, batch [n, NL]).
        For the M-type twist the same coefficients land on w^0 (xi-scaled),
        w^5 and w^3. Any common Fp2 scale on (cy, cx, c0) is killed by the
        final exponentiation."""
        F, F2 = self.fp, self.fp2
        zero2 = (jnp.zeros_like(xP), jnp.zeros_like(xP))
        cy_yP = (F.mul(cy[0], yP), F.mul(cy[1], yP))
        cx_xP = (F.mul(cx[0], xP), F.mul(cx[1], xP))
        if self.twist == "D":
            return self._fp12_from_w(
                [cy_yP, cx_xP, zero2, c0, zero2, zero2]
            )
        # M-type: scale the w^0 slot by xi (also killed by the final exp)
        return self._fp12_from_w(
            [self.ctx.t.mul_xi(cy_yP), zero2, zero2, c0, zero2, cx_xP]
        )

    # ---- sparse line multiplication -----------------------------------------
    def _mul_by_line(self, f, coeffs):
        """f * line where the line occupies 3 of 6 w-slots.

        D-twist: slots (w^0, w^1, w^3) -> fp12 ((a0,0,0),(a1,a3,0)).
        M-twist: slots (w^0, w^3, w^5) -> fp12 ((a0,0,0),(0,a3,a5)).
        Karatsuba with the sparsity exploited: 13 (D) / 14 (M) fp2
        sub-products instead of the dense mul's 18, ALL stacked into one
        base-field mul call (same compile-lean pattern as DevQuadExt.mul).
        """
        from .tower import tree_bcast, tree_idx, tree_stack

        F2 = self.fp2
        t = self.ctx.t
        nr = t.mul_xi  # fp2 non-residue multiply (v^3 = xi)
        f0, f1 = f  # fp6 halves
        f00, f01, f02 = f0
        f10, f11, f12 = f1

        def stack_mul(pairs):
            ls, rs = zip(*[tree_bcast(a, b) for a, b in pairs])
            V = F2.mul(tree_stack(list(ls)), tree_stack(list(rs)))
            return [tree_idx(V, i) for i in range(len(pairs))]

        if self.twist == "D":
            a0, a1, a3 = coeffs  # A = (a0,0,0), B = (a1,a3,0)
            s01 = F2.add(f10, f11)
            b01 = F2.add(a1, a3)
            g0, g1, g2_ = F2.add(f00, f10), F2.add(f01, f11), F2.add(f02, f12)
            c01 = F2.add(a0, a1)
            sg01 = F2.add(g0, g1)
            prods = stack_mul([
                (f00, a0), (f01, a0), (f02, a0),          # v0 = f0*A
                (f10, a1), (f11, a3), (s01, b01), (f12, a3), (f12, a1),
                (g0, c01), (g1, a3), (sg01, F2.add(c01, a3)),
                (g2_, a3), (g2_, c01),
            ])
            (v00, v01, v02,
             m0, m1, tt, p4, p5,
             n0, n1, nt, n4, n5) = prods
            # v1 = f1*B with B=(b0,b1,0): c0 = m0 + nr(f12*b1), c1 =
            # (f10+f11)(b0+b1)-m0-m1, c2 = f12*b0 + m1
            v1 = (
                F2.add(m0, nr(p4)),
                F2.sub(F2.sub(tt, m0), m1),
                F2.add(p5, m1),
            )
            # w = (f0+f1)*(A+B), A+B = (c01, a3, 0): same shape
            w_ = (
                F2.add(n0, nr(n4)),
                F2.sub(F2.sub(nt, n0), n1),
                F2.add(n5, n1),
            )
            v0 = (v00, v01, v02)
        else:
            a0, a3, a5 = coeffs  # A = (a0,0,0), B = (0,b1,b2)=(0,a3,a5)
            s12 = F2.add(f11, f12)
            b12 = F2.add(a3, a5)
            g0, g1, g2_ = F2.add(f00, f10), F2.add(f01, f11), F2.add(f02, f12)
            prods = stack_mul([
                (f00, a0), (f01, a0), (f02, a0),          # v0 = f0*A
                (f11, a3), (f12, a5), (s12, b12), (f10, a3), (f10, a5),
                # w = (f0+f1) * (a0, a3, a5): dense CH-SQR3 6 products
                (g0, a0), (g1, a3), (g2_, a5),
                (F2.add(g0, g1), F2.add(a0, a3)),
                (F2.add(g0, g2_), F2.add(a0, a5)),
                (F2.add(g1, g2_), b12),
            ])
            (v00, v01, v02,
             m1, m2, tt, p1, p2,
             w0, w1, w2, t01, t02, t12) = prods
            # v1 = f1*(0,b1,b2): c0 = nr(f11 b2 + f12 b1), c1 = f10 b1 +
            # nr(f12 b2), c2 = f10 b2 + f11 b1
            v1 = (
                nr(F2.sub(F2.sub(tt, m1), m2)),
                F2.add(p1, nr(m2)),
                F2.add(p2, m1),
            )
            v0 = (v00, v01, v02)
            w_ = (
                F2.add(w0, nr(F2.sub(F2.sub(t12, w1), w2))),
                F2.add(F2.sub(F2.sub(t01, w0), w1), nr(w2)),
                F2.add(F2.sub(F2.sub(t02, w0), w2), w1),
            )

        F6 = self.fp6
        c0 = F6.add(v0, F6.mul_by_x(v1))     # v0 + nr6 * v1  (w^2 = v)
        c1 = F6.sub(F6.sub(w_, v0), v1)
        return (c0, c1)

    # ---- Miller loop ----------------------------------------------------------
    def _miller_impl(self, xP, yP, qx, qy):
        """Batched Miller f_{|x|,Q}(P). Inputs: xP,yP Fp limbs [n,NL];
        qx,qy Fp2 trees (twist affine). Returns Fp12 tree [n,...].

        INVERSION-FREE: T is kept in homogeneous projective twist
        coordinates; line coefficients are the denominator-scaled
        (2YZ^2, -3X^2 Z, 3X^3 - 2Y^2 Z) for doubling and
        (lambda, -theta, theta*qx - lambda*qy) with theta = Y - qy*Z,
        lambda = X - qx*Z for addition - the Fp2 scale factors vanish in
        the final exponentiation. This removes the per-iteration batched
        Fermat inversion of the affine formulation: a ~2*|p| sequential
        scan per Miller bit that dominated both compile time and latency."""
        F2, F12 = self.fp2, self.fp12
        g2curve = self.ctx.g2

        one2 = F2.one()
        q_proj_one = jax.tree.map(
            lambda x: jnp.broadcast_to(x, qx[0].shape[:-1] + x.shape[-1:]),
            one2,
        )

        b3 = g2curve.b3  # 3*b' device constant (twist curve coefficient)

        def stack2(pairs):
            """k independent Fp2 products in ONE stacked base-field mul
            (same compile-lean/launch-lean pattern as _mul_by_line): each
            extra kernel launch inside the 64-step scan costs more than
            the arithmetic it carries."""
            from .tower import tree_bcast, tree_idx, tree_stack

            ls, rs = zip(*[tree_bcast(a, b) for a, b in pairs])
            V = F2.mul(tree_stack(list(ls)), tree_stack(list(rs)))
            return [tree_idx(V, i) for i in range(len(pairs))]

        def dbl(carry):
            """Combined doubling + line (Costello-Lange-Naehrig-style
            shared subexpressions, homogeneous a=0 twist; eprint 2010/526
            family).  Line coefficients (-H, 3X^2, E-B) equal the previous
            (2YZ^2, -3X^2 Z, 3X^3-2Y^2 Z) scaled by -1/Z (projective
            scale, killed by the final exponentiation; the equality uses
            the curve relation Y^2 Z = X^3 + b'Z^3).  The new point is the
            CLN double uniformly scaled by 4 (avoids the /2's).
            Non-complete formulas are sound here: T = [k]Q with
            0 < k < r never hits the identity.

            The Fp2 products run as THREE stacked mul calls (dependency
            levels), not ~10 individual ones -- per-launch overhead inside
            the scan body dominated the arithmetic (measured ~5x gap to
            the mul-limited roofline in round 2)."""
            (X, Y, Z), f = carry
            f = F12.sqr(f)
            # level 1: independent products of the current coordinates
            B, C, A, X2, YZ2, Zb = stack2([
                (Y, Y), (Z, Z), (X, Y), (X, X),
                (F2.add(Y, Z), F2.add(Y, Z)), (Z, b3),
            ])
            H = F2.sub(F2.sub(YZ2, B), C)            # 2YZ
            cy = F2.neg(H)
            cx = F2.mul_small(X2, 3)
            # level 2: E = 3 b' Z^2 (= Zb * Z) + the line evaluations at
            # the embedded G1 point (depend only on level 1)
            yP2 = (yP, jnp.zeros_like(yP))
            xP2 = (xP, jnp.zeros_like(xP))
            E, cy_yP, cx_xP = stack2([(Zb, Z), (cy, yP2), (cx, xP2)])
            F_ = F2.mul_small(E, 3)                  # 9 b' Z^2
            G = F2.add(B, F_)
            c0 = F2.sub(E, B)
            # level 3: everything needing E/G
            AX, GG, EE, BH = stack2([
                (A, F2.sub(B, F_)), (G, G), (E, E), (B, H),
            ])
            X3 = F2.mul_small(AX, 2)
            Y3 = F2.sub(GG, F2.mul_small(EE, 12))
            Z3 = F2.mul_small(BH, 4)
            f = self._mul_by_line(
                f, self._line_coeffs_post_eval(cy_yP, cx_xP, c0)
            )
            return ((X3, Y3, Z3), f)

        def addq(carry):
            (X, Y, Z), f = carry
            qyZ, qxZ = stack2([(qy, Z), (qx, Z)])
            theta = F2.sub(Y, qyZ)
            lam = F2.sub(X, qxZ)
            yP2 = (yP, jnp.zeros_like(yP))
            xP2 = (xP, jnp.zeros_like(xP))
            tqx, lqy, cy_yP, cx_xP = stack2([
                (theta, qx), (lam, qy),
                (lam, yP2), (F2.neg(theta), xP2),
            ])
            c0 = F2.sub(tqx, lqy)
            f = self._mul_by_line(
                f, self._line_coeffs_post_eval(cy_yP, cx_xP, c0)
            )
            T = g2curve.add((X, Y, Z), (qx, qy, q_proj_one))
            return (T, f)

        n_shape = xP.shape[:-1]
        f0 = self._ones_fp12(n_shape)
        bits = jnp.asarray(self.x_bits, dtype=jnp.uint32)
        T0 = (qx, qy, q_proj_one)

        def body(carry, bit):
            carry = dbl(carry)
            carry = jax.lax.cond(bit > 0, addq, lambda c: c, carry)
            return carry, None

        (_, f), _ = jax.lax.scan(body, (T0, f0), bits)
        return f

    def _ones_fp12(self, batch_shape):
        one = self.fp.one()
        o = jnp.broadcast_to(one, batch_shape + one.shape)
        z = jnp.zeros_like(o)
        return ((o, z), (z, z), (z, z)), ((z, z), (z, z), (z, z))

    def _masked_inputs(self, g1_aff, g2_aff):
        """Mask degenerate (identity) pairs to the generator so the Miller
        loop stays regular; returns (xP, yP, qx, qy, skip)."""
        xP, yP, p_inf = g1_aff
        qx, qy, q_inf = g2_aff
        skip = jnp.logical_or(p_inf, q_inf)
        gen1 = self.ctx.g1_to_dev([self.ctx.host.g1_gen])
        gen2 = self.ctx.g2_to_dev([self.ctx.host.g2_gen])
        g1x = jnp.broadcast_to(gen1[0][0], xP.shape)
        g1y = jnp.broadcast_to(gen1[1][0], yP.shape)
        xP = jnp.where(skip[..., None], g1x, xP)
        yP = jnp.where(skip[..., None], g1y, yP)
        qx = tree_select(skip, jax.tree.map(
            lambda g: jnp.broadcast_to(g[0], xP.shape), gen2[0]), qx)
        qy = tree_select(skip, jax.tree.map(
            lambda g: jnp.broadcast_to(g[0], xP.shape), gen2[1]), qy)
        return xP, yP, qx, qy, skip

    def miller_batch(self, g1_aff, g2_aff):
        """g1_aff: (x, y, inf) from DevSWCurve.normalize on G1;
        g2_aff: (x, y, inf) on G2. Returns per-pair Miller values [n], with
        identity pairs already set to 1 (conjugation for negative x applied
        on host after the final product)."""
        xP, yP, qx, qy, skip = self._masked_inputs(g1_aff, g2_aff)
        if use_fused():
            # one-launch Pallas register machine; bit-identical to the
            # scan path (tests/test_pairing_fused.py)
            f = self.fused.miller(xP, yP, qx, qy)
        else:
            f = self._miller_jit(xP, yP, qx, qy)
        one = self._ones_fp12(xP.shape[:-1])
        return tree_select(skip, one, f)

    def miller_product(self, g1_aff, g2_aff):
        """Miller product of an affine pair batch -> [1, ...] fp12 limb
        tree (== product_reduce(miller_batch(...))). With RIPP_RNS=1 the
        whole loop + product tree runs in RNS form with int8 MXU base
        extensions (ops/pairing_rns.py) and only the final product is
        converted back to limbs."""
        from .pairing_rns import use_rns

        if use_rns():
            if self._rns is None:
                from .pairing_rns import rns_miller

                self._rns = rns_miller(self.ctx)
            xP, yP, qx, qy, skip = self._masked_inputs(g1_aff, g2_aff)
            return self._rns.product(xP, yP, qx, qy, skip)
        return self.product_reduce(self.miller_batch(g1_aff, g2_aff))

    def product_reduce(self, f):
        """Product of an Fp12 batch along axis 0 -> [1, ...] element (single
        mul instance; see ops/reduce.py)."""
        from .reduce import scan_reduce

        n = jax.tree.leaves(f)[0].shape[0]
        red = scan_reduce(self.fp12.mul, f, n)
        return jax.tree.map(lambda x: x[None], red)

    # ---- final exponentiation (device) --------------------------------------
    @property
    def _frob2_consts(self):
        """Device fp2 constants g_k = xi^{k (p^2-1)/6}: the w^k-slot
        multipliers of the p^2-power Frobenius (which acts trivially on
        Fp2 itself since p^2 = 1 mod the quadratic structure)."""
        if getattr(self, "_frob2_cache", None) is None:
            host = self.ctx.host
            t = host.tower
            e = (host.p * host.p - 1) // 6
            fp = self.fp
            consts = []
            for k in range(6):
                c = t.fp2.pow(t.xi, k * e)
                consts.append((fp.const(c[0]), fp.const(c[1])))
            self._frob2_cache = consts
        return self._frob2_cache

    def _dev_frob2(self, f):
        """f^(p^2) on device: slot-wise fp2 constant multiplications."""
        F2 = self.fp2
        g = self._frob2_consts
        (s0, s2, s4), (s1, s3, s5) = f
        return (
            (s0, F2.mul(s2, g[2]), F2.mul(s4, g[4])),
            (F2.mul(s1, g[1]), F2.mul(s3, g[3]), F2.mul(s5, g[5])),
        )

    @property
    def _frob1_consts(self):
        """Device fp2 constants for the p-power Frobenius: slot k of the
        w-basis picks up xi^{k (p-1)/6} after the Fp2 conjugation (host
        tower frob12_c1/frob6 structure, flattened to the 6 w-slots)."""
        if getattr(self, "_frob1_cache", None) is None:
            host = self.ctx.host
            t = host.tower
            e = (host.p - 1) // 6
            fp = self.fp
            consts = []
            for k in range(6):
                c = t.fp2.pow(t.xi, k * e)
                consts.append((fp.const(c[0]), fp.const(c[1])))
            self._frob1_cache = consts
        return self._frob1_cache

    def _dev_frob1(self, f):
        """f^p on device: per-slot Fp2 conjugation (p = 3 mod 4 towers:
        u -> -u) then the slot constant multiplication."""
        F2 = self.fp2
        g = self._frob1_consts

        def cj(c):
            return (c[0], self.fp.neg(c[1]))

        (s0, s2, s4), (s1, s3, s5) = f
        return (
            (cj(s0), F2.mul(cj(s2), g[2]), F2.mul(cj(s4), g[4])),
            (F2.mul(cj(s1), g[1]), F2.mul(cj(s3), g[3]),
             F2.mul(cj(s5), g[5])),
        )

    def _cyc_conj(self, f):
        return (f[0], self.fp6.neg(f[1]))

    def _cyc_pow_const(self, g, e: int):
        """g^e for a static host integer e, g in the cyclotomic subgroup
        (inverse = conjugation).  Bit-scan with the existing full Fp12
        squaring; e is a compile-time constant so each distinct |e| is
        one scan length."""
        F12 = self.fp12
        if e == 0:
            return self._ones_fp12(jax.tree.leaves(g)[0].shape[:1])
        neg = e < 0
        e = abs(e)
        bits = jnp.asarray([int(b) for b in bin(e)[2:]], dtype=jnp.uint32)

        def body(acc, bit):
            sq = F12.sqr(acc)
            wm = F12.mul(sq, g)
            out = jax.tree.map(
                lambda a, b: jnp.where(bit > 0, a, b), wm, sq
            )
            return out, None

        if bits.shape[0] == 1:
            acc = g
        else:
            acc, _ = jax.lax.scan(body, g, bits[1:])
        return self._cyc_conj(acc) if neg else acc

    def _final_exp_impl(self, f):
        """f^((p^12-1)/r) on a [b, ...] fp12 batch.  Easy part via
        conj/inv/frob2; hard part via the exact BLS12 seed ladder
        h = ((x-1)/3)(x-1)(x+p)(x^2+p^2-1) + 1 (host/pairing.py
        hard_part_ladder, differentially tested against the blind
        exponentiation): 4 seed-length scans instead of one ~4|p|-bit
        scan (~5x fewer Fp12 ops)."""
        F12, F6 = self.fp12, self.fp6
        host = self.ctx.host
        g = F12.mul((f[0], F6.neg(f[1])), F12.inv(f))   # f^(p^6-1)
        g = F12.mul(self._dev_frob2(g), g)              # ^(p^2+1)
        x = host.x
        g0 = self._cyc_pow_const(g, (x - 1) // 3)
        g1 = self._cyc_pow_const(g0, x - 1)
        g2 = F12.mul(self._cyc_pow_const(g1, x), self._dev_frob1(g1))
        g3 = F12.mul(
            F12.mul(self._cyc_pow_const(self._cyc_pow_const(g2, x), x),
                    self._dev_frob2(g2)),
            self._cyc_conj(g2),
        )
        return F12.mul(g3, g)

    def gt_exp_batch(self, gs, es):
        """Batched GT exponentiation on device: host GT list [k], host int
        exponents [k] -> host GT list.  One 255-bit square-and-multiply
        scan over the whole batch replaces per-element host-Python
        cyclotomic pows (~1 s each) in the GIPA/SIPP verifiers."""
        import numpy as np

        from .curve import MIN_REDUCE_BATCH
        from .tower import tree_select

        host = self.ctx.host
        k = len(gs)
        if k == 0:
            return []
        nbits = host.r.bit_length()
        # fixed batch 64 (= 2 * log2(n) for n up to 2^32): ONE compiled
        # executable for every protocol size; pad exponents with 0 -> 1
        kp = max(64, -(-k // 64) * 64)
        bits = np.zeros((kp, nbits), dtype=np.uint32)
        for i, e in enumerate(es):
            e = e % host.r
            for j in range(nbits):
                bits[i, j] = (e >> (nbits - 1 - j)) & 1
        one_gt = host.tower.fp12.one()
        f = self.ctx.t.fp12_to_dev(list(gs) + [one_gt] * (kp - k))

        if use_fused():
            # one Pallas launch per exponent bit with VMEM-resident
            # intermediates (ops/pairing_fused.FusedGtExp); bit-identical
            # to the XLA scan below, ~25x faster on v5e (BASELINE.md r5)
            if self._gtexp_fused is None:
                from .pairing_fused import fused_gtexp

                self._gtexp_fused = fused_gtexp(self.ctx)
            out = self._gtexp_fused(f, jnp.asarray(bits))
            return self.ctx.t.fp12_from_dev(out)[:k]

        if self._gtexp_jit is None:
            from ..utils.aotcache import aot_jit

            F12 = self.fp12

            def impl(f, bits):
                kb = jax.tree.leaves(f)[0].shape[0]
                onef = self._ones_fp12((kb,))

                def body(acc, col):
                    sq = F12.sqr(acc)
                    wm = F12.mul(sq, f)
                    return tree_select(col > 0, wm, sq), None

                acc, _ = jax.lax.scan(
                    body, onef, jnp.moveaxis(jnp.asarray(bits), 0, 1)
                )
                return acc

            self._gtexp_jit = aot_jit(
                f"gtexp-{self.ctx.host.name}", impl)
        out = self._gtexp_jit(f, jnp.asarray(bits))
        return self.ctx.t.fp12_from_dev(out)[:k]

    def finalize_product(self, prod, conj_for_x: bool = True):
        """[1, ...] Miller-product tree -> host GT element, with the
        negative-x conjugation and the FULL final exponentiation on
        device (the host-Python Fp12 final exp cost ~1 s per product and
        dominated every commitment round; on device it is a single
        cached executable at MIN_REDUCE_BATCH)."""
        from .curve import MIN_REDUCE_BATCH

        if self._finalexp_jit is None:
            from ..utils.aotcache import aot_jit

            F6 = self.fp6

            def run(p, neg):
                p = jax.lax.cond(
                    neg, lambda q: (q[0], F6.neg(q[1])), lambda q: q, p
                )
                return self._final_exp_impl(p)

            # AOT export cache: the 4 seed-ladder scans trace ~10^4 ops
            # per fresh process (utils/aotcache.py, VERDICT r4 item 4)
            self._finalexp_jit = aot_jit(
                f"finalexp-{self.ctx.host.name}", run)
        padded = jax.tree.map(
            lambda x: jnp.concatenate(
                [x] + [x] * (MIN_REDUCE_BATCH - 1), axis=0
            ),
            prod,
        )
        neg = jnp.asarray(bool(self.x_neg) and conj_for_x)
        out = self._finalexp_jit(padded, neg)
        one = jax.tree.map(lambda x: x[:1], out)
        return self.ctx.t.fp12_from_dev(one)[0]

    # ---- end-to-end -----------------------------------------------------------
    def multi_pairing(self, P_proj, Q_proj):
        """Full pairing product of projective device batches -> host GT
        element. Miller + product tree on device, final exp on host.

        Chunked execution (ops/curve.py CHUNK_TIERS): the batch is padded
        to the smallest shape tier that fits, or looped over top-tier
        chunks -- so every protocol round at every size reuses one of
        three compiled Miller executables instead of compiling its own
        (round-2: per-round-shape compiles were ~95% of a 2^14 TIPP
        prove's wall clock).  Per-chunk Miller products combine on host
        (an Fq12 mul is microseconds)."""
        from ..host import pairing as hp
        from .curve import chunk_plan, pad_with_identity

        n = jax.tree.leaves(P_proj)[0].shape[0]
        chunk, n_chunks, padded = chunk_plan(n)
        if padded > n:
            P_proj = pad_with_identity(self.ctx.g1, P_proj, padded)
            Q_proj = pad_with_identity(self.ctx.g2, Q_proj, padded)
        acc = None
        for c in range(n_chunks):
            sl = slice(c * chunk, (c + 1) * chunk)
            Pc = jax.tree.map(lambda x: x[sl], P_proj)
            Qc = jax.tree.map(lambda x: x[sl], Q_proj)
            g1a = self.ctx.g1.normalize(Pc)
            g2a = self.ctx.g2.normalize(Qc)
            prod = self.miller_product(g1a, g2a)
            acc = prod if acc is None else self._mul1_jit(acc, prod)
        return self.finalize_product(acc)


_PAIRINGS = {}


def dev_pairing(ctx: DevCurveCtx) -> DevPairing:
    key = id(ctx)
    if key not in _PAIRINGS:
        _PAIRINGS[key] = DevPairing(ctx)
    return _PAIRINGS[key]
