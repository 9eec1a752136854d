"""Radix-2 number-theoretic transform over prime scalar fields (host).

Used by the Groth16 fixture layer's QAP: with a roots-of-unity evaluation
domain, setup needs no O(m^2) Lagrange basis (the basis polynomials
evaluate in closed form) and the per-proof h(X) computation is O(m log m)
NTTs instead of O(m^2) polynomial arithmetic.

BLS scalar fields are NTT-friendly by construction (r - 1 divisible by a
large power of two: 2^32 for BLS12-381, 2^47 for BLS12-377).
"""

from __future__ import annotations

import functools
from typing import List, Sequence


@functools.lru_cache(maxsize=None)
def two_adicity(r: int) -> int:
    s, t = 0, r - 1
    while t % 2 == 0:
        s += 1
        t //= 2
    return s


@functools.lru_cache(maxsize=None)
def root_of_unity(r: int, m: int) -> int:
    """Primitive m-th root of unity mod r (m a power of two dividing the
    2-part of r-1).  Found by projecting small candidates onto the 2-Sylow
    subgroup and testing the order -- no factorization of r-1 needed."""
    assert m & (m - 1) == 0 and m >= 1
    if m == 1:
        return 1
    s = two_adicity(r)
    assert m <= (1 << s), f"domain {m} exceeds 2-adicity {s}"
    odd = (r - 1) >> s
    for c in range(2, 1000):
        w = pow(c, odd, r)  # order divides 2^s
        if pow(w, 1 << (s - 1), r) != 1:  # order is exactly 2^s
            return pow(w, (1 << s) // m, r)
    raise AssertionError("no generator candidate found")


def ntt(vals: Sequence[int], root: int, r: int) -> List[int]:
    """In-order iterative Cooley-Tukey NTT: returns [f(root^j)]_j for the
    polynomial with coefficients `vals` (length must be a power of two)."""
    a = [v % r for v in vals]
    n = len(a)
    assert n & (n - 1) == 0
    if n == 1:
        return a
    # bit-reversal permutation
    j = 0
    for i in range(1, n):
        bit = n >> 1
        while j & bit:
            j ^= bit
            bit >>= 1
        j |= bit
        if i < j:
            a[i], a[j] = a[j], a[i]
    length = 2
    while length <= n:
        w_len = pow(root, n // length, r)
        for i in range(0, n, length):
            w = 1
            half = length // 2
            for k in range(i, i + half):
                u, v = a[k], a[k + half] * w % r
                a[k] = (u + v) % r
                a[k + half] = (u - v) % r
                w = w * w_len % r
        length <<= 1
    return a


def intt(vals: Sequence[int], root: int, r: int) -> List[int]:
    """Inverse NTT (coefficients from values on the root^j domain)."""
    n = len(vals)
    out = ntt(vals, pow(root, -1, r), r)
    n_inv = pow(n, -1, r)
    return [v * n_inv % r for v in out]


def coset_ntt(coeffs: Sequence[int], root: int, shift: int, r: int
              ) -> List[int]:
    """Evaluate on the coset shift * root^j."""
    scaled = [c * pow(shift, k, r) % r for k, c in enumerate(coeffs)]
    return ntt(scaled, root, r)


def coset_intt(vals: Sequence[int], root: int, shift: int, r: int
               ) -> List[int]:
    """Coefficients from values on the coset shift * root^j."""
    coeffs = intt(vals, root, r)
    inv = pow(shift, -1, r)
    return [c * pow(inv, k, r) % r for k, c in enumerate(coeffs)]
