"""RNS-Montgomery Fp multiplier prototype: MXU base extensions.

Round-4 decision-record follow-through (BASELINE.md "MXU path for the Fp
multiplier"): the CIOS limb kernel family (ops/fp_pallas.py) is VPU-bound
at ~6.1k lane-ops/mul with a serial m-chain; this module implements the
alternative the record projects — a residue number system in which

  * the product itself is ELEMENTWISE per 14-bit residue channel (VPU,
    fully parallel, no carry chain), and
  * the two base extensions per Montgomery reduction are constant-matrix
    linear maps lowered to int8 MXU matmuls ([B, 2k] @ [2k, 2k] with
    7-bit digit splitting; exact in int32 accumulation).

Pipeline per multiplication (Bajard/Kawamura/Shenoy-Kumaresan family):

  inputs a, b held as residues over base A (k primes), base B (k primes)
  and a redundant power-of-two channel m_r = 2^16.

  1. c = a*b elementwise in A ∪ B ∪ {m_r}.
  2. q = -c * p^{-1} mod M_A, elementwise in base A.
  3. approximate base extension q -> B ∪ {m_r}  (int8 MXU matmul +
     float32 alpha estimate, biased LOW so q' = q + beta*M_A, beta∈{0,1}
     — the overshoot only inflates the < 4p residue bound, never breaks
     congruence).
  4. r = (c + q'*p) * M_A^{-1}, elementwise in base B ∪ {m_r}.  Exact
     division: c + q'*p ≡ 0 (mod M_A) by construction.
  5. exact Shenoy-Kumaresan extension r -> A using the redundant channel
     (beta recovered mod 2^16; a second int8 MXU matmul).

  Result ≡ a*b*M_A^{-1} (mod p), bounded < 2p + 16p^2/M_A
  < 2p + p/(k+2) < 4p (c = a*b < 16p^2 and q' < 2*M_A under the
  M_A > 16p(k+2) setup check): the < 4p representative invariant is
  closed under chaining (M_A > 2^390 >> 16p).

Channel modular reductions use a float32-reciprocal Barrett (valid for
z < 2^30 against 14-bit moduli; quotient off by at most one either way,
fixed with two selects).

Differential test: tests/test_fp_rns.py (vs host Python ints, plus chain
stability).  Measurement harness: benches/bench_fp_rns.py.

Replaces (in prototype form) the same arkworks ark-ff Montgomery backend
the reference consumes at /root/reference/inner_products/src/lib.rs:77-116;
design is TPU-first (MXU contraction for the O(k^2) phase), no counterpart
in the reference.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

MR_BITS = 16
MR = 1 << MR_BITS
MR_MASK = MR - 1
DIGIT = 7  # 7-bit digits keep every int8 matmul operand in [0, 127]
DIGIT_MASK = (1 << DIGIT) - 1


def _primes_in(lo: int, hi: int, count: int, skip=frozenset()):
    """First `count` primes in (lo, hi], descending from hi (host-side)."""
    out = []
    n = hi
    while n > lo and len(out) < count:
        if n not in skip and all(n % d for d in range(2, int(n**0.5) + 1)):
            out.append(n)
        n -= 1
    if len(out) < count:
        raise ValueError(f"not enough primes in ({lo}, {hi}]")
    return out


@functools.lru_cache(maxsize=None)
def rns_spec(p: int, k: int = 29):
    """Precompute all channel constants and digit-split extension matrices.

    Returns a dict of numpy arrays (hashable via id; wrapped by the jitted
    closure below).  k=29 14-bit primes per base gives M ~= 2^400 > 16p
    for 381-bit p with ~2^17 slack for the approximate-extension overshoot.
    """
    mA = _primes_in(1 << 13, (1 << 14) - 1, k)
    mB = _primes_in(1 << 13, (1 << 14) - 1, 2 * k)[k:]
    assert not (set(mA) & set(mB))
    MA = 1
    for m in mA:
        MA *= m
    MB = 1
    for m in mB:
        MB *= m
    if MA <= 16 * p * (k + 2):
        raise ValueError("base A too small for < 4p invariant")
    if MB <= 4 * p:
        raise ValueError("base B too small")

    def digits(w):
        return w & DIGIT_MASK, w >> DIGIT

    u32 = lambda x: np.asarray(x, dtype=np.uint32)
    f32 = lambda x: np.asarray(x, dtype=np.float32)

    # --- elementwise channel constants -------------------------------
    mA_a, mB_a = u32(mA), u32(mB)
    neg_pinv_A = u32([(-pow(p, -1, m)) % m for m in mA])
    p_mod_B = u32([p % m for m in mB])
    MAinv_B = u32([pow(MA % m, -1, m) for m in mB])
    p_mod_r = np.uint32(p & MR_MASK)
    MAinv_r = np.uint32(pow(MA % MR, -1, MR))
    # sigma constants
    invMAi = u32([pow((MA // m) % m, -1, m) for m in mA])   # base A
    invMBj = u32([pow((MB // m) % m, -1, m) for m in mB])   # base B
    # alpha/beta correction constants
    MA_mod_B = u32([MA % m for m in mB])
    MA_mod_r = np.uint32(MA & MR_MASK)
    MB_mod_A = u32([MB % m for m in mA])
    MBinv_r = np.uint32(pow(MB % MR, -1, MR))
    # m_r rows of the extensions (VPU, wrap-around mod 2^16)
    T1_r = u32([(MA // m) & MR_MASK for m in mA])
    T2_r = u32([(MB // m) & MR_MASK for m in mB])

    # --- digit-split int8 extension matrices -------------------------
    # ext1: q (base A) -> base B.   X[b, (d,i)] = digit d of sigma_i.
    # W[(d,i), (e,j)] = digit e of (2^(7d) * (MA//mA_i)) mod mB_j.
    def ext_matrix(src_mods, dst_mods, M):
        ksrc, kdst = len(src_mods), len(dst_mods)
        W = np.zeros((2 * ksrc, 2 * kdst), dtype=np.int8)
        for d in range(2):
            for i, mi in enumerate(src_mods):
                for j, mj in enumerate(dst_mods):
                    w = ((M // mi) << (DIGIT * d)) % mj
                    w0, w1 = w & DIGIT_MASK, w >> DIGIT
                    assert w1 <= DIGIT_MASK, (w, mj)
                    W[d * ksrc + i, j] = w0
                    W[d * ksrc + i, kdst + j] = w1
        return W

    W1 = ext_matrix(mA, mB, MA)
    W2 = ext_matrix(mB, mA, MB)

    # alpha estimate: floor(sum sigma_i / m_i), biased low.
    inv_mA_f32 = f32([np.nextafter(1.0 / m, 0.0) for m in mA]).astype(np.float32)

    return dict(
        p=p, k=k, mA=mA, mB=mB, MA=MA, MB=MB,
        mA_a=mA_a, mB_a=mB_a,
        inv_mA_f=f32(1.0) / f32(mA_a), inv_mB_f=f32(1.0) / f32(mB_a),
        neg_pinv_A=neg_pinv_A, p_mod_B=p_mod_B, MAinv_B=MAinv_B,
        p_mod_r=p_mod_r, MAinv_r=MAinv_r,
        invMAi=invMAi, invMBj=invMBj,
        MA_mod_B=MA_mod_B, MA_mod_r=MA_mod_r, MB_mod_A=MB_mod_A,
        MBinv_r=MBinv_r, T1_r=T1_r, T2_r=T2_r,
        W1=W1, W2=W2, inv_mA_f32=inv_mA_f32,
    )


def _mod_barrett(z, m_u32, inv_m_f32):
    """z mod m for z < 2^30 (uint32), m a 14-bit channel-constant vector.

    float32 reciprocal quotient; q off by at most +-1, fixed by selects.
    """
    q = jnp.floor(z.astype(jnp.float32) * inv_m_f32).astype(jnp.int32)
    r = z.astype(jnp.int32) - q * m_u32.astype(jnp.int32)
    r = jnp.where(r < 0, r + m_u32.astype(jnp.int32), r)
    r = jnp.where(r >= m_u32.astype(jnp.int32), r - m_u32.astype(jnp.int32), r)
    return r.astype(jnp.uint32)


def _mulmod(a, b, m_u32, inv_m_f32):
    return _mod_barrett(a * b, m_u32, inv_m_f32)


def _digit_split_int8(x):
    """[k, B] uint32 (< 2^14) -> [2k, B] int8 of 7-bit digits."""
    lo = (x & DIGIT_MASK).astype(jnp.int8)
    hi = (x >> DIGIT).astype(jnp.int8)
    return jnp.concatenate([lo, hi], axis=0)


def _ext_matmul(sig, W, kdst):
    """Base-extension core: digit matmul + digit recombination.

    sig: [k, B] residues < 2^14 (channel-major: batch rides the 128-lane
    minor dimension).  W: [2k, 2kdst] int8.  Returns [kdst, B] uint32 of
    (sum_i sigma_i * (M//m_i)) mod m_j as a < 2^28 value, BEFORE the
    alpha/beta correction and final channel mod.
    """
    X = _digit_split_int8(sig)  # [2k, B]
    S = jax.lax.dot_general(
        W, X, (((0,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )  # [2*kdst, B]; each entry < 2k*127*127 < 2^20
    return (S[:kdst] + (S[kdst:] << DIGIT)).astype(jnp.uint32)


def make_rns_mul(p: int, k: int = 29):
    """Build the jittable RNS Montgomery multiplier for prime p.

    State layout: (rA [k,B] u32, rB [k,B] u32, rr [B] u32) — residues of
    a value < 4p over base A, base B and the redundant 2^16 channel.
    CHANNEL-MAJOR: the batch rides the minor (128-lane) dimension, so
    every per-channel elementwise op runs at full VPU lane utilization
    (channel-minor measured 40.0 M muls/s on v5e; see BASELINE.md).
    Returns mul(a, b) -> a*b*MA^{-1} mod p (same layout,
    < 2p + p/(k+2) < 4p).
    """
    s = rns_spec(p, k)
    mA, mB = jnp.asarray(s["mA_a"][:, None]), jnp.asarray(s["mB_a"][:, None])
    inv_mA_f, inv_mB_f = jnp.asarray(s["inv_mA_f"][:, None]), jnp.asarray(s["inv_mB_f"][:, None])
    neg_pinv_A = jnp.asarray(s["neg_pinv_A"][:, None])
    p_mod_B, MAinv_B = jnp.asarray(s["p_mod_B"][:, None]), jnp.asarray(s["MAinv_B"][:, None])
    invMAi, invMBj = jnp.asarray(s["invMAi"][:, None]), jnp.asarray(s["invMBj"][:, None])
    MA_mod_B, MB_mod_A = jnp.asarray(s["MA_mod_B"][:, None]), jnp.asarray(s["MB_mod_A"][:, None])
    T1_r, T2_r = jnp.asarray(s["T1_r"][:, None]), jnp.asarray(s["T2_r"][:, None])
    W1, W2 = jnp.asarray(s["W1"]), jnp.asarray(s["W2"])
    inv_mA_low = jnp.asarray(s["inv_mA_f32"][:, None])
    MA_mod_r = jnp.uint32(s["MA_mod_r"])
    p_mod_r, MAinv_r = jnp.uint32(s["p_mod_r"]), jnp.uint32(s["MAinv_r"])
    MBinv_r = jnp.uint32(s["MBinv_r"])
    kk = s["k"]

    def mul(a, b):
        aA, aB, ar = a
        bA, bB, br = b
        # 1. elementwise product in all channels
        cA = _mulmod(aA, bA, mA, inv_mA_f)
        cB = _mulmod(aB, bB, mB, inv_mB_f)
        cr = (ar * br) & MR_MASK
        # 2. q = -c p^{-1} in base A
        q = _mulmod(cA, neg_pinv_A, mA, inv_mA_f)
        # 3. sigma + approximate extension A -> B, m_r
        sig = _mulmod(q, invMAi, mA, inv_mA_f)
        # alpha biased LOW: q' = q + beta*MA, beta in {0, 1}.
        # floor() can be -1.0 (q=0 => all sigma=0 => floor(-2^-10)): go
        # through int32 first — float->int32 of -1.0 is exact and
        # int32->uint32 is defined two's-complement wrap, whereas a
        # negative float->uint32 cast is backend-dependent (LLVM fptoui
        # poison). alpha = 0xFFFFFFFF keeps the corr/qr arithmetic
        # correct under mod-2^32 wrap.
        alpha = jnp.floor(
            jnp.sum(sig.astype(jnp.float32) * inv_mA_low, axis=0)
            - jnp.float32(2 ** -10)
        ).astype(jnp.int32).astype(jnp.uint32)  # [B]
        zB = _ext_matmul(sig, W1, kk)  # < 2^28
        # subtract alpha*MA mod m_j, keep nonnegative with +32*m_j
        corr = 32 * mB - alpha[None, :] * MA_mod_B
        qB = _mod_barrett(zB + corr, mB, inv_mB_f)
        qr = (jnp.sum(sig * T1_r, axis=0) - alpha * MA_mod_r) & MR_MASK
        # 4. r = (c + q'p) MA^{-1} in B, m_r
        t = _mod_barrett(cB + _mulmod(qB, p_mod_B, mB, inv_mB_f), mB, inv_mB_f)
        rB = _mulmod(t, MAinv_B, mB, inv_mB_f)
        rr = (((cr + qr * p_mod_r) & MR_MASK) * MAinv_r) & MR_MASK
        # 5. exact SK extension B -> A via the redundant channel
        sig2 = _mulmod(rB, invMBj, mB, inv_mB_f)
        sumr = jnp.sum(sig2 * T2_r, axis=0) & MR_MASK
        beta = (((sumr - rr) & MR_MASK) * MBinv_r) & MR_MASK  # exact, < k
        zA = _ext_matmul(sig2, W2, kk)
        corr2 = 32 * mA - beta[None, :] * MB_mod_A
        rA = _mod_barrett(zA + corr2, mA, inv_mA_f)
        return rA, rB, rr

    return mul


# ----------------------------------------------------------------------
# host-side conversion helpers (test/bench I/O only)


def to_rns(p: int, xs, k: int = 29):
    """list[int] -> (rA [k,B], rB [k,B], rr [B]) numpy uint32."""
    s = rns_spec(p, k)
    rA = np.array([[x % m for x in xs] for m in s["mA"]], dtype=np.uint32)
    rB = np.array([[x % m for x in xs] for m in s["mB"]], dtype=np.uint32)
    rr = np.array([x & MR_MASK for x in xs], dtype=np.uint32)
    return rA, rB, rr


def from_rns_base_a(p: int, rA, k: int = 29):
    """CRT-reconstruct values mod p from base-A residues [k, B] (host)."""
    s = rns_spec(p, k)
    MA = s["MA"]
    out = []
    for row in np.asarray(rA).T:
        v = 0
        for m, r in zip(s["mA"], row):
            Mi = MA // m
            v += int(r) * Mi * pow(Mi % m, -1, m)
        out.append((v % MA) % p)
    return out
