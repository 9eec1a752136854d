"""Host-side tests for the NTT utilities and the Blake2s R1CS circuit
(the reference aggregation bench's proof workload, bench.rs:30-75).
Fast: no JAX, no device kernels."""

import struct

from ripp_tpu.applications.blake2s_circuit import (
    blake2s_compress_block,
    blake2s_prf,
    build_blake2s_circuit,
)
from ripp_tpu.host.curves import bls12_381
from ripp_tpu.utils.ntt import (
    coset_intt,
    coset_ntt,
    intt,
    ntt,
    root_of_unity,
    two_adicity,
)

R381 = bls12_381().r


def test_two_adicity_bls12_381():
    # BLS12-381's scalar field has 2-adicity 32 by construction
    assert two_adicity(R381) == 32


def test_root_of_unity_orders():
    for m in (1, 2, 8, 64, 1 << 15):
        w = root_of_unity(R381, m)
        assert pow(w, m, R381) == 1
        if m > 1:
            assert pow(w, m // 2, R381) != 1


def test_ntt_roundtrip_and_evaluation():
    import random

    rng = random.Random(11)
    n = 32
    w = root_of_unity(R381, n)
    coeffs = [rng.randrange(R381) for _ in range(n)]
    vals = ntt(coeffs, w, R381)
    # spot-check against direct Horner evaluation at w^j
    for j in (0, 1, 5, n - 1):
        x = pow(w, j, R381)
        direct = 0
        for c in reversed(coeffs):
            direct = (direct * x + c) % R381
        assert vals[j] == direct
    assert intt(vals, w, R381) == coeffs


def test_coset_ntt_roundtrip():
    import random

    rng = random.Random(12)
    n = 16
    w = root_of_unity(R381, n)
    coeffs = [rng.randrange(R381) for _ in range(n)]
    g = 7
    vals = coset_ntt(coeffs, w, g, R381)
    # on the coset, the vanishing polynomial X^n - 1 is the nonzero
    # constant g^n - 1 (this is what makes the QAP division work there)
    x = g * pow(w, 3, R381) % R381
    assert (pow(x, n, R381) - 1) % R381 == (pow(g, n, R381) - 1) % R381
    assert coset_intt(vals, w, g, R381) == coeffs


def test_blake2s_compress_matches_hashlib():
    import hashlib

    # one full-input compression of [0^32 || input]: digest of the
    # 64-byte block under default blake2s-256 parameters
    inp = list(struct.unpack("<8I", bytes(range(64, 96))))
    msg = bytes(32) + struct.pack("<8I", *inp)
    ref = list(struct.unpack("<8I", hashlib.blake2s(msg).digest()))
    assert blake2s_prf(inp) == ref
    # raw compression entry point agrees with the PRF wrapper
    words = list(struct.unpack("<16I", msg))
    assert blake2s_compress_block(words) == ref


def test_blake2s_circuit_satisfied_and_binding():
    inp = list(struct.unpack("<8I", bytes(range(32))))
    cs, z, out_words = build_blake2s_circuit(R381, inp)
    assert cs.is_satisfied(z, R381)
    assert out_words == blake2s_prf(inp)
    # the public outputs are the first num_public entries after the 1
    assert z[1:cs.num_public + 1] == out_words
    # tampering any public output must break satisfiability
    z_bad = list(z)
    z_bad[1] = (z_bad[1] + 1) % R381
    assert not cs.is_satisfied(z_bad, R381)
