"""Device twisted-Edwards (JubJub) kernels vs host, plus a JubJub Pedersen
commitment round-trip (reference parity: dh_commitments pedersen test runs
over ed-on-bls12-381, pedersen/mod.rs:32)."""

import pytest

import jax.numpy as jnp

from ripp_tpu.host.curves import jubjub
from ripp_tpu.ops.curve import DevEdwardsCurve
from ripp_tpu.ops.fp import DevFp, make_spec
from ripp_tpu.utils.fiat_shamir import SeededRng, rand_field

N = 4


@pytest.fixture(scope="module")
def setup():
    j = jubjub()
    F = DevFp(make_spec("jubjub.fq", j.curve.F.p))
    a_c = F.const(j.curve.F.p - 1)   # a = -1
    d_c = F.const(j.curve.d if isinstance(j.curve.d, int)
                  else j.curve.d)
    dev = DevEdwardsCurve(F, a_c, d_c, name="dev_jubjub")
    return j, F, dev


def _to_dev(F, pts):
    xs = jnp.asarray(F.spec.to_mont_limbs([p[0] for p in pts]))
    ys = jnp.asarray(F.spec.to_mont_limbs([p[1] for p in pts]))
    return (xs, ys)


def _from_dev(j, F, P):
    xs = F.spec.from_mont_limbs(P[0])
    ys = F.spec.from_mont_limbs(P[1])
    return list(zip(xs, ys))


def test_edwards_add_and_scalar_mul(setup):
    j, F, dev = setup
    host = j.curve
    rng = SeededRng(30)
    pts = [host.scalar_mul(j.gen, rand_field(rng, j.r)) for _ in range(N)]
    qts = [host.scalar_mul(j.gen, rand_field(rng, j.r)) for _ in range(N)]
    dP, dQ = _to_dev(F, pts), _to_dev(F, qts)
    got = _from_dev(j, F, dev.add(dP, dQ))
    expect = [host.add(p, q) for p, q in zip(pts, qts)]
    for g, e in zip(got, expect):
        assert g[0] == e[0] and g[1] == e[1]

    # shared-scalar ladder
    k = rand_field(rng, j.r)
    bits = jnp.asarray([int(b) for b in bin(k)[2:]], dtype=jnp.uint32)
    got = _from_dev(j, F, dev.scalar_mul_bits(dP, bits))
    expect = [host.scalar_mul(p, k) for p in pts]
    for g, e in zip(got, expect):
        assert g[0] == e[0] and g[1] == e[1]


def test_jubjub_pedersen_roundtrip(setup):
    """Pedersen over JubJub: com = sum m_i * K_i, verify by recommit."""
    j, F, dev = setup
    host = j.curve
    rng = SeededRng(31)
    keys = [host.scalar_mul(j.gen, rand_field(rng, j.r)) for _ in range(N)]
    msgs = [rand_field(rng, j.r) for _ in range(N)]
    com = None
    for k_pt, m in zip(keys, msgs):
        term = host.scalar_mul(k_pt, m)
        com = term if com is None else host.add(com, term)
    # recommit-verify (DoublyHomomorphicCommitment::verify default method)
    com2 = None
    for k_pt, m in zip(keys, msgs):
        term = host.scalar_mul(k_pt, m)
        com2 = term if com2 is None else host.add(com2, term)
    assert com == com2
    # wrong message rejected
    bad = list(msgs)
    bad[0] = (bad[0] + 1) % j.r
    com3 = None
    for k_pt, m in zip(keys, bad):
        term = host.scalar_mul(k_pt, m)
        com3 = term if com3 is None else host.add(com3, term)
    assert com != com3
