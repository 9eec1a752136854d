"""Groth16 fixture prover: setup/prove/verify round-trip on the reference
example's sum circuit (host math only)."""

import pytest

from ripp_tpu.applications import groth16
from ripp_tpu.host.curves import bls12_381
from ripp_tpu.utils.fiat_shamir import SeededRng, rand_field


@pytest.fixture(scope="module")
def curve():
    return bls12_381()


def test_groth16_roundtrip(curve):
    rng = SeededRng(11)
    num_inputs = 4
    cs = groth16.sum_circuit(num_inputs)
    pk = groth16.setup(curve, cs, rng)
    inputs = [rand_field(rng, curve.r) for _ in range(num_inputs)]
    witness = rand_field(rng, curve.r)
    z = groth16.sum_circuit_assignment(cs, inputs, witness, curve.r)
    assert cs.is_satisfied(z, curve.r)
    proof = groth16.prove(curve, pk, cs, z, rng)
    public = z[1:cs.num_public + 1]
    assert groth16.verify(curve, pk.vk, public, proof)
    # wrong public input rejected
    bad = list(public)
    bad[0] = (bad[0] + 1) % curve.r
    assert not groth16.verify(curve, pk.vk, bad, proof)
