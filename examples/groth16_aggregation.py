"""End-to-end Groth16 aggregation demo
(benches/examples/groth16_aggregation.rs parity).

Generates NUM_PROOFS proofs of a 4-input sum circuit, aggregates them into
one O(log n) proof, verifies, and prints ms timings.

Usage: python -m examples.groth16_aggregation [num_proofs] [curve]
"""

from __future__ import annotations

import sys
import time

from ripp_tpu.applications import groth16, groth16_aggregation as agg
from ripp_tpu.ops.points import dev_ctx
from ripp_tpu.utils.fiat_shamir import SeededRng, rand_field

NUM_PUBLIC_INPUTS = 4


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    curve = sys.argv[2] if len(sys.argv) > 2 else "bls12_381"
    ctx = dev_ctx(curve)
    host = ctx.host
    rng = SeededRng(0)

    cs = groth16.sum_circuit(NUM_PUBLIC_INPUTS)
    pk = groth16.setup(host, cs, rng)
    srs = agg.setup_inner_product(ctx, rng, n)
    v_srs = srs.get_verifier_key()

    print(f"Generating {n} Groth16 proofs (batched device prover)...",
          flush=True)
    t0 = time.perf_counter()
    zs, publics = [], []
    for _ in range(n):
        inputs = [rand_field(rng, host.r) for _ in range(NUM_PUBLIC_INPUTS)]
        witness = rand_field(rng, host.r)
        z = groth16.sum_circuit_assignment(cs, inputs, witness, host.r)
        zs.append(z)
        publics.append(z[1:cs.num_public + 1])
    A, B2, C = groth16.prove_batch(ctx, pk, cs, zs, rng)
    gen_ms = (time.perf_counter() - t0) * 1e3

    t0 = time.perf_counter()
    aproof = agg.aggregate_proofs_vec(ctx, srs, A, B2, C)
    agg_ms = (time.perf_counter() - t0) * 1e3

    t0 = time.perf_counter()
    ok = agg.verify_aggregate_proof(ctx, v_srs, pk.vk, publics, aproof)
    ver_ms = (time.perf_counter() - t0) * 1e3
    assert ok, "aggregate proof failed to verify"

    print(f"Proof generation time: {gen_ms:.0f} ms")
    print(f"Proof aggregation time: {agg_ms:.0f} ms")
    print(f"Proof verification time: {ver_ms:.0f} ms")


if __name__ == "__main__":
    main()
