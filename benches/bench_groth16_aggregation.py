"""Groth16 aggregation bench (benches/benches/groth16_aggregation parity,
schemes `single_circuit` = per-proof verification and `ipa` = IPP
aggregation; the BW6-recursion and monolithic-circuit baselines of the
reference require an in-circuit SNARK verifier and are out of scope).

CSV schema `trial,num_proofs,scheme,function,time` on stdout.

Usage: python -m benches.bench_groth16_aggregation [trials] [num_proofs]
"""

from __future__ import annotations

import sys

from ripp_tpu.applications import groth16, groth16_aggregation as agg
from ripp_tpu.ops.points import dev_ctx
from ripp_tpu.utils.fiat_shamir import SeededRng, rand_field

from .common import timed

NUM_PUBLIC_INPUTS = 4


def csv(trial, n, scheme, function, ms):
    print(f"{trial},{n},{scheme},{function},{ms:.3f}", flush=True)


def main():
    trials = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    ctx = dev_ctx("bls12_381")
    host = ctx.host
    rng = SeededRng(0)

    cs = groth16.sum_circuit(NUM_PUBLIC_INPUTS)
    pk = groth16.setup(host, cs, rng)
    srs, ms = timed(agg.setup_inner_product, ctx, rng, n)
    csv(0, n, "ipa", "setup", ms)
    v_srs = srs.get_verifier_key()

    proofs = []
    publics = []
    gen_ms = 0.0
    for _ in range(n):
        inputs = [rand_field(rng, host.r) for _ in range(NUM_PUBLIC_INPUTS)]
        witness = rand_field(rng, host.r)
        z = groth16.sum_circuit_assignment(cs, inputs, witness, host.r)
        proof, ms = timed(groth16.prove, host, pk, cs, z, rng)
        gen_ms += ms
        proofs.append(proof)
        publics.append(z[1:cs.num_public + 1])
    csv(0, n, "groth16", "generate", gen_ms)

    for trial in range(trials):
        # single_circuit baseline: verify each proof individually
        _, ms = timed(
            lambda: all(
                groth16.verify(host, pk.vk, pub, pf)
                for pub, pf in zip(publics, proofs)
            )
        )
        csv(trial, n, "single_circuit", "verify", ms)

        aggregate, ms = timed(agg.aggregate_proofs, ctx, srs, proofs)
        csv(trial, n, "ipa", "aggregate", ms)
        ok, ms = timed(
            agg.verify_aggregate_proof, ctx, v_srs, pk.vk, publics, aggregate
        )
        assert ok, "aggregate verification failed"
        csv(trial, n, "ipa", "verify", ms)


if __name__ == "__main__":
    main()
