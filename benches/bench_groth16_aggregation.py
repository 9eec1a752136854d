"""Groth16 aggregation bench (benches/benches/groth16_aggregation parity).

Schemes emitted (CSV `trial,num_proofs,scheme,function,time` on stdout):
  single_circuit  per-proof proving + random-linear-combination BATCH
                  verification (the reference's batch_verify_proof,
                  bench.rs:528-595)
  ipa             IPP aggregation (setup / aggregate / verify)

The reference's other two schemes need an in-circuit Groth16 verifier
(R1CS gadget machinery): `olr` (BW6-761 one-layer recursion, bench.rs:
413-458) and `complete_circuit` (monolithic proof, bench.rs:470-526).
The CLI accepts their flags for parity and emits an explicit `skipped`
row instead of silently dropping them.

Usage: python -m benches.bench_groth16_aggregation \
         [trials] [num_proofs] [bench_rec] [gen_all] [mono]
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
    argv = sys.argv[1:]
    trials = int(argv[0]) if len(argv) > 0 else 1
    n = int(argv[1]) if len(argv) > 1 else 16
    bench_rec = (argv[2] if len(argv) > 2 else "false") == "true"
    gen_all = (argv[3] if len(argv) > 3 else "true") == "true"
    mono = (argv[4] if len(argv) > 4 else "false") == "true"

    ctx = dev_ctx("bls12_381")
    host = ctx.host
    rng = SeededRng(0)

    print("trial,num_proofs,scheme,function,time", flush=True)

    cs = groth16.sum_circuit(NUM_PUBLIC_INPUTS)
    pk = groth16.setup(host, cs, rng)
    srs, ms = timed(agg.setup_inner_product, ctx, rng, n)
    csv(0, n, "ipa", "setup", ms)
    v_srs = srs.get_verifier_key()

    # proof generation: the vectorized device prover (all proofs batched)
    zs, publics = [], []
    n_gen = n if gen_all else 1
    for _ in range(n_gen):
        inputs = [rand_field(rng, host.r) for _ in range(NUM_PUBLIC_INPUTS)]
        witness = rand_field(rng, host.r)
        z = groth16.sum_circuit_assignment(cs, inputs, witness, host.r)
        zs.append(z)
        publics.append(z[1:cs.num_public + 1])
    if not gen_all:
        zs = zs * n
        publics = publics * n
    (A, B2, C), ms = timed(groth16.prove_batch, ctx, pk, cs, zs, rng)
    csv(0, n, "single_circuit", "prove", ms)

    for trial in range(trials):
        ok, ms = timed(
            agg.batch_verify_proofs, ctx, pk.vk, publics, A, B2, C,
            SeededRng(0),
        )
        assert ok, "batch verification failed"
        csv(trial, n, "single_circuit", "verify", ms)

        aggregate, ms = timed(agg.aggregate_proofs_vec, ctx, srs, A, B2, C)
        csv(trial, n, "ipa", "aggregate", ms)
        ok, ms = timed(
            agg.verify_aggregate_proof, ctx, v_srs, pk.vk, publics, aggregate
        )
        assert ok, "aggregate verification failed"
        csv(trial, n, "ipa", "verify", ms)

    if bench_rec:
        csv(0, n, "olr", "skipped", 0.0)
        print("# olr (BW6-761 one-layer recursion) requires an in-circuit "
              "Groth16 verifier; not implemented in this round", flush=True)
    if mono:
        csv(0, n, "complete_circuit", "skipped", 0.0)
        print("# complete_circuit (monolithic proof) requires the R1CS "
              "gadget layer; not implemented in this round", flush=True)


if __name__ == "__main__":
    main()
