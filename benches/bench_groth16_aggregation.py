"""Groth16 aggregation bench (benches/benches/groth16_aggregation parity).

Schemes emitted (CSV `trial,num_proofs,scheme,function,time` on stdout):
  single_circuit    per-proof proving + random-linear-combination BATCH
                    verification (the reference's batch_verify_proof,
                    bench.rs:528-595)
  ipa               IPP aggregation (setup / aggregate / verify)
  olr               BW6-761 one-layer recursion: one outer Groth16 proof
                    verifying all n BLS12-377 inner proofs in-circuit
                    (bench.rs:413-458; enable with bench_rec=true)
  complete_circuit  one monolithic Groth16 proof of all n Blake2s
                    instances (bench.rs:470-526; enable with mono=true)

Usage: python -m benches.bench_groth16_aggregation \
         [trials] [num_proofs] [bench_rec] [gen_all] [mono]
"""

from __future__ import annotations

import sys

import struct

from ripp_tpu.applications import groth16, groth16_aggregation as agg
from ripp_tpu.applications.blake2s_circuit import build_blake2s_circuit
from ripp_tpu.models.vectors import PointVec
from ripp_tpu.ops.points import dev_ctx
from ripp_tpu.utils.fiat_shamir import SeededRng, rand_field

from .common import timed


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

    # workload: Blake2s-PRF preimage circuits (~21.5k constraints), the
    # reference bench's circuit (bench.rs:30-75); NTT-domain QAP
    def rand_input(k):
        return list(struct.unpack("<8I", bytes(
            (rand_field(rng, 256)) for _ in range(32))))

    cs, z0, out0 = build_blake2s_circuit(host.r, rand_input(0))
    pk = groth16.setup(host, cs, rng)
    srs, ms = timed(agg.setup_inner_product, ctx, rng, n)
    csv(0, n, "ipa", "setup", ms)
    v_srs = srs.get_verifier_key()

    # proof generation (host prover per proof, like the reference; with
    # gen_all=false one proof is cloned n times, bench.rs:298-302)
    n_gen = n if gen_all else 1
    zs = [z0]
    for _ in range(n_gen - 1):
        cs_i, z_i, _ = build_blake2s_circuit(host.r, rand_input(0))
        zs.append(z_i)
    proofs, gen_ms = [], 0.0
    for z in zs:
        pf, ms = timed(groth16.prove, host, pk, cs, z, rng)
        gen_ms += ms
        proofs.append(pf)
    publics = [z[1:cs.num_public + 1] for z in zs]
    if not gen_all:
        proofs = proofs * n
        publics = publics * n
    csv(0, n, "single_circuit", "prove", gen_ms / n_gen)
    A = PointVec.from_host(ctx, "g1", [p.a for p in proofs])
    B2 = PointVec.from_host(ctx, "g2", [p.b for p in proofs])
    C = PointVec.from_host(ctx, "g1", [p.c for p in proofs])

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
        # olr (bench.rs:413-458): ONE BW6-761 Groth16 proof whose circuit
        # verifies all n inner proofs in-circuit
        # (applications/groth16_recursion.py; ~38k constraints per
        # verified proof).  The recursion needs the inner curve's base
        # field to equal the outer scalar field, so the inner proofs are
        # generated on BLS12-377 (like the reference bench, bench.rs:1).
        from ripp_tpu.applications.groth16_recursion import (
            build_verifier_circuit,
        )
        from ripp_tpu.host.curves import bls12_377
        from ripp_tpu.ops.points import bw6_dev_ctx

        cv377 = bls12_377()
        bctx = bw6_dev_ctx()
        bw6 = bctx.host
        cs377, z0_377, _ = build_blake2s_circuit(cv377.r, rand_input(0))
        pk377 = groth16.setup(cv377, cs377, rng)
        inner, inner_pubs = [], []
        for i in range(n):
            cs_i, z_i, _ = build_blake2s_circuit(cv377.r, rand_input(i))
            pf, _ = timed(groth16.prove, cv377, pk377, cs377, z_i, rng)
            inner.append(pf)
            inner_pubs.append(z_i[1:cs377.num_public + 1])
        (rc_cs, rc_z), ms = timed(
            build_verifier_circuit, pk377.vk, inner_pubs, inner, 32, cv377
        )
        csv(0, n, "olr", "synthesize", ms)
        # outer setup+prove run device-batched over BW6DevCtx (48-limb
        # Fp kernels); GT-side verification stays on host (host/bw6.py)
        opk, ms = timed(groth16.setup_device, bctx, rc_cs, rng)
        csv(0, n, "olr", "setup", ms)
        for trial in range(trials):
            def olr_prove():
                A, B2, C = groth16.prove_batch(
                    bctx, opk, rc_cs, [rc_z], rng
                )
                return groth16.Proof(a=A.to_host()[0], b=B2.to_host()[0],
                                     c=C.to_host()[0])

            oprf, ms = timed(olr_prove)
            csv(trial, n, "olr", "prove", ms)
            ok, ms = timed(
                groth16.verify, bw6, opk.vk,
                rc_z[1:rc_cs.num_public + 1], oprf,
            )
            assert ok, "olr verification failed"
            csv(trial, n, "olr", "verify", ms)
    if mono:
        # complete_circuit (bench.rs:470-526): ONE monolithic Groth16
        # proof covering all n Blake2s evaluations -- n independent
        # compression instances in a single constraint system (no
        # in-circuit pairing gadgets; this baseline exists to show how a
        # huge single SNARK compares against aggregation).
        from ripp_tpu.applications.blake2s_circuit import (
            build_blake2s_multi_circuit,
        )

        mono_inputs = [rand_input(k) for k in range(n)]
        (mono_cs, mono_z, _), ms = timed(
            build_blake2s_multi_circuit, host.r, mono_inputs
        )
        csv(0, n, "complete_circuit", "synthesize", ms)
        mono_pk, ms = timed(groth16.setup_device, ctx, mono_cs, rng)
        csv(0, n, "complete_circuit", "setup", ms)
        for trial in range(trials):
            # device-batched prover at B=1 (the query MSMs are the cost)
            def mono_prove():
                mA, mB2, mC = groth16.prove_batch(
                    ctx, mono_pk, mono_cs, [mono_z], rng
                )
                return groth16.Proof(a=mA.to_host()[0], b=mB2.to_host()[0],
                                     c=mC.to_host()[0])

            mono_prf, ms = timed(mono_prove)
            csv(trial, n, "complete_circuit", "prove", ms)
            mono_pub = mono_z[1:mono_cs.num_public + 1]
            ok, ms = timed(
                groth16.verify, host, mono_pk.vk, mono_pub, mono_prf
            )
            assert ok, "complete_circuit verification failed"
            csv(trial, n, "complete_circuit", "verify", ms)


if __name__ == "__main__":
    main()
