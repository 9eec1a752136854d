"""SIPP scaling harness (sipp/examples/scaling-ipp.rs parity).

CSV `size,direct,prover,verifier` (seconds) per device count, written to
<outdir>/ipp-<ndev>-devices.csv so the reference gnuplot script works with
devices standing in for threads.

Usage: python -m benches.scaling_ipp <log2_min> <log2_max> <outdir>
"""

from __future__ import annotations

import os
import sys
import time

import jax

from ripp_tpu.models import sipp
from ripp_tpu.models.vectors import FrVec, PointVec
from ripp_tpu.ops.points import dev_ctx
from ripp_tpu.utils.fiat_shamir import SeededRng, rand_field, rand_sw_point


def main():
    lo = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    hi = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    outdir = sys.argv[3] if len(sys.argv) > 3 else "data"
    os.makedirs(outdir, exist_ok=True)
    ndev = len(jax.devices())
    ctx = dev_ctx("bls12_381")
    host = ctx.host
    rng = SeededRng(0)

    path = os.path.join(outdir, f"ipp-{ndev}-devices.csv")
    with open(path, "w") as f:
        f.write("size,direct,prover,verifier\n")
        for logn in range(lo, hi + 1):
            n = 1 << logn
            A = [rand_sw_point(rng, host.g1) for _ in range(n)]
            B = [rand_sw_point(rng, host.g2) for _ in range(n)]
            r = [rand_field(rng, host.r) for _ in range(n)]

            t0 = time.perf_counter()
            value = sipp.product_of_pairings_with_coeffs(
                ctx,
                PointVec.from_host(ctx, "g1", A),
                PointVec.from_host(ctx, "g2", B),
                FrVec.from_ints(ctx, r),
            )
            direct = time.perf_counter() - t0

            t0 = time.perf_counter()
            if ndev > 1 and n >= 2 * ndev:
                # mesh-resident prover (parallel/sipp.py): per-round ICI
                # all-reduces, device-local folds; byte-identical proofs
                from ripp_tpu.parallel import ShardedSIPP
                from ripp_tpu.parallel.mesh import data_mesh

                proof = ShardedSIPP(ctx, data_mesh()).prove(A, B, r, value)
            else:
                proof = sipp.prove(ctx, A, B, r, value)
            prover = time.perf_counter() - t0

            t0 = time.perf_counter()
            ok = sipp.verify(ctx, A, B, r, value, proof)
            verifier = time.perf_counter() - t0
            assert ok

            line = f"{n},{direct:.6f},{prover:.6f},{verifier:.6f}"
            f.write(line + "\n")
            print(line, flush=True)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
