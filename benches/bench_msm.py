"""Variable-base MSM throughput bench (BASELINE config 2: Pippenger MSM
G1 + G2 at n = 2^16, points/s).

Usage: python -m benches.bench_msm [log2_n] [iters] [curve]

Emits CSV `group,n,ms,points_per_s` on stdout.  Fixture points are cheap
multiples of the generator built ON DEVICE (2^16 host scalar-muls would
dominate wall-clock otherwise); scalars are ChaCha-derived.
"""

from __future__ import annotations

import sys
import time

import jax

from ripp_tpu.ops import msm as msm_mod
from ripp_tpu.ops.fixed_base import fixed_base_msm
from ripp_tpu.ops.points import dev_ctx
from ripp_tpu.utils.fiat_shamir import SeededRng, rand_field


def bench_group(ctx, grp: str, n: int, iters: int):
    host = ctx.host
    rng = SeededRng(1234)
    dcurve = ctx.g1 if grp == "g1" else ctx.g2
    gen = host.g1_gen if grp == "g1" else host.g2_gen

    # fixture: points = (i+1) * gen via the fixed-base table kernel
    from ripp_tpu.models.vectors import PointVec

    base = PointVec.from_host(ctx, grp, [gen])
    pts = fixed_base_msm(dcurve, base.pts, list(range(1, n + 1)),
                         host.r.bit_length())
    scalars = ctx.t.fr_to_dev([rand_field(rng, host.r) for _ in range(n)])

    def run():
        return msm_mod.msm(dcurve, ctx.t.fr, pts, scalars)

    out = run()
    jax.block_until_ready(out)  # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run()
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"{grp},{n},{ms:.2f},{n / ms * 1e3:.0f}", flush=True)
    return ms


def main():
    log2n = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    curve = sys.argv[3] if len(sys.argv) > 3 else "bls12_381"
    ctx = dev_ctx(curve)
    n = 1 << log2n
    print("group,n,ms,points_per_s", flush=True)
    bench_group(ctx, "g1", n, iters)
    bench_group(ctx, "g2", n, iters)


if __name__ == "__main__":
    main()
