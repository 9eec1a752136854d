"""Multi-device scaling of the two sharded reduction kernels.

Measures sharded pairing-product (multiplicative Fq12 all-reduce) and
sharded MSM (additive EC all-reduce) throughput at 1/2/4/8 devices at a
compute-dominated size, reporting parallel efficiency vs the 1-device
run (BASELINE.json target: >= 80%).

CSV: kernel,n,ndev,seconds,elems_per_s,efficiency -> <outdir>/scaling-kernels.csv

Usage:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python -m benches.scaling_kernels [curve] [log2_n] [outdir]

METHODOLOGY NOTE: on the single-socket CI host the 8 "devices" of the
forced CPU platform share the same core(s), so measured efficiency
documents the harness, not ICI scaling; on a real v5e pod slice the same
script reports true multi-chip efficiency (the collectives are one
log(D)-depth Fq12/EC combine per reduction - communication-trivial next
to the per-device Miller/Pippenger work).
"""

from __future__ import annotations

import os
import sys
import time

import jax

from ripp_tpu.models.vectors import FrVec, PointVec
from ripp_tpu.ops.points import dev_ctx
from ripp_tpu.parallel import (
    data_mesh,
    make_sharded_miller_product,
    make_sharded_msm,
    shard_tree,
)
from ripp_tpu.utils.fiat_shamir import SeededRng, rand_field, rand_sw_point


def _bench(fn, args, iters=3):
    jax.block_until_ready(fn(*args))  # compile + warm
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    curve = sys.argv[1] if len(sys.argv) > 1 else "bls12_nano"
    logn = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    outdir = sys.argv[3] if len(sys.argv) > 3 else "data"
    os.makedirs(outdir, exist_ok=True)
    n = 1 << logn
    ctx = dev_ctx(curve)
    host = ctx.host
    rng = SeededRng(3)
    A = [rand_sw_point(rng, host.g1) for _ in range(n)]
    B = [rand_sw_point(rng, host.g2) for _ in range(n)]
    r = [rand_field(rng, host.r) for _ in range(n)]
    dA = ctx.g1_to_dev(A)
    dB = ctx.g2_to_dev(B)
    dr = ctx.t.fr_to_dev(r)

    all_devs = jax.devices()
    counts = [d for d in (1, 2, 4, 8) if d <= len(all_devs)]
    rows = []
    base = {}
    for ndev in counts:
        mesh = data_mesh(all_devs[:ndev])
        a_sh = shard_tree(mesh, dA)
        b_sh = shard_tree(mesh, dB)
        r_sh = shard_tree(mesh, dr)
        for kernel, fn, args in (
            ("pairing_product", make_sharded_miller_product(ctx, mesh),
             (a_sh, b_sh)),
            ("msm_g1", make_sharded_msm(ctx, "g1", mesh), (a_sh, r_sh)),
        ):
            dt = _bench(fn, args)
            eps = n / dt
            if ndev == 1:
                base[kernel] = dt
            eff = base[kernel] / (dt * ndev)
            rows.append((kernel, n, ndev, dt, eps, eff))
            print(f"{kernel} n={n} ndev={ndev}: {dt*1e3:.1f} ms "
                  f"({eps:,.0f} elems/s, efficiency {eff:.0%})",
                  flush=True)

    path = os.path.join(outdir, "scaling-kernels.csv")
    with open(path, "w") as f:
        f.write("kernel,n,ndev,seconds,elems_per_s,efficiency\n")
        for k, nn, d, dt, eps, eff in rows:
            f.write(f"{k},{nn},{d},{dt:.6f},{eps:.1f},{eff:.4f}\n")
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
