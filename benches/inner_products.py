"""Inner-product micro-bench (benches/benches/inner_products.rs parity):
wall ms for pairing IP, MSM-G1, MSM-G2 at LEN=16 on BLS12-381."""

from __future__ import annotations

import sys

from ripp_tpu.models.instances import mipp_config, tipp_config
from ripp_tpu.models.commitments import MultiexpIP
from ripp_tpu.ops.points import dev_ctx
from ripp_tpu.utils.fiat_shamir import SeededRng

from .common import rand_fr_vec, rand_g1_vec, rand_g2_vec, timed

LEN = 16


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else LEN
    ctx = dev_ctx("bls12_381")
    rng = SeededRng(0)
    a1 = rand_g1_vec(ctx, rng, n)
    b2 = rand_g2_vec(ctx, rng, n)
    fr = rand_fr_vec(ctx, rng, n)

    tipp = tipp_config(ctx)
    _, ms = timed(tipp.ip.compute, a1, b2)  # warm compile
    _, ms = timed(tipp.ip.compute, a1, b2)
    print(f"pairing inner product, len {n}: {ms:.1f} ms")

    mipp = mipp_config(ctx)
    _, _ = timed(mipp.ip.compute, a1, fr)
    _, ms = timed(mipp.ip.compute, a1, fr)
    print(f"multiexponentiation G1 inner product, len {n}: {ms:.1f} ms")

    mipp2 = MultiexpIP(ctx, "g2")
    _, _ = timed(mipp2.compute, b2, fr)
    _, ms = timed(mipp2.compute, b2, fr)
    print(f"multiexponentiation G2 inner product, len {n}: {ms:.1f} ms")


if __name__ == "__main__":
    main()
