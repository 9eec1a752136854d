"""Headline benchmark: batched pairing-product throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The metric is full pairing-product throughput (batched Miller loops + Fq12
product reduction, the hot kernel under SIPP/TIPP/AFGHO — SURVEY.md
section 2.1 rows 2-3) at n=256 pairs on BLS12-381 (BASELINE config 1 scale).

vs_baseline: the reference publishes no numbers and this image has no Rust
toolchain (BASELINE.md), so the denominator is an estimate of the reference
`cfg_multi_pairing` on the BASELINE.json target hardware (64-core CPU):
arkworks BLS12-381 Miller loop ~= 400us/pair single-thread and the chunked
product scales near-linearly => ~160k pairs/s. Replace with a measured
number when a Rust toolchain is available.
"""

import json
import time

REF_PAIRS_PER_S_64CORE_EST = 160_000.0

N = 256
ITERS = 3


def main():
    import jax

    from ripp_tpu.ops.pairing import dev_pairing
    from ripp_tpu.ops.points import dev_ctx

    ctx = dev_ctx("bls12_381")
    host = ctx.host

    # deterministic fixture: small generator multiples (cheap on host)
    A = [host.g1.scalar_mul(host.g1_gen, 2 * i + 3) for i in range(N)]
    B = [host.g2.scalar_mul(host.g2_gen, 3 * i + 5) for i in range(N)]
    dA, dB = ctx.g1_to_dev(A), ctx.g2_to_dev(B)

    dp = dev_pairing(ctx)

    def run(P, Q):
        g1a = ctx.g1.normalize(P)
        g2a = ctx.g2.normalize(Q)
        f = dp.miller_batch(g1a, g2a)
        return dp.product_reduce(f)

    run_j = jax.jit(run)
    jax.block_until_ready(run_j(dA, dB))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = run_j(dA, dB)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / ITERS

    pairs_per_s = N / dt
    print(json.dumps({
        "metric": "pairing_product_throughput_n256_bls12_381",
        "value": round(pairs_per_s, 2),
        "unit": "pairings/s",
        "vs_baseline": round(pairs_per_s / REF_PAIRS_PER_S_64CORE_EST, 4),
    }))


def _backend_alive(timeout_s: int = 900) -> bool:
    """Probe the pinned JAX backend in a subprocess with a hard timeout.

    A wedged axon tunnel makes jax.devices() hang for 30+ minutes (the
    remote chip claim must expire first); without this guard the bench
    would hang the whole harness instead of reporting failure."""
    import subprocess
    import sys

    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax, jax.numpy as jnp;"
             "jnp.arange(4).sum().block_until_ready()"],
            timeout=timeout_s, capture_output=True,
        )
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


if __name__ == "__main__":
    if _backend_alive():
        main()
    else:
        print(json.dumps({
            "metric": "pairing_product_throughput_n256_bls12_381",
            "value": 0.0,
            "unit": "pairings/s",
            "vs_baseline": 0.0,
            "error": "JAX backend unavailable (axon TPU tunnel down); "
                     "last measured value: see BASELINE.md",
        }))
