"""Measure the RNS-MXU Montgomery multiplier prototype (ops/fp_rns.py).

Prints Fp muls/s for BLS12-381 alongside the CIOS Pallas kernel's measured
number, using the same honest protocol as bench.py: fresh input buffers per
timed iteration, per-iteration block_until_ready, and a device-vs-host
correctness gate before anything is timed.

Usage: python benches/bench_fp_rns.py [batch] [chain_depth] [iters]
"""

import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache_cpu" if os.environ.get("JAX_PLATFORMS") == "cpu"
        else ".jax_cache",
    ),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np
import jax

if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
    # axon sitecustomize overrides the env var via jax.config; re-assert
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ripp_tpu.ops.fp_rns import (
    from_rns_base_a, make_rns_mul, rns_spec, to_rns, MR_MASK,
)

P381 = 0x1A0111EA397FE69A4B1BA7B6434BACD764774B84F38512BF6730D2A0F6B0F6241EABFFFEB153FFFFB9FEFFFFFFFFAAAB


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 16
    D = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 5

    s = rns_spec(P381)
    k = s["k"]
    mul = make_rns_mul(P381)

    def chain(a, b):
        # D dependent muls: defeats dead-code elimination and amortizes
        # dispatch, matching how fp_pallas was measured (12-chains).
        acc = a
        for _ in range(D):
            acc = mul(acc, b)
        return acc

    jchain = jax.jit(chain)

    # correctness gate at small n (device vs host bigint)
    n0 = 8
    rng = np.random.default_rng(42)
    a0 = [int.from_bytes(rng.bytes(64), "little") % P381 for _ in range(n0)]
    b0 = [int.from_bytes(rng.bytes(64), "little") % P381 for _ in range(n0)]
    out = jax.jit(chain)(to_rns(P381, a0), to_rns(P381, b0))
    got = from_rns_base_a(P381, np.asarray(out[0]))
    MAinv = pow(s["MA"], -1, P381)
    want = list(a0)
    for _ in range(D):
        want = [(x * y * MAinv) % P381 for x, y in zip(want, b0)]
    assert got == want, "device RNS chain != host bigint chain"
    print(f"correctness gate: {n0}-element depth-{D} chain == host", file=sys.stderr)

    # fresh random residue batches per iteration (uniform residues are fine
    # for throughput: channel ops are data-independent)
    def fresh(seed):
        r = np.random.default_rng(seed)
        rA = r.integers(0, np.asarray(s["mA"], np.uint32)[:, None],
                        size=(k, B)).astype(np.uint32)
        rB = r.integers(0, np.asarray(s["mB"], np.uint32)[:, None],
                        size=(k, B)).astype(np.uint32)
        rr = r.integers(0, MR_MASK + 1, size=(B,), dtype=np.uint32)
        return (jnp.asarray(rA), jnp.asarray(rB), jnp.asarray(rr))

    # NOTE: throughput-only inputs (residues not mutually consistent); the
    # kernel's work is identical, correctness was gated above.
    warm = jchain(fresh(0), fresh(1))
    jax.block_until_ready(warm)

    times = []
    for i in range(iters):
        a, b = fresh(2 * i + 2), fresh(2 * i + 3)
        jax.block_until_ready((a, b))
        t0 = time.perf_counter()
        jax.block_until_ready(jchain(a, b))
        times.append(time.perf_counter() - t0)
    dt = min(times)
    muls = B * D
    rate = muls / dt
    print(
        f"rns_mxu_mul: batch={B} depth={D} best={dt*1e3:.2f} ms "
        f"-> {rate/1e6:.1f} M muls/s "
        f"(CIOS pallas measured 258.4 M; parity bar ~5600 M)",
        file=sys.stderr,
    )
    print(f'{{"metric": "fp_mul_rns_mxu", "value": {rate:.0f}, "unit": "muls/s"}}')


if __name__ == "__main__":
    main()
