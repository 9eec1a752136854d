"""Poly-commit bench (benches/benches/poly_commit.rs parity).

CSV schema `trial,scheme,function,degree,time` on stdout; schemes kzg /
ipa / transparent_ipa; degrees 4^(i+1)-1; verify = mean of VERIFY_ITERS.

Usage: python -m benches.bench_poly_commit [num_trials] [num_data_points]
"""

from __future__ import annotations

import sys
import time

from ripp_tpu.applications import kzg, poly_commit, poly_commit_transparent
from ripp_tpu.ops.points import dev_ctx
from ripp_tpu.utils.fiat_shamir import SeededRng, rand_field
from ripp_tpu.utils.poly import poly_eval

from .common import timed

VERIFY_ITERS = 50


def csv(trial, scheme, function, degree, ms):
    print(f"{trial},{scheme},{function},{degree},{ms:.3f}", flush=True)


def bench_kzg(ctx, rng, trial, degree):
    r = ctx.host.r
    coeffs = [rand_field(rng, r) for _ in range(degree + 1)]
    (powers, v_srs), ms = timed(kzg.setup, ctx, rng, degree)
    csv(trial, "kzg", "setup", degree, ms)
    com, ms = timed(kzg.commit, powers, coeffs)
    csv(trial, "kzg", "commit", degree, ms)
    z = rand_field(rng, r)
    proof, ms = timed(kzg.open, powers, coeffs, z)
    csv(trial, "kzg", "open", degree, ms)
    ev = poly_eval(coeffs, z, r)
    t0 = time.perf_counter()
    for _ in range(VERIFY_ITERS):
        ok = kzg.verify(ctx, v_srs, com, z, ev, proof)
    ms = (time.perf_counter() - t0) * 1e3 / VERIFY_ITERS
    assert ok
    csv(trial, "kzg", "verify", degree, ms)


def bench_ipa(ctx, rng, trial, degree):
    r = ctx.host.r
    coeffs = [rand_field(rng, r) for _ in range(degree + 1)]
    srs, ms = timed(poly_commit.setup_univariate, ctx, rng, degree)
    csv(trial, "ipa", "setup", degree, ms)
    v_srs = srs.ip_srs.get_verifier_key()
    (com, y_coms), ms = timed(poly_commit.commit_univariate, ctx, srs, coeffs)
    csv(trial, "ipa", "commit", degree, ms)
    z = rand_field(rng, r)
    proof, ms = timed(
        poly_commit.open_univariate, ctx, srs, coeffs, y_coms, z
    )
    csv(trial, "ipa", "open", degree, ms)
    ev = poly_eval(coeffs, z, r)
    t0 = time.perf_counter()
    ok = poly_commit.verify_univariate(ctx, v_srs, degree, com, z, ev, proof)
    ms = (time.perf_counter() - t0) * 1e3
    assert ok
    csv(trial, "ipa", "verify", degree, ms)


def bench_transparent(ctx, rng, trial, degree):
    r = ctx.host.r
    coeffs = [rand_field(rng, r) for _ in range(degree + 1)]
    ck, ms = timed(poly_commit_transparent.setup_univariate, ctx, rng, degree)
    csv(trial, "transparent_ipa", "setup", degree, ms)
    (com, y_coms), ms = timed(
        poly_commit_transparent.commit_univariate, ctx, ck, coeffs
    )
    csv(trial, "transparent_ipa", "commit", degree, ms)
    z = rand_field(rng, r)
    proof, ms = timed(
        poly_commit_transparent.open_univariate, ctx, ck, coeffs, y_coms, z
    )
    csv(trial, "transparent_ipa", "open", degree, ms)
    ev = poly_eval(coeffs, z, r)
    t0 = time.perf_counter()
    ok = poly_commit_transparent.verify_univariate(
        ctx, ck, com, z, ev, proof
    )
    ms = (time.perf_counter() - t0) * 1e3
    assert ok
    csv(trial, "transparent_ipa", "verify", degree, ms)


def main():
    trials = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    points = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    ctx = dev_ctx("bls12_381")
    rng = SeededRng(0)
    print("trial,scheme,function,degree,time")
    for trial in range(trials):
        for i in range(points):
            degree = 4 ** (i + 1) - 1
            bench_kzg(ctx, rng, trial, degree)
            bench_ipa(ctx, rng, trial, degree)
            bench_transparent(ctx, rng, trial, degree)


if __name__ == "__main__":
    main()
