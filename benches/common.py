"""Shared helpers for the bench CLIs (reference harness parity,
SURVEY.md section 6)."""

from __future__ import annotations

import time
from contextlib import contextmanager

from ripp_tpu.models.vectors import FrVec, PointVec
from ripp_tpu.utils.fiat_shamir import SeededRng, rand_field, rand_sw_point


class Timer:
    def __init__(self):
        self.ms = 0.0

    @contextmanager
    def measure(self):
        t0 = time.perf_counter()
        yield
        self.ms = (time.perf_counter() - t0) * 1e3


def timed(fn, *args, **kwargs):
    t0 = time.perf_counter()
    out = fn(*args, **kwargs)
    return out, (time.perf_counter() - t0) * 1e3


def rand_g1_vec(ctx, rng, n) -> PointVec:
    return PointVec.from_host(
        ctx, "g1", [rand_sw_point(rng, ctx.host.g1) for _ in range(n)]
    )


def rand_g2_vec(ctx, rng, n) -> PointVec:
    return PointVec.from_host(
        ctx, "g2", [rand_sw_point(rng, ctx.host.g2) for _ in range(n)]
    )


def rand_fr_vec(ctx, rng, n) -> FrVec:
    return FrVec.from_ints(
        ctx, [rand_field(rng, ctx.host.r) for _ in range(n)]
    )
