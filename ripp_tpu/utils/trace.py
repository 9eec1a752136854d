"""Scope timers: the ark_std start_timer/end_timer (`print-trace` feature)
analog (SURVEY.md section 5.1).

Enabled by RIPP_TPU_TRACE=1 (off by default, like the reference's cargo
feature). Scope labels match the reference's timer labels so phase timings
are directly comparable. `jax_profile` additionally wraps a scope in a
jax.profiler trace when RIPP_TPU_PROFILE_DIR is set."""

from __future__ import annotations

import os
import time
from contextlib import contextmanager

_ENABLED = os.environ.get("RIPP_TPU_TRACE", "") == "1"
_DEPTH = 0


@contextmanager
def scope(label: str):
    """Nested wall-clock scope printed like the reference's timers."""
    global _DEPTH
    if not _ENABLED:
        yield
        return
    indent = "·" * (2 * _DEPTH)
    print(f"{indent}Start: {label}", flush=True)
    _DEPTH += 1
    t0 = time.perf_counter()
    try:
        yield
    finally:
        _DEPTH -= 1
        ms = (time.perf_counter() - t0) * 1e3
        print(f"{indent}End:   {label} {ms:.3f}ms", flush=True)


@contextmanager
def jax_profile(label: str):
    """jax.profiler trace scope, active when RIPP_TPU_PROFILE_DIR is set."""
    profile_dir = os.environ.get("RIPP_TPU_PROFILE_DIR")
    if not profile_dir:
        with scope(label):
            yield
        return
    import jax

    with jax.profiler.trace(profile_dir):
        with scope(label):
            yield
