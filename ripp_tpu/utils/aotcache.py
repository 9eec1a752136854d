"""AOT export cache: skip Python re-tracing of huge jitted pipelines.

The cold-process penalty (VERDICT r4 item 4: TIPP 2^14 rep0/rep1 = 21x)
has two parts: XLA compiles (already covered by the persistent
compilation cache) and PYTHON TRACING of the fused register-machine
kernels — ~10^5 op constructions per program, minutes of single-core
Python per fresh process, paid before the compilation cache can even be
consulted.

jax.export removes the second part: the traced+lowered StableHLO of a
jitted callable is serialized to disk once, and later processes
deserialize (a fast flatbuffer/StableHLO parse) and call — same program
bytes, so the XLA persistent cache hit still applies to the compile.

Artifacts live in <repo>/.jax_export/<key>-<platform>.bin and are
committed like the .jax_cache entries. Keys must encode everything that
changes the traced program (curve, batch shape, flags).

The reference has no analog (Rust is AOT-compiled); this replaces the
compile-once property that rustc gives the reference for free.
"""

from __future__ import annotations

import hashlib
import os
from typing import Callable, Sequence

import jax

_DIR = os.environ.get(
    "RIPP_EXPORT_DIR",
    os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), ".jax_export"),
)

# Bump when kernel code changes in ways that alter traced programs, so
# stale artifacts can never resurrect old math. (Differential tests
# against host ground truth are the backstop.)
VERSION = "r5a"


def _path(key: str) -> str:
    plat = jax.default_backend()
    return os.path.join(_DIR, f"{key}-{VERSION}-{plat}.bin")


def disabled() -> bool:
    return os.environ.get("RIPP_AOT_EXPORT", "1") == "0"


def cached_export(key: str, build: Callable[[], Callable],
                  example_args_fn: Callable[[], Sequence]) -> Callable:
    """Return a callable for the pipeline `build()` (a jit-able fn),
    deserializing a previously exported artifact when available.

    build:            () -> python callable (will be jax.jit-ed)
    example_args_fn:  () -> abstract example args (ShapeDtypeStruct
                      pytrees ok); only used when exporting fresh.

    On any export/deserialize failure the plain jitted callable is
    returned (correctness never depends on the cache)."""
    if disabled():
        return jax.jit(build())
    path = _path(key)
    if os.path.exists(path):
        try:
            with open(path, "rb") as fh:
                exp = jax.export.deserialize(fh.read())
            fn = exp.call
            return jax.jit(fn)
        except Exception:
            pass  # stale/corrupt artifact: fall through to re-export
    fn = jax.jit(build())
    try:
        exp = jax.export.export(fn)(*example_args_fn())
        _save(path, exp)
        return jax.jit(exp.call)
    except Exception:
        return fn


def _save(path: str, exp) -> None:
    os.makedirs(_DIR, exist_ok=True)
    tmp = path + f".tmp.{os.getpid()}"
    with open(tmp, "wb") as fh:
        fh.write(exp.serialize())
    os.replace(tmp, path)


def aot_jit(name: str, fn: Callable) -> Callable:
    """jit with a disk-backed export cache, keyed by (name, arg shapes).

    On the first call with a given arg-shape signature the function is
    traced+exported once and the artifact persisted; every later PROCESS
    deserializes instead of re-tracing (the XLA persistent cache then
    skips the compile too). Arguments must be array pytrees (no python
    scalars). Falls back to plain jit on any export failure."""
    if disabled():
        return jax.jit(fn)
    cache = {}
    jfn = jax.jit(fn)

    def wrapper(*args):
        shapes = str(jax.tree.map(
            lambda x: (getattr(x, "shape", ()), str(getattr(x, "dtype", type(x)))),
            args))
        key = f"{name}-{hashlib.md5(shapes.encode()).hexdigest()[:10]}"
        entry = cache.get(key)
        if entry is None:
            path = _path(key)
            entry = None
            if os.path.exists(path):
                try:
                    with open(path, "rb") as fh:
                        entry = jax.jit(jax.export.deserialize(fh.read()).call)
                except Exception:
                    entry = None
            if entry is None:
                try:
                    exp = jax.export.export(jfn)(*args)
                    _save(path, exp)
                    entry = jax.jit(exp.call)
                except Exception:
                    entry = jfn
            cache[key] = entry
        return entry(*args)

    return wrapper
