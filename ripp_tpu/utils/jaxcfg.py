"""JAX configuration: persistent compilation cache.

Big-int kernels (Fermat inversion scans, Miller loops) have large jaxprs;
first compiles take tens of seconds. A persistent cache makes every later
process start warm, which matters for the log-round protocol drivers that
jit one kernel per (type, size).
"""

from __future__ import annotations

import os

_DONE = False


def setup() -> None:
    global _DONE
    if _DONE:
        return
    import jax

    # XLA:CPU's LLVM JIT allocates one code/data mapping per compiled
    # section; the big Miller/shard_map modules push a process past the
    # default vm.max_map_count=65530, which surfaces as spurious
    # "LLVM compilation error: Cannot allocate memory" (then SIGSEGV)
    # with 100+ GB free.  Raise the limit when we can (root build VM).
    try:
        with open("/proc/sys/vm/max_map_count") as fh:
            if int(fh.read()) < 1048576:
                with open("/proc/sys/vm/max_map_count", "w") as fw:
                    fw.write("1048576")
    except (OSError, ValueError):
        pass

    # Platform-split caches: with PALLAS_AXON_REMOTE_COMPILE the TPU-side
    # entries are compiled on a DIFFERENT x86 host (the terminal side of
    # the tunnel); loading those AOT results into local XLA:CPU trips
    # machine-feature mismatches (cpu_aot_loader warns about SIGILL).
    # CPU runs therefore get their own cache directory.
    suffix = "_cpu" if os.environ.get("JAX_PLATFORMS", "") == "cpu" else ""
    cache_dir = os.environ.get(
        "RIPP_TPU_JAX_CACHE",
        os.environ.get(  # respect the standard JAX env var when set
            "JAX_COMPILATION_CACHE_DIR",
            os.path.join(os.path.dirname(__file__), "..", "..",
                         ".jax_cache" + suffix),
        ),
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax or read-only fs: run without the cache
    _DONE = True
