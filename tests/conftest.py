"""Test configuration.

The suite runs on whatever platform the session pins (a single real TPU
chip under the axon plugin when available, CPU otherwise). Multi-device
sharding coverage lives in test_parallel.py, which re-launches
parallel_check.py in a subprocess on an 8-virtual-device CPU mesh — JAX
platforms cannot be switched after interpreter start, and the axon
sitecustomize hook registers its PJRT plugin at startup.
"""

import os

# Only take effect when nothing pinned a platform (plain CPU boxes/CI):
# give sharding paths 8 virtual devices.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Persistent compilation cache: the limb kernels compile slowly (seconds per
# shape instance) and protocols touch many shapes (n, n/2, ..., 1); cache
# compiled executables across test runs/processes.  CPU runs use their own
# directory: remote-compiled TPU AOT entries in .jax_cache are built on a
# different x86 host and trip machine-feature mismatches under XLA:CPU.
_suffix = "_cpu" if os.environ.get("JAX_PLATFORMS") == "cpu" else ""
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache" + _suffix
)

# The axon sitecustomize hook calls jax.config.update("jax_platforms",
# "axon,cpu") at interpreter start, which OVERRIDES the env var: a run
# that asked for CPU would silently claim (and contend for) the one real
# TPU chip. Re-assert the request through the config API, which wins.
if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

# LLVM's JIT makes one mapping per compiled code section; big Miller /
# shard_map modules exhaust the default vm.max_map_count=65530 ("LLVM
# compilation error: Cannot allocate memory" + SIGSEGV with RAM free).
try:
    with open("/proc/sys/vm/max_map_count") as _fh:
        if int(_fh.read()) < 1048576:
            with open("/proc/sys/vm/max_map_count", "w") as _fw:
                _fw.write("1048576")
except (OSError, ValueError):
    pass
