"""Drive the 8-virtual-device sharding checks in a clean subprocess.

The main test process runs on the session's pinned platform (one real TPU
chip under axon, or whatever JAX_PLATFORMS says); multi-device mesh tests
need a CPU host platform with a forced device count, and JAX platforms
cannot be switched after initialization — hence the subprocess.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_sharded_reductions_and_dryrun():
    env = dict(os.environ)
    # drop the axon (single-TPU) PJRT plugin and force an 8-device CPU host
    # platform; the sitecustomize hook only registers axon when
    # PALLAS_AXON_POOL_IPS is non-empty
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    # NOTE: --xla_backend_optimization_level=0 is deliberately NOT set:
    # it ~halves compile time but the unoptimized LLVM modules of the big
    # Miller programs leak tens of GB per compile (observed: OOM/segfault
    # on a 125 GB box); default optimization stays ~6 GB RSS.
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    ).strip()
    # subprocess runs on XLA:CPU -> CPU-only cache (TPU AOT entries in
    # .jax_cache come from a different x86 host; loading them here risks
    # SIGILL per cpu_aot_loader machine-feature warnings)
    env.setdefault("JAX_COMPILATION_CACHE_DIR",
                   os.path.join(REPO, ".jax_cache_cpu"))
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tests", "parallel_check.py")],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        # cold-cache XLA:CPU compiles of the sharded Miller/Pippenger
        # programs take tens of minutes on this VM's single core; warm
        # .jax_cache runs take seconds
        timeout=3600,
    )
    assert proc.returncode == 0, (
        f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    )
    assert "ALL PARALLEL CHECKS PASSED" in proc.stdout
