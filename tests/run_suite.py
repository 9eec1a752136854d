"""Run the test suite one FILE per process (the supported way to run the
full suite cold on a CPU host).

Why: XLA:CPU's LLVM JIT accumulates compile residue that is never
returned to the OS; one process compiling every BLS12-381-width module
of the suite grows past 100 GB RSS (observed round 4: a single pytest
process at 112 GB mid-test_protocols). tests/parallel_check.py already
runs its phases in subprocesses for the same reason; this runner applies
the pattern to the whole suite. The persistent compilation cache keeps
later files warm, so the split costs nothing.

Usage:  python tests/run_suite.py [extra pytest args...]
"""

from __future__ import annotations

import glob
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    files = sorted(glob.glob(os.path.join(REPO, "tests", "test_*.py")))
    extra = sys.argv[1:]
    failed = []
    for f in files:
        name = os.path.basename(f)
        t0 = time.time()
        r = subprocess.run(
            [sys.executable, "-m", "pytest", f, "-q"] + extra, cwd=REPO
        )
        status = "ok" if r.returncode in (0, 5) else f"FAIL rc={r.returncode}"
        print(f"== {name}: {status} ({time.time()-t0:.0f}s)", flush=True)
        if r.returncode not in (0, 5):  # 5 = no tests collected
            failed.append(name)
    if failed:
        print("FAILED FILES:", ", ".join(failed))
        return 1
    print("ALL TEST FILES PASSED")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
