#!/usr/bin/env python
"""CI gate (analog of the reference's ci/format.py + tox flow):

1. packaging smoke: `from s3prl_tpu.nn import SUpstream` imports cleanly
   (the reference runs this before test deps, tox.ini:28);
2. the test suite — the fast default tier (tests/slow_tests.txt tiered out;
   the reference tiers by opt-in markers, test/conftest.py:8-84), or the
   full suite with --full.

Usage: python ci/check.py [--quick | --full]
  (default)  fast tier: pytest -q        (~5 min warm-cache)
  --quick    3 core modules only         (~1 min)
  --full     everything: pytest --runslow (~45 min on a 1-CPU box)
"""

import subprocess
import sys

QUICK_TESTS = [
    "tests/test_upstream_api.py",
    "tests/test_data.py",
    "tests/test_models.py",
]


def main():
    quick = "--quick" in sys.argv
    full = "--full" in sys.argv
    print("[1/2] import smoke test")
    subprocess.run(
        [sys.executable, "-c",
         "import os; os.environ['JAX_PLATFORMS']='cpu'; "
         "import jax; jax.config.update('jax_platforms','cpu'); "
         "from s3prl_tpu.nn import SUpstream; print('import OK')"],
        check=True,
    )
    print("[2/2] pytest")
    args = [sys.executable, "-m", "pytest", "-q"]
    if quick:
        args += QUICK_TESTS
    elif full:
        args += ["tests/", "--runslow"]
    else:
        args += ["tests/"]
    subprocess.run(args, check=True)
    print("CI green")


if __name__ == "__main__":
    main()
