#!/usr/bin/env python
"""CI gate (analog of the reference's ci/format.py + tox flow):

1. packaging smoke: `from s3prl_tpu.nn import SUpstream` imports cleanly
   (the reference runs this before test deps, tox.ini:28);
2. the full CPU test suite.

Usage: python ci/check.py [--quick]
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
    args += QUICK_TESTS if quick else ["tests/"]
    subprocess.run(args, check=True)
    print("CI green")


if __name__ == "__main__":
    main()
