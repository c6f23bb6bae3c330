"""CLI entry: `python -m s3prl_tpu.main <ProblemName> [--config ...] [--a.b v]`.

The analog of the reference's s3prl-main console script (s3prl/main.py:6-26):
resolve the problem class from the registry and hand the remaining argv to
its omni-config `main`.
"""

from __future__ import annotations

import logging
import sys

from .problem.base import Problem
from . import problem as _problem_registry  # noqa: F401  (populates registry)

logging.basicConfig(
    level=logging.INFO, format="%(asctime)s %(levelname)s %(name)s: %(message)s"
)


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help"):
        print(__doc__)
        print("available problems:", ", ".join(sorted(Problem._registry)))
        return
    cls = Problem.get_class_from_name(argv[0])
    return cls().main(argv[1:])


if __name__ == "__main__":
    main()
