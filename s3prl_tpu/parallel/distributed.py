"""Multi-host runtime helpers (SURVEY §5.8).

The reference initializes torch.distributed process groups per GPU process
(run_downstream.py:166-168) and gates side effects on rank 0
(utility/helper.py:28 is_leader_process). TPU-native equivalents:
`jax.distributed.initialize()` once per host, `jax.process_index()` as the
leader test, and per-host FileLock + global device sync replacing the
download barrier (runner.py:145-156).
"""

from __future__ import annotations

import logging
import os
from typing import Optional

import jax

logger = logging.getLogger(__name__)


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize the multi-host runtime (no-op on single host).

    With TPU pods the arguments are auto-discovered from the environment;
    explicit values serve GPU/CPU clusters.
    """
    if num_processes is None and "COORDINATOR_ADDRESS" not in os.environ and coordinator_address is None:
        if jax.process_count() == 1:
            logger.info("single-process runtime; skipping jax.distributed.initialize")
            return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    logger.info(
        f"initialized process {jax.process_index()}/{jax.process_count()} "
        f"with {jax.local_device_count()} local devices"
    )


def is_leader_process() -> bool:
    """Rank-0 test (analog of utility/helper.py:28)."""
    return jax.process_index() == 0


def barrier(name: str = "barrier") -> None:
    """Global device sync (analog of torch.distributed.barrier for the
    rank-0-downloads pattern, runner.py:145-156)."""
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)
