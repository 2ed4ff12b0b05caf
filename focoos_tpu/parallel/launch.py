"""Multi-host launch (reference: focoos/utils/distributed/dist.py:38 launch()).

The torch version spawns one process per GPU and wires NCCL. On TPU one
process drives all local chips, so "launch" means: initialize
``jax.distributed`` across hosts (coordinator address from args or the
standard TPU env), then call the entrypoint once per host. Single-host is a
plain call.
"""

from __future__ import annotations

import os
from typing import Callable, Optional, Tuple

from focoos_tpu.utils.logger import get_logger

logger = get_logger(__name__)


def launch(
    main_func: Callable,
    num_devices: int = -1,
    num_machines: int = 1,
    machine_rank: int = 0,
    dist_url: Optional[str] = None,
    args: Tuple = (),
):
    """Run ``main_func(*args)`` with the distributed runtime initialized.

    - single host: direct call (XLA already sees every local chip).
    - multi host: ``jax.distributed.initialize`` with the coordinator at
      ``dist_url`` (or auto-detected on Cloud TPU pods).
    """
    import jax

    if num_machines > 1 or os.environ.get("COORDINATOR_ADDRESS") or dist_url:
        coordinator = dist_url.replace("tcp://", "") if dist_url else os.environ.get("COORDINATOR_ADDRESS")
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_machines if num_machines > 1 else None,
            process_id=machine_rank if num_machines > 1 else None,
        )
        logger.info(
            f"jax.distributed initialized: process {jax.process_index()}/{jax.process_count()}, "
            f"{jax.local_device_count()} local / {jax.device_count()} global devices"
        )
    return main_func(*args)
