"""OOM-tolerant execution helpers (reference: focoos/utils/memory.py:25-83).

The reference's ``retry_if_cuda_oom`` retries after ``torch.cuda.empty_cache``
and then falls back to CPU. The JAX analog: on ``RESOURCE_EXHAUSTED``, clear
jit caches / live buffers where possible, retry, then fall back to the CPU
backend.
"""

from __future__ import annotations

import functools
from typing import Callable

from focoos_tpu.utils.logger import get_logger

logger = get_logger(__name__)


def _is_oom(err: Exception) -> bool:
    msg = str(err)
    return "RESOURCE_EXHAUSTED" in msg or "Out of memory" in msg or "out of memory" in msg.lower()


def retry_if_oom(func: Callable) -> Callable:
    """Call ``func``; on device OOM clear caches and retry; finally retry on CPU."""

    @functools.wraps(func)
    def wrapped(*args, **kwargs):
        import jax

        try:
            return func(*args, **kwargs)
        except Exception as e:  # noqa: BLE001
            if not _is_oom(e):
                raise
            logger.warning(f"{func.__name__}: device OOM, clearing caches and retrying")
            jax.clear_caches()
        try:
            return func(*args, **kwargs)
        except Exception as e:  # noqa: BLE001
            if not _is_oom(e):
                raise
            logger.warning(f"{func.__name__}: still OOM, retrying on CPU")
            cpu = jax.devices("cpu")[0]
            with jax.default_device(cpu):
                return func(*args, **kwargs)

    return wrapped
