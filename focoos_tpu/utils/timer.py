"""Timing helpers (reference: focoos/utils/timer.py)."""

from __future__ import annotations

import functools
import time
from typing import Callable

from focoos_tpu.utils.logger import get_logger

logger = get_logger(__name__)


class Timer:
    """Context-manager + cumulative timer."""

    def __init__(self):
        self.reset()

    def reset(self) -> None:
        self._start = time.perf_counter()
        self._paused_at = None
        self._paused_total = 0.0

    def pause(self) -> None:
        if self._paused_at is None:
            self._paused_at = time.perf_counter()

    def resume(self) -> None:
        if self._paused_at is not None:
            self._paused_total += time.perf_counter() - self._paused_at
            self._paused_at = None

    def seconds(self) -> float:
        end = self._paused_at if self._paused_at is not None else time.perf_counter()
        return end - self._start - self._paused_total

    def __enter__(self) -> "Timer":
        self.reset()
        return self

    def __exit__(self, *a) -> None:
        self.elapsed = self.seconds()


def took(func: Callable) -> Callable:
    """Decorator logging wall-clock of each call (reference @took)."""

    @functools.wraps(func)
    def wrapped(*args, **kwargs):
        t0 = time.perf_counter()
        result = func(*args, **kwargs)
        logger.info(f"{func.__name__} took {(time.perf_counter() - t0) * 1000:.1f} ms")
        return result

    return wrapped
