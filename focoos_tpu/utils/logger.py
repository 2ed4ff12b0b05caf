"""Colored logger + log-capture utilities (reference: focoos/utils/logger.py)."""

from __future__ import annotations

import atexit
import functools
import logging
import os
import sys
import time
from typing import Optional

_LOG_LEVEL = os.getenv("FOCOOS_TPU_LOG_LEVEL", "INFO").upper()

_COLORS = {
    "DEBUG": "\033[36m",
    "INFO": "\033[32m",
    "WARNING": "\033[33m",
    "ERROR": "\033[31m",
    "CRITICAL": "\033[35m",
}
_RESET = "\033[0m"


class _ColorFormatter(logging.Formatter):
    def format(self, record: logging.LogRecord) -> str:
        msg = super().format(record)
        if sys.stderr.isatty():
            color = _COLORS.get(record.levelname, "")
            return f"{color}{msg}{_RESET}"
        return msg


@functools.lru_cache(maxsize=None)
def get_logger(name: str = "focoos_tpu") -> logging.Logger:
    logger = logging.getLogger(name)
    if logger.handlers:
        return logger
    logger.setLevel(_LOG_LEVEL)
    handler = logging.StreamHandler(sys.stderr)
    handler.setFormatter(_ColorFormatter("%(asctime)s [%(name)s] %(levelname)s: %(message)s", "%H:%M:%S"))
    logger.addHandler(handler)
    logger.propagate = False
    return logger


_LAST_LOG_TIMES: dict = {}


def log_every_n_seconds(logger: logging.Logger, msg: str, n: float = 10.0, level: int = logging.INFO) -> None:
    """Rate-limited logging keyed by call site (reference: focoos/utils/logger.py:log_every_n_seconds)."""
    import inspect

    frame = inspect.currentframe()
    key = (frame.f_back.f_code.co_filename, frame.f_back.f_lineno) if frame and frame.f_back else msg
    now = time.time()
    if now - _LAST_LOG_TIMES.get(key, 0.0) >= n:
        _LAST_LOG_TIMES[key] = now
        logger.log(level, msg)


class _Tee:
    """Duplicate a stream to a log file (reference: focoos/utils/logger.py stdout tee)."""

    def __init__(self, stream, fileobj):
        self.stream = stream
        self.fileobj = fileobj

    def write(self, data):
        self.stream.write(data)
        self.fileobj.write(data)

    def flush(self):
        self.stream.flush()
        self.fileobj.flush()

    def isatty(self):
        return getattr(self.stream, "isatty", lambda: False)()


def capture_all_output(log_path: str) -> Optional[object]:
    """Tee stdout+stderr into ``log_path`` (per-run log.txt)."""
    os.makedirs(os.path.dirname(log_path) or ".", exist_ok=True)
    f = open(log_path, "a", buffering=1, encoding="utf-8")
    sys.stdout = _Tee(sys.stdout, f)
    sys.stderr = _Tee(sys.stderr, f)
    atexit.register(f.close)
    return f
