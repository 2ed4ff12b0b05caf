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
        try:
            self.fileobj.write(data)
        except ValueError:  # log file already closed by atexit at teardown
            pass

    def flush(self):
        self.stream.flush()
        try:
            self.fileobj.flush()
        except ValueError:  # closed by atexit at teardown
            pass

    def isatty(self):
        return getattr(self.stream, "isatty", lambda: False)()


def capture_all_output(log_path: str) -> Optional[object]:
    """Tee stdout+stderr into ``log_path`` (per-run log.txt).

    Also re-points ALREADY-CREATED logging StreamHandlers at the tee:
    handlers hold a reference to the original sys.stderr from import time, so
    without this every logger created before training starts would bypass
    log.txt (observed: a run's log.txt containing only the late-created
    evaluation logger's lines)."""
    os.makedirs(os.path.dirname(log_path) or ".", exist_ok=True)
    f = open(log_path, "a", buffering=1, encoding="utf-8")
    old_out, old_err = sys.stdout, sys.stderr
    sys.stdout = _Tee(old_out, f)
    sys.stderr = _Tee(old_err, f)
    for name in list(logging.root.manager.loggerDict) + [None]:
        lg = logging.getLogger(name) if name else logging.root
        for h in getattr(lg, "handlers", []):
            if isinstance(h, logging.StreamHandler) and getattr(h, "stream", None) in (old_out, old_err):
                h.stream = sys.stderr if h.stream is old_err else sys.stdout
    atexit.register(f.close)
    return f
