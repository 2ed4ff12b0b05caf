"""Environment-driven framework configuration (reference: focoos/config.py:26-69).

Plain dataclass + os.environ parsing (pydantic-settings is not available in
this image, and the surface is 6 fields).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from focoos_tpu.ports import PROD_API_URL, RuntimeType


def _env(name: str, default):
    raw = os.getenv(name)
    if raw is None:
        return default
    if isinstance(default, bool):
        return raw.lower() in ("1", "true", "yes")
    if isinstance(default, int):
        return int(raw)
    return raw


@dataclass
class FocoosConfig:
    focoos_api_key: str = field(default_factory=lambda: _env("FOCOOS_API_KEY", ""))
    focoos_log_level: str = field(default_factory=lambda: _env("FOCOOS_LOG_LEVEL", "INFO"))
    default_host_url: str = field(default_factory=lambda: _env("FOCOOS_HOST_URL", PROD_API_URL))
    runtime_type: RuntimeType = field(
        default_factory=lambda: RuntimeType(_env("FOCOOS_RUNTIME_TYPE", RuntimeType.XLA_TPU_BF16.value))
    )
    warmup_iter: int = field(default_factory=lambda: _env("FOCOOS_WARMUP_ITER", 2))
    compile_cache_enabled: bool = field(default_factory=lambda: _env("FOCOOS_COMPILE_CACHE", True))


FOCOOS_CONFIG = FocoosConfig()
