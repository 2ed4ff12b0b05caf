"""System introspection (reference: focoos/utils/system.py:159-249)."""

from __future__ import annotations

import os
import platform
import sys
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np


@dataclass
class DeviceInfo:
    id: int
    kind: str
    platform: str
    memory_gb: Optional[float] = None


@dataclass
class SystemInfo:
    focoos_tpu_version: str = ""
    python_version: str = ""
    system: str = ""
    jax_version: str = ""
    backend: str = ""
    device_count: int = 0
    devices: List[DeviceInfo] = field(default_factory=list)
    process_index: int = 0
    process_count: int = 1
    packages: Dict[str, str] = field(default_factory=dict)

    def pretty_print(self) -> None:
        for k in ("focoos_tpu_version", "python_version", "system", "jax_version", "backend",
                  "device_count", "process_index", "process_count"):
            print(f"{k}: {getattr(self, k)}")
        for d in self.devices:
            mem = f" {d.memory_gb:.1f} GB" if d.memory_gb else ""
            print(f"  device {d.id}: {d.kind} ({d.platform}){mem}")
        for name, ver in self.packages.items():
            print(f"  {name}: {ver}")


def get_system_info() -> SystemInfo:
    import jax

    import focoos_tpu

    devices = []
    for d in jax.devices():
        mem = None
        try:
            stats = d.memory_stats()
            if stats and "bytes_limit" in stats:
                mem = stats["bytes_limit"] / 1e9
        except Exception:
            pass
        devices.append(DeviceInfo(id=d.id, kind=str(d.device_kind), platform=d.platform, memory_gb=mem))

    packages = {}
    for name in ("flax", "optax", "numpy", "orbax.checkpoint"):
        try:
            mod = __import__(name)
            packages[name] = getattr(mod, "__version__", "?")
        except ImportError:
            pass

    return SystemInfo(
        focoos_tpu_version=focoos_tpu.__version__,
        python_version=sys.version.split()[0],
        system=f"{platform.system()} {platform.release()}",
        jax_version=jax.__version__,
        backend=jax.default_backend(),
        device_count=jax.device_count(),
        devices=devices,
        process_index=jax.process_index(),
        process_count=jax.process_count(),
        packages=packages,
    )


def seed_all_rng(seed: Optional[int] = None) -> int:
    """Seed python/numpy RNGs; returns the seed (derives one from os.urandom
    when None — reference: utils/env.py:21)."""
    import random as _random

    if seed is None:
        seed = int.from_bytes(os.urandom(4), "little")
    _random.seed(seed)
    np.random.seed(seed % (2**32))
    return seed
