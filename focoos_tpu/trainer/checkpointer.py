"""Orbax-backed checkpointing (reference: focoos/trainer/checkpointer.py).

Same API surface (save / load / resume_or_load / has_checkpoint /
``last_checkpoint`` tag, PeriodicCheckpointer with max_to_keep GC) but state
is a JAX pytree (TrainState: params, batch_stats, opt_state, EMA, step)
persisted via orbax — restart-safe across hosts.
"""

from __future__ import annotations

import os
import shutil
from typing import Any, Dict, List, Optional

import jax
import numpy as np

from focoos_tpu.utils.logger import get_logger

logger = get_logger(__name__)

_LAST_CHECKPOINT_TAG = "last_checkpoint"


class Checkpointer:
    def __init__(self, state_template: Any, save_dir: str, **checkpointables: Any):
        self.save_dir = save_dir
        self._template = state_template
        self.checkpointables = checkpointables
        os.makedirs(save_dir, exist_ok=True)

    # ------------------------------------------------------------------
    def save(self, name: str, state: Any, **extra: Any) -> str:
        """Save ``state`` (TrainState pytree) + hook states under ``name``."""
        import orbax.checkpoint as ocp

        path = os.path.abspath(os.path.join(self.save_dir, name))
        if os.path.exists(path):
            shutil.rmtree(path)
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(path, jax.device_get(state))
        if extra:
            np.savez(os.path.join(self.save_dir, f"{name}.extra.npz"), **_flatten_extra(extra))
        with open(os.path.join(self.save_dir, _LAST_CHECKPOINT_TAG), "w") as f:
            f.write(name)
        logger.info(f"Saved checkpoint to {path}")
        return path

    def load(self, name_or_path: str) -> tuple:
        import orbax.checkpoint as ocp

        path = name_or_path
        if not os.path.isabs(path):
            path = os.path.abspath(os.path.join(self.save_dir, path))
        abstract = jax.tree.map(np.asarray, jax.device_get(self._template))
        with ocp.StandardCheckpointer() as ckptr:
            state = ckptr.restore(path, abstract)
        extra_path = path + ".extra.npz"
        extra: Dict[str, Any] = {}
        if os.path.isfile(extra_path):
            with np.load(extra_path, allow_pickle=True) as data:
                extra = {k: data[k].item() if data[k].ndim == 0 else data[k] for k in data.files}
        logger.info(f"Loaded checkpoint from {path}")
        return state, extra

    # ------------------------------------------------------------------
    def has_checkpoint(self) -> bool:
        return os.path.isfile(os.path.join(self.save_dir, _LAST_CHECKPOINT_TAG))

    def get_checkpoint_file(self) -> Optional[str]:
        tag = os.path.join(self.save_dir, _LAST_CHECKPOINT_TAG)
        if not os.path.isfile(tag):
            return None
        with open(tag) as f:
            return f.read().strip()

    def resume_or_load(self, path: Optional[str], resume: bool = True):
        """reference semantics (checkpointer.py:203): if resume and a last
        checkpoint exists, load it; else load ``path`` (weights only)."""
        if resume and self.has_checkpoint():
            name = self.get_checkpoint_file()
            return self.load(name), True
        return None, False

    def all_checkpoints(self) -> List[str]:
        return sorted(
            d for d in os.listdir(self.save_dir)
            if os.path.isdir(os.path.join(self.save_dir, d)) and d.startswith("model_")
        )


def _flatten_extra(extra: Dict[str, Any]) -> Dict[str, Any]:
    out = {}
    for k, v in extra.items():
        out[k] = np.asarray(v) if not isinstance(v, np.ndarray) else v
    return out


class PeriodicCheckpointerMixin:
    """max_to_keep GC (reference: checkpointer.py:284-361)."""

    def __init__(self, checkpointer: Checkpointer, period: int, max_iter: int, max_to_keep: int = 1):
        self.checkpointer = checkpointer
        self.period = period
        self.max_iter = max_iter
        self.max_to_keep = max_to_keep
        self._recent: List[str] = []

    def step(self, iteration: int, state: Any, stride: int = 1, **extra: Any) -> None:
        # fire when any multiple of ``period`` falls in (iteration, iteration+stride]
        # — with multi-step dispatch (steps_per_call=K) the loop advances K
        # optimizer iterations per host call, so strict modulo checks can skip
        # the boundary (ADVICE r1 medium).
        # the state passed in reflects ALL ``stride`` completed optimizer steps
        # (iterations iteration..iteration+stride-1), so both the filename and
        # the saved iteration field must record the LAST completed iteration —
        # otherwise resume (start_iter = saved+1) would replay stride-1 steps
        # that are already baked into the weights and desync the LR schedule
        # (ADVICE r2 medium).
        last = iteration + stride - 1
        if self.period > 0 and (iteration + stride) // self.period > iteration // self.period:
            name = f"model_{last:07d}"
            self.checkpointer.save(name, state, iteration=last, **extra)
            self._recent.append(name)
            while len(self._recent) > self.max_to_keep:
                old = self._recent.pop(0)
                path = os.path.join(self.checkpointer.save_dir, old)
                if os.path.isdir(path) and old != self.checkpointer.get_checkpoint_file():
                    shutil.rmtree(path, ignore_errors=True)
                    extra_f = path + ".extra.npz"
                    if os.path.isfile(extra_f):
                        os.remove(extra_f)
        if iteration + stride >= self.max_iter:
            self.checkpointer.save("model_final", state, iteration=last, **extra)
