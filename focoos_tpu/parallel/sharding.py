"""Parameter / optimizer-state sharding rules: FSDP (ZeRO-3 style) and
Megatron-style tensor parallelism, expressed as GSPMD layout constraints.

The reference's distributed story is plain DDP — replicated params, gradient
all-reduce (focoos/utils/distributed/dist.py:38-137). On TPU the same code
path also gives us FSDP and TP *for free*: shard the TrainState leaves via
``jax.jit`` in/out shardings and GSPMD inserts the all-gathers (params),
reduce-scatters (grads) and psums (TP row-parallel outputs) over ICI. No
wrapper classes, no hand-written collectives — the sharding IS the strategy.

Modes
-----
- ``dp``       — params/opt-state replicated, batch sharded over ``data``
                 (the reference's DDP).
- ``fsdp``     — every large leaf additionally sharded over ``data`` on its
                 largest divisible axis (ZeRO-3: param + grad + opt state all
                 sharded; XLA all-gathers weights just-in-time per layer).
- ``tp``       — Megatron attention/MLP sharding over the ``model`` axis:
                 column-parallel qkv/value/linear1 (output dim), row-parallel
                 out_proj/linear2 (input dim, psum inserted at the output).
- ``fsdp_tp``  — both: TP over ``model``, FSDP over ``data`` on the axes TP
                 left alone (2-D sharding of the big dense kernels).

All modes are *layout constraints only* — GSPMD guarantees the same numerics
as single-device execution to float tolerance (tested in
tests/test_sharding.py).
"""

from __future__ import annotations

import re
from typing import Any, List, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from focoos_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS, make_mesh

# Column-parallel: output features sharded over `model`. The activations come
# in replicated; each shard computes its feature slice locally.
_COL_PARALLEL = re.compile(r"'(q_proj|k_proj|v_proj|value_proj|linear1|fc1)'")
# Row-parallel: input features sharded over `model`; GSPMD psums the partial
# products back to a replicated output (the Megatron pair of the above —
# `output_proj` is MSDA's out projection, paired with `value_proj`).
_ROW_PARALLEL = re.compile(r"'(out_proj|output_proj|linear2|fc2)'")


def make_mesh_2d(
    n_data: int,
    n_model: int,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """(data × model) mesh. `model` should map to the minor/ICI-adjacent axis
    so TP collectives (per-layer, latency-bound) ride the fastest links."""
    devices = list(devices if devices is not None else jax.devices())
    assert n_data * n_model == len(devices), (n_data, n_model, len(devices))
    return make_mesh((n_data, n_model), axis_names=(DATA_AXIS, MODEL_AXIS), devices=devices)


def _tp_spec(path: str, shape: Tuple[int, ...], n_model: int) -> Optional[List[Optional[str]]]:
    """Megatron TP rule for one leaf, or None if no rule applies."""
    if n_model <= 1:
        return None
    if _COL_PARALLEL.search(path):
        if path.endswith("'kernel']") and len(shape) == 2 and shape[1] % n_model == 0:
            return [None, MODEL_AXIS]
        if path.endswith("'bias']") and len(shape) == 1 and shape[0] % n_model == 0:
            return [MODEL_AXIS]
    if _ROW_PARALLEL.search(path):
        if path.endswith("'kernel']") and len(shape) == 2 and shape[0] % n_model == 0:
            return [MODEL_AXIS, None]
        # row-parallel bias stays replicated (added after the psum)
    return None


def _fsdp_axis(shape: Tuple[int, ...], n_data: int, spec: List[Optional[str]]) -> Optional[int]:
    """Largest axis divisible by the data-axis size and not already sharded."""
    best, best_dim = None, 0
    for a, d in enumerate(shape):
        if spec[a] is None and d % n_data == 0 and d > best_dim:
            best, best_dim = a, d
    return best


def spec_for(
    path: str,
    shape: Tuple[int, ...],
    mesh: Mesh,
    mode: str = "dp",
    min_fsdp_size: int = 2**13,
) -> P:
    """PartitionSpec for one state leaf under the given mode."""
    if mode not in ("dp", "fsdp", "tp", "fsdp_tp"):
        raise ValueError(f"unknown sharding mode {mode!r}")
    ndim = len(shape)
    if ndim == 0 or mode == "dp":
        return P()
    axis_sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    spec: List[Optional[str]] = [None] * ndim
    if "tp" in mode and MODEL_AXIS in axis_sizes:
        tp = _tp_spec(path, shape, axis_sizes[MODEL_AXIS])
        if tp is not None:
            spec = tp
    if "fsdp" in mode and DATA_AXIS in axis_sizes and int(np.prod(shape)) >= min_fsdp_size:
        a = _fsdp_axis(shape, axis_sizes[DATA_AXIS], spec)
        if a is not None:
            spec[a] = DATA_AXIS
    while spec and spec[-1] is None:  # canonical form: P(None, "x") == P(None, "x"), P(None,) == P()
        spec.pop()
    return P(*spec)


def state_shardings(state: Any, mesh: Mesh, mode: str = "dp", min_fsdp_size: int = 2**13) -> Any:
    """Pytree of NamedShardings matching ``state`` (a TrainState or any
    params-like tree). Works on the optimizer state too: optax's mu/nu trees
    repeat the param paths, so the same regex rules hit the same leaves."""

    def one(path, leaf):
        shape = tuple(getattr(leaf, "shape", ()))
        return NamedSharding(mesh, spec_for(jax.tree_util.keystr(path), shape, mesh, mode, min_fsdp_size))

    return jax.tree_util.tree_map_with_path(one, state)


def device_put_state(state: Any, shardings: Any) -> Any:
    """Place every leaf of ``state`` with its computed sharding."""
    return jax.tree.map(lambda x, s: jax.device_put(x, s), state, shardings)
