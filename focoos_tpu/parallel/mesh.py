"""Device-mesh helpers — the framework's entire "distributed backend".

Replaces the reference's NCCL/Gloo + mp-spawn stack
(focoos/utils/distributed/{dist,comm}.py, SURVEY.md §2.12): instead of
per-process DDP wrappers and hand-written collectives, we build a
``jax.sharding.Mesh`` over the local (or multi-host) device set, shard the
batch over the ``data`` axis, replicate parameters, and let GSPMD insert the
gradient all-reduces over ICI. ``comm.py``'s gather/reduce helpers collapse
into ``process_allgather`` / sharded reductions.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    shape: Optional[Tuple[int, ...]] = None,
    axis_names: Sequence[str] = (DATA_AXIS,),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a mesh. Default: 1-D data mesh over all devices."""
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devices),)
        axis_names = axis_names[:1]
    assert int(np.prod(shape)) == len(devices), f"mesh shape {shape} != {len(devices)} devices"
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names=tuple(axis_names))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Device_put every leaf with its leading axis sharded over `data`."""
    s = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    r = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, r), tree)


# ---------------------------------------------------------------------------
# host-process helpers (analog of focoos/utils/distributed/comm.py)
# ---------------------------------------------------------------------------


def get_world_size() -> int:
    return jax.process_count()


def get_rank() -> int:
    return jax.process_index()


def is_main_process() -> bool:
    return jax.process_index() == 0


def synchronize() -> None:
    """Barrier across hosts (no-op single-host)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("focoos_tpu_barrier")


def all_gather_objects(obj: Any) -> list:
    """Gather arbitrary picklable objects from every host
    (analog of comm.all_gather, focoos/utils/distributed/comm.py:139).

    ``process_allgather`` requires identical pytree structure and leaf shapes
    on every process, but evaluator states are ragged (per-host lists of
    variable-shape arrays). So: pickle to bytes, allgather the byte lengths,
    pad every host's buffer to the global max, allgather one fixed-shape
    uint8 array, then truncate + unpickle per host — the same
    pad-to-max-then-trim trick the reference plays with NCCL tensors
    (focoos/utils/distributed/comm.py:139-163).
    """
    if jax.process_count() == 1:
        return [obj]
    import pickle

    from jax.experimental import multihost_utils

    buf = np.frombuffer(pickle.dumps(obj, protocol=pickle.HIGHEST_PROTOCOL), dtype=np.uint8)
    lengths = np.asarray(
        multihost_utils.process_allgather(np.int64(buf.size), tiled=False)
    ).reshape(-1)
    max_len = int(lengths.max())
    padded = np.zeros(max_len, dtype=np.uint8)
    padded[: buf.size] = buf
    gathered = np.asarray(multihost_utils.process_allgather(padded, tiled=False))
    gathered = gathered.reshape(len(lengths), max_len)
    return [pickle.loads(gathered[i, : int(lengths[i])].tobytes()) for i in range(len(lengths))]
