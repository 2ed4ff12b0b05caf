"""Flat-npz parameter serialization.

The portable weight format is a ``.npz`` of '/'-joined tree paths → numpy
arrays, with a leading collection prefix (``params/...``, ``batch_stats/...``).
This is the analog of the reference's ``model_final.pth`` state dict and is
produced either by training or by the torch→jax converter
(tools/convert_torch_weights.py). Orbax handles training checkpoints; this
format is for model exchange.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import numpy as np


def flatten_tree(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(
            str(p.key) if hasattr(p, "key") else str(p.idx) if hasattr(p, "idx") else str(p) for p in path
        )
        flat[prefix + key] = np.asarray(leaf)
    return flat


def unflatten_tree(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for key, value in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return tree


def save_variables_npz(path: str, variables: Dict[str, Any]) -> None:
    flat = {}
    for collection, tree in variables.items():
        flat.update(flatten_tree(tree, prefix=f"{collection}/"))
    np.savez(path, **flat)


def load_variables_npz(path: str) -> Dict[str, Any]:
    with np.load(path) as data:
        flat = {k: data[k] for k in data.files}
    return unflatten_tree(flat)


def tree_size_mb(tree: Any) -> float:
    return sum(leaf.size * leaf.dtype.itemsize for leaf in jax.tree_util.tree_leaves(tree)) / 1e6


def fill_structure(structure: Any, source: Dict[str, Any]) -> tuple[Dict[str, Any], list, list]:
    """Place checkpoint arrays into an ``eval_shape`` variable structure.

    ``structure`` is a pytree of ShapeDtypeStructs (no materialized arrays);
    leaves whose path+shape match a source array are filled with it (cast to
    the structure dtype). Returns (filled, skipped, missing): when both lists
    are empty the checkpoint fully covers the model and NO init compute is
    needed — the fast load path for pretrained models on remote devices."""
    paths = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(structure)[0]:
        key = "/".join(
            str(p.key) if hasattr(p, "key") else str(p.idx) if hasattr(p, "idx") else str(p) for p in path
        )
        paths[key] = leaf
    sflat = {}
    for collection, tree in source.items():
        sflat.update(flatten_tree(tree, prefix=f"{collection}/"))
    filled, skipped, missing = {}, [], []
    for k, spec in paths.items():
        if k in sflat:
            if tuple(sflat[k].shape) == tuple(spec.shape):
                filled[k] = sflat[k].astype(spec.dtype)
            else:
                skipped.append(k)
        else:
            missing.append(k)
    return unflatten_tree(filled), skipped, missing


def merge_compatible(
    target: Dict[str, Any], source: Dict[str, Any], strict: bool = False
) -> tuple[Dict[str, Any], list, list]:
    """Shape-tolerant merge (reference: focoos/models/base_model.py:98-143
    checkpoint-tolerant load): source leaves replace target leaves when paths
    and shapes match; mismatches are reported, not fatal."""
    tflat = flatten_tree(target)
    sflat = flatten_tree(source)
    skipped, missing = [], []
    merged = dict(tflat)
    for k, v in tflat.items():
        if k in sflat:
            if sflat[k].shape == v.shape:
                merged[k] = sflat[k].astype(v.dtype)
            else:
                skipped.append(k)
        else:
            missing.append(k)
    if strict and (skipped or missing):
        raise ValueError(f"strict load failed: skipped={skipped[:5]} missing={missing[:5]}")
    return unflatten_tree(merged), skipped, missing
