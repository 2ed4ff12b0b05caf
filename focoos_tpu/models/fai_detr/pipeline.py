"""Pipeline-parallel execution of the fai_detr decoder stack.

Runs the flagship's REAL decoder loop (models/fai_detr/modelling.py:365-400 —
DecoderLayer + per-layer bbox/score heads + iterative reference-point
refinement with its stop-gradient chain) as a GPipe pipeline over a ``pipe``
mesh axis via ``parallel/pipeline.py``: one decoder layer (+ its heads) per
stage, stage params stacked and sharded ``P("pipe")``, activations shifted by
``lax.ppermute``, per-layer aux outputs returning sharded over the pipe axis
(their reduction in the criterion becomes a psum over ICI). The shared
query-pos head is replicated; its gradient is psum'd by shard_map's
transpose.

The reference has no pipeline story (DDP only); this demonstrates the depth
axis on the production decoder. Applicability note in docs/parallelism.md —
for a CNN-dominant detector this is capability, not a claimed speedup.
"""

from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from focoos_tpu.models.fai_detr.config import DETRConfig
from focoos_tpu.models.fai_detr.modelling import DecoderLayer
from focoos_tpu.nn.layers.common import MLP
from focoos_tpu.ops.boxes import inverse_sigmoid
from focoos_tpu.parallel.pipeline import PIPE_AXIS, pipeline_apply, stack_stage_params

from flax import linen as nn


def extract_stage_params(predictor_params: dict, dec_layers: int) -> Tuple[Any, Any]:
    """→ (stacked per-stage params, shared params) from the predictor's
    param tree — same checkpoint layout as the sequential path (no separate
    PP weights)."""
    per_stage = [
        {
            "layer": predictor_params[f"decoder_layers_{i}"],
            "bbox": predictor_params[f"dec_bbox_classifier_{i}"],
            "score": predictor_params[f"dec_score_classifier_{i}"],
        }
        for i in range(dec_layers)
    ]
    shared = {"query_pos_head": predictor_params["query_pos_head"]}
    return stack_stage_params(per_stage), shared


def pp_decoder(
    cfg: DETRConfig,
    stacked: Any,
    shared: Any,
    target: jnp.ndarray,  # [B, Q, C] decoder entry queries
    ref_unact: jnp.ndarray,  # [B, Q, 4] unactivated reference points (fp32)
    level_maps: Sequence[jnp.ndarray],  # per-level NHWC value maps
    spatial_shapes: Sequence[Tuple[int, int]],
    mesh: Mesh,
    n_micro: int,
    train: bool = False,
    batch_spec: P = P(),
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """→ (dec_logits [L, B, Q, C], dec_boxes [L, B, Q, 4]) — same tensors the
    sequential loop stacks, with the leading layer axis sharded over `pipe`."""
    hd = cfg.transformer_predictor_hidden_dim
    layer_mod = DecoderLayer(
        hd, cfg.transformer_predictor_nhead, cfg.transformer_predictor_dim_feedforward,
        len(spatial_shapes), 4,  # num_decoder_points: TransformerPredictor default
    )
    qpos_mod = MLP(2 * hd, hd, 2)
    bbox_mod = MLP(hd, 4, 3)
    score_mod = nn.Dense(cfg.num_classes)
    shapes = tuple((int(h), int(w)) for h, w in spatial_shapes)

    def stage_fn(p, carry, k, sh, idx):
        output, ref_points, ref_points_detach = carry
        query_pos = qpos_mod.apply({"params": sh["query_pos_head"]}, ref_points_detach.astype(output.dtype))
        vals = [k[f"m{i}"] for i in range(len(shapes))]
        output = layer_mod.apply(
            {"params": p["layer"]}, output, ref_points_detach[:, :, None, :], vals, shapes, query_pos
        )
        delta = bbox_mod.apply({"params": p["bbox"]}, output).astype(jnp.float32)
        inter_ref = jax.nn.sigmoid(delta + inverse_sigmoid(ref_points_detach))
        logits_i = score_mod.apply({"params": p["score"]}, output)
        # layer 0 supervises inter_ref; later layers re-derive from the
        # UNdetached previous ref (modelling.py:387-390)
        boxes_i = jnp.where(
            idx == 0, inter_ref, jax.nn.sigmoid(delta + inverse_sigmoid(ref_points))
        )
        new_detach = jax.lax.stop_gradient(inter_ref) if train else inter_ref
        return (output, inter_ref, new_detach), (logits_i.astype(jnp.float32), boxes_i)

    ref0 = jax.nn.sigmoid(ref_unact)
    carry0 = (target, ref0, ref0)
    consts = {f"m{i}": m for i, m in enumerate(level_maps)}
    _, outs = pipeline_apply(
        stage_fn, stacked, carry0, n_micro, mesh, axis=PIPE_AXIS, consts=consts,
        shared=shared, batch_spec=batch_spec,
    )
    return outs  # (dec_logits, dec_boxes), leading axis = layer (pipe-sharded)
