"""fai_detr — RT-DETR re-designed for TPU (flax/linen, NHWC, static shapes).

Re-derivation of the reference architecture
(focoos/models/fai_detr/modelling.py): backbone → hybrid encoder (AIFI
transformer on res5 + CSPRep FPN/PAN) → NMS-free decoder with encoder top-k
query selection and 6 multi-scale-deformable-attention layers with iterative
box refinement. Differences from the reference are deliberate TPU choices:

- NHWC convs, bf16-friendly compute dtype, fp32 LayerNorm/softmax.
- Deformable attention = vectorized XLA gather (focoos_tpu/ops/deformable.py)
  instead of per-level ``F.grid_sample`` CUDA calls.
- Anchors/position embeddings are pure functions of the (static) trace
  shapes — no buffers, no dynamic-shape re-generation branches.
- The decoder always returns stacked per-layer outputs; train/eval selection
  happens in the caller, keeping one traced graph per input shape.
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from focoos_tpu.models.fai_detr.config import DETRConfig
from focoos_tpu.models.fai_detr.ports import DETRAuxOutputs, DETRModelOutput
from focoos_tpu.nn.backbone.base import BaseBackbone
from focoos_tpu.nn.layers.common import (
    bn_use_running,
    ConvNorm,
    Int8Dense,
    MLP,
    MultiHeadAttention,
    TransformerEncoderLayer,
    bilinear_resize,
    get_activation,
    sine_position_embedding_2d,
)
from focoos_tpu.ops.boxes import box_cxcywh_to_xyxy, inverse_sigmoid
from focoos_tpu.ops.deformable import ms_deform_attn_dispatch as ms_deform_attn
from focoos_tpu.ops.deformable import ms_deform_attn_dispatch_levels as ms_deform_attn_levels

Dtype = jnp.dtype


class RepVggBlock(nn.Module):
    """3x3+1x1 re-parameterizable block (reference: fai_detr/modelling.py:30).

    Kept in two-branch form; XLA fuses conv+BN, and the weight converter can
    emit a pre-fused single conv for the export path.
    """

    ch_out: int
    act: str = "silu"
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        y = ConvNorm(self.ch_out, 3, 1, padding=1, act=None, dtype=self.dtype, name="conv1")(x, train)
        y = y + ConvNorm(self.ch_out, 1, 1, padding=0, act=None, dtype=self.dtype, name="conv2")(x, train)
        return get_activation(self.act)(y)


class CSPRepLayer(nn.Module):
    """Cross-stage-partial block of RepVgg units (reference: fai_detr/modelling.py:84)."""

    out_channels: int
    num_blocks: int = 3
    expansion: float = 1.0
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        hidden = int(self.out_channels * self.expansion)
        x1 = ConvNorm(hidden, 1, 1, act="silu", dtype=self.dtype, name="conv1")(x, train)
        for i in range(self.num_blocks):
            x1 = RepVggBlock(hidden, dtype=self.dtype, name=f"bottlenecks_{i}")(x1, train)
        x2 = ConvNorm(hidden, 1, 1, act="silu", dtype=self.dtype, name="conv2")(x, train)
        y = x1 + x2
        if hidden != self.out_channels:
            y = ConvNorm(self.out_channels, 1, 1, act="silu", dtype=self.dtype, name="conv3")(y, train)
        return y


class HybridEncoder(nn.Module):
    """Backbone + AIFI transformer on res5 + CSPRep FPN/PAN
    (reference 'Encoder': fai_detr/modelling.py:195-347).

    Returns ``(mask_features, [p5, p4, p3])`` — multi-scale maps ordered
    stride 32 → 8, NHWC.
    """

    backbone: BaseBackbone
    feat_dim: int = 256
    out_dim: int = 256
    nhead: int = 8
    dim_feedforward: int = 1024
    num_encoder_layers: int = 1
    expansion: float = 1.0
    depth_mult: float = 1.0
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, images: jnp.ndarray, train: bool = False):
        feats = self.backbone(images, train=train)
        xs = [feats[k] for k in ("res3", "res4", "res5")]

        # 1x1 conv + BN channel projection
        proj = []
        for i, x in enumerate(xs):
            x = nn.Conv(self.feat_dim, (1, 1), use_bias=False, dtype=self.dtype, name=f"input_proj_{i}_conv")(x)
            x = nn.BatchNorm(use_running_average=bn_use_running(train), momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                             name=f"input_proj_{i}_bn")(x)
            proj.append(x)

        # AIFI: single-scale transformer encoder on res5 tokens
        if self.num_encoder_layers > 0:
            b, h, w, c = proj[2].shape
            tokens = proj[2].reshape(b, h * w, c)
            pos = sine_position_embedding_2d(h, w, self.feat_dim // 2, dtype=tokens.dtype)[None]
            for li in range(self.num_encoder_layers):
                tokens = TransformerEncoderLayer(
                    self.feat_dim, self.nhead, self.dim_feedforward, activation="gelu",
                    dtype=self.dtype, name=f"encoder_0_layers_{li}",
                )(tokens, pos_embed=pos)
            proj[2] = tokens.reshape(b, h, w, c)

        nb = round(3 * self.depth_mult)

        # top-down FPN: res5 → res3
        inner = [proj[2]]
        for idx, low_i in enumerate((1, 0)):
            lat = ConvNorm(self.feat_dim, 1, 1, act="silu", dtype=self.dtype, name=f"lateral_convs_{idx}")(
                inner[0], train
            )
            inner[0] = lat
            low = proj[low_i]
            up = bilinear_resize(lat, (low.shape[1], low.shape[2]))
            fused = CSPRepLayer(self.feat_dim, nb, self.expansion, dtype=self.dtype, name=f"fpn_blocks_{idx}")(
                jnp.concatenate([up, low], axis=-1), train
            )
            inner.insert(0, fused)
        # inner = [p3(1/8), p4(1/16), p5(1/32)]

        # bottom-up PAN
        outs = [inner[0]]
        for idx in range(2):
            high = inner[idx + 1]
            down = bilinear_resize(outs[-1], (high.shape[1], high.shape[2]))
            down = ConvNorm(self.feat_dim, 3, 1, act="silu", dtype=self.dtype, name=f"downsample_convs_{idx}")(
                down, train
            )
            out = CSPRepLayer(self.feat_dim, nb, self.expansion, dtype=self.dtype, name=f"pan_blocks_{idx}")(
                jnp.concatenate([down, high], axis=-1), train
            )
            outs.append(out)

        mask_features = nn.Conv(self.out_dim, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype,
                                name="mask_features")(outs[0])
        return mask_features, outs[::-1]  # [p5, p4, p3]


def _msda_offset_bias_init(num_heads: int, num_levels: int, num_points: int) -> np.ndarray:
    """Radial grid bias init for sampling offsets (reference: fai_detr/modelling.py:810-819)."""
    thetas = np.arange(num_heads, dtype=np.float32) * (2.0 * math.pi / num_heads)
    grid = np.stack([np.cos(thetas), np.sin(thetas)], -1)
    grid = grid / np.abs(grid).max(-1, keepdims=True)
    grid = np.tile(grid.reshape(num_heads, 1, 1, 2), (1, num_levels, num_points, 1))
    scaling = np.arange(1, num_points + 1, dtype=np.float32).reshape(1, 1, -1, 1)
    return (grid * scaling).reshape(-1)


class MSDeformableAttention(nn.Module):
    """Multi-scale deformable attention (reference: fai_detr/modelling.py:777-884)."""

    embed_dim: int = 256
    num_heads: int = 8
    num_levels: int = 3
    num_points: int = 4
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,  # [B, Lq, C]
        reference_points: jnp.ndarray,  # [B, Lq, 1 or L, 4] cxcywh in [0,1]
        value,  # [B, S, C] flat, or list of per-level [B, H, W, C] maps
        spatial_shapes: Sequence[Tuple[int, int]],
    ) -> jnp.ndarray:
        b, lq = query.shape[:2]
        hh = self.num_heads
        hd = self.embed_dim // hh
        total = hh * self.num_levels * self.num_points

        value_proj = Int8Dense(self.embed_dim, dtype=self.dtype, name="value_proj")
        if isinstance(value, (list, tuple)):
            # per-level projection (commutes with the level split — same
            # weights, identical math) keeps values in their natural NHWC
            # layout: no flat→spatial relayout copies (~0.25 ms/level/layer)
            v_levels = [
                value_proj(vl).reshape(vl.shape[0], vl.shape[1], vl.shape[2], hh, hd)
                for vl in value
            ]
            v = None
        else:
            s = value.shape[1]
            v = value_proj(value).reshape(b, s, hh, hd)

        bias_np = _msda_offset_bias_init(hh, self.num_levels, self.num_points)
        offsets = nn.Dense(
            total * 2,
            kernel_init=nn.initializers.zeros,
            bias_init=lambda key, shape, dtype=jnp.float32: jnp.asarray(bias_np, dtype),
            dtype=self.dtype,
            name="sampling_offsets",
        )(query).reshape(b, lq, hh, self.num_levels, self.num_points, 2)

        attn = nn.Dense(
            total, kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
            dtype=self.dtype, name="attention_weights",
        )(query).reshape(b, lq, hh, self.num_levels * self.num_points)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(query.dtype)
        attn = attn.reshape(b, lq, hh, self.num_levels, self.num_points)

        # box-conditioned sampling locations (reference_points last dim == 4)
        ref = reference_points[:, :, None, :, None, :]  # [B, Lq, 1, 1orL, 1, 4]
        loc = ref[..., :2] + offsets / self.num_points * ref[..., 2:] * 0.5

        if v is None:
            out = ms_deform_attn_levels(v_levels, spatial_shapes, loc, attn)
        else:
            out = ms_deform_attn(v, spatial_shapes, loc, attn)
        return Int8Dense(self.embed_dim, dtype=self.dtype, name="output_proj")(out)


class DecoderLayer(nn.Module):
    """Self-attn + deformable cross-attn + FFN (reference: fai_detr/modelling.py:887-958)."""

    d_model: int = 256
    n_head: int = 8
    dim_feedforward: int = 1024
    n_levels: int = 3
    n_points: int = 4
    activation: str = "relu"
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(
        self,
        tgt: jnp.ndarray,
        reference_points: jnp.ndarray,
        memory: jnp.ndarray,
        spatial_shapes: Sequence[Tuple[int, int]],
        query_pos: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        q = tgt if query_pos is None else tgt + query_pos
        sa = MultiHeadAttention(self.d_model, self.n_head, dtype=self.dtype, name="self_attn")(q, q, tgt)
        tgt = nn.LayerNorm(epsilon=1e-5, name="norm1")(tgt + sa)

        ca = MSDeformableAttention(
            self.d_model, self.n_head, self.n_levels, self.n_points, dtype=self.dtype, name="cross_attn"
        )(tgt if query_pos is None else tgt + query_pos, reference_points, memory, spatial_shapes)
        tgt = nn.LayerNorm(epsilon=1e-5, name="norm2")(tgt + ca)

        ffn = Int8Dense(self.dim_feedforward, dtype=self.dtype, name="linear1")(tgt)
        ffn = get_activation(self.activation)(ffn)
        ffn = Int8Dense(self.d_model, dtype=self.dtype, name="linear2")(ffn)
        return nn.LayerNorm(epsilon=1e-5, name="norm3")(tgt + ffn)


def generate_anchors(
    spatial_shapes: Sequence[Tuple[int, int]], grid_size: float = 0.05, eps: float = 1e-2
) -> Tuple[np.ndarray, np.ndarray]:
    """Static anchor logits + validity mask (reference: fai_detr/modelling.py:1169-1189).

    Pure numpy — runs once per trace shape at compile time.
    """
    anchors = []
    for lvl, (h, w) in enumerate(spatial_shapes):
        gy, gx = np.meshgrid(np.arange(h, dtype=np.float32), np.arange(w, dtype=np.float32), indexing="ij")
        gxy = (np.stack([gx, gy], -1) + 0.5) / np.array([w, h], np.float32)
        wh = np.ones_like(gxy) * grid_size * (2.0 ** (2 - lvl))
        anchors.append(np.concatenate([gxy, wh], -1).reshape(h * w, 4))
    a = np.concatenate(anchors, 0)  # [S, 4]
    valid = ((a > eps) & (a < 1 - eps)).all(-1, keepdims=True)  # [S, 1]
    a = np.log(a / (1 - a))
    a = np.where(valid, a, 0.0)
    return a.astype(np.float32), valid


def _bias_init_with_prob(prior_prob: float) -> float:
    return float(-math.log((1 - prior_prob) / prior_prob))


class TransformerPredictor(nn.Module):
    """Query selection + iterative-refinement decoder
    (reference: fai_detr/modelling.py:1023-1263)."""

    num_classes: int
    hidden_dim: int = 256
    num_queries: int = 300
    nhead: int = 8
    dec_layers: int = 6
    dim_feedforward: int = 1024
    num_levels: int = 3
    num_decoder_points: int = 4
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, feats: List[jnp.ndarray], train: bool = False):
        cls_bias = _bias_init_with_prob(1.0 / (self.num_classes + 1))
        cls_bias_init = nn.initializers.constant(cls_bias)

        # flatten levels: feats ordered [p5, p4, p3] NHWC
        tokens = []
        level_maps = []  # NHWC per level — fed to the decoder's MSDA so the
        spatial_shapes = []  # value path never leaves its natural layout
        for i, f in enumerate(feats):
            x = nn.Conv(self.hidden_dim, (1, 1), use_bias=False, dtype=self.dtype, name=f"input_proj_{i}_conv")(f)
            x = nn.BatchNorm(use_running_average=bn_use_running(train), momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                             name=f"input_proj_{i}_bn")(x)
            b, h, w, c = x.shape
            level_maps.append(x)
            tokens.append(x.reshape(b, h * w, c))
            spatial_shapes.append((h, w))
        memory = jnp.concatenate(tokens, axis=1)  # [B, S, C]
        bsz = memory.shape[0]

        # --- encoder query selection (reference :1191-1232)
        anchors_np, valid_np = generate_anchors(spatial_shapes)
        anchors = jnp.asarray(anchors_np, dtype=jnp.float32)[None]  # [1, S, 4]
        valid = jnp.asarray(valid_np, dtype=memory.dtype)[None]  # [1, S, 1]

        masked_memory = memory * valid
        out_mem = Int8Dense(self.hidden_dim, dtype=self.dtype, name="enc_output_0")(masked_memory)
        out_mem = nn.LayerNorm(epsilon=1e-5, name="enc_output_1")(out_mem)

        enc_logits = nn.Dense(self.num_classes, bias_init=cls_bias_init, dtype=self.dtype,
                              name="enc_score_classifier")(out_mem)  # [B, S, C]
        enc_coord_delta = MLP(self.hidden_dim, 4, 3, dtype=self.dtype, name="enc_bbox_classifier")(out_mem)
        enc_coord_unact = enc_coord_delta.astype(jnp.float32) + anchors  # [B, S, 4]

        scores = jnp.max(enc_logits, axis=-1)  # [B, S]
        # small inputs can have fewer anchor positions than num_queries
        # (e.g. 96px -> 189 anchors < 300): select what exists, tile the rest
        # (duplicate queries are harmless — matching assigns each target once)
        s_total = scores.shape[1]
        k = min(self.num_queries, s_total)
        _, topk_idx = jax.lax.top_k(scores, k)  # [B, k]
        if k < self.num_queries:
            reps = -(-self.num_queries // k)
            topk_idx = jnp.tile(topk_idx, (1, reps))[:, : self.num_queries]  # [B, Q]

        def gather_q(x):
            return jnp.take_along_axis(x, topk_idx[..., None], axis=1)

        ref_unact = jax.lax.stop_gradient(gather_q(enc_coord_unact))  # [B, Q, 4] fp32
        enc_topk_boxes = jax.nn.sigmoid(gather_q(enc_coord_unact))
        enc_topk_logits = gather_q(enc_logits)
        target = jax.lax.stop_gradient(gather_q(out_mem))  # [B, Q, C]

        # --- decoder with iterative refinement (reference :961-1020)
        dec_boxes = []
        dec_logits = []
        ref_points_detach = jax.nn.sigmoid(ref_unact)
        output = target
        ref_points = ref_points_detach
        query_pos_head = MLP(2 * self.hidden_dim, self.hidden_dim, 2, dtype=self.dtype, name="query_pos_head")
        for i in range(self.dec_layers):
            query_pos = query_pos_head(ref_points_detach.astype(output.dtype))

            output = DecoderLayer(
                self.hidden_dim, self.nhead, self.dim_feedforward, self.num_levels, self.num_decoder_points,
                dtype=self.dtype, name=f"decoder_layers_{i}",
            )(output, ref_points_detach[:, :, None, :], level_maps, spatial_shapes, query_pos)

            delta = MLP(self.hidden_dim, 4, 3, dtype=self.dtype, name=f"dec_bbox_classifier_{i}")(output)
            delta = delta.astype(jnp.float32)
            inter_ref = jax.nn.sigmoid(delta + inverse_sigmoid(ref_points_detach))

            logits_i = nn.Dense(self.num_classes, bias_init=cls_bias_init, dtype=self.dtype,
                                name=f"dec_score_classifier_{i}")(output)
            dec_logits.append(logits_i)
            if i == 0:
                dec_boxes.append(inter_ref)
            else:
                dec_boxes.append(jax.nn.sigmoid(delta + inverse_sigmoid(ref_points)))

            ref_points = inter_ref
            ref_points_detach = jax.lax.stop_gradient(inter_ref) if train else inter_ref

        return DETRAuxOutputs(
            dec_logits=jnp.stack([x.astype(jnp.float32) for x in dec_logits]),
            dec_boxes=jnp.stack(dec_boxes),
            enc_logits=enc_topk_logits.astype(jnp.float32),
            enc_boxes=enc_topk_boxes.astype(jnp.float32),
        )


class FAIDetr(nn.Module):
    """RT-DETR top-level module (reference: fai_detr/modelling.py:1273-1358).

    ``__call__(images_nhwc_uint8_or_float) -> (DETRModelOutput, DETRAuxOutputs)``;
    normalization happens on-device in the traced graph.
    """

    config: DETRConfig
    backbone: BaseBackbone
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, images: jnp.ndarray, train: bool = False):
        cfg = self.config
        compute_dtype = self.dtype or jnp.float32
        mean = jnp.asarray(cfg.pixel_mean, dtype=jnp.float32)
        std = jnp.asarray(cfg.pixel_std, dtype=jnp.float32)
        x = (images.astype(jnp.float32) - mean) / std
        x = x.astype(compute_dtype)

        _, ms_feats = HybridEncoder(
            backbone=self.backbone,
            feat_dim=cfg.pixel_decoder_feat_dim,
            out_dim=cfg.pixel_decoder_out_dim,
            nhead=cfg.pixel_decoder_nhead,
            dim_feedforward=cfg.pixel_decoder_dim_feedforward,
            num_encoder_layers=cfg.pixel_decoder_num_encoder_layers,
            expansion=cfg.pixel_decoder_expansion,
            dtype=self.dtype,
            name="pixel_decoder",
        )(x, train)

        aux = TransformerPredictor(
            num_classes=cfg.num_classes,
            hidden_dim=cfg.transformer_predictor_hidden_dim,
            num_queries=cfg.num_queries,
            nhead=cfg.transformer_predictor_nhead,
            dec_layers=cfg.transformer_predictor_dec_layers,
            dim_feedforward=cfg.transformer_predictor_dim_feedforward,
            dtype=self.dtype,
            name="predictor",
        )(ms_feats, train)

        boxes = box_cxcywh_to_xyxy(aux.dec_boxes[-1])
        logits = jax.nn.sigmoid(aux.dec_logits[-1])
        return DETRModelOutput(boxes=boxes, logits=logits, loss=None), aux
