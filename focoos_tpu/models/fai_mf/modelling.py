"""fai_mf — MaskFormer-lite re-designed for TPU (flax/linen, NHWC).

Re-derivation of the reference (focoos/models/fai_mf/modelling.py):
backbone → TransformerFPN pixel decoder (optional encoder-only transformer on
res5 + FPN with nearest upsampling) → masked-attention transformer decoder
over 3 scales with learnable queries → per-layer class + mask-embed heads
(mask = einsum(query_embed, mask_features)).

TPU design notes:
- NHWC; mask einsum is "bqc,bhwc->bqhw" — a single MXU matmul per image.
- Masked cross-attention: the reference builds boolean torch attn masks
  (True=blocked); here the mask is additive-free boolean (True=allowed)
  folded into the fused softmax, with the all-blocked→allow-all fix applied
  per query exactly as the reference (:510-513).
- The decoder always emits stacked per-layer outputs; eval takes the last.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from focoos_tpu.nn.layers.common import bn_use_running
from focoos_tpu.models.fai_mf.config import MaskFormerConfig
from focoos_tpu.models.fai_mf.ports import MaskFormerAuxOutputs, MaskFormerModelOutput
from focoos_tpu.nn.backbone.base import BaseBackbone
from focoos_tpu.nn.layers.common import (
    bn_use_running,
    CrossAttentionBlock,
    FFNBlock,
    MLP,
    SelfAttentionBlock,
    TransformerEncoderLayer,
    bilinear_resize,
    nearest_resize_torch,
    sine_position_embedding_2d_normalized,
)

Dtype = jnp.dtype


class TransformerFPN(nn.Module):
    """FPN pixel decoder w/ optional res5 transformer
    (reference: fai_mf/modelling.py:201-369 TransformerFPN).

    Returns (mask_features [B,H/4,W/4,out_dim], [p5, p4, p3] NHWC).
    """

    backbone: BaseBackbone
    feat_dim: int = 256
    out_dim: int = 256
    transformer_layers: int = 0
    transformer_nheads: int = 8
    transformer_dim_feedforward: int = 1024
    transformer_pre_norm: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, images: jnp.ndarray, train: bool = False):
        feats = self.backbone(images, train=train)
        names = ["res2", "res3", "res4", "res5"]
        names = [n for n in names if n in feats]

        def bn(name):
            return nn.BatchNorm(use_running_average=bn_use_running(train), momentum=0.9, epsilon=1e-5,
                                dtype=self.dtype, name=name)

        multi_scale = []
        y = None
        # top-down: res5 → res2; torch layer/adapter indices count res2=1..res5=4
        for rev_i, fname in enumerate(reversed(names)):
            idx = len(names) - rev_i  # 4 for res5, 1 for res2
            x = feats[fname]
            if rev_i == 0:
                if self.transformer_layers > 0:
                    x = nn.Conv(self.feat_dim, (1, 1), dtype=self.dtype, name="input_proj")(x)
                    b, h, w, c = x.shape
                    pos = sine_position_embedding_2d_normalized(h, w, self.feat_dim // 2, dtype=x.dtype)[None]
                    tokens = x.reshape(b, h * w, c)
                    for li in range(self.transformer_layers):
                        tokens = TransformerEncoderLayer(
                            self.feat_dim, self.transformer_nheads, self.transformer_dim_feedforward,
                            normalize_before=self.transformer_pre_norm, dtype=self.dtype,
                            name=f"transformer_layers_{li}",
                        )(tokens, pos_embed=pos)
                    if self.transformer_pre_norm:
                        tokens = nn.LayerNorm(epsilon=1e-5, name="transformer_norm")(tokens)
                    x = tokens.reshape(b, h, w, c)
                y = nn.Conv(self.feat_dim, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                            dtype=self.dtype, name=f"layer_{idx}_conv")(x)
                y = bn(f"layer_{idx}_norm")(y)
                y = nn.relu(y)
            else:
                lat = nn.Conv(self.feat_dim, (1, 1), use_bias=False, dtype=self.dtype,
                              name=f"adapter_{idx}_conv")(x)
                lat = bn(f"adapter_{idx}_norm")(lat)
                # torch-convention nearest (floor mapping): differs from
                # jax.image.resize at odd sizes, e.g. res5 w=4 → res4 w=7
                up = nearest_resize_torch(y, (lat.shape[1], lat.shape[2]))
                y = lat + up
                y = nn.Conv(self.feat_dim, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                            dtype=self.dtype, name=f"layer_{idx}_conv")(y)
                y = bn(f"layer_{idx}_norm")(y)
                y = nn.relu(y)
            if len(multi_scale) < 3:
                multi_scale.append(y)

        mask_features = nn.Conv(self.out_dim, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype,
                                name="mask_features")(y)
        return mask_features, multi_scale


class PredictionHeads(nn.Module):
    """Class + mask-embed heads (reference: fai_mf/modelling.py:28-127)."""

    hidden_dim: int
    num_classes: int
    mask_dim: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, queries: jnp.ndarray, mask_features: jnp.ndarray):
        """queries [B, Q, C]; mask_features [B, H, W, Cm] →
        (class_logits [B, Q, num_classes+1], masks [B, Q, H, W])."""
        x = nn.LayerNorm(epsilon=1e-5, name="decoder_norm")(queries)
        logits = nn.Dense(self.num_classes + 1, dtype=self.dtype, name="classifier")(x)
        embed = MLP(self.hidden_dim, self.mask_dim, 3, dtype=self.dtype, name="mask_classifier")(x)
        masks = jnp.einsum("bqc,bhwc->bqhw", embed, mask_features)
        return logits, masks


def _attn_allowed_from_masks(masks: jnp.ndarray, hw: Tuple[int, int]) -> jnp.ndarray:
    """Pred masks [B, Q, H, W] → boolean allowed-mask [B, 1, Q, h*w]
    (reference semantics :96-106, :510-513: blocked where mask<0; if a query
    blocks everything, allow everything)."""
    b, q = masks.shape[:2]
    m = jax.image.resize(masks, (b, q, hw[0], hw[1]), method="bilinear", antialias=False)
    blocked = (m < 0).reshape(b, q, hw[0] * hw[1])
    all_blocked = jnp.all(blocked, axis=-1, keepdims=True)
    allowed = jnp.where(all_blocked, True, ~blocked)
    return allowed[:, None]  # broadcast over heads


class MultiScaleMaskedTransformerDecoder(nn.Module):
    """Masked-attention query decoder (reference: fai_mf/modelling.py:372-557)."""

    num_classes: int
    hidden_dim: int = 256
    mask_dim: int = 256
    num_queries: int = 100
    nheads: int = 8
    dec_layers: int = 6
    dim_feedforward: int = 1024
    num_scales: int = 3
    pre_norm: bool = True
    use_attn_masks: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, xs: List[jnp.ndarray], mask_features: jnp.ndarray, train: bool = False):
        xs = xs[: self.num_scales]
        nlv = min(self.num_scales, self.dec_layers)
        bsz = xs[0].shape[0]

        srcs, poss, sizes = [], [], []
        for i in range(nlv):
            x = xs[i]
            b, h, w, c = x.shape
            src = nn.Conv(self.hidden_dim, (1, 1), dtype=self.dtype, name=f"input_proj_{i}")(x)
            srcs.append(src.reshape(b, h * w, self.hidden_dim))
            poss.append(sine_position_embedding_2d_normalized(h, w, self.hidden_dim // 2, dtype=src.dtype)[None])
            sizes.append((h, w))

        query_embed = self.param("query_embed", nn.initializers.normal(1.0), (self.num_queries, self.hidden_dim))
        query_feat = self.param("query_feat", nn.initializers.normal(1.0), (self.num_queries, self.hidden_dim))
        qe = jnp.broadcast_to(query_embed[None], (bsz, self.num_queries, self.hidden_dim)).astype(srcs[0].dtype)
        output = jnp.broadcast_to(query_feat[None], (bsz, self.num_queries, self.hidden_dim)).astype(srcs[0].dtype)

        heads = PredictionHeads(self.hidden_dim, self.num_classes, self.mask_dim, dtype=self.dtype,
                                name="forward_prediction_heads")

        all_logits, all_masks = [], []
        logits, masks = heads(output, mask_features)
        all_logits.append(logits)
        all_masks.append(masks)

        for i in range(self.dec_layers):
            lvl = i % nlv
            attn_mask = None
            if self.use_attn_masks:
                m = jax.lax.stop_gradient(masks) if train else masks
                # native-dtype resize: the attn mask is a sign test (<0), so
                # a bf16 bilinear is equivalent away from the zero crossing;
                # an f32 upcast here doubled the bandwidth of 3 mask resizes
                # per decoder block (measured 0.87 ms/fwd at b8@640)
                attn_mask = _attn_allowed_from_masks(m, sizes[lvl])
            output = CrossAttentionBlock(
                self.hidden_dim, self.nheads, normalize_before=self.pre_norm, dtype=self.dtype,
                name=f"transformer_cross_attention_layers_{i}",
            )(output, srcs[lvl], pos=poss[lvl], query_pos=qe, attn_mask=attn_mask)
            output = SelfAttentionBlock(
                self.hidden_dim, self.nheads, normalize_before=self.pre_norm, dtype=self.dtype,
                name=f"transformer_self_attention_layers_{i}",
            )(output, query_pos=qe)
            output = FFNBlock(
                self.hidden_dim, self.dim_feedforward, normalize_before=self.pre_norm, dtype=self.dtype,
                name=f"transformer_ffn_layers_{i}",
            )(output)
            logits, masks = heads(output, mask_features)
            all_logits.append(logits)
            all_masks.append(masks)

        return MaskFormerAuxOutputs(
            logits=jnp.stack([x.astype(jnp.float32) for x in all_logits]),
            masks=jnp.stack([x.astype(jnp.float32) for x in all_masks]),
        )


class FAIMaskFormer(nn.Module):
    """MaskFormer top-level module (reference: fai_mf/modelling.py:633-725)."""

    config: MaskFormerConfig
    backbone: BaseBackbone
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, images: jnp.ndarray, train: bool = False):
        cfg = self.config
        mean = jnp.asarray(cfg.pixel_mean, dtype=jnp.float32)
        std = jnp.asarray(cfg.pixel_std, dtype=jnp.float32)
        x = (images.astype(jnp.float32) - mean) / std
        x = x.astype(self.dtype or jnp.float32)

        mask_features, ms = TransformerFPN(
            backbone=self.backbone,
            feat_dim=cfg.pixel_decoder_feat_dim,
            out_dim=cfg.pixel_decoder_out_dim,
            transformer_layers=cfg.pixel_decoder_transformer_layers,
            transformer_nheads=cfg.pixel_decoder_transformer_nheads,
            transformer_dim_feedforward=cfg.pixel_decoder_transformer_dim_feedforward,
            dtype=self.dtype,
            name="pixel_decoder",
        )(x, train)

        aux = MultiScaleMaskedTransformerDecoder(
            num_classes=cfg.num_classes,
            hidden_dim=cfg.transformer_predictor_hidden_dim,
            mask_dim=cfg.transformer_predictor_out_dim,
            num_queries=cfg.num_queries,
            nheads=8,
            dec_layers=cfg.transformer_predictor_dec_layers,
            dim_feedforward=cfg.transformer_predictor_dim_feedforward,
            dtype=self.dtype,
            name="predictor",
        )(ms, mask_features, train)

        logits_raw = aux.logits[-1]
        masks_raw = aux.masks[-1]
        if cfg.cls_sigmoid:
            cls_probs = jax.nn.sigmoid(logits_raw)[..., :-1]
        else:
            cls_probs = jax.nn.softmax(logits_raw, axis=-1)[..., :-1]
        masks = jax.nn.sigmoid(masks_raw)
        if not train:
            b, q = masks.shape[:2]
            # bf16 upsample of sigmoid masks — the full-res [B,Q,H,W] tensor
            # dominates eval-graph bandwidth in f32 (see bisenetformer
            # modelling.py for the measured breakdown); consumers upcast.
            if self.dtype is not None:
                masks = masks.astype(self.dtype)
            masks = jax.image.resize(
                masks, (b, q, images.shape[1], images.shape[2]), method="bilinear", antialias=False
            )
        return MaskFormerModelOutput(masks=masks, logits=cls_probs, loss=None), aux
