"""rtmo — one-stage multi-person pose estimation (RTMO) for TPU.

Re-derivation of the reference (focoos/models/rtmo/{modelling,decoder,
transformer,utils}.py): CSPDarknet → HybridEncoder (AIFI transformer on res5
+ RepVGG-CSP FPN/PAN, strided-conv downsampling, nearest upsampling) →
RTMOHead (split cls/pose branches) → grid decode + NMS → DCC dynamic
coordinate classifier (per-detection 1-D bin heatmaps refined by a Gated
Attention Unit).

TPU design: the whole decode pipeline is static-shape — top-K candidates,
dense-IoU greedy NMS (focoos_tpu/ops/nms.py), DCC over a fixed
``max_detections`` slot array with validity masking — so inference is one
fused XLA program and only [B, D] results leave the device.
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from focoos_tpu.models.rtmo.config import RTMOConfig
from focoos_tpu.models.rtmo.ports import RTMOAuxOutputs, RTMOModelOutput
from focoos_tpu.nn.backbone.base import BaseBackbone
from focoos_tpu.nn.backbone.csp_darknet import ConvModule
from focoos_tpu.nn.layers.common import bn_use_running, MultiHeadAttention, nearest_resize_torch
from focoos_tpu.ops.nms import topk_nms

Dtype = jnp.dtype


# ---------------------------------------------------------------------------
# positional encodings (reference: rtmo/transformer.py:9-120)
# ---------------------------------------------------------------------------


def spe_dim_t(out_channels: int, temperature: float) -> np.ndarray:
    pos_dim = out_channels // 2
    return temperature ** (np.arange(pos_dim, dtype=np.float32) / pos_dim)


def spe_1d(position: jnp.ndarray, dim_t: jnp.ndarray) -> jnp.ndarray:
    """[..., P] positions → [..., P, C] (cos ‖ sin)."""
    freq = position[..., None] / dim_t
    return jnp.concatenate([jnp.cos(freq), jnp.sin(freq)], axis=-1)


def spe_2d_grid(h: int, w: int, out_channels: int, temperature: float) -> np.ndarray:
    """2-D grid encoding → [H*W, 2*out_channels], layout (h-enc ‖ w-enc)
    matching the reference's transpose+reshape (rtmo/decoder.py:326)."""
    dim_t = spe_dim_t(out_channels, temperature)
    gh, gw = np.meshgrid(np.arange(h, dtype=np.float32), np.arange(w, dtype=np.float32), indexing="ij")
    fh = gh.reshape(-1)[:, None] / dim_t
    fw = gw.reshape(-1)[:, None] / dim_t
    enc_h = np.concatenate([np.cos(fh), np.sin(fh)], axis=-1)
    enc_w = np.concatenate([np.cos(fw), np.sin(fw)], axis=-1)
    return np.concatenate([enc_h, enc_w], axis=-1).astype(np.float32)


# ---------------------------------------------------------------------------
# neck building blocks (reference: rtmo/decoder.py)
# ---------------------------------------------------------------------------


class ProjectionConv(nn.Module):
    """conv + BN, no activation (reference: decoder.py:54-94)."""

    out_channels: int
    kernel_size: int = 1
    stride: int = 1
    padding: int = 0
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        k, p = self.kernel_size, self.padding
        x = nn.Conv(self.out_channels, (k, k), strides=(self.stride, self.stride),
                    padding=[(p, p), (p, p)], use_bias=False, dtype=self.dtype, name="conv")(x)
        return nn.BatchNorm(use_running_average=bn_use_running(train), momentum=0.9, epsilon=1e-5,
                            dtype=self.dtype, name="bn")(x)


class RepVGGBlock(nn.Module):
    """3x3 + 1x1 two-branch block with SiLU (reference: decoder.py:97-187)."""

    out_channels: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        y = ProjectionConv(self.out_channels, 3, padding=1, dtype=self.dtype, name="branch_3x3")(x, train)
        y = y + ProjectionConv(self.out_channels, 1, dtype=self.dtype, name="branch_1x1")(x, train)
        return nn.silu(y)


class NeckCSPRepLayer(nn.Module):
    """CSP of RepVGG blocks (reference: decoder.py:190-232)."""

    out_channels: int
    num_blocks: int = 1
    widen_factor: float = 1.0
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        hidden = int(self.out_channels * self.widen_factor)
        x1 = ConvModule(hidden, 1, dtype=self.dtype, name="conv1")(x, train)
        for i in range(self.num_blocks):
            x1 = RepVGGBlock(hidden, dtype=self.dtype, name=f"bottlenecks_{i}")(x1, train)
        x2 = ConvModule(hidden, 1, dtype=self.dtype, name="conv2")(x, train)
        y = x1 + x2
        if hidden != self.out_channels:
            y = ConvModule(self.out_channels, 1, dtype=self.dtype, name="conv3")(y, train)
        return y


class DetrEncoderLayer(nn.Module):
    """Post-norm DETR encoder layer with GELU FFN (reference: transformer.py:383-430)."""

    embed_dims: int
    num_heads: int
    feedforward_channels: int = 1024
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, pos: jnp.ndarray) -> jnp.ndarray:
        q = x + pos
        attn = MultiHeadAttention(self.embed_dims, self.num_heads, dtype=self.dtype, name="self_attn")(q, q, x)
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x + attn)
        f = nn.Dense(self.feedforward_channels, dtype=self.dtype, name="ffn_linear1")(x)
        f = nn.gelu(f, approximate=False)
        f = nn.Dense(self.embed_dims, dtype=self.dtype, name="ffn_linear2")(f)
        return nn.LayerNorm(epsilon=1e-5, name="norm2")(x + f)


class RTMOHybridEncoder(nn.Module):
    """Neck (reference: rtmo/decoder.py:235-360). Returns the projected
    [P16, P32] maps (output_indices [1, 2])."""

    cfg: RTMOConfig
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, feats: dict, train: bool = False) -> List[jnp.ndarray]:
        cfg = self.cfg
        hidden = cfg.hidden_dim
        xs = [feats[k] for k in ("res3", "res4", "res5")]
        proj = [
            ProjectionConv(hidden, 1, dtype=self.dtype, name=f"input_proj_{i}")(x, train)
            for i, x in enumerate(xs)
        ]

        # AIFI on res5
        if cfg.transformer_encoder_layers > 0:
            b, h, w, c = proj[2].shape
            tokens = proj[2].reshape(b, h * w, c)
            pos = jnp.asarray(spe_2d_grid(h, w, hidden // 2, cfg.pe_temperature))[None].astype(tokens.dtype)
            for li in range(cfg.transformer_encoder_layers):
                tokens = DetrEncoderLayer(
                    cfg.transformer_embed_dims, cfg.transformer_num_heads,
                    cfg.transformer_feedforward_channels, dtype=self.dtype, name=f"encoder_0_layers_{li}",
                )(tokens, pos)
            proj[2] = tokens.reshape(b, h, w, c)

        # top-down FPN with nearest upsampling
        inner = [proj[2]]
        for idx, low_i in enumerate((1, 0)):
            lat = ConvModule(hidden, 1, dtype=self.dtype, name=f"lateral_convs_{idx}")(inner[0], train)
            inner[0] = lat
            low = proj[low_i]
            # torch-convention nearest (floor mapping); integer 2x here takes
            # the repeat fast path — identical values, no gather
            up = nearest_resize_torch(lat, (low.shape[1], low.shape[2]))
            fused = NeckCSPRepLayer(hidden, cfg.csp_layers, cfg.widen_factor, dtype=self.dtype,
                                    name=f"fpn_blocks_{idx}")(jnp.concatenate([up, low], axis=-1), train)
            inner.insert(0, fused)

        # bottom-up PAN with strided-conv downsampling
        outs = [inner[0]]
        for idx in range(2):
            high = inner[idx + 1]
            down = ConvModule(hidden, 3, stride=2, padding=1, dtype=self.dtype,
                              name=f"downsample_convs_{idx}")(outs[-1], train)
            out = NeckCSPRepLayer(hidden, cfg.csp_layers, cfg.widen_factor, dtype=self.dtype,
                                  name=f"pan_blocks_{idx}")(jnp.concatenate([down, high], axis=-1), train)
            outs.append(out)

        outs = [outs[i] for i in cfg.output_indices]
        projected = []
        for i, o in enumerate(outs):
            p = nn.Conv(cfg.output_dim, (1, 1), use_bias=False, dtype=self.dtype, name=f"projector_{i}_conv")(o)
            p = nn.BatchNorm(use_running_average=bn_use_running(train), momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                             name=f"projector_{i}_bn")(p)
            projected.append(p)
        return projected


# ---------------------------------------------------------------------------
# head (reference: rtmo/modelling.py:195-380)
# ---------------------------------------------------------------------------


class RTMOHeadModule(nn.Module):
    cfg: RTMOConfig
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, xs: List[jnp.ndarray], train: bool = False):
        cfg = self.cfg
        wf = cfg.widen_factor
        cls_ch = int(cfg.cls_feat_channels * wf)
        pose_ch = 8 * int(wf * 36)  # num_groups * channels_per_group
        cls_bias = float(-math.log((1 - 0.01) / 0.01))

        def conv_bn_silu(x, ch, groups, name):
            x = nn.Conv(ch, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                        feature_group_count=groups, dtype=self.dtype, name=f"{name}_conv")(x)
            x = nn.BatchNorm(use_running_average=bn_use_running(train), momentum=0.97, epsilon=1e-3,
                             dtype=self.dtype, name=f"{name}_bn")(x)
            return nn.silu(x)

        cls_scores, bbox_preds, kpt_offsets, kpt_vis, pose_feats = [], [], [], [], []
        for i in range(len(xs)):
            half = xs[i].shape[-1] // 2
            cls_feat, reg_feat = xs[i][..., :half], xs[i][..., half:]
            for s in range(cfg.stacked_convs):
                cls_feat = conv_bn_silu(cls_feat, cls_ch, 1, f"conv_cls_{i}_{s}")
            for s in range(cfg.stacked_convs * 2):
                reg_feat = conv_bn_silu(reg_feat, pose_ch, 1 if s == 0 else 8, f"conv_pose_{i}_{s}")

            cls_scores.append(
                nn.Conv(cfg.num_classes, (1, 1), bias_init=nn.initializers.constant(cls_bias),
                        dtype=self.dtype, name=f"out_cls_{i}")(cls_feat)
            )
            bbox_preds.append(nn.Conv(4, (1, 1), dtype=self.dtype, name=f"out_bbox_{i}")(reg_feat))
            kpt_offsets.append(
                nn.Conv(cfg.num_keypoints * 2, (1, 1), dtype=self.dtype, name=f"out_kpt_reg_{i}")(reg_feat)
            )
            kpt_vis.append(nn.Conv(cfg.num_keypoints, (1, 1), dtype=self.dtype, name=f"out_kpt_vis_{i}")(reg_feat))
            if cfg.pose_vec_channels > 0:
                pose_feats.append(
                    nn.Conv(cfg.pose_vec_channels, (1, 1), dtype=self.dtype, name=f"out_pose_{i}")(reg_feat)
                )
            else:
                pose_feats.append(reg_feat)
        return cls_scores, bbox_preds, kpt_offsets, kpt_vis, pose_feats


# ---------------------------------------------------------------------------
# DCC (reference: rtmo/modelling.py:383-668) + GAU (:46-193)
# ---------------------------------------------------------------------------


class GAUEncoder(nn.Module):
    """Gated Attention Unit over the keypoint axis (reference :46-193)."""

    s: int = 128
    token_dims: int = 128
    expansion_factor: int = 2
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, pos_enc: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        e = int(self.token_dims * self.expansion_factor)
        # ScaleNorm
        g = self.param("ln_g", nn.initializers.ones, (1,))
        norm = jnp.sqrt(jnp.sum(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True) + 1e-12) * (self.token_dims**-0.5)
        xn = (x / jnp.clip(norm, min=1e-5).astype(x.dtype)) * g.astype(x.dtype)

        uv = nn.Dense(2 * e + self.s, use_bias=False, dtype=self.dtype, name="uv")(xn)
        uv = nn.silu(uv)
        u, v, base = jnp.split(uv, [e, 2 * e], axis=-1)

        gamma = self.param("gamma", nn.initializers.uniform(1.0), (2, self.s))
        beta = self.param("beta", nn.initializers.uniform(1.0), (2, self.s))
        q = base * gamma[0].astype(base.dtype) + beta[0].astype(base.dtype)
        k = base * gamma[1].astype(base.dtype) + beta[1].astype(base.dtype)
        if pos_enc is not None:
            q = q + pos_enc.astype(q.dtype)
            k = k + pos_enc.astype(k.dtype)

        qk = jnp.einsum("...ks,...ls->...kl", q, k)
        kernel = jnp.square(nn.relu(qk / jnp.sqrt(float(self.s))))
        out = u * jnp.einsum("...kl,...le->...ke", kernel, v)
        out = nn.Dense(self.token_dims, use_bias=False, dtype=self.dtype, name="o")(out)

        res_scale = self.param("res_scale", nn.initializers.ones, (self.token_dims,))
        return x * res_scale.astype(x.dtype) + out


class _MaskedBatchNorm(nn.Module):
    """BatchNorm1d whose TRAIN statistics can be restricted to valid rows.

    The criterion path feeds DCC a STATIC p_max-slot gather of the SimOTA
    positives (loss.py::_gather_positives); without masking, the padding
    slots' pose features would enter the batch statistics, which the
    reference never sees (it runs DCC on exactly the positives,
    focoos/models/rtmo/modelling.py:1002-1009). Variable layout mirrors
    flax.linen.BatchNorm exactly (params scale/bias, batch_stats mean/var),
    so checkpoints and the torch weight converter are unaffected.
    """

    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool, mask: Optional[jnp.ndarray] = None):
        feat = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((feat,), jnp.float32))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((feat,), jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (feat,))
        bias = self.param("bias", nn.initializers.zeros, (feat,))
        use_batch = not bn_use_running(train)  # honors trace-time FREEZE_ALL_BN
        if use_batch:
            xf = x.astype(jnp.float32).reshape(-1, feat)
            if mask is None:
                w = jnp.ones((xf.shape[0],), jnp.float32)
            else:
                w = mask.astype(jnp.float32).reshape(-1)
            n = jnp.maximum(jnp.sum(w), 1.0)
            mean = jnp.sum(xf * w[:, None], axis=0) / n
            var = jnp.sum(jnp.square(xf - mean) * w[:, None], axis=0) / n
            if not self.is_initializing():
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var
        else:
            mean, var = ra_mean.value, ra_var.value
        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.epsilon)
        y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
        return y.astype(self.dtype or x.dtype)


class DCC(nn.Module):
    """Dynamic coordinate classifier (reference :383-668)."""

    cfg: RTMOConfig
    dtype: Optional[Dtype] = None

    def _bins(self) -> Tuple[np.ndarray, np.ndarray]:
        nx, ny = self.cfg.num_bins
        return (
            np.linspace(-0.5, 0.5, nx).astype(np.float32),
            np.linspace(-0.5, 0.5, ny).astype(np.float32),
        )

    @nn.compact
    def __call__(
        self,
        pose_feats: jnp.ndarray,
        bbox_cs: jnp.ndarray,
        grids: jnp.ndarray,
        train: bool = False,
        mask: Optional[jnp.ndarray] = None,
    ):
        """pose_feats [..., C_pose]; bbox_cs [..., 4] (cx, cy, sw, sh);
        grids [..., 2] → (keypoints [..., K, 2] abs, (x_probs, y_probs), sigmas).
        ``mask`` (broadcastable to pose_feats[..., 0]) restricts train-mode BN
        statistics to valid slots — see _MaskedBatchNorm."""
        cfg = self.cfg
        K, F = cfg.num_keypoints, cfg.feat_channels_dcc
        xb_np, yb_np = self._bins()
        dim_t = jnp.asarray(spe_dim_t(cfg.spe_channels, 300.0))

        center, scale = bbox_cs[..., :2], bbox_cs[..., 2:]
        rel_center = center - grids
        x_bins = jnp.asarray(xb_np) * scale[..., 0:1] + rel_center[..., 0:1]  # [..., NX]
        y_bins = jnp.asarray(yb_np) * scale[..., 1:2] + rel_center[..., 1:2]

        x_bins_enc = nn.Dense(F, dtype=self.dtype, name="x_fc")(spe_1d(x_bins, dim_t).astype(jnp.float32))
        y_bins_enc = nn.Dense(F, dtype=self.dtype, name="y_fc")(spe_1d(y_bins, dim_t).astype(jnp.float32))

        # learnable per-keypoint sigma (reference DCC.sigma_fc :467, train only)
        sigma_scale = self.param("sigma_scale", nn.initializers.constant(0.1), ())
        sigmas = jax.nn.sigmoid(
            nn.Dense(K, dtype=self.dtype, name="sigma_fc")(pose_feats).astype(jnp.float32)
        ) * sigma_scale

        # pose features → K keypoint tokens (Linear + BatchNorm1d folded math)
        kf = nn.Dense(F * K, dtype=self.dtype, name="pose_to_kpts_fc")(pose_feats)
        # BatchNorm1d over the flattened feature dim; masked in the criterion
        # path so the static positive-slot padding stays out of the statistics
        kf = _MaskedBatchNorm(momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                              name="pose_to_kpts_bn")(kf, train=train, mask=mask)
        kf = kf.reshape(*kf.shape[:-1], K, F)

        pos_enc = self.param("pos_enc", nn.initializers.normal(1.0), (K, cfg.gau_s))
        kf = GAUEncoder(s=cfg.gau_s, token_dims=F, expansion_factor=cfg.gau_expansion_factor,
                        dtype=self.dtype, name="gau")(kf, pos_enc=pos_enc)

        x_hms = jnp.einsum("...kf,...bf->...kb", kf, x_bins_enc).astype(jnp.float32)
        y_hms = jnp.einsum("...kf,...bf->...kb", kf, y_bins_enc).astype(jnp.float32)

        x_hms = jnp.clip(x_hms, -5e4, 5e4)
        y_hms = jnp.clip(y_hms, -5e4, 5e4)
        px = jax.nn.softmax(x_hms, axis=-1)
        py = jax.nn.softmax(y_hms, axis=-1)

        # integral decode over ABSOLUTE bins (center, not rel_center —
        # reference _decode_xy_heatmaps :575-585 re-adds the grid via center)
        x_bins_abs = jnp.asarray(xb_np) * scale[..., 0:1] + center[..., 0:1]
        y_bins_abs = jnp.asarray(yb_np) * scale[..., 1:2] + center[..., 1:2]
        x = jnp.sum(px * x_bins_abs[..., None, :], axis=-1)
        y = jnp.sum(py * y_bins_abs[..., None, :], axis=-1)
        return jnp.stack([x, y], axis=-1), (px, py), sigmas

    def target_heatmaps(self, kpt_targets, bbox_cs, sigmas, areas):
        """Laplacian target heatmaps (reference :587-623). Pure function of
        config (bins) — no params."""
        xb_np, yb_np = self._bins()
        center, scale = bbox_cs[..., :2], bbox_cs[..., 2:]
        x_bins = jnp.asarray(xb_np) * scale[..., 0:1] + center[..., 0:1]  # [..., NX]
        y_bins = jnp.asarray(yb_np) * scale[..., 1:2] + center[..., 1:2]
        dist_x = jnp.abs(kpt_targets[..., 0:1] - x_bins[..., None, :])  # [..., K, NX]
        dist_y = jnp.abs(kpt_targets[..., 1:2] - y_bins[..., None, :])
        a = jnp.clip(jnp.sqrt(jnp.maximum(areas, 0.0)), min=1.0)[..., None, None]
        s = jnp.clip(sigmas, min=1e-3)[..., None]
        dist_x = dist_x / a / s
        dist_y = dist_y / a / s
        hm_x = jnp.exp(-dist_x / 2) / s
        hm_y = jnp.exp(-dist_y / 2) / s
        return hm_x, hm_y


# ---------------------------------------------------------------------------
# priors
# ---------------------------------------------------------------------------


def grid_priors(
    featmap_sizes: Sequence[Tuple[int, int]], strides: Sequence[int], centralize: bool = False
) -> Tuple[np.ndarray, np.ndarray]:
    """MlvlPointGenerator grid priors → (priors [A, 2] abs xy, strides [A]).

    Reference semantics (focoos/models/rtmo/loss.py:36,142): the default
    offset is 0.5 (anchor points at cell centers, (i+0.5)*stride);
    ``centralize_points`` replaces it with a (stride-1)/2 pixel-center shift.
    Round-3 e2e parity caught the offset inverted here — every decoded box
    was shifted by stride/2."""
    pts, sts = [], []
    for (h, w), s in zip(featmap_sizes, strides):
        off = 0.0 if centralize else 0.5
        xs = (np.arange(w, dtype=np.float32) + off) * s
        ys = (np.arange(h, dtype=np.float32) + off) * s
        if centralize:
            xs += (s - 1) / 2.0
            ys += (s - 1) / 2.0
        gx, gy = np.meshgrid(xs, ys)
        pts.append(np.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1))
        sts.append(np.full((h * w,), s, np.float32))
    return np.concatenate(pts), np.concatenate(sts)


# ---------------------------------------------------------------------------
# top-level model
# ---------------------------------------------------------------------------


class RTMO(nn.Module):
    """RTMO top-level module (reference: rtmo/modelling.py:1506-1666)."""

    config: RTMOConfig
    backbone: BaseBackbone
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, images: jnp.ndarray, train: bool = False):
        cfg = self.config
        mean = jnp.asarray(cfg.pixel_mean, dtype=jnp.float32)
        std = jnp.asarray(cfg.pixel_std, dtype=jnp.float32)
        x = (images.astype(jnp.float32) - mean) / std
        x = x.astype(self.dtype or jnp.float32)

        feats = self.backbone(x, train=train)
        ms = RTMOHybridEncoder(cfg, dtype=self.dtype, name="neck")(feats, train)
        cls_scores, bbox_preds, kpt_offsets, kpt_vis, pose_feats = RTMOHeadModule(
            cfg, dtype=self.dtype, name="head_module"
        )(ms, train)

        featmap_sizes = [(m.shape[1], m.shape[2]) for m in ms]
        priors_np, strides_np = grid_priors(
            featmap_sizes, cfg.featmap_strides_pointgenerator, cfg.centralize_points_pointgenerator
        )
        priors = jnp.asarray(priors_np)
        strides = jnp.asarray(strides_np)

        def flat(xs, ch):
            return jnp.concatenate([t.reshape(t.shape[0], -1, ch) for t in xs], axis=1)

        b = images.shape[0]
        aux = RTMOAuxOutputs(
            cls_scores=flat(cls_scores, cfg.num_classes).astype(jnp.float32),
            bbox_preds=flat(bbox_preds, 4).astype(jnp.float32),
            kpt_offsets=flat(kpt_offsets, cfg.num_keypoints * 2).astype(jnp.float32),
            kpt_vis=flat(kpt_vis, cfg.num_keypoints).astype(jnp.float32),
            pose_feats=flat(pose_feats, pose_feats[0].shape[-1]),
            priors=priors,
            strides=strides,
        )

        if train:
            # loss path: the criterion consumes raw aux; DCC runs separately
            # on assigned positives (rtmo/loss.py) — reference RTMOHead.forward
            # :942-948 skips predict() during training. The DCC submodule must
            # still be initialized, so bind it on dummy slots.
            d = 1
            dummy_pose = jnp.zeros((b, d, aux.pose_feats.shape[-1]), aux.pose_feats.dtype)
            dummy_cs = jnp.ones((b, d, 4), jnp.float32)
            dummy_grid = jnp.zeros((b, d, 2), jnp.float32)
            kp, _, _ = DCC(cfg, dtype=self.dtype, name="dcc")(dummy_pose, dummy_cs, dummy_grid)
            zeros = jnp.zeros((b, d), jnp.float32)
            out = RTMOModelOutput(
                scores=zeros, labels=zeros.astype(jnp.int32), boxes=jnp.zeros((b, d, 4), jnp.float32),
                boxes_scores=zeros, keypoints=kp,
                keypoints_scores=jnp.zeros((b, d, cfg.num_keypoints), jnp.float32),
                keypoints_visible=jnp.zeros((b, d, cfg.num_keypoints), jnp.float32),
                loss=None,
            )
            return out, aux

        # ------------------------------------------------------------------
        # static-shape decode (reference RTMOHead.predict :1357-1479)
        scores_all = jax.nn.sigmoid(aux.cls_scores)  # [B, A, C]
        scores_max = jnp.max(scores_all, axis=-1)
        labels = jnp.argmax(scores_all, axis=-1)

        # decode bboxes (reference decode_bbox utils.py:190)
        xys = aux.bbox_preds[..., :2] * strides[None, :, None] + priors[None]
        whs = jnp.exp(aux.bbox_preds[..., 2:]) * strides[None, :, None]
        boxes = jnp.concatenate([xys - whs / 2, xys + whs / 2], axis=-1)  # [B, A, 4]

        kpt_vis_sig = jax.nn.sigmoid(aux.kpt_vis)

        d = cfg.max_detections

        def decode_one(boxes_i, scores_i, labels_i, vis_i, pose_i):
            idx, valid, out_scores = topk_nms(
                boxes_i, scores_i, cfg.nms_pre_topk, cfg.nms_thr, d, cfg.score_thr
            )
            sel_boxes = boxes_i[idx]
            sel_labels = labels_i[idx]
            sel_vis = vis_i[idx]
            sel_pose = pose_i[idx]
            sel_grids = priors[idx]
            return idx, valid, out_scores, sel_boxes, sel_labels, sel_vis, sel_pose, sel_grids

        idx, valid, out_scores, sel_boxes, sel_labels, sel_vis, sel_pose, sel_grids = jax.vmap(decode_one)(
            boxes, scores_max, labels, kpt_vis_sig, aux.pose_feats
        )

        # bbox → center/scale with padding 1.25 (reference bbox_xyxy2cs :113, padding from RTMOHead)
        cs_scale = (sel_boxes[..., 2:] - sel_boxes[..., :2]) * 1.25
        cs_center = (sel_boxes[..., 2:] + sel_boxes[..., :2]) * 0.5
        bbox_cs = jnp.concatenate([cs_center, cs_scale], axis=-1)

        keypoints, _hms, _sigmas = DCC(cfg, dtype=self.dtype, name="dcc")(sel_pose, bbox_cs, sel_grids)

        validf = valid.astype(jnp.float32)
        out = RTMOModelOutput(
            scores=out_scores * validf,
            labels=sel_labels,
            boxes=sel_boxes,
            boxes_scores=out_scores * validf,
            keypoints=keypoints,
            keypoints_scores=sel_vis,
            keypoints_visible=sel_vis,
            loss=None,
        )
        return out, aux
