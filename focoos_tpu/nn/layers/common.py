"""Shared NN building blocks (flax.linen, NHWC).

TPU-native re-design of the reference layer toolkit
(focoos/nn/layers/{conv,base,norm,transformer}.py): convolutions run in NHWC
(XLA's preferred TPU layout), BatchNorm statistics are computed over the
*global* batch under pjit/GSPMD — which gives SyncBatchNorm semantics across
the data mesh for free (the reference needs torch SyncBatchNorm conversion,
focoos/trainer/trainer.py:334).
"""

from __future__ import annotations

import contextlib
import contextvars
from typing import Any, Callable, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def get_activation(name: Optional[str]) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Activation registry (reference: focoos/nn/layers/base.py:get_activation_fn)."""
    if name is None or name == "identity":
        return lambda x: x
    table = {
        "relu": nn.relu,
        "gelu": lambda x: nn.gelu(x, approximate=False),
        "silu": nn.silu,
        "swish": nn.silu,
        "glu": nn.glu,
        "leaky_relu": nn.leaky_relu,
        "sigmoid": nn.sigmoid,
        "hardsigmoid": nn.hard_sigmoid,
        "relu6": lambda x: jnp.clip(x, 0.0, 6.0),
    }
    if name not in table:
        raise ValueError(f"activation must be one of {sorted(table)}, not {name}")
    return table[name]


# Trace-time global set by the trainer when TrainerArgs.freeze_bn is on —
# the functional analog of the reference's whole-model
# FrozenBatchNorm2d.convert_frozen_batchnorm (trainer/trainer.py:329).
# Read once per jit trace, so flipping it before building the train step
# freezes every BatchNorm in the compiled graph.
FREEZE_ALL_BN = False

# Trace-time int8 mode, entered by Int8XLARuntime around its traces: every
# ConvNorm executes as an int8 QDQ conv (per-out-channel weight scales,
# s8xs8→s32 on the MXU) — the XLA-native analog of the reference's ONNX
# quantize_static QDQ graphs (focoos/infer/quantizer.py:200-209).
# A ContextVar (not a module global) so a concurrent trace of another model
# in a different thread/context never picks up the int8 path by accident
# (ADVICE r2 low). ``_INT8_ACT_SCALES`` optionally carries calibrated static
# per-layer activation scales keyed by the flax module path; when absent the
# QDQ conv falls back to a dynamic per-tensor absmax.
_INT8_QDQ: "contextvars.ContextVar[bool]" = contextvars.ContextVar("focoos_int8_qdq", default=False)
_INT8_ACT_SCALES: "contextvars.ContextVar[Optional[dict]]" = contextvars.ContextVar(
    "focoos_int8_act_scales", default=None
)


def int8_qdq_enabled() -> bool:
    return _INT8_QDQ.get()


def int8_act_scales() -> Optional[dict]:
    return _INT8_ACT_SCALES.get()


@contextlib.contextmanager
def int8_qdq_mode(enabled: bool = True, act_scales: Optional[dict] = None):
    """Enter int8 QDQ tracing mode (optionally with calibrated activation
    scales). Nesting-safe and thread-safe via contextvars tokens."""
    t1 = _INT8_QDQ.set(enabled)
    t2 = _INT8_ACT_SCALES.set(act_scales)
    try:
        yield
    finally:
        _INT8_ACT_SCALES.reset(t2)
        _INT8_QDQ.reset(t1)


# Calibration pass: each _Int8QDQConv sows its input absmax into the
# ``int8_calib`` collection (apply with mutable=["int8_calib"]) — the analog
# of the reference's MinMax CalibrationDataReader feeding quantize_static
# (focoos/infer/quantizer.py:51-124).
_INT8_CALIBRATE: "contextvars.ContextVar[bool]" = contextvars.ContextVar(
    "focoos_int8_calibrate", default=False
)


def int8_calibrating() -> bool:
    return _INT8_CALIBRATE.get()


@contextlib.contextmanager
def int8_calibration_mode():
    t1 = _INT8_QDQ.set(True)
    t2 = _INT8_CALIBRATE.set(True)
    try:
        yield
    finally:
        _INT8_CALIBRATE.reset(t2)
        _INT8_QDQ.reset(t1)


def bn_use_running(train: bool) -> bool:
    """``use_running_average`` for raw ``nn.BatchNorm`` call sites.

    Honors the trainer's ``FREEZE_ALL_BN`` override so TrainerArgs.freeze_bn
    reaches every BN in the zoo, not only those built via the wrapper below.
    Evaluated at trace time.
    """
    return (not train) or FREEZE_ALL_BN


class BatchNorm(nn.Module):
    """BatchNorm over NHWC / NLC feature axis.

    ``frozen=True`` replicates the reference's FrozenBatchNorm2d
    (focoos/nn/layers/norm.py:6): running stats are always used and never
    updated. Under pjit, the train-mode batch reduction spans the full global
    batch → cross-device synchronized statistics.
    """

    momentum: float = 0.9
    epsilon: float = 1e-5
    frozen: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        use_running = (not train) or self.frozen or FREEZE_ALL_BN
        return nn.BatchNorm(
            use_running_average=use_running,
            momentum=self.momentum,
            epsilon=self.epsilon,
            dtype=self.dtype,
            name="bn",
        )(x)


def get_norm(
    norm: Optional[str], dtype: Optional[Dtype] = None, num_groups: int = 32, name: str = "norm"
) -> Optional[nn.Module]:
    """Norm-layer factory (reference: focoos/nn/layers/norm.py:209)."""
    if norm is None or norm == "":
        return None
    if norm == "BN":
        return BatchNorm(dtype=dtype, name=name)
    if norm == "FrozenBN":
        return BatchNorm(frozen=True, dtype=dtype, name=name)
    if norm == "GN":
        return nn.GroupNorm(num_groups=num_groups, epsilon=1e-5, dtype=dtype, name=name)
    if norm == "LN":
        return nn.LayerNorm(epsilon=1e-5, dtype=dtype, name=name)
    raise ValueError(f"Unknown norm: {norm}")


class ConvNorm(nn.Module):
    """Conv2d + norm + activation (reference: focoos/nn/layers/conv.py:ConvNormLayer).

    NHWC input; SAME-style padding computed as (k-1)//2 like the torch default.
    """

    ch_out: int
    kernel_size: int = 3
    stride: int = 1
    padding: Optional[int] = None
    bias: bool = False
    norm: Optional[str] = "BN"
    act: Optional[str] = None
    groups: int = 1
    dilation: int = 1
    # execute a 3x3/s2 conv as space-to-depth + 2x2 conv (same params/paths,
    # exact to fp rounding) — see _S2DConv3x3s2 below. Only valid for
    # kernel_size=3, stride=2, no bias/groups/dilation.
    s2d: bool = False
    # execute a 3x3/s2 conv as a phase-packed 5x5/s4 conv + depth-to-space
    # (same params/paths, exact to fp rounding) — see _PhasePackConv3x3s2.
    # Falls back to the plain conv when H or W isn't divisible by 4.
    phase_pack: bool = False
    # execute a 3x3 conv (stride 1 or 2) as a block-banded matmul over the
    # flattened (W, C) lane axis — see _BandedConv3x3. The measured stem win
    # on v5e (docs/tpu_design.md). Falls back when Wo has no {32,16,8} tile.
    banded: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        k = self.kernel_size
        pad = (k - 1) // 2 * self.dilation if self.padding is None else self.padding
        if (
            self.phase_pack
            and k == 3
            and self.stride == 2
            and not self.bias
            and self.groups == 1
            and self.dilation == 1
            and x.shape[1] % 4 == 0
            and x.shape[2] % 4 == 0
        ):
            x = _PhasePackConv3x3s2(self.ch_out, dtype=self.dtype, name="conv")(x)
        elif self.s2d and k == 3 and self.stride == 2 and not self.bias and self.groups == 1:
            x = _S2DConv3x3s2(self.ch_out, dtype=self.dtype, name="conv")(x)
        elif (
            self.banded
            and k == 3
            and self.stride in (1, 2)
            and not self.bias
            and self.groups == 1
            and self.dilation == 1
            and pad == 1
        ):
            x = _BandedConv3x3(self.ch_out, stride=self.stride, dtype=self.dtype, name="conv")(x)
        elif int8_qdq_enabled() and not train:
            x = _Int8QDQConv(
                features=self.ch_out,
                kernel_size=k,
                stride=self.stride,
                padding=pad,
                use_bias=self.bias,
                groups=self.groups,
                dilation=self.dilation,
                dtype=self.dtype,
                name="conv",
            )(x)
        else:
            x = nn.Conv(
                features=self.ch_out,
                kernel_size=(k, k),
                strides=(self.stride, self.stride),
                padding=[(pad, pad), (pad, pad)],
                use_bias=self.bias,
                feature_group_count=self.groups,
                kernel_dilation=(self.dilation, self.dilation),
                dtype=self.dtype,
                name="conv",
            )(x)
        norm = get_norm(self.norm, dtype=self.dtype)
        if norm is not None:
            if isinstance(norm, BatchNorm):
                x = norm(x, train=train)
            else:
                x = norm(x)
        if self.act is not None:
            x = get_activation(self.act)(x)
        return x


class MLP(nn.Module):
    """Linear→ReLU→…→Linear stack (reference: focoos/nn/layers/base.py:MLP)."""

    hidden_dim: int
    output_dim: int
    num_layers: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i in range(self.num_layers):
            out = self.output_dim if i == self.num_layers - 1 else self.hidden_dim
            x = nn.Dense(out, dtype=self.dtype, name=f"layers_{i}")(x)
            if i < self.num_layers - 1:
                x = nn.relu(x)
        return x


class MultiHeadAttention(nn.Module):
    """Standard MHA with merged qkv semantics matching torch's
    ``nn.MultiheadAttention`` so pretrained in_proj weights port 1:1."""

    embed_dim: int
    num_heads: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,
        key: jnp.ndarray,
        value: jnp.ndarray,
        attn_mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        e, h = self.embed_dim, self.num_heads
        hd = e // h
        q = nn.Dense(e, dtype=self.dtype, name="q_proj")(query)
        k = nn.Dense(e, dtype=self.dtype, name="k_proj")(key)
        v = nn.Dense(e, dtype=self.dtype, name="v_proj")(value)

        def split(t):
            return t.reshape(*t.shape[:-1], h, hd)

        q, k, v = split(q), split(k), split(v)
        scale = hd**-0.5
        logits = jnp.einsum("...qhd,...khd->...hqk", q * scale, k)
        if attn_mask is not None:
            logits = jnp.where(attn_mask, logits, jnp.finfo(logits.dtype).min)
        weights = jnp.asarray(
            nn.softmax(logits.astype(jnp.float32), axis=-1), dtype=q.dtype
        )
        out = jnp.einsum("...hqk,...khd->...qhd", weights, v)
        out = out.reshape(*out.shape[:-2], e)
        return nn.Dense(e, dtype=self.dtype, name="out_proj")(out)


class TransformerEncoderLayer(nn.Module):
    """Post-norm transformer encoder layer
    (reference: focoos/nn/layers/transformer.py:553, normalize_before=False)."""

    d_model: int
    nhead: int
    dim_feedforward: int = 2048
    activation: str = "relu"
    normalize_before: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, src: jnp.ndarray, pos_embed: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        attn = MultiHeadAttention(self.d_model, self.nhead, dtype=self.dtype, name="self_attn")
        norm1 = nn.LayerNorm(epsilon=1e-5, name="norm1")
        norm2 = nn.LayerNorm(epsilon=1e-5, name="norm2")

        def ffn(x):
            x = nn.Dense(self.dim_feedforward, dtype=self.dtype, name="linear1")(x)
            x = get_activation(self.activation)(x)
            return nn.Dense(self.d_model, dtype=self.dtype, name="linear2")(x)

        if self.normalize_before:
            s2 = norm1(src)
            q = s2 if pos_embed is None else s2 + pos_embed
            src = src + attn(q, q, s2)
            return src + ffn(norm2(src))
        q = src if pos_embed is None else src + pos_embed
        src = norm1(src + attn(q, q, src))
        return norm2(src + ffn(src))


def sine_position_embedding_2d(
    h: int,
    w: int,
    num_pos_feats: int,
    temperature: float = 10000.0,
    dtype: Dtype = jnp.float32,
) -> jnp.ndarray:
    """Non-normalized 2-D sine position embedding → [H*W, 2*num_pos_feats].

    Matches the reference's PositionEmbeddingSine with normalize=False
    (focoos/models/fai_detr/modelling.py:110-179): concat order is
    (sin(y), cos(y), sin(x), cos(x)), each interleave-sliced.
    """
    y = jnp.arange(h, dtype=jnp.float32)[:, None] * jnp.ones((1, w), jnp.float32)
    x = jnp.arange(w, dtype=jnp.float32)[None, :] * jnp.ones((h, 1), jnp.float32)
    dim_t = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_t = temperature ** (2.0 * jnp.floor(dim_t / 2.0) / num_pos_feats)
    pos_x = x[:, :, None] / dim_t  # [H, W, F]
    pos_y = y[:, :, None] / dim_t
    out = jnp.concatenate(
        [
            jnp.sin(pos_y[:, :, 0::2]).reshape(h * w, -1),
            jnp.cos(pos_y[:, :, 1::2]).reshape(h * w, -1),
            jnp.sin(pos_x[:, :, 0::2]).reshape(h * w, -1),
            jnp.cos(pos_x[:, :, 1::2]).reshape(h * w, -1),
        ],
        axis=-1,
    )
    return out.astype(dtype)


def bilinear_resize(x: jnp.ndarray, size: Sequence[int]) -> jnp.ndarray:
    """Bilinear NHWC resize with half-pixel centers, NO antialiasing — exact
    torch ``F.interpolate(mode="bilinear", align_corners=False)`` semantics."""
    import jax

    b, _, _, c = x.shape
    return jax.image.resize(x, (b, size[0], size[1], c), method="bilinear", antialias=False)


def nearest_resize_torch(x: jnp.ndarray, size: Sequence[int]) -> jnp.ndarray:
    """Nearest NHWC resize with torch ``F.interpolate(mode="nearest")``
    semantics: src index = floor(dst * in / out) (asymmetric), which differs
    from jax.image.resize's half-pixel rounding at NON-integer scales —
    e.g. FPN upsampling on odd input sizes (e2e parity seam). Integer
    upscales take the repeat fast path (identical results, no gather)."""
    oh, ow = int(size[0]), int(size[1])
    ih, iw = x.shape[1], x.shape[2]
    if oh % ih == 0 and ow % iw == 0:
        return jnp.repeat(jnp.repeat(x, oh // ih, axis=1), ow // iw, axis=2)
    ri = (jnp.arange(oh) * ih) // oh
    ci = (jnp.arange(ow) * iw) // ow
    return x[:, ri][:, :, ci]


def sine_position_embedding_2d_normalized(
    h: int,
    w: int,
    num_pos_feats: int,
    temperature: float = 10000.0,
    scale: float = 2.0 * 3.141592653589793,
    eps: float = 1e-6,
    offset: float = 0.0,
    dtype: Dtype = jnp.float32,
) -> jnp.ndarray:
    """Normalized sine embedding → [H*W, 2*num_pos_feats].

    Matches the reference PositionEmbeddingSine(normalize=True)
    (focoos/nn/layers/position_encoding.py:7): 1-based cumsum coordinates
    normalized to (0, scale]; sin/cos interleaved per position pair; channel
    order (y-half, x-half).
    """
    y = (jnp.arange(h, dtype=jnp.float32) + 1.0 + offset) / (h + eps) * scale
    x = (jnp.arange(w, dtype=jnp.float32) + 1.0 + offset) / (w + eps) * scale
    dim_t = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_t = temperature ** (2.0 * jnp.floor(dim_t / 2.0) / num_pos_feats)
    py = y[:, None] / dim_t  # [H, F]
    px = x[:, None] / dim_t  # [W, F]

    def interleave(p):
        s = jnp.sin(p[:, 0::2])
        c = jnp.cos(p[:, 1::2])
        return jnp.stack([s, c], axis=-1).reshape(p.shape[0], -1)

    py_i = interleave(py)  # [H, F]
    px_i = interleave(px)  # [W, F]
    out = jnp.concatenate(
        [
            jnp.broadcast_to(py_i[:, None, :], (h, w, num_pos_feats)).reshape(h * w, -1),
            jnp.broadcast_to(px_i[None, :, :], (h, w, num_pos_feats)).reshape(h * w, -1),
        ],
        axis=-1,
    )
    return out.astype(dtype)


class SelfAttentionBlock(nn.Module):
    """Pre/post-norm residual self-attention
    (reference: focoos/nn/layers/transformer.py:17 SelfAttentionLayer)."""

    d_model: int
    nhead: int
    normalize_before: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, tgt, query_pos=None, attn_mask=None):
        attn = MultiHeadAttention(self.d_model, self.nhead, dtype=self.dtype, name="self_attn")
        norm = nn.LayerNorm(epsilon=1e-5, name="norm")
        if self.normalize_before:
            t2 = norm(tgt)
            q = t2 if query_pos is None else t2 + query_pos
            return tgt + attn(q, q, t2, attn_mask=attn_mask)
        q = tgt if query_pos is None else tgt + query_pos
        return norm(tgt + attn(q, q, tgt, attn_mask=attn_mask))


class CrossAttentionBlock(nn.Module):
    """Pre/post-norm residual cross-attention
    (reference: focoos/nn/layers/transformer.py:131 CrossAttentionLayer)."""

    d_model: int
    nhead: int
    normalize_before: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, tgt, memory, pos=None, query_pos=None, attn_mask=None):
        attn = MultiHeadAttention(self.d_model, self.nhead, dtype=self.dtype, name="multihead_attn")
        norm = nn.LayerNorm(epsilon=1e-5, name="norm")
        k = memory if pos is None else memory + pos
        if self.normalize_before:
            t2 = norm(tgt)
            q = t2 if query_pos is None else t2 + query_pos
            return tgt + attn(q, k, memory, attn_mask=attn_mask)
        q = tgt if query_pos is None else tgt + query_pos
        return norm(tgt + attn(q, k, memory, attn_mask=attn_mask))


class FFNBlock(nn.Module):
    """Pre/post-norm residual FFN (reference: focoos/nn/layers/transformer.py:267 FFNLayer)."""

    d_model: int
    dim_feedforward: int
    activation: str = "relu"
    normalize_before: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, tgt):
        norm = nn.LayerNorm(epsilon=1e-5, name="norm")

        def ffn(x):
            x = nn.Dense(self.dim_feedforward, dtype=self.dtype, name="linear1")(x)
            x = get_activation(self.activation)(x)
            return nn.Dense(self.d_model, dtype=self.dtype, name="linear2")(x)

        if self.normalize_before:
            return tgt + ffn(norm(tgt))
        return norm(tgt + ffn(tgt))


class _Int8QDQConv(nn.Module):
    """Int8 QDQ convolution with the same parameter tree as ``nn.Conv``
    (kernel [kh, kw, in/groups, out] under this module's scope, so
    checkpoints are interchangeable with the float path).

    Per-out-channel symmetric weight scales; per-tensor activation scale —
    **static** when a calibrated absmax for this layer's path is present in
    ``int8_act_scales()`` (reference MinMax quantize_static analog, which
    never pays a runtime reduce), else **dynamic** absmax/127 as fallback;
    s8×s8→s32 conv on the MXU; dequant fused into the following norm/act by
    XLA. Under ``int8_calibration_mode`` the input absmax is sown into the
    ``int8_calib`` collection. When the incoming kernel was already
    round-tripped through int8 (Int8XLARuntime's weight store), the in-graph
    requantization is exact. v5e measured: ~1.2× over bf16 per conv at
    res3-like shapes (see docs/tpu_design.md)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    use_bias: bool = False
    groups: int = 1
    dilation: int = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        import jax

        k = self.kernel_size
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (k, k, in_ch // self.groups, self.features),
        )
        out_dtype = self.dtype or x.dtype
        f32 = jnp.float32
        w = kernel.astype(f32)
        sw = jnp.max(jnp.abs(w), axis=(0, 1, 2), keepdims=True) / 127.0
        sw = jnp.maximum(sw, 1e-12)
        wq = jnp.round(w / sw).astype(jnp.int8)
        if int8_calibrating():
            self.sow(
                "int8_calib",
                "absmax",
                jnp.max(jnp.abs(x.astype(f32))),
                reduce_fn=jnp.maximum,
                init_fn=lambda: jnp.asarray(0.0, f32),
            )
        calib = int8_act_scales()
        path_key = "/".join(self.path)
        if calib is not None and path_key in calib:
            sx = jnp.asarray(calib[path_key], f32)
        else:
            sx = jnp.max(jnp.abs(x.astype(f32))) / 127.0
        sx = jnp.maximum(sx, 1e-12)
        xq = jnp.clip(jnp.round(x.astype(f32) / sx), -127, 127).astype(jnp.int8)
        y = jax.lax.conv_general_dilated(
            xq,
            wq,
            (self.stride, self.stride),
            [(self.padding, self.padding), (self.padding, self.padding)],
            rhs_dilation=(self.dilation, self.dilation),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.groups,
            preferred_element_type=jnp.int32,
        )
        y = y.astype(f32) * (sx * sw.reshape(1, 1, 1, -1))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(f32)
        return y.astype(out_dtype)


class Int8Dense(nn.Module):
    """Drop-in ``nn.Dense`` (identical parameter tree — ``kernel`` [in, out]
    + optional ``bias``, so checkpoints are interchangeable) that executes as
    an int8 QDQ matmul under ``int8_qdq_mode`` — the dense-matmul extension
    of ``_Int8QDQConv`` (reference analog: ONNX quantize_static also
    QDQ-wraps MatMul nodes, focoos/infer/quantizer.py:200-209).
    Per-out-channel weight scales; activation scale static when calibrated
    (sown into ``int8_calib`` the same way), else dynamic per-tensor."""

    features: int
    use_bias: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        import jax

        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (x.shape[-1], self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,)) if self.use_bias else None
        out_dtype = self.dtype or x.dtype
        if not int8_qdq_enabled():
            y = jnp.dot(x.astype(out_dtype), kernel.astype(out_dtype))
            if bias is not None:
                y = y + bias.astype(out_dtype)
            return y
        f32 = jnp.float32
        w = kernel.astype(f32)
        sw = jnp.maximum(jnp.max(jnp.abs(w), axis=0, keepdims=True) / 127.0, 1e-12)
        wq = jnp.round(w / sw).astype(jnp.int8)
        if int8_calibrating():
            self.sow(
                "int8_calib",
                "absmax",
                jnp.max(jnp.abs(x.astype(f32))),
                reduce_fn=jnp.maximum,
                init_fn=lambda: jnp.asarray(0.0, f32),
            )
        calib = int8_act_scales()
        path_key = "/".join(self.path)
        if calib is not None and path_key in calib:
            sx = jnp.asarray(calib[path_key], f32)
        else:
            sx = jnp.max(jnp.abs(x.astype(f32))) / 127.0
        sx = jnp.maximum(sx, 1e-12)
        xq = jnp.clip(jnp.round(x.astype(f32) / sx), -127, 127).astype(jnp.int8)
        y = jax.lax.dot_general(
            xq, wq, (((x.ndim - 1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        y = y.astype(f32) * (sx * sw.reshape((1,) * (x.ndim - 1) + (-1,)))
        if bias is not None:
            y = y + bias.astype(f32)
        return y.astype(out_dtype)


class _PhasePackConv3x3s2(nn.Module):
    """conv 3x3 stride-2 pad-1 executed as one 5x5 stride-4 conv that emits
    all four output phases as channels, then depth-to-space.

    The channel-starved stem conv (C_in=3) runs at ~1% MXU utilization: XLA
    pads the 3 input channels up to a full lane tile per tap. Packing the
    2x2 output-phase grid into the channel dim makes N = 4*F = 128 output
    lanes and K = 5*5*C contraction taps — the MXU finally gets a wide
    matmul — at quarter spatial extent; the trailing depth-to-space is one
    cheap relayout. Output phase (py,px) tap (dy,dx) reads raw row
    4I + 2py + dy - 1, so the window spans u = 2py+dy in [0,4]: a 5x5
    stride-4 kernel with the original 3x3 taps scattered per phase
    (zero elsewhere). The parameter keeps the torch-compatible [3,3,C,F]
    shape/name so checkpoints and converters are unaffected. Exact to fp
    rounding. Requires H % 4 == W % 4 == 0 (caller falls back otherwise).
    """

    features: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        import jax

        b, h, w, c = x.shape
        f = self.features
        k = self.param("kernel", nn.initializers.lecun_normal(), (3, 3, c, f))
        kf = k.astype(x.dtype)
        # k5[u, v, c, (py, px, f)] = kernel[u - 2py, v - 2px, c, f]
        k5 = jnp.zeros((5, 5, c, 2, 2, f), x.dtype)
        for py in range(2):
            for px in range(2):
                for dy in range(3):
                    for dx in range(3):
                        k5 = k5.at[2 * py + dy, 2 * px + dx, :, py, px].set(kf[dy, dx])
        k5 = k5.reshape(5, 5, c, 4 * f)
        dn = jax.lax.conv_dimension_numbers(x.shape, k5.shape, ("NHWC", "HWIO", "NHWC"))
        y = jax.lax.conv_general_dilated(x, k5, (4, 4), ((1, 0), (1, 0)), dimension_numbers=dn)
        ho, wo = h // 4, w // 4
        y = y.reshape(b, ho, wo, 2, 2, f).transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * ho, 2 * wo, f)
        return y


def stem_banded_auto(train: bool, flag: Optional[bool] = None) -> bool:
    """Resolve a backbone's stem-banding config (None = auto).

    Auto policy: the banded stem (below) is a measured inference-path win on
    TPU; training keeps the plain conv (banded backward unmeasured) and other
    backends keep XLA's native conv. ``FOCOOS_STEM_BANDED=0/1`` overrides.
    """
    import os

    if flag is not None:
        return flag
    env = os.environ.get("FOCOOS_STEM_BANDED")
    if env is not None:
        return env not in ("0", "false", "")
    import jax

    return (not train) and jax.default_backend() == "tpu"


def _banded_wtile(wo: int) -> int:
    """Largest supported output-column tile that divides Wo (0 = can't tile)."""
    for t in (32, 16, 8):
        if wo % t == 0:
            return t
    return 0


class _BandedConv3x3(nn.Module):
    """conv 3x3 pad-1 (stride 1 or 2) as a block-banded matmul over the
    flattened (W, C) lane axis — implicit im2col on the MXU.

    The channel-starved stem conv (C_in=3) is floor-bounded by its
    lane-hostile input read: NHWC with C=3 occupies 3 of 128 lanes per tile,
    and every relayout-based fix (s2d, phase packing, XLA im2col, entry
    layouts — docs/tpu_design.md stem entries) pays more in copies than the
    better matmul shape saves. This formulation never relayouts the input:
    viewed as [B, H, W*C] the image is lane-DENSE (W*C = 1920 at 640²), and
    a 3x3 conv is, per kh tap row, a banded matrix product along that lane
    axis. Tiling Wo into T-column groups turns each tile into a dense
    [K, T*F] matmul with K = C*(s*T + 3 - s) window lanes, against a
    block-Toeplitz weight matrix that carries kernel[kh] at lane offset
    C*s*t' for output column t' — the MXU performs the im2col implicitly.
    The band costs K/(9C) x the useful FLOPs (~7x at C=3, T=32) but that is
    still only ~0.16 ms of MXU time for b16@640 vs ~1.9 ms for the
    lane-starved conv + input relayout it replaces.

    Parameter keeps the torch-compatible [3, 3, C, F] shape/name
    (``kernel``) so checkpoints/converters are unaffected. Matches the plain
    conv to accumulation-order rounding (f32-exact in tests).
    """

    features: int
    stride: int = 2
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        import jax

        b, h, w, c = x.shape
        f = self.features
        s = self.stride
        k = self.param("kernel", nn.initializers.lecun_normal(), (3, 3, c, f))
        kf = k.astype(x.dtype)
        ho = (h - 1) // s + 1
        wo = (w - 1) // s + 1
        t = _banded_wtile(wo)
        if t == 0 or (s == 2 and (h % 2 or w % 2)) or s not in (1, 2):
            dn = jax.lax.conv_dimension_numbers(x.shape, kf.shape, ("NHWC", "HWIO", "NHWC"))
            return jax.lax.conv_general_dilated(
                x, kf, (s, s), ((1, 1), (1, 1)), dimension_numbers=dn
            )
        pad_b = 1 if s == 1 else 0
        kk = c * (s * t + 3 - s)  # input lanes per output tile window
        nt = wo // t
        xv = x.reshape(b, h, w * c)
        xp = jnp.pad(xv, ((0, 0), (1, pad_b), (c, pad_b * c)))
        # windows: sall[b, i, wt, kh*kk + j] = xp[b, s*i + kh, c*s*t*wt + j]
        parts = []
        for kh in range(3):
            r = jax.lax.slice_in_dim(xp, kh, kh + s * (ho - 1) + 1, stride=s, axis=1)
            parts.append(
                jnp.stack(
                    [jax.lax.slice_in_dim(r, c * s * t * wt, c * s * t * wt + kk, axis=2) for wt in range(nt)],
                    axis=2,
                )
            )
        sall = jnp.concatenate(parts, axis=-1)  # [b, ho, nt, 3*kk]
        # block-Toeplitz weights: output column t' reads taps (kw, cin) at
        # window lane c*s*t' + c*kw + cin
        k9 = kf.reshape(3, 3 * c, f)
        bmat = jnp.concatenate(
            [
                jnp.stack(
                    [jnp.pad(k9[kh], ((c * s * ti, kk - 3 * c - c * s * ti), (0, 0))) for ti in range(t)],
                    axis=1,
                )
                for kh in range(3)
            ],
            axis=0,
        ).reshape(3 * kk, t * f)
        y = jnp.einsum("bhwk,kn->bhwn", sall, bmat, preferred_element_type=jnp.float32)
        return y.astype(x.dtype).reshape(b, ho, wo, f)


class _S2DConv3x3s2(nn.Module):
    """conv 3x3 stride-2 pad-1 executed as space-to-depth(2) + conv 2x2.

    Classic TPU stem optimization (MLPerf ResNet): the raw 3-channel conv at
    full resolution runs at ~1% MXU utilization (3 of 128 input lanes used);
    s2d packs 2x2 pixel blocks into channels (3→12) and quarters the spatial
    extent. The parameter keeps the torch-compatible [3, 3, C, F] shape/name
    (``kernel``) — the 2x2 phase kernel is a zero-padded gather of it, so
    checkpoints and converters are unaffected. Exact to fp rounding.
    """

    features: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        import jax

        b, h, w, c = x.shape
        k = self.param("kernel", nn.initializers.lecun_normal(), (3, 3, c, self.features))
        # pad to even H/W (conv3x3/s2/p1 on odd sizes covers the same taps)
        ph, pw = h % 2, w % 2
        if ph or pw:
            x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
            h, w = h + ph, w + pw
        z = x.reshape(b, h // 2, 2, w // 2, 2, c).transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)

        # k2[di, dj, (py, px, c), f] = kernel[2di+py-1, 2dj+px-1, c, f] (0 outside)
        kf = k.astype(z.dtype)
        k2 = jnp.zeros((2, 2, 2, 2, c, self.features), z.dtype)
        for di in range(2):
            for dj in range(2):
                for py in range(2):
                    for px in range(2):
                        u, v = 2 * di + py - 1, 2 * dj + px - 1
                        if 0 <= u <= 2 and 0 <= v <= 2:
                            k2 = k2.at[di, dj, py, px].set(kf[u, v])
        k2 = k2.reshape(2, 2, 4 * c, self.features)
        dn = jax.lax.conv_dimension_numbers(z.shape, k2.shape, ("NHWC", "HWIO", "NHWC"))
        return jax.lax.conv_general_dilated(z, k2, (1, 1), ((1, 0), (1, 0)), dimension_numbers=dn)
