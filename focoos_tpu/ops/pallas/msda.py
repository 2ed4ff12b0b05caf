"""Fused multi-scale deformable attention Pallas kernel.

Replaces the reference's per-level ``F.grid_sample`` hot loop
(focoos/nn/layers/deformable.py:10-36) — the single hottest op in the
RT-DETR decoder (6 layers x 300 queries x 8 heads x 3 levels x 4 points).

Why a kernel: the XLA separable-matmul formulation
(focoos_tpu/ops/deformable.py:87) materializes the row-interpolated
intermediate ``rows`` [B, Lq, Hh, P, W, D] in HBM (~300 MB fp32 for the
80x80 level at fai-detr-l shapes) because XLA cannot fuse a matmul into a
following contraction. Here the same two-stage interpolation runs per
(batch, head, query-tile) grid cell with the intermediate held in VMEM:

    wy[qp, H] = 2-non-zero row one-hot  (VPU iota compares, attn folded in)
    tmp       = wy @ V[H, W*D]          (MXU)
    out[qp,D] = sum_x wx[qp, x] * tmp[qp, x, :]   (VPU)

All shapes are static per level; one ``pallas_call`` per level, summed in
XLA (3 adds of [B, Hh, Lq, D] — negligible).

Gradients: the kernel is wrapped in ``jax.custom_vjp`` whose backward pass
is the VJP of the XLA separable formulation (numerically identical
semantics), so the fused forward is usable inside the jitted train step.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _msda_level_kernel(locx_ref, locy_ref, aw_ref, v_ref, o_ref, *, h: int, w: int,
                       d: int, p: int, q_b: int):
    # Mosaic cannot shape-cast lanes (QP, W*D)→(QP, W, D), so the column stage
    # works at interleaved [QP, W*D] resolution and folds D out with a constant
    # 0/1 matrix on the MXU; the P-sum happens in XLA after the call.
    f32 = jnp.float32
    qp = q_b * p
    x = locx_ref[0, 0].astype(f32) * w - 0.5  # [QP, 1]
    y = locy_ref[0, 0].astype(f32) * h - 0.5
    aw = aw_ref[0, 0].astype(f32)  # [QP, 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    tx = x - x0
    ty = y - y0

    def corner_weights(i0, t, n):
        # 1-D interpolation weights: (1-t) at i0, t at i0+1, 0 outside the map
        # (zeros padding / align_corners=False parity with grid_sample)
        w0 = jnp.where((i0 >= 0) & (i0 <= n - 1), 1.0 - t, 0.0)
        w1 = jnp.where((i0 + 1 >= 0) & (i0 + 1 <= n - 1), t, 0.0)
        i0c = jnp.clip(i0, 0, n - 1).astype(jnp.int32)
        i1c = jnp.clip(i0 + 1, 0, n - 1).astype(jnp.int32)
        return w0, w1, i0c, i1c

    # row one-hot [QP, H] with the attention weight folded in
    ih = jax.lax.broadcasted_iota(jnp.int32, (qp, h), 1)
    yw0, yw1, yi0, yi1 = corner_weights(y0, ty, h)
    wy = ((ih == yi0).astype(f32) * yw0 + (ih == yi1).astype(f32) * yw1) * aw

    v = v_ref[0, 0]  # [H, W*D]
    tmp = jax.lax.dot_general(
        wy.astype(v.dtype), v, (((1,), (0,)), ((), ())), preferred_element_type=f32
    )  # [QP, W*D]

    # column weights interleaved over (x, d) lanes: col c holds wx[qp, c // D]
    iwd_x = jax.lax.broadcasted_iota(jnp.int32, (qp, w * d), 1) // d
    xw0, xw1, xi0, xi1 = corner_weights(x0, tx, w)
    wxd = (iwd_x == xi0).astype(f32) * xw0 + (iwd_x == xi1).astype(f32) * xw1

    # fold (x, d) → d: R[c, j] = 1 iff c % D == j. bf16 operands — an f32
    # matmul runs the MXU at a fraction of peak; the product of two bilinear
    # weights and a bf16 value fits comfortably in bf16 before f32 accumulation.
    cdt = v.dtype
    fold = (
        jax.lax.broadcasted_iota(jnp.int32, (w * d, d), 0) % d
        == jax.lax.broadcasted_iota(jnp.int32, (w * d, d), 1)
    ).astype(cdt)
    res = jax.lax.dot_general(
        (tmp * wxd).astype(cdt), fold, (((1,), (0,)), ((), ())), preferred_element_type=f32
    )  # [QP, D]
    o_ref[0, 0] = res.astype(o_ref.dtype)


def msda_pallas(
    value: jnp.ndarray,  # [B, S, Hh, D]
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,  # [B, Lq, Hh, L, P, 2] in [0, 1]
    attention_weights: jnp.ndarray,  # [B, Lq, Hh, L, P]
    query_block: int = 64,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused MSDA → [B, Lq, Hh*D]. Same semantics as ops.deformable.ms_deform_attn."""
    b, s, hh, d = value.shape
    lq = sampling_locations.shape[1]
    p = sampling_locations.shape[4]

    # Mosaic requires the block's second-to-last dim divisible by 8 (fp32
    # sublanes); queries are padded up to a q_b multiple and cropped after.
    q_b = max(8, min(query_block, ((lq + 7) // 8) * 8))
    assert q_b % 8 == 0, q_b
    pad_q = (-lq) % q_b
    if pad_q:
        zpad6 = [(0, 0)] * 6
        zpad6[1] = (0, pad_q)
        sampling_locations = jnp.pad(sampling_locations, zpad6)
        zpad5 = [(0, 0)] * 5
        zpad5[1] = (0, pad_q)
        attention_weights = jnp.pad(attention_weights, zpad5)
    lq_p = lq + pad_q
    qp = q_b * p

    out = None
    start = 0
    for lid, (h, w) in enumerate(spatial_shapes):
        sl = h * w
        v_l = value[:, start : start + sl].transpose(0, 2, 1, 3).reshape(b, hh, h, w * d)
        start += sl
        loc = sampling_locations[:, :, :, lid]  # [B, Lq, Hh, P, 2]
        locx = loc[..., 0].transpose(0, 2, 1, 3).reshape(b, hh, lq_p * p, 1)
        locy = loc[..., 1].transpose(0, 2, 1, 3).reshape(b, hh, lq_p * p, 1)
        aw = attention_weights[:, :, :, lid].transpose(0, 2, 1, 3).reshape(b, hh, lq_p * p, 1)

        grid = (b, hh, lq_p // q_b)
        kern = functools.partial(_msda_level_kernel, h=h, w=w, d=d, p=p, q_b=q_b)
        flops_cell = 2 * qp * h * (w * d)
        out_l = pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, qp, 1), lambda bi, hi, qi: (bi, hi, qi, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, qp, 1), lambda bi, hi, qi: (bi, hi, qi, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, qp, 1), lambda bi, hi, qi: (bi, hi, qi, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, h, w * d), lambda bi, hi, qi: (bi, hi, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 1, qp, d), lambda bi, hi, qi: (bi, hi, qi, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, hh, lq_p * p, d), value.dtype),
            cost_estimate=pl.CostEstimate(
                flops=flops_cell * b * hh * (lq_p // q_b),
                bytes_accessed=(b * hh * h * w * d + b * hh * lq_p * d) * value.dtype.itemsize,
                transcendentals=0,
            ),
            interpret=interpret,
        )(locx, locy, aw, v_l)
        out = out_l if out is None else out + out_l

    # P-sum (cheap in XLA; Mosaic can't sublane-split-reduce), drop query padding
    out = out.reshape(b, hh, lq_p, p, d).sum(axis=3)[:, :, :lq]
    return out.transpose(0, 2, 1, 3).reshape(b, lq, hh * d)


# ---------------------------------------------------------------------------
# custom VJP: fused forward, XLA-separable backward (identical math)
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def ms_deform_attn_fused(spatial_shapes, value, sampling_locations, attention_weights):
    return msda_pallas(value, spatial_shapes, sampling_locations, attention_weights)


def _fused_fwd(spatial_shapes, value, sampling_locations, attention_weights):
    out = msda_pallas(value, spatial_shapes, sampling_locations, attention_weights)
    return out, (value, sampling_locations, attention_weights)


def _fused_bwd(spatial_shapes, residuals, g):
    from focoos_tpu.ops.deformable import ms_deform_attn_separable

    value, loc, aw = residuals
    _, vjp = jax.vjp(lambda v, l, a: ms_deform_attn_separable(v, spatial_shapes, l, a),
                     value, loc, aw)
    return vjp(g)


ms_deform_attn_fused.defvjp(_fused_fwd, _fused_bwd)
