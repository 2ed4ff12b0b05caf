"""Pallas TPU kernel: the fused ResNet-D stem.

Computes, in ONE kernel launch with all intermediates VMEM-resident::

    y1 = relu(bn1(conv3x3_s2(x,  W1)))   # C_in->32, H x W -> H/2 x W/2
    y2 = relu(bn2(conv3x3_s1(y1, W2)))   # 32->32
    y3 = relu(bn3(conv3x3_s1(y2, W3)))   # 32->64
    out = maxpool3x3_s2_p1(y3)           # -> H/4 x W/4

Why: the stem is the measured floor of the fai-detr-l forward
(docs/tpu_design.md, five failed XLA-level attempts + the round-4 banded
conv1_1). The XLA graph pays ~4 ms of lane-starved convs (C in {3, 32, 64}
occupies 3-64 of 128 lanes) plus ~3 ms of layout ping-pong copies between
them (profiled: copy.1783-1787), because every conv/BN boundary round-trips
a [16,320,320,32] activation through HBM in a different layout. This kernel
streams the image once (39 MB bf16), keeps y1/y2/y3 in VMEM row-bands, and
writes only the final [B, H/4, W/4, 64] (52 MB) — the HBM floor.

How: every conv runs as the round-4 *banded matmul* (see
nn/layers/common.py:_BandedConv3x3) — the image viewed as [rows, W*C] is
lane-dense, and a 3x3 conv per kh tap row is a banded product along that
axis; tiling the output into T-column groups makes each band a dense
[K, T*F] MXU matmul against a block-Toeplitz weight matrix (implicit
im2col, built once outside the kernel). The stride-2 conv1 needs stride-2
row taps, which would be a strided sublane gather — avoided by DMA-ing the
input band as separate even/odd row-parity planes (the (kh, output-row)
tap pattern then reads CONTIGUOUS plane rows: kh=0 -> even[i], kh=1 ->
odd[i], kh=2 -> even[i+1]). BN (eval-mode affine) + relu fold into the f32
matmul epilogue; band-edge halo rows are masked branch-free with row-index
iotas (zero for conv pads, -inf for the maxpool pad).

Reference behavior matched: focoos/nn/backbone/resnet.py stem (variant
c/d deep stem) + F.max_pool2d(3, 2, padding=1). Inference-only (the
backward is unimplemented); the caller gates on eval + TPU.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def _toeplitz_band(kernel: jnp.ndarray, t: int, stride: int, dtype) -> jnp.ndarray:
    """[3, 3, C, F] conv kernel -> block-Toeplitz [3*K, T*F] band matrix,
    K = C*(stride*T + 3 - stride); rows ordered kh-major, window-lane minor
    (identical construction to _BandedConv3x3)."""
    _, _, c, f = kernel.shape
    kk = c * (stride * t + 3 - stride)
    k9 = kernel.astype(dtype).reshape(3, 3 * c, f)
    return jnp.concatenate(
        [
            jnp.stack(
                [jnp.pad(k9[kh], ((c * stride * ti, kk - 3 * c - c * stride * ti), (0, 0))) for ti in range(t)],
                axis=1,
            )
            for kh in range(3)
        ],
        axis=0,
    ).reshape(3 * kk, t * f)


def _windows(v: jnp.ndarray, nt: int, step: int, kk: int) -> jnp.ndarray:
    """[rows, L] -> [rows*nt, kk]: overlapping lane windows, one per tile."""
    rows = v.shape[0]
    s = jnp.stack([jax.lax.slice_in_dim(v, w * step, w * step + kk, axis=1) for w in range(nt)], axis=1)
    return s.reshape(rows * nt, kk)


def _stem_kernel(
    # scalar-free inputs
    xp_ref,  # ANY/HBM: [B, Hp2, 2, Lp] row-parity interleaved padded input
    b1_ref, b2_ref, b3_ref,  # VMEM band matrices
    s1_ref, a1_ref, s2_ref, a2_ref, s3_ref, a3_ref,  # VMEM [1, T*F] BN tiles (f32)
    out_ref,  # VMEM out block [1, K4, W4*64]
    xs_e, xs_o, y1s, y2s, y3s,  # VMEM scratch
    sem,  # DMA semaphores (2,)
    *,
    cin: int, h: int, w: int, k4: int, t1: int, t2: int, dtype,
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = pl.program_id(0)
    a = pl.program_id(1)

    h2, w2 = h // 2, w // 2
    lw1 = cin * w  # input row lanes (unpadded)
    kk1 = cin * (2 * t1 + 1)
    nt1 = w2 // t1
    kk2 = 32 * (t2 + 2)
    nt2 = w2 // t2
    r1n = 2 * k4 + 5  # y1 rows per band
    r2n = 2 * k4 + 3
    r3n = 2 * k4 + 1
    ne = r1n + 1  # even input-plane rows: ceil((2*r1n+1)/2)
    no = r1n  # odd rows

    # ---- input band DMA: rows [64a, 64a+2*r1n+1) of the padded image as
    # even/odd parity planes (see module docstring)
    cp_e = pltpu.make_async_copy(xp_ref.at[n, pl.ds(a * (2 * k4), ne), 0, :], xs_e, sem.at[0])
    cp_o = pltpu.make_async_copy(xp_ref.at[n, pl.ds(a * (2 * k4), no), 1, :], xs_o, sem.at[1])
    cp_e.start()
    cp_o.start()
    cp_e.wait()
    cp_o.wait()

    def band_conv(v_by_kh, bmat_ref, scale_ref, bias_ref, rows, nt, step, kk, tf):
        s_all = jnp.concatenate([_windows(v, nt, step, kk) for v in v_by_kh], axis=-1)
        acc = jnp.dot(s_all, bmat_ref[:], preferred_element_type=jnp.float32)
        y = jnp.maximum(acc * scale_ref[:] + bias_ref[:], 0.0)
        return y.astype(dtype).reshape(rows, nt * tf)

    # ---- conv1 (stride 2, banded over the raw lane axis) ----
    # output local row i -> global r1 = (2*k4)*a - 3 + i; taps parity-plane
    # rows: kh=0 -> even[i], kh=1 -> odd[i], kh=2 -> even[i+1]
    y1 = band_conv(
        [xs_e[0:r1n, :], xs_o[0:r1n, :], xs_e[1 : r1n + 1, :]],
        b1_ref, s1_ref, a1_ref, r1n, nt1, cin * 2 * t1, kk1, t1 * 32,
    )
    base1 = (2 * k4) * a - 3
    rid1 = jax.lax.broadcasted_iota(jnp.int32, (r1n, 1), 0) + base1
    y1 = jnp.where((rid1 >= 0) & (rid1 < h2), y1, jnp.zeros_like(y1))
    y1s[:, 0:32] = jnp.zeros((r1n, 32), dtype)
    y1s[:, 32 : 32 + w2 * 32] = y1
    y1s[:, 32 + w2 * 32 :] = jnp.zeros((r1n, 32), dtype)

    # ---- conv2 (stride 1): row taps are contiguous slices of y1s ----
    y2 = band_conv(
        [y1s[0:r2n, :], y1s[1 : r2n + 1, :], y1s[2 : r2n + 2, :]],
        b2_ref, s2_ref, a2_ref, r2n, nt2, 32 * t2, kk2, t2 * 32,
    )
    rid2 = jax.lax.broadcasted_iota(jnp.int32, (r2n, 1), 0) + base1 + 1
    y2 = jnp.where((rid2 >= 0) & (rid2 < h2), y2, jnp.zeros_like(y2))
    y2s[:, 0:32] = jnp.zeros((r2n, 32), dtype)
    y2s[:, 32 : 32 + w2 * 32] = y2
    y2s[:, 32 + w2 * 32 :] = jnp.zeros((r2n, 32), dtype)

    # ---- conv3 (stride 1, F=64) ----
    y3 = band_conv(
        [y2s[0:r3n, :], y2s[1 : r3n + 1, :], y2s[2 : r3n + 2, :]],
        b3_ref, s3_ref, a3_ref, r3n, nt2, 32 * t2, kk2, t2 * 64,
    )
    # maxpool pads with -inf (torch F.max_pool2d semantics); mask the band's
    # out-of-image halo rows the same way
    rid3 = jax.lax.broadcasted_iota(jnp.int32, (r3n, 1), 0) + base1 + 2
    neg = jnp.full_like(y3, -jnp.inf)
    y3 = jnp.where((rid3 >= 0) & (rid3 < h2), y3, neg)
    y3s[:, 0:64] = jnp.full((r3n, 64), -jnp.inf, dtype)
    y3s[:, 64 : 64 + w2 * 64] = y3
    y3s[:, 64 + w2 * 64 :] = jnp.full((r3n, 128), -jnp.inf, dtype)

    # ---- maxpool 3x3/s2/p1: rows via pairwise max + parity reduce, lanes
    # via three 64-lane phase views ----
    v = y3s[:]
    p = jnp.maximum(v[0 : r3n - 1, :], v[1:r3n, :])  # p[j] = max(y3[j], y3[j+1])
    rows = jnp.max(p.reshape(k4, 2, p.shape[-1]), axis=1)  # max(p[2i], p[2i+1])
    w4 = w // 4
    out = None
    for kw in range(3):
        ph = jax.lax.slice_in_dim(rows, 64 * kw, 64 * kw + w4 * 128, axis=1)
        ph = ph.reshape(k4, w4, 128)[:, :, 0:64].reshape(k4, w4 * 64)
        out = ph if out is None else jnp.maximum(out, ph)
    out_ref[0] = out


@functools.partial(
    jax.jit,
    static_argnames=("k4", "t1", "t2", "interpret"),
)
def fused_resnet_stem(
    x: jnp.ndarray,
    k1: jnp.ndarray, s1: jnp.ndarray, a1: jnp.ndarray,
    k2: jnp.ndarray, s2: jnp.ndarray, a2: jnp.ndarray,
    k3: jnp.ndarray, s3: jnp.ndarray, a3: jnp.ndarray,
    k4: int = 8,
    t1: int = 32,
    t2: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused deep-stem forward. x: [B, H, W, C] (normalized, float); k_i are
    the [3,3,Cin,F] conv kernels; (s_i, a_i) the folded eval-BN affine
    per channel (scale = gamma*rsqrt(var+eps), a = beta - mean*scale).
    Returns [B, H/4, W/4, 64]. Requires H % (8*k4) == 0, (W/2) % lcm(t1,t2)
    == 0 — callers check via `fused_stem_supported`."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w, cin = x.shape
    h2, w2, w4 = h // 2, w // 2, w // 4
    dtype = x.dtype
    nb = h2 // (2 * k4)  # bands of k4 output rows
    r1n = 2 * k4 + 5

    # padded, parity-interleaved input: rows +7 top (conv row halos reach
    # x row 64a-7) and enough bottom to keep every band's DMA in range
    pad_bot = (2 * (r1n + 1) + 2 * k4 * (nb - 1)) - h - 7
    lp = cin * w + 3  # +3 left lanes: conv1's only OOB tap column
    xp = jnp.pad(x.reshape(b, h, cin * w), ((0, 0), (7, max(pad_bot, 0)), (3, 0)))
    xp = xp.reshape(b, xp.shape[1] // 2, 2, lp)

    kk1 = cin * (2 * t1 + 1)
    kk2 = 32 * (t2 + 2)
    b1 = _toeplitz_band(k1, t1, 2, dtype)
    b2 = _toeplitz_band(k2, t2, 1, dtype)
    b3 = _toeplitz_band(k3, t2, 1, dtype)

    def tile_affine(s, a, t):
        return (
            jnp.tile(s.astype(jnp.float32), t)[None, :],
            jnp.tile(a.astype(jnp.float32), t)[None, :],
        )

    s1t, a1t = tile_affine(s1, a1, t1)
    s2t, a2t = tile_affine(s2, a2, t2)
    s3t, a3t = tile_affine(s3, a3, t2)

    kern = functools.partial(
        _stem_kernel, cin=cin, h=h, w=w, k4=k4, t1=t1, t2=t2, dtype=dtype,
    )
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        grid=(b, nb),
        out_shape=jax.ShapeDtypeStruct((b, h // 4, w4 * 64), dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] + [vspec] * 9,
        out_specs=pl.BlockSpec((1, k4, w4 * 64), lambda n, a: (n, a, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((r1n + 1, lp), dtype),      # xs_e
            pltpu.VMEM((r1n, lp), dtype),          # xs_o
            pltpu.VMEM((r1n, 64 + w2 * 32), dtype),      # y1s (32-lane side pads)
            pltpu.VMEM((2 * k4 + 3, 64 + w2 * 32), dtype),  # y2s
            pltpu.VMEM((2 * k4 + 1, 192 + w2 * 64), dtype),  # y3s (64 left, 128 right)
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xp, b1, b2, b3, s1t, a1t, s2t, a2t, s3t, a3t)
    return out.reshape(b, h // 4, w4, 64)


def fused_stem_supported(h: int, w: int, k4: int = 8, t1: int = 32, t2: int = 8) -> bool:
    """Static shape gate for fused_resnet_stem."""
    if h % 4 or w % 4:
        return False
    h2, w2 = h // 2, w // 2
    return h2 % (2 * k4) == 0 and w2 % t1 == 0 and w2 % t2 == 0
