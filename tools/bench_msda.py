"""Benchmark multi-scale deformable attention variants on TPU at RT-DETR-L
shapes (B=1, Lq=300, 8 heads, 3 levels [80²,40²,20²], P=4, D=32)."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def chain(fn, args, iters=48, trials=3):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(*a):
        def body(carry, _):
            out = fn(*a[:-1], carry)
            bump = (jnp.sum(out) * 1e-24).astype(carry.dtype)
            return carry + bump, None

        final, _ = jax.lax.scan(body, a[-1], None, length=iters)
        return jnp.sum(final)

    float(run(*args))
    best = 1e9
    for _ in range(trials):
        t0 = time.perf_counter()
        float(run(*args))
        best = min(best, time.perf_counter() - t0)
    return best / iters * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from focoos_tpu.ops.deformable import ms_deform_attn, ms_deform_attn_matmul, ms_deform_attn_separable

    b, lq, hh, d, p = 1, 300, 8, 32, 4
    shapes = [(80, 80), (40, 40), (20, 20)]
    s = sum(h * w for h, w in shapes)
    rng = np.random.default_rng(0)
    value = jnp.asarray(rng.normal(size=(b, s, hh, d)).astype(np.float32), jnp.bfloat16)
    loc = jnp.asarray(rng.uniform(0, 1, (b, lq, hh, 3, p, 2)).astype(np.float32), jnp.bfloat16)
    w = jnp.asarray(rng.uniform(0, 1, (b, lq, hh, 3, p)).astype(np.float32), jnp.bfloat16)

    t_gather = chain(lambda v, l, att: ms_deform_attn(v, shapes, l, att), (value, loc, w), iters=48)
    t_matmul = chain(lambda v, l, att: ms_deform_attn_matmul(v, shapes, l, att), (value, loc, w), iters=48)
    t_sep = chain(lambda v, l, att: ms_deform_attn_separable(v, shapes, l, att), (value, loc, w), iters=48)
    print(f"gather variant:    {t_gather:.3f} ms")
    print(f"matmul variant:    {t_matmul:.3f} ms")
    print(f"separable variant: {t_sep:.3f} ms")
    # correctness cross-check
    o1 = ms_deform_attn(value.astype(jnp.float32), shapes, loc.astype(jnp.float32), w.astype(jnp.float32))
    o2 = ms_deform_attn_matmul(value.astype(jnp.float32), shapes, loc.astype(jnp.float32), w.astype(jnp.float32))
    o3 = ms_deform_attn_separable(value.astype(jnp.float32), shapes, loc.astype(jnp.float32), w.astype(jnp.float32))
    print("max diff matmul:", float(jnp.max(jnp.abs(o1 - o2))))
    print("max diff separable:", float(jnp.max(jnp.abs(o1 - o3))))


if __name__ == "__main__":
    main()
