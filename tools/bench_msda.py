"""Benchmark MSDA formulations on the real chip at fai-detr-l shapes.

Chained-scan device timing (wall clock is RTT-dominated over the tunnel).
Usage: python tools/bench_msda.py [batch] [dtype]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def bench(fn, args, chain=200):
    @jax.jit
    def run(a):
        # chain: perturb loc by epsilon*mean(out) so iterations can't overlap
        def body(carry, _):
            loc, aw = carry
            out = fn(args[0], args[1], loc, aw)
            eps = (jnp.mean(out.astype(jnp.float32)) * 1e-24).astype(loc.dtype)
            return (loc + eps, aw), None
        (loc, aw), _ = jax.lax.scan(body, (a[2], a[3]), None, length=chain)
        return jnp.mean(loc.astype(jnp.float32))

    float(run(args))  # compile
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(run(args))
        ts.append((time.perf_counter() - t0) * 1000 / chain)
    return float(np.mean(ts)), float(np.min(ts))


def bench_bwd(fn, args, chain=50):
    """fwd+bwd (sum-of-grads chained) device timing."""
    value, shapes, loc0, aw0 = args

    def loss(v, loc, aw):
        out = fn(v, shapes, loc, aw)
        return jnp.sum(out.astype(jnp.float32) * 1e-6)

    grad_fn = jax.grad(loss, argnums=(0, 1, 2))

    @jax.jit
    def run(a):
        def body(carry, _):
            v, loc, aw = carry
            gv, gl, ga = grad_fn(v, loc, aw)
            eps = (jnp.mean(gv.astype(jnp.float32)) * 1e-24).astype(v.dtype)
            return (v + eps, loc + gl.astype(loc.dtype) * 0, aw), None

        (v, _, _), _ = jax.lax.scan(body, (a[0], a[2], a[3]), None, length=chain)
        return jnp.mean(v.astype(jnp.float32))

    float(run(args))  # compile
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(run(args))
        ts.append((time.perf_counter() - t0) * 1000 / chain)
    return float(np.mean(ts)), float(np.min(ts))


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    dt = jnp.bfloat16 if (len(sys.argv) > 2 and sys.argv[2] == "bf16") else jnp.float32
    bwd_mode = "--bwd" in sys.argv
    from focoos_tpu.ops.deformable import (
        ms_deform_attn,
        ms_deform_attn_separable,
        ms_deform_attn_separable_hybrid,
    )
    from focoos_tpu.ops.pallas.msda import msda_pallas

    shapes = ((80, 80), (40, 40), (20, 20))
    S = sum(h * w for h, w in shapes)
    Hh, D, Lq, P = 8, 32, 300, 4
    rng = np.random.default_rng(0)
    value = jnp.asarray(rng.normal(size=(b, S, Hh, D)), dt)
    loc = jnp.asarray(rng.uniform(0, 1, size=(b, Lq, Hh, 3, P, 2)), dt)
    aw = jax.nn.softmax(jnp.asarray(rng.normal(size=(b, Lq, Hh, 3 * P)), jnp.float32), -1)
    aw = aw.reshape(b, Lq, Hh, 3, P).astype(dt)

    print(f"device={jax.devices()[0].device_kind} batch={b} dtype={dt.__name__} mode={'fwd+bwd' if bwd_mode else 'fwd'}")
    if bwd_mode:
        from focoos_tpu.ops.deformable import _msda_sep_fwd_impl

        todo = [
            ("sep+autodiff", ms_deform_attn_separable),
            ("sep+hybridVJP", lambda v, s, l, a: ms_deform_attn_separable_hybrid(v, tuple(s), l, a)),
            ("sep+remat", lambda v, s, l, a: jax.checkpoint(
                lambda v_, l_, a_: _msda_sep_fwd_impl(v_, tuple(s), l_, a_))(v, l, a)),
        ]
        for name, fn in todo:
            try:
                mean, best = bench_bwd(fn, (value, shapes, loc, aw))
                print(f"{name:16s} {mean:8.3f} ms/grad-call (best {best:.3f})")
            except Exception as e:
                print(f"{name:16s} FAILED: {type(e).__name__}: {str(e)[:300]}")
        return
    for name, fn in [
        ("separable(XLA)", ms_deform_attn_separable),
        ("pallas-fused", lambda v, s, l, a: msda_pallas(v, s, l, a)),
        ("gather(XLA)", ms_deform_attn),
    ]:
        try:
            mean, best = bench(fn, (value, shapes, loc, aw))
            print(f"{name:16s} {mean:8.3f} ms/call (best {best:.3f})")
        except Exception as e:
            print(f"{name:16s} FAILED: {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
