"""A/B: weights as jit ARGUMENTS vs embedded CONSTANTS (VERDICT r4 weak #2).

Round 4 moved bench weights from closure-captured constants to jit arguments
(4aee6fa) to fix persistent-cache keying; r2→r4 then showed wall regressions
(fai-cls-m b128 2.94→3.95 ms, detr-l b16 37.8→39.8 ms) that the record could
not attribute: constants allow XLA constant folding, so the change itself is
the prime suspect. This measures BOTH variants in ONE process on the same
chip (same day, same tunnel), wall AND device-busy time, settling it.

Usage: python tools/ab_const_args.py [iters]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(name, size, bs, iters, as_const: bool):
    import jax
    import jax.numpy as jnp

    from focoos_tpu.model_manager import ModelManager
    from focoos_tpu.utils.profiling import device_op_ms

    model = ModelManager.get(name, dtype="bfloat16")
    x = jnp.asarray(np.random.rand(bs, size, size, 3).astype(np.float32) * 255.0)

    def sink(t):
        s = t[:, :1] if t.ndim >= 2 else t
        return jnp.sum(s.astype(jnp.float32))

    def body_of(variables):
        def body(img, _):
            out, _aux = model.module.apply(variables, img, train=False)
            sig = sum(sink(l) for l in jax.tree.leaves(out) if hasattr(l, "ndim"))
            return img + (sig * 1e-24).astype(img.dtype), None

        return body

    if as_const:
        variables = jax.device_put(model.variables)  # closed over → constants

        @jax.jit
        def run_c(img):
            final, _ = jax.lax.scan(body_of(variables), img, None, length=iters)
            return jnp.mean(final.astype(jnp.float32))

        run = lambda: float(run_c(x))  # noqa: E731
    else:

        @jax.jit
        def run_a(variables, img):
            final, _ = jax.lax.scan(body_of(variables), img, None, length=iters)
            return jnp.mean(final.astype(jnp.float32))

        run = lambda: float(run_a(model.variables, x))  # noqa: E731

    t0 = time.monotonic()
    run()  # compile + warm
    compile_s = time.monotonic() - t0
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        run()
        ts.append(time.perf_counter() - t0)
    wall_ms = min(ts) / iters * 1000
    dev_ms = device_op_ms(run, n_calls=1, per=iters)
    return {"wall_ms": round(wall_ms, 3), "device_busy_ms": round(dev_ms, 3),
            "compile_s": round(compile_s, 1)}


def main():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/focoos_tpu_xla"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    out = {}
    for name, size, bs in (("fai-cls-m-coco", 224, 128), ("fai-detr-l-coco", 640, 16)):
        key = f"{name}_b{bs}"
        out[key] = {}
        for variant in ("args", "const"):
            out[key][variant] = measure(name, size, bs, iters, as_const=(variant == "const"))
            print(f"{key} {variant}: {out[key][variant]}", file=sys.stderr, flush=True)
            print(json.dumps(out), flush=True)
    os._exit(0)


if __name__ == "__main__":
    main()
