"""A/B the banded stem on the real chip: fai-detr-l b16@640 forward,
FOCOOS_STEM_BANDED=0 vs 1, chained-scan timing (see bench.py header for why
per-call host timing is meaningless over the axon tunnel).

Usage: python tools/ab_stem.py [model] [batch] [size] [iters]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(name, bs, size, iters, banded, dtype="bfloat16"):
    import jax
    import jax.numpy as jnp

    from focoos_tpu.model_manager import ModelManager

    os.environ["FOCOOS_STEM_BANDED"] = "1" if banded else "0"
    model = ModelManager.get(name, dtype=dtype)
    x = jnp.asarray(np.random.rand(bs, size, size, 3).astype(np.float32) * 255.0)

    @jax.jit
    def run(variables, img):
        def body(img, _):
            out, _aux = model.module.apply(variables, img, train=False)
            leaves = [l for l in jax.tree.leaves(out) if hasattr(l, "ndim")]
            sig = sum(jnp.sum((l[:, :1] if l.ndim >= 2 else l).astype(jnp.float32)) for l in leaves)
            return img + (sig * 1e-24).astype(img.dtype), None

        final, _ = jax.lax.scan(body, img, None, length=iters)
        return jnp.mean(final.astype(jnp.float32))

    float(run(model.variables, x))  # compile+warm
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(model.variables, x))
        ts.append(time.perf_counter() - t0)
    ms = min(ts) / iters * 1000
    print(f"banded={int(banded)}: {ms:.2f} ms/fwd -> {bs / (ms / 1000):.1f} img/s", flush=True)
    return ms


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/focoos_tpu_xla"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    name = sys.argv[1] if len(sys.argv) > 1 else "fai-detr-l-coco"
    bs = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    size = int(sys.argv[3]) if len(sys.argv) > 3 else 640
    iters = int(sys.argv[4]) if len(sys.argv) > 4 else 32
    print(f"device: {jax.devices()[0].device_kind}; {name} b{bs}@{size}", flush=True)
    off = measure(name, bs, size, iters, banded=False)
    on = measure(name, bs, size, iters, banded=True)
    print(f"speedup: {off / on:.3f}x ({off:.2f} -> {on:.2f} ms)", flush=True)


if __name__ == "__main__":
    main()
