"""Driver benchmark: fai-detr-l-coco 640×640 batched throughput on one TPU chip.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "img/s", "vs_baseline": N, ...}

Baseline = reference TensorRT-FP16 on NVIDIA T4 @640: 87 FPS
(BASELINE.md / docs/models/index.md:26).

Measurement method: the device tunnel in this environment has ~27 ms RTT and
``block_until_ready`` does not reliably block, so per-call host timing is
meaningless. Instead we chain ITERS forwards inside ONE jitted ``lax.scan``
with a data dependency between iterations (the previous output perturbs the
next input by ~1e-24, preventing CSE) and fetch a single scalar at the end;
device time per forward = total / ITERS.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

BASELINE_FPS = 87.0  # fai-detr-l TRT-FP16 T4 @640


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_chained_bench(module, variables, batch, iters):
    import jax
    import jax.numpy as jnp

    def body(img, _):
        out, _aux = module.apply(variables, img, train=False)
        bump = (jnp.mean(out.logits).astype(img.dtype) * 1e-24).astype(img.dtype)
        return img + bump, None

    @jax.jit
    def run(img):
        final, _ = jax.lax.scan(body, img, None, length=iters)
        return jnp.mean(final)

    return run


def main():
    import os

    import jax
    import jax.numpy as jnp

    from focoos_tpu.model_manager import ModelManager

    try:
        jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/focoos_tpu_xla"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    dev = jax.devices()[0]
    log(f"device: {dev.device_kind} ({dev.platform})")
    on_tpu = dev.platform not in ("cpu",)
    dtype = "bfloat16" if on_tpu else "float32"

    model = ModelManager.get("fai-detr-l-coco", dtype=dtype)

    results = {}
    batch_sizes = [1, 4, 16] if on_tpu else [1]
    iters = 32 if on_tpu else 2
    best_ips = 0.0
    p50_b1 = None
    for bs in batch_sizes:
        x = jnp.asarray(np.random.rand(bs, 640, 640, 3).astype(np.float32) * 255.0)
        run = make_chained_bench(model.module, model.variables, x, iters)
        try:
            float(run(x))  # compile + warm
        except Exception as e:
            log(f"batch {bs}: {type(e).__name__}: {str(e)[:120]}")
            break
        trials = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(x))  # scalar fetch forces full completion
            trials.append(time.perf_counter() - t0)
        per_fwd = min(trials) / iters
        ips = bs / per_fwd
        results[f"b{bs}_ms"] = round(per_fwd * 1000, 3)
        results[f"b{bs}_ips"] = round(ips, 2)
        if bs == 1:
            p50_b1 = per_fwd * 1000
        best_ips = max(best_ips, ips)
        log(f"batch {bs}: {per_fwd * 1000:.2f} ms/fwd → {ips:.1f} img/s")

    out = {
        "metric": "fai-detr-l-coco 640x640 throughput (1 chip, bf16)",
        "value": round(best_ips, 2),
        "unit": "img/s",
        "vs_baseline": round(best_ips / BASELINE_FPS, 3),
        "p50_latency_ms_b1": round(p50_b1, 3) if p50_b1 else None,
        "device": str(dev.device_kind),
        "detail": results,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
