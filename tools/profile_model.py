"""Per-fusion TPU time attribution for a registry model's forward or train step.

Usage:
    python tools/profile_model.py [model-name] [batch] [size]          # forward
    python tools/profile_model.py --train [model-name] [batch] [size]  # full train step

Wraps ``jax.profiler.trace`` (works over remote device tunnels) and parses the
emitted trace for HLO-fusion time, bytes and category — the torch analog is
the TorchProfiler hook (reference: trainer/hooks/hook.py:359), but this one
attributes at the XLA-fusion level where TPU time actually goes. ``--train``
profiles one optimizer step (fwd+loss+matching+bwd+update), the hot loop of
the fine-tune workload (reference hot loop: trainer/trainer.py:723).
"""

from __future__ import annotations

import collections
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def profile_callable(run, label):
    """Trace 3 calls of ``run()`` (already compiled) and print the device-op
    time attribution."""
    import jax

    from focoos_tpu.utils.profiling import parse_trace

    run()  # compile + warm
    trace_dir = tempfile.mkdtemp(prefix="focoos_prof_")
    n_calls = 3
    with jax.profiler.trace(trace_dir):
        for _ in range(n_calls):
            run()

    try:
        dur, meta = parse_trace(trace_dir)
    except FileNotFoundError:
        print("no trace produced", file=sys.stderr)
        return 1

    total = sum(dur.values()) / n_calls / 1e3
    print(f"== {label}: {total:.2f} ms device-op time/call ==")
    by_cat = collections.Counter()
    for op, us in dur.items():
        by_cat[meta.get(op, {}).get("hlo_category", "?")] += us
    for cat, us in by_cat.most_common():
        print(f"  {cat:28s} {us / n_calls / 1e3:8.2f} ms/call")
    print("-- top fusions --")
    for op, us in dur.most_common(20):
        ln = meta.get(op, {}).get("long_name", "")[:120]
        print(f"  {us / n_calls / 1e3:7.2f} ms  {op:14s} {ln}")
    # per-category top ops: where the non-matmul time actually goes
    for cat in [c for c, _ in by_cat.most_common(4)]:
        print(f"-- top ops in '{cat}' --")
        ops = [(op, us) for op, us in dur.most_common()
               if meta.get(op, {}).get("hlo_category", "?") == cat]
        for op, us in ops[:8]:
            ln = meta.get(op, {}).get("long_name", "")[:150]
            print(f"  {us / n_calls / 1e3:7.2f} ms  {op:14s} {ln}")
    return 0


def make_forward(name, batch, size):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from focoos_tpu.model_manager import ModelManager

    model = ModelManager.get(name, dtype="bfloat16" if jax.default_backend() != "cpu" else None)
    x = jnp.asarray(np.random.rand(batch, size, size, 3).astype(np.float32) * 255)

    def sink(t):
        # cheap DCE-safe scalar (see bench.py::make_chained_fwd): a full mean
        # over a large output leaf lowers to a multi-ms scalar reduce fusion
        # that would dominate the profile
        s = t[:, :1] if t.ndim >= 2 else t
        return jnp.sum(s.astype(jnp.float32))

    @jax.jit
    def fwd(v, im):
        out, _ = model.module.apply(v, im, train=False)
        return sum(sink(l) for l in jax.tree.leaves(out) if hasattr(l, "ndim"))

    return lambda: float(fwd(model.variables, x))


def make_train_step(name, batch, size, n_inst=25):
    """One full optimizer step on a synthetic padded batch — same
    construction as bench.py::bench_train_step but single-step (no scan) so
    the trace attributes fusions of the real per-step program."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from focoos_tpu.model_manager import ModelManager
    from focoos_tpu.models.fai_detr.loss import make_loss_fn
    from focoos_tpu.models.fai_detr.ports import DETRTargets
    from focoos_tpu.ports import TrainerArgs
    from focoos_tpu.trainer.solver import build_optimizer
    from focoos_tpu.trainer.train_step import build_train_step, create_train_state

    model = ModelManager.get(name, dtype="bfloat16" if jax.default_backend() != "cpu" else None)
    rng_np = np.random.default_rng(0)
    images = jnp.asarray(rng_np.random((batch, size, size, 3), np.float32) * 255.0)
    boxes = np.abs(rng_np.normal(0.4, 0.15, (batch, n_inst, 4))).clip(0.05, 0.9).astype(np.float32)
    targets = DETRTargets(
        labels=jnp.asarray(rng_np.integers(0, 80, (batch, n_inst)).astype(np.int32)),
        boxes=jnp.asarray(boxes),
        valid=jnp.asarray(rng_np.random((batch, n_inst)) > 0.3),
    )
    args = TrainerArgs(run_name="prof", max_iters=10)
    tx, _ = build_optimizer(model.variables["params"], args)
    state = create_train_state(dict(model.variables), tx)
    loss_fn = make_loss_fn(model.module, model.config)
    step = jax.jit(build_train_step(loss_fn, tx, donate=False))
    rng = jax.random.PRNGKey(0)

    def run():
        s2, m = step(state, (images, targets), rng)
        float(m["total_loss"])

    return run


def main():
    argv = [a for a in sys.argv[1:]]
    train = "--train" in argv
    if train:
        argv.remove("--train")
    name = argv[0] if len(argv) > 0 else "fai-detr-l-coco"
    batch = int(argv[1]) if len(argv) > 1 else 16
    size = int(argv[2]) if len(argv) > 2 else 640

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/focoos_tpu_xla"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    if train:
        run = make_train_step(name, batch, size)
        label = f"{name} TRAIN b{batch}@{size}"
    else:
        run = make_forward(name, batch, size)
        label = f"{name} b{batch}@{size}"
    return profile_callable(run, label)


if __name__ == "__main__":
    raise SystemExit(main())
