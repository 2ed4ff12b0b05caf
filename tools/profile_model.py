"""Per-fusion TPU time attribution for a registry model's forward pass.

Usage: python tools/profile_model.py [model-name] [batch] [size]

Wraps ``jax.profiler.trace`` (works over remote device tunnels) and parses the
emitted trace for HLO-fusion time, bytes and category — the torch analog is
the TorchProfiler hook (reference: trainer/hooks/hook.py:359), but this one
attributes at the XLA-fusion level where TPU time actually goes.
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "fai-detr-l-coco"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    size = int(sys.argv[3]) if len(sys.argv) > 3 else 640

    import jax
    import jax.numpy as jnp
    import numpy as np

    from focoos_tpu.model_manager import ModelManager

    model = ModelManager.get(name, dtype="bfloat16" if jax.default_backend() != "cpu" else None)
    x = jnp.asarray(np.random.rand(batch, size, size, 3).astype(np.float32) * 255)

    @jax.jit
    def fwd(v, im):
        out, _ = model.module.apply(v, im, train=False)
        return jnp.mean(jax.tree.leaves(out)[0])

    float(fwd(model.variables, x))  # compile
    trace_dir = tempfile.mkdtemp(prefix="focoos_prof_")
    n_calls = 3
    with jax.profiler.trace(trace_dir):
        for _ in range(n_calls):
            float(fwd(model.variables, x))

    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True)
    if not paths:
        print("no trace produced", file=sys.stderr)
        return 1
    with gzip.open(paths[0]) as f:
        events = json.load(f).get("traceEvents", [])

    # restrict to device-process events (host python frames also emit X events)
    pids = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e.get("args", {}).get("name", "")
    dev_pids = {p for p, n in pids.items() if "TPU" in n or "GPU" in n or "device" in n.lower()}

    dur = collections.Counter()
    meta = {}
    for e in events:
        if (e.get("ph") == "X" and e.get("dur") and e.get("pid") in dev_pids
                and not e.get("name", "").startswith("jit_")):
            dur[e["name"]] += e["dur"]
            if e.get("args") and e["name"] not in meta:
                meta[e["name"]] = e["args"]

    total = sum(dur.values()) / n_calls / 1e3
    print(f"== {name} b{batch}@{size}: {total:.2f} ms device-op time/call ==")
    by_cat = collections.Counter()
    for op, us in dur.items():
        by_cat[meta.get(op, {}).get("hlo_category", "?")] += us
    for cat, us in by_cat.most_common():
        print(f"  {cat:28s} {us / n_calls / 1e3:8.2f} ms/call")
    print("-- top fusions --")
    for op, us in dur.most_common(15):
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


if __name__ == "__main__":
    raise SystemExit(main())
