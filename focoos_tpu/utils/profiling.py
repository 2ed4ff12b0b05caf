"""Device-time attribution from ``jax.profiler`` traces.

The torch analog is the TorchProfiler hook (reference:
focoos/trainer/hooks/hook.py:359, chrome-trace export); here the trace is
parsed host-side to recover *device-op* time — the number that separates a
real kernel regression from host/tunnel/dispatch weather (wall-clock over a
remote device tunnel includes ~27 ms RTT per fetch and arbitrary link noise;
device-op microseconds do not).

Used by ``tools/profile_model.py`` (per-fusion accounting) and ``bench.py``
(a ``device_op_ms`` field next to every wall-clock workload number, so the
scoreboard can tell weather from regressions across rounds).
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import shutil
import tempfile


def parse_trace(trace_dir: str):
    """Parse the newest ``*.trace.json.gz`` under ``trace_dir``.

    Returns ``(dur, meta)``: total microseconds per device op name across the
    whole trace, and the op-arg metadata (hlo_category / long_name) captured
    for each. Host-process events and whole-program wrapper spans
    (``jit_<fn>``, bare launch ids) are excluded so fusions are not
    double-counted.
    """
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True)
    if not paths:
        raise FileNotFoundError(f"no trace under {trace_dir}")
    with gzip.open(sorted(paths)[-1]) as f:
        events = json.load(f).get("traceEvents", [])

    pids = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e.get("args", {}).get("name", "")
    dev_pids = {p for p, n in pids.items() if "TPU" in n or "GPU" in n or "device" in n.lower()}

    dur: collections.Counter = collections.Counter()
    meta: dict = {}
    for e in events:
        nm = e.get("name", "")
        if (e.get("ph") == "X" and e.get("dur") and e.get("pid") in dev_pids
                and not nm.startswith("jit_") and not nm.isdigit()):
            dur[nm] += e["dur"]
            if e.get("args") and nm not in meta:
                meta[nm] = e["args"]
    return dur, meta


def parse_trace_busy_us(trace_dir: str) -> float:
    """Device BUSY microseconds: the union of all device-track event
    intervals in the newest trace under ``trace_dir``.

    Summing per-op durations double-counts nested spans — a ``lax.scan``
    emits the whole-loop ``while`` event *plus* every child fusion (measured
    ~2× wall on chained benchmarks). Interval union is immune to nesting and
    to op-naming conventions.
    """
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True)
    if not paths:
        raise FileNotFoundError(f"no trace under {trace_dir}")
    with gzip.open(sorted(paths)[-1]) as f:
        events = json.load(f).get("traceEvents", [])
    pids = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e.get("args", {}).get("name", "")
    dev_pids = {p for p, n in pids.items() if "TPU" in n or "GPU" in n or "device" in n.lower()}
    spans = sorted(
        (float(e["ts"]), float(e["ts"]) + float(e["dur"]))
        for e in events
        if e.get("ph") == "X" and e.get("dur") and e.get("pid") in dev_pids
    )
    busy, cur_s, cur_e = 0.0, None, None
    for s, t in spans:
        if cur_e is None or s > cur_e:
            if cur_e is not None:
                busy += cur_e - cur_s
            cur_s, cur_e = s, t
        else:
            cur_e = max(cur_e, t)
    if cur_e is not None:
        busy += cur_e - cur_s
    return busy


def device_op_ms(run, n_calls: int = 1, per: int = 1) -> float:
    """Device busy milliseconds for ``n_calls`` invocations of an
    already-compiled ``run()`` (which must block until done), divided by
    ``n_calls * per``.

    ``per`` amortizes a chained program: if ``run`` executes a
    ``lax.scan`` of K forwards, pass ``per=K`` to get ms per forward.
    """
    import jax

    trace_dir = tempfile.mkdtemp(prefix="focoos_devms_")
    try:
        with jax.profiler.trace(trace_dir):
            for _ in range(n_calls):
                run()
        return parse_trace_busy_us(trace_dir) / (n_calls * per) / 1e3
    finally:
        shutil.rmtree(trace_dir, ignore_errors=True)
