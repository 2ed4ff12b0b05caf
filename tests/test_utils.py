"""Utils tests (reference model: tests/utils/ — vision conversions + metrics
parsing with a fabricated metrics.json)."""

import json

import numpy as np
import pytest


def test_image_loader_sources(tmp_path):
    from PIL import Image

    from focoos_tpu.utils.vision import image_loader

    rgb = np.random.randint(0, 255, (10, 12, 3), np.uint8)
    # ndarray passthrough
    np.testing.assert_array_equal(image_loader(rgb), rgb)
    # grayscale -> 3 channels
    assert image_loader(rgb[..., 0]).shape == (10, 12, 3)
    # RGBA drops alpha
    rgba = np.concatenate([rgb, np.full((10, 12, 1), 255, np.uint8)], -1)
    assert image_loader(rgba).shape == (10, 12, 3)
    # PIL
    np.testing.assert_array_equal(image_loader(Image.fromarray(rgb)), rgb)
    # path + bytes
    p = tmp_path / "x.png"
    Image.fromarray(rgb).save(p)
    np.testing.assert_array_equal(image_loader(str(p)), rgb)
    np.testing.assert_array_equal(image_loader(p.read_bytes()), rgb)


def test_annotate_image_draws():
    from focoos_tpu.ports import FocoosDet, FocoosDetections
    from focoos_tpu.utils.vision import annotate_image

    img = np.zeros((32, 32, 3), np.uint8)
    dets = FocoosDetections(detections=[FocoosDet(bbox=[4, 4, 20, 20], conf=0.9, cls_id=0, label="a")])
    out = annotate_image(img, dets, classes=["a"])
    out = np.asarray(out)
    assert out.shape == img.shape
    assert out.sum() > 0  # something was drawn


def test_parse_metrics_fabricated_jsonl(tmp_path):
    from focoos_tpu.utils.metrics import parse_metrics

    rows = [
        {"iteration": 0, "total_loss": 9.0, "loss_bbox": 3.0},
        {"iteration": 2, "total_loss": 5.0, "bbox/AP": 11.0},
        {"iteration": 4, "total_loss": 4.0, "bbox/AP": 17.5},
        "not json at all",
    ]
    p = tmp_path / "metrics.json"
    with open(p, "w") as f:
        for r in rows:
            f.write((json.dumps(r) if isinstance(r, dict) else r) + "\n")
    m = parse_metrics(str(p))
    assert len(m.train_metrics) == 3
    assert len(m.valid_metrics) == 2
    assert m.best_valid_metric is not None
    assert m.best_valid_metric.get("bbox/AP") == pytest.approx(17.5)


def test_parse_metrics_missing_file():
    from focoos_tpu.utils.metrics import parse_metrics

    m = parse_metrics("/definitely/not/here/metrics.json")
    assert m.train_metrics == [] and m.valid_metrics == []


def test_cli_aug_flags_override_defaults():
    """--aug-*/--val-aug-* flags override the task-default pipelines
    (reference: cli/cli.py:279-525 full DatasetAugmentations flag surface)."""
    import argparse

    from focoos_tpu.cli.cli import _add_aug_args, _build_augs
    from focoos_tpu.ports import Task

    p = argparse.ArgumentParser()
    _add_aug_args(p)
    ns = p.parse_args(["--aug-horizontal-flip", "0.9", "--aug-rotation", "15",
                       "--val-aug-square", "1.0"])
    train_augs, val_augs = _build_augs(ns, Task.DETECTION, 320)
    assert train_augs.horizontal_flip == 0.9
    assert train_augs.rotation == 15.0
    assert val_augs.square == 1.0
    assert val_augs.horizontal_flip != 0.9  # val pipeline untouched by --aug-*
    assert train_augs.resolution == 320


def test_timer_pause_resume_and_took(caplog):
    import time as _time

    from focoos_tpu.utils.timer import Timer, took

    t = Timer()
    _time.sleep(0.02)
    t.pause()
    frozen = t.seconds()
    _time.sleep(0.02)
    assert abs(t.seconds() - frozen) < 1e-6  # paused: no accumulation
    t.resume()
    _time.sleep(0.01)
    assert t.seconds() > frozen

    with Timer() as ct:
        _time.sleep(0.01)
    assert ct.elapsed >= 0.005

    @took
    def add(a, b):
        return a + b

    assert add(2, 3) == 5


@pytest.mark.slow
def test_retry_if_oom_retries_then_succeeds():
    from focoos_tpu.utils.memory import retry_if_oom

    calls = {"n": 0}

    @retry_if_oom
    def flaky():
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("RESOURCE_EXHAUSTED: out of memory allocating")
        return "ok"

    assert flaky() == "ok"
    assert calls["n"] == 2

    @retry_if_oom
    def broken():
        raise ValueError("not an oom")

    import pytest as _pytest

    with _pytest.raises(ValueError):
        broken()


def test_system_info_and_seed():
    from focoos_tpu.utils.system import get_system_info, seed_all_rng

    info = get_system_info()
    assert info.jax_version and info.packages.get("numpy")
    assert isinstance(info.devices, list)

    s = seed_all_rng(123)
    a = np.random.rand(3)
    seed_all_rng(123)
    b = np.random.rand(3)
    assert s == 123 and np.allclose(a, b)
    auto = seed_all_rng(None)
    assert isinstance(auto, int)


def test_gradio_app_degrades_without_gradio(monkeypatch):
    """`launch` must raise a clear RuntimeError when gradio isn't installed
    (it's an optional dep in this environment), not an ImportError mid-UI."""
    import builtins

    import pytest as _pytest

    from focoos_tpu.cli import gradio_app

    real_import = builtins.__import__

    def no_gradio(name, *a, **k):
        if name == "gradio" or name.startswith("gradio."):
            raise ImportError("No module named 'gradio'")
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", no_gradio)
    with _pytest.raises((RuntimeError, ImportError)) as ei:
        gradio_app.launch("fai-cls-n-coco")
    assert "gradio" in str(ei.value).lower()


def test_profiling_trace_parse_and_busy_union(tmp_path):
    """parse_trace sums per-op device time (wrapper spans excluded);
    parse_trace_busy_us merges nested/overlapping spans so a scan's `while`
    wrapper is not double-counted (it was: device_op_ms read ~2x wall)."""
    import gzip
    import json

    from focoos_tpu.utils.profiling import parse_trace, parse_trace_busy_us

    events = [
        {"ph": "M", "name": "process_name", "pid": 1, "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "name": "process_name", "pid": 2, "args": {"name": "python host"}},
        # wrapper span covering both fusions (a lax.scan 'while')
        {"ph": "X", "pid": 1, "tid": 1, "name": "while", "ts": 0, "dur": 100},
        {"ph": "X", "pid": 1, "tid": 2, "name": "fusion.1", "ts": 0, "dur": 40,
         "args": {"hlo_category": "convolution"}},
        {"ph": "X", "pid": 1, "tid": 2, "name": "fusion.2", "ts": 50, "dur": 50,
         "args": {"hlo_category": "loop"}},
        # host event must be ignored
        {"ph": "X", "pid": 2, "tid": 1, "name": "hostwork", "ts": 0, "dur": 1000},
        # wrapper spans excluded from the name sum
        {"ph": "X", "pid": 1, "tid": 1, "name": "jit_fn", "ts": 0, "dur": 100},
        {"ph": "X", "pid": 1, "tid": 1, "name": "7", "ts": 0, "dur": 100},
    ]
    d = tmp_path / "plugins" / "profile" / "x"
    d.mkdir(parents=True)
    with gzip.open(d / "host.trace.json.gz", "wt") as f:
        json.dump({"traceEvents": events}, f)

    dur, meta = parse_trace(str(tmp_path))
    assert set(dur) == {"while", "fusion.1", "fusion.2"}
    assert dur["fusion.1"] == 40 and meta["fusion.1"]["hlo_category"] == "convolution"
    # busy union: [0,100] regardless of nesting/duplication (not 40+50+100...)
    assert parse_trace_busy_us(str(tmp_path)) == 100.0
