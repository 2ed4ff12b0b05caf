"""Infer/export/quantizer tests (reference model: tests/test_infer_model.py,
tests/test_runtime.py)."""

import os

import numpy as np
import pytest

from focoos_tpu.model_manager import ModelManager
from focoos_tpu.ports import RuntimeType


@pytest.fixture(scope="module")
def tiny_model():
    return ModelManager.get(
        "fai-detr-m-coco", num_classes=3, image_size=96, num_queries=10,
        transformer_predictor_dec_layers=2,
    )


def test_export_params_and_reload(tiny_model, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("export"))
    infer_model = tiny_model.export(RuntimeType.XLA_CPU, out_dir=out, image_size=96)
    assert os.path.isfile(os.path.join(out, "model_final.npz"))
    assert os.path.isfile(os.path.join(out, "model_info.json"))
    img = np.random.randint(0, 255, (96, 96, 3), np.uint8)
    res = infer_model.infer(img, threshold=0.0)
    assert len(res.detections) > 0
    assert res.latency.inference is not None


def test_export_stablehlo_roundtrip(tiny_model, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("hlo"))
    infer_model = tiny_model.export(RuntimeType.STABLEHLO, out_dir=out, image_size=96)
    assert os.path.isfile(os.path.join(out, "model.stablehlo"))
    img = np.random.randint(0, 255, (96, 96, 3), np.uint8)
    res = infer_model([img], threshold=0.0)[0]
    assert len(res.detections) > 0


def test_stablehlo_missing_artifact_raises(tiny_model, tmp_path_factory):
    from focoos_tpu.infer.infer_model import InferModel

    out = str(tmp_path_factory.mktemp("noartifact"))
    tiny_model.save_weights(os.path.join(out, "model_final.npz"))
    tiny_model.model_info.dump_json(out)
    with pytest.raises(FileNotFoundError):
        InferModel(out, RuntimeType.STABLEHLO)


def test_quantizer_roundtrip(tiny_model, tmp_path_factory):
    from focoos_tpu.infer.quantizer import Quantizer

    out = str(tmp_path_factory.mktemp("quant"))
    q = Quantizer(tiny_model)
    path = q.quantize(out)
    assert os.path.isfile(path)
    assert os.path.isfile(os.path.join(out, "quant_report.txt"))
    fp_size = os.path.getsize(os.path.join(out, "model_info.json"))  # just exists
    original = tiny_model.variables
    Quantizer.load_quantized(tiny_model, path)
    img = np.random.randint(0, 255, (96, 96, 3), np.uint8)
    res = tiny_model.infer(img, threshold=0.0)
    assert len(res.detections) > 0
    tiny_model.variables = original
    tiny_model._fwd_cache.clear()


def test_weight_save_load_roundtrip(tiny_model, tmp_path_factory):
    import jax

    out = str(tmp_path_factory.mktemp("weights"))
    p = tiny_model.save_weights(os.path.join(out, "model_final.npz"))
    before = jax.tree.leaves(tiny_model.variables["params"])[0]
    tiny_model.load_weights(p, strict=True)
    after = jax.tree.leaves(tiny_model.variables["params"])[0]
    np.testing.assert_allclose(np.asarray(before), np.asarray(after))


def test_data_parallel_serving_matches_single_device(tiny_model, tmp_path_factory):
    """Batch sharded over the 8-device mesh produces identical detections,
    including the pad path for non-divisible batches."""
    import jax

    from focoos_tpu.infer.infer_model import InferModel

    out = str(tmp_path_factory.mktemp("dp"))
    tiny_model.export(RuntimeType.XLA_CPU, out_dir=out, image_size=96)
    single = InferModel(out, RuntimeType.XLA_CPU)
    dp = InferModel(out, RuntimeType.XLA_CPU, data_parallel=True)
    assert dp.runtime._mesh is not None and dp.runtime._mesh.devices.size == len(jax.devices())

    imgs = [np.random.randint(0, 255, (96, 96, 3), np.uint8) for _ in range(11)]
    r1 = single(imgs, threshold=0.0)
    r2 = dp(imgs, threshold=0.0)
    assert len(r1) == len(r2) == 11
    for a, b in zip(r1, r2):
        assert [d.bbox for d in a.detections] == [d.bbox for d in b.detections]
        assert [d.cls_id for d in a.detections] == [d.cls_id for d in b.detections]


def test_int8_runtime_roundtrip(tiny_model, tmp_path_factory):
    """XLA_TPU_INT8: export writes model_int8.npz, runtime executes int8
    weights with dequant fused in-graph; ranking tracks the fp runtime."""
    from focoos_tpu.infer.infer_model import InferModel

    out = str(tmp_path_factory.mktemp("int8"))
    im8 = tiny_model.export(RuntimeType.XLA_TPU_INT8, out_dir=out, image_size=96)
    assert os.path.isfile(os.path.join(out, "model_int8.npz"))
    fp = InferModel(out, RuntimeType.XLA_CPU)

    img = np.random.randint(0, 255, (96, 96, 3), np.uint8)
    r8 = im8.infer(img, threshold=0.0)
    rf = fp.infer(img, threshold=0.0)
    assert len(r8.detections) == len(rf.detections) > 0
    s8 = np.array([d.conf for d in r8.detections][:5])
    sf = np.array([d.conf for d in rf.detections][:5])
    # random (untrained) weights quantize worst-case; scores still track
    np.testing.assert_allclose(s8, sf, atol=0.15)

    # missing artifact raises cleanly
    import pytest as _pytest

    bare = str(tmp_path_factory.mktemp("bare"))
    tiny_model.save_weights(os.path.join(bare, "model_final.npz"))
    tiny_model.model_info.dump_json(bare)
    with _pytest.raises(FileNotFoundError):
        InferModel(bare, RuntimeType.XLA_TPU_INT8)


def test_stablehlo_chunked_batches(tiny_model, tmp_path_factory):
    """A fixed-batch StableHLO artifact serves arbitrary batch sizes via
    pad-and-chunk, with position-invariant results."""
    from focoos_tpu.infer.infer_model import InferModel

    out = str(tmp_path_factory.mktemp("hlo_chunk"))
    tiny_model.export(RuntimeType.STABLEHLO, out_dir=out, image_size=96, batch_size=2)
    im = InferModel(out, RuntimeType.STABLEHLO)
    imgs = [np.random.randint(0, 255, (96, 96, 3), np.uint8) for _ in range(5)]
    res = im(imgs, threshold=0.0)
    assert len(res) == 5
    single = im([imgs[0]], threshold=0.0)[0]
    assert [d.bbox for d in res[0].detections] == [d.bbox for d in single.detections]


def test_load_runtime_dispatch_and_guards():
    """(reference model: tests/test_runtime.py — dispatch per RuntimeType +
    guard failures)."""
    import pytest as _pytest

    from focoos_tpu.infer.runtimes import load_runtime

    with _pytest.raises(AssertionError):
        load_runtime(RuntimeType.XLA_CPU, output_names=["x"])  # no module/variables
    with _pytest.raises(AssertionError):
        load_runtime(RuntimeType.STABLEHLO, output_names=["x"])  # no artifact
    with _pytest.raises(AssertionError):
        load_runtime(RuntimeType.XLA_TPU_INT8, output_names=["x"])  # no module+artifact
