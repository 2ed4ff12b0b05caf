"""Infer/export/quantizer tests (reference model: tests/test_infer_model.py,
tests/test_runtime.py)."""

import os

import numpy as np
import pytest

from focoos_tpu.model_manager import ModelManager
from focoos_tpu.ports import RuntimeType

pytestmark = pytest.mark.slow


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


def test_export_tf_savedmodel_roundtrip(tiny_model, tmp_path_factory):
    """Portable out-of-JAX artifact (VERDICT r4 next #8): jax2tf SavedModel
    loads through pure TF and matches the XLA engine at 1e-3."""
    tf = pytest.importorskip("tensorflow")  # noqa: F841

    from focoos_tpu.infer.infer_model import InferModel
    from focoos_tpu.infer.runtimes import XLARuntime

    out = str(tmp_path_factory.mktemp("sm"))
    tiny_model.export(RuntimeType.TF_SAVEDMODEL, out_dir=out, image_size=96)
    assert os.path.isdir(os.path.join(out, "saved_model"))

    infer_model = InferModel(out, runtime_type=RuntimeType.TF_SAVEDMODEL)
    x = np.random.randint(0, 255, (1, 96, 96, 3), np.uint8)
    tf_out = infer_model.runtime(x)
    names = tiny_model.processor.get_output_names()
    rt = XLARuntime(tiny_model.module, tiny_model.variables, names)
    xla_out = rt(x.astype(np.float32))
    for name, a, b in zip(names, tf_out, xla_out):
        assert np.max(np.abs(a.astype(np.float64) - b.astype(np.float64))) < 1e-3, name

    img = np.random.randint(0, 255, (120, 96, 3), np.uint8)
    res = infer_model.infer(img, threshold=0.0)
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


def test_int8_qdq_conv_param_tree_and_snr():
    """INT8_QDQ ConvNorm shares the float path's param tree exactly and its
    QDQ output stays within PTQ error of the float conv (reference analog:
    quantize_static QDQ graphs, infer/quantizer.py:200-209)."""
    import jax
    import jax.numpy as jnp

    from focoos_tpu.nn.layers import common as nn_common
    from focoos_tpu.nn.layers.common import ConvNorm

    mod = ConvNorm(16, 3, 1, norm=None, act=None)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 8))
    variables = mod.init(jax.random.PRNGKey(1), x)

    y_f = mod.apply(variables, x)
    assert not nn_common.int8_qdq_enabled()
    with nn_common.int8_qdq_mode():
        v2 = mod.init(jax.random.PRNGKey(1), x)
        # identical tree: int8 path must load float checkpoints unchanged
        assert jax.tree.structure(v2) == jax.tree.structure(variables)
        y_q = mod.apply(variables, x)
    assert not nn_common.int8_qdq_enabled()

    err = jnp.linalg.norm(y_f - y_q) / jnp.linalg.norm(y_f)
    snr_db = -20 * jnp.log10(err)
    assert y_q.shape == y_f.shape
    assert float(snr_db) > 25.0, f"int8 SNR too low: {float(snr_db):.1f} dB"

    # train=True keeps the float path (QDQ is inference-only)
    with nn_common.int8_qdq_mode():
        y_t = mod.apply(variables, x, train=True)
    assert float(jnp.abs(y_t - y_f).max()) < 1e-6

    # calibration sows per-layer input absmax; a calibrated static scale
    # reproduces the dynamic result exactly when it equals the true absmax
    with nn_common.int8_calibration_mode():
        _, mut = mod.apply(variables, x, mutable=["int8_calib"])
    from focoos_tpu.utils.checkpoint import flatten_tree

    calib = flatten_tree(mut["int8_calib"])
    assert len(calib) == 1
    (key, absmax), = calib.items()
    assert key.endswith("conv/absmax")
    assert abs(float(absmax) - float(jnp.abs(x).max())) < 1e-6
    scales = {key[: -len("/absmax")]: float(absmax) / 127.0}
    with nn_common.int8_qdq_mode(act_scales=scales):
        y_s = mod.apply(variables, x)
    assert float(jnp.abs(y_s - y_q).max()) < 1e-6


def test_export_stablehlo_size_buckets_dispatch(tiny_model, tmp_path_factory):
    """Bucketed export writes one program per size; the runtime dispatches an
    odd-size input to the closest bucket by area (ONNX dynamic-axes analog,
    reference fai_detr/processor.py:242-251)."""
    from focoos_tpu.infer.runtimes import StableHLORuntime

    out = str(tmp_path_factory.mktemp("hlo_buckets"))
    infer_model = tiny_model.export(
        RuntimeType.STABLEHLO, out_dir=out, image_size=96, size_buckets=[64]
    )
    assert os.path.isfile(os.path.join(out, "model.stablehlo"))
    assert os.path.isfile(os.path.join(out, "model_64x64.stablehlo"))

    rt = infer_model.runtime
    assert isinstance(rt, StableHLORuntime)
    assert set(rt._programs) == {(96, 96), (64, 64)}

    # exact bucket hits run without resize
    out96 = rt(np.random.randint(0, 255, (1, 96, 96, 3), np.uint8))
    out64 = rt(np.random.randint(0, 255, (1, 64, 64, 3), np.uint8))
    assert out96[0].shape[0] == 1 and out64[0].shape[0] == 1

    # odd size (70x70) → closest bucket by area is 64x64 (squash-resized)
    out70 = rt(np.random.randint(0, 255, (2, 70, 70, 3), np.uint8))
    assert out70[0].shape[0] == 2
