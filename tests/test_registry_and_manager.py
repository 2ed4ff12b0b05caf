"""Registry + manager tests (reference model: tests/test_model_registry.py,
tests/test_model_manager.py)."""

import pytest

from focoos_tpu.model_manager import BackboneManager, ConfigManager
from focoos_tpu.model_registry.model_registry import ModelRegistry
from focoos_tpu.ports import ModelFamily, ModelInfo, Task


def test_all_cards_parse():
    models = ModelRegistry.list_models()
    assert len(models) >= 16
    for name in models:
        info = ModelRegistry.get_model_info(name)
        assert isinstance(info, ModelInfo)
        assert info.num_classes > 0
        assert isinstance(info.task, Task)
        assert isinstance(info.model_family, ModelFamily)


def test_registry_missing_raises():
    with pytest.raises(ValueError):
        ModelRegistry.get_model_info("not-a-model")


def test_config_manager_builds_typed_configs():
    for name in ["fai-detr-l-coco", "fai-mf-l-ade", "bisenetformer-s-ade", "fai-cls-n-coco", "rtmo-s-coco"]:
        info = ModelRegistry.get_model_info(name)
        cfg = ConfigManager.from_dict(info.model_family, info.config)
        assert cfg.num_classes == info.num_classes or cfg.num_classes > 0
        assert cfg.backbone_config is not None


def test_config_override_validation():
    info = ModelRegistry.get_model_info("fai-detr-m-coco")
    cfg = ConfigManager.from_dict(info.model_family, info.config, num_queries=123)
    assert cfg.num_queries == 123


def test_backbone_manager_types():
    for bb in ["resnet", "stdc", "csp_darknet", "convnextv2", "mobilenet_v2", "swin"]:
        BackboneManager._ensure(bb)
        assert bb in BackboneManager._registry


def test_config_manager_invalid_kwarg_raises():
    info = ModelRegistry.get_model_info("fai-detr-m-coco")
    with pytest.raises((TypeError, ValueError)):
        ConfigManager.from_dict(info.model_family, info.config, not_a_real_field=1)


def test_model_manager_from_local_dir(tmp_path):
    """ModelManager.get on a local artifact dir (reference: test_model_manager.py
    local-dir path): model_info.json + model_final.npz round-trip."""
    from focoos_tpu.model_manager import ModelManager

    m = ModelManager.get("fai-detr-m-coco", num_classes=3, image_size=96, num_queries=10,
                         transformer_predictor_dec_layers=2)
    out = str(tmp_path)
    m.save_weights(f"{out}/model_final.npz")
    m.model_info.dump_json(out)

    m2 = ModelManager.get(out)
    import numpy as np
    import jax

    a = jax.tree.leaves(m.variables["params"])[0]
    b = jax.tree.leaves(m2.variables["params"])[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    assert m2.model_info.num_classes == 3


def test_model_manager_unknown_name_raises():
    from focoos_tpu.model_manager import ModelManager

    with pytest.raises((ValueError, FileNotFoundError)):
        ModelManager.get("definitely-not-a-model-or-dir")


def test_serialized_dataset_roundtrip():
    from focoos_tpu.data.datasets import SerializedDataset

    recs = [{"file_name": f"{i}.jpg", "annotations": [{"bbox": [i, 0, i + 4, 4]}]} for i in range(10)]
    sd = SerializedDataset(recs)
    assert len(sd) == 10
    assert sd[0] == recs[0]
    assert sd[9] == recs[9]
