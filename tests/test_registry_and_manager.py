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
