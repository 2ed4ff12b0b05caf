"""Unified model loading (reference: focoos/model_manager.py).

``ModelManager.get("fai-detr-l-coco")`` resolves a model card from the
bundled registry / a local run dir / the hub, builds the flax module for its
family, initializes or loads parameters, and wraps everything in a
``FocoosModel``.
"""

from __future__ import annotations

import importlib
import os
from dataclasses import fields
from typing import Any, Callable, Dict, Optional, Union

from focoos_tpu.model_registry.model_registry import ModelRegistry
from focoos_tpu.nn.backbone.base import BackboneConfig
from focoos_tpu.ports import ArtifactName, ModelConfig, ModelFamily, ModelInfo
from focoos_tpu.utils.logger import get_logger

logger = get_logger(__name__)


class BackboneManager:
    """string → (config class, module class) map (reference: model_manager.py:237-303)."""

    _registry: Dict[str, tuple] = {}

    @classmethod
    def register(cls, model_type: str, config_cls: type, module_cls: type) -> None:
        cls._registry[model_type] = (config_cls, module_cls)

    @classmethod
    def _ensure(cls, model_type: str) -> None:
        if model_type in cls._registry:
            return
        # lazy import: focoos_tpu.nn.backbone.<model_type> self-registers
        mod = importlib.import_module(f"focoos_tpu.nn.backbone.{model_type}")
        if model_type not in cls._registry:
            # fall back to naming convention: <Type>Config / <Type> module
            for attr in dir(mod):
                obj = getattr(mod, attr)
                if isinstance(obj, type) and issubclass(obj, BackboneConfig) and obj is not BackboneConfig:
                    if getattr(obj(), "model_type", None) == model_type:
                        raise RuntimeError(f"backbone module {model_type} did not self-register")
        if model_type not in cls._registry:
            raise ValueError(f"Unknown backbone: {model_type}")

    @classmethod
    def config_from_dict(cls, d: dict) -> BackboneConfig:
        model_type = d["model_type"]
        cls._ensure(model_type)
        config_cls, _ = cls._registry[model_type]
        known = {f.name for f in fields(config_cls)}
        return config_cls(**{k: v for k, v in d.items() if k in known})

    @classmethod
    def from_config(cls, config: BackboneConfig):
        cls._ensure(config.model_type)
        _, module_cls = cls._registry[config.model_type]
        return module_cls(config=config)


class ConfigManager:
    """family → typed config, with nested backbone dispatch
    (reference: model_manager.py:306-389)."""

    _registry: Dict[str, type] = {}

    @classmethod
    def register(cls, family: Union[str, ModelFamily], config_cls: type) -> None:
        cls._registry[ModelFamily(family).value] = config_cls

    @classmethod
    def from_dict(cls, family: Union[str, ModelFamily], d: dict, **overrides: Any) -> ModelConfig:
        key = ModelFamily(family).value
        ModelManager._ensure_family_registered(key)
        config_cls = cls._registry[key]
        d = dict(d)
        known = {f.name for f in fields(config_cls)}
        # explicit user overrides must name real fields (reference:
        # model_manager.py:375 raises on invalid update keys)
        bad_overrides = {k for k in overrides if k not in known and overrides[k] is not None}
        if bad_overrides:
            raise ValueError(f"Invalid config keys for {key}: {sorted(bad_overrides)} (known: {sorted(known)})")
        d.update({k: v for k, v in overrides.items() if v is not None})
        if "backbone_config" in d and isinstance(d["backbone_config"], dict):
            d["backbone_config"] = BackboneManager.config_from_dict(d["backbone_config"])
        # stored card dicts may carry keys from newer/older versions: warn+drop
        bad = set(d) - known
        if bad:
            logger.warning(f"Dropping unknown config keys for {key}: {sorted(bad)}")
        return config_cls(**{k: v for k, v in d.items() if k in known})


class ModelManager:
    """Unified loader (reference: model_manager.py:17-234)."""

    _builders: Dict[str, Callable] = {}  # family → (config) -> nn.Module

    @classmethod
    def register_model(cls, family: Union[str, ModelFamily], builder: Callable) -> None:
        cls._builders[ModelFamily(family).value] = builder

    @classmethod
    def _ensure_family_registered(cls, family: str) -> None:
        if family in cls._builders and family in ConfigManager._registry:
            return
        mod = importlib.import_module(f"focoos_tpu.models.{family}")
        for attr in dir(mod):
            if attr.startswith("_register"):
                getattr(mod, attr)()

    @classmethod
    def get(
        cls,
        name: Union[str, ModelInfo],
        *,
        num_classes: Optional[int] = None,
        classes: Optional[list] = None,
        image_size: Optional[Union[int, tuple]] = None,
        init_weights: bool = True,
        dtype: Optional[str] = None,
        **config_overrides: Any,
    ):
        """Resolve + build a model.

        ``name`` may be a registry name, a local run dir (containing
        model_info.json), "hub://<ref>", or a ModelInfo.
        """
        from focoos_tpu.models.focoos_model import FocoosModel

        weights_dir = None
        if isinstance(name, ModelInfo):
            model_info = name
        elif os.path.isdir(str(name)) and os.path.isfile(os.path.join(str(name), ArtifactName.INFO.value)):
            model_info = ModelInfo.from_json(os.path.join(str(name), ArtifactName.INFO.value))
            weights_dir = str(name)
        elif str(name).startswith("hub://"):
            model_info, weights_dir = cls._from_hub(str(name)[len("hub://") :])
        elif ModelRegistry.exists(str(name)):
            model_info = ModelRegistry.get_model_info(str(name))
            # local pretrained cache (the download-cache analog,
            # reference model_manager.py + ~/FocoosAI/models/<name>/):
            # converted weights dropped by tools/convert_torch_weights.py
            # under MODELS_DIR/<name>/ load automatically.
            from focoos_tpu.ports import MODELS_DIR

            cache_dir = os.path.join(MODELS_DIR, str(name))
            if os.path.isfile(os.path.join(cache_dir, ArtifactName.WEIGHTS.value)):
                weights_dir = cache_dir
        else:
            raise ValueError(
                f"'{name}' is neither a registry model, a local dir with model_info.json, nor a hub ref. "
                f"Registry: {ModelRegistry.list_models()}"
            )

        family = ModelFamily(model_info.model_family).value
        cls._ensure_family_registered(family)

        if classes is not None:
            model_info.classes = list(classes)
            num_classes = len(classes)
        if num_classes is not None and num_classes != len(model_info.classes):
            model_info.classes = [f"class_{i}" for i in range(num_classes)]
        if num_classes is not None:
            config_overrides["num_classes"] = num_classes
        if image_size is not None:
            model_info.im_size = image_size

        config = ConfigManager.from_dict(family, model_info.config, **config_overrides)
        model_info.config = config.to_dict()
        jdtype = None
        if dtype is not None:
            import jax.numpy as jnp

            jdtype = jnp.dtype(dtype)
        module = cls._builders[family](config, dtype=jdtype)
        return FocoosModel(
            module=module,
            config=config,
            model_info=model_info,
            weights_dir=weights_dir,
            init_weights=init_weights,
            dtype=dtype,
        )

    @classmethod
    def _from_hub(cls, ref: str):
        from focoos_tpu.hub.focoos_hub import FocoosHUB

        hub = FocoosHUB()
        return hub.get_local_model(ref)
