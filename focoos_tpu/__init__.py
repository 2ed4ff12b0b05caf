"""focoos-tpu — TPU-native computer-vision framework with focoos-parity APIs.

Public surface (mirrors the reference package root, focoos/__init__.py):

    from focoos_tpu import ModelManager
    model = ModelManager.get("fai-detr-l-coco")
    detections = model.infer("image.jpg")
    model.train(TrainerArgs(...), train_ds, val_ds)
    infer_model = model.export(RuntimeType.STABLEHLO)
"""

__version__ = "0.1.0"

from focoos_tpu.ports import (  # noqa: F401
    DatasetLayout,
    DatasetSplitType,
    FocoosDet,
    FocoosDetections,
    ModelFamily,
    ModelInfo,
    ModelStatus,
    RuntimeType,
    Task,
    TrainerArgs,
)


_LAZY = {
    # name -> (module, attr); mirrors the reference root exports
    # (focoos/__init__.py) with lazy resolution to keep import light
    "ModelManager": ("focoos_tpu.model_manager", "ModelManager"),
    "ConfigManager": ("focoos_tpu.model_manager", "ConfigManager"),
    "BackboneManager": ("focoos_tpu.model_manager", "BackboneManager"),
    "ModelRegistry": ("focoos_tpu.model_registry.model_registry", "ModelRegistry"),
    "FocoosHUB": ("focoos_tpu.hub.focoos_hub", "FocoosHUB"),
    "RemoteModel": ("focoos_tpu.hub.remote_model", "RemoteModel"),
    "RemoteDataset": ("focoos_tpu.hub.remote_dataset", "RemoteDataset"),
    "ApiClient": ("focoos_tpu.hub.api_client", "ApiClient"),
    "AutoDataset": ("focoos_tpu.data.auto_dataset", "AutoDataset"),
    "DictDataset": ("focoos_tpu.data.datasets", "DictDataset"),
    "DatasetAugmentations": ("focoos_tpu.data.default_aug", "DatasetAugmentations"),
    "InferModel": ("focoos_tpu.infer.infer_model", "InferModel"),
    "load_runtime": ("focoos_tpu.infer.runtimes", "load_runtime"),
    "Quantizer": ("focoos_tpu.infer.quantizer", "Quantizer"),
    "FocoosModel": ("focoos_tpu.models.focoos_model", "FocoosModel"),
    "FOCOOS_CONFIG": ("focoos_tpu.config", "FOCOOS_CONFIG"),
    "Boxes": ("focoos_tpu.structures", "Boxes"),
    "BitMasks": ("focoos_tpu.structures", "BitMasks"),
    "Instances": ("focoos_tpu.structures", "Instances"),
    "ImageList": ("focoos_tpu.structures", "ImageList"),
}


def __getattr__(name):
    if name in _LAZY:
        import importlib

        mod, attr = _LAZY[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(f"module 'focoos_tpu' has no attribute '{name}'")


def __dir__():
    return sorted(list(globals()) + list(_LAZY))
