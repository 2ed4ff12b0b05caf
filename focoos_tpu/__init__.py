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


def __getattr__(name):
    # lazy imports keep `import focoos_tpu` light
    if name == "ModelManager":
        from focoos_tpu.model_manager import ModelManager

        return ModelManager
    if name == "ModelRegistry":
        from focoos_tpu.model_registry.model_registry import ModelRegistry

        return ModelRegistry
    if name == "FocoosHUB":
        from focoos_tpu.hub.focoos_hub import FocoosHUB

        return FocoosHUB
    if name == "AutoDataset":
        from focoos_tpu.data.auto_dataset import AutoDataset

        return AutoDataset
    if name == "InferModel":
        from focoos_tpu.infer.infer_model import InferModel

        return InferModel
    raise AttributeError(f"module 'focoos_tpu' has no attribute '{name}'")
