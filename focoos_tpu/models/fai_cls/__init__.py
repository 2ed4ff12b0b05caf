"""fai_cls family registration (reference: focoos/models/fai_cls/__init__.py)."""

from focoos_tpu.ports import ModelFamily


def _register():
    from focoos_tpu.model_manager import BackboneManager, ConfigManager, ModelManager
    from focoos_tpu.models.fai_cls.config import ClassificationConfig
    from focoos_tpu.processor.processor_manager import ProcessorManager

    ConfigManager.register(ModelFamily.IMAGE_CLASSIFIER, ClassificationConfig)

    def build(config: ClassificationConfig, dtype=None):
        from focoos_tpu.models.fai_cls.modelling import FAIClassification

        backbone = BackboneManager.from_config(config.backbone_config)
        return FAIClassification(config=config, backbone=backbone, dtype=dtype)

    ModelManager.register_model(ModelFamily.IMAGE_CLASSIFIER, build)

    def processor_loader(config, image_size=None):
        from focoos_tpu.models.fai_cls.processor import ClassificationProcessor

        return ClassificationProcessor(config, image_size)

    ProcessorManager.register(ModelFamily.IMAGE_CLASSIFIER, processor_loader)
