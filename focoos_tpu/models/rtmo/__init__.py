"""rtmo family registration (reference: focoos/models/rtmo/__init__.py)."""

from focoos_tpu.ports import ModelFamily


def _register():
    from focoos_tpu.model_manager import BackboneManager, ConfigManager, ModelManager
    from focoos_tpu.models.rtmo.config import RTMOConfig
    from focoos_tpu.processor.processor_manager import ProcessorManager

    ConfigManager.register(ModelFamily.RTMO, RTMOConfig)

    def build(config: RTMOConfig, dtype=None):
        from focoos_tpu.models.rtmo.modelling import RTMO

        backbone = BackboneManager.from_config(config.backbone_config)
        return RTMO(config=config, backbone=backbone, dtype=dtype)

    ModelManager.register_model(ModelFamily.RTMO, build)

    def processor_loader(config, image_size=None):
        from focoos_tpu.models.rtmo.processor import RTMOProcessor

        return RTMOProcessor(config, image_size)

    ProcessorManager.register(ModelFamily.RTMO, processor_loader)
