"""bisenetformer family registration (reference: focoos/models/bisenetformer/__init__.py)."""

from focoos_tpu.ports import ModelFamily


def _register():
    from focoos_tpu.model_manager import BackboneManager, ConfigManager, ModelManager
    from focoos_tpu.models.bisenetformer.config import BisenetFormerConfig
    from focoos_tpu.processor.processor_manager import ProcessorManager

    ConfigManager.register(ModelFamily.BISENETFORMER, BisenetFormerConfig)

    def build(config: BisenetFormerConfig, dtype=None):
        from focoos_tpu.models.bisenetformer.modelling import BisenetFormer

        backbone = BackboneManager.from_config(config.backbone_config)
        return BisenetFormer(config=config, backbone=backbone, dtype=dtype)

    ModelManager.register_model(ModelFamily.BISENETFORMER, build)

    def processor_loader(config, image_size=None):
        from focoos_tpu.models.bisenetformer.processor import BisenetFormerProcessor

        return BisenetFormerProcessor(config, image_size)

    ProcessorManager.register(ModelFamily.BISENETFORMER, processor_loader)
