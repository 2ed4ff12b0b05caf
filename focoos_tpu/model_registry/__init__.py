from focoos_tpu.model_registry.model_registry import ModelRegistry

__all__ = ["ModelRegistry"]
