"""bisenetformer processor — same decode semantics as fai_mf
(reference: focoos/models/bisenetformer/processor.py) but export IO order is
[logits, masks] (reference :303-310)."""

from __future__ import annotations

from typing import List

from focoos_tpu.models.fai_mf.processor import MaskFormerProcessor
from focoos_tpu.models.fai_mf.ports import MaskFormerModelOutput
from focoos_tpu.ports import FocoosDetections


class BisenetFormerProcessor(MaskFormerProcessor):
    def preprocess_entries(self, entries, max_instances: int = 100, mask_stride: int = 8):
        # bisenet mask features are stride-8 (FFM on res3)
        return super().preprocess_entries(entries, max_instances, mask_stride)

    def export_postprocess(self, output, inputs, class_names: List[str] = [], **kw) -> List[FocoosDetections]:
        import jax.numpy as jnp

        model_output = MaskFormerModelOutput(
            logits=jnp.asarray(output[0]), masks=jnp.asarray(output[1]), loss=None
        )
        return self.postprocess(model_output, inputs, class_names, **kw)

    def get_output_names(self) -> List[str]:
        return ["logits", "masks"]
