"""fai_cls processor (reference: focoos/models/fai_cls/processor.py)."""

from __future__ import annotations

from typing import List, Optional, Tuple, Union

import jax
import numpy as np

from focoos_tpu.models.fai_cls.config import ClassificationConfig
from focoos_tpu.models.fai_cls.ports import ClassificationModelOutput, ClassificationTargets
from focoos_tpu.ports import DatasetEntry, FocoosDet, FocoosDetections
from focoos_tpu.processor.base_processor import Processor
from focoos_tpu.structures import ImageList


def _sigmoid(x: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-x))


class ClassificationProcessor(Processor):
    def __init__(self, config: ClassificationConfig, image_size: Optional[Union[int, Tuple[int, int]]] = None):
        super().__init__(config, image_size or config.resolution)
        self.num_classes = config.num_classes
        self.threshold = config.threshold

    def preprocess(self, inputs, dtype=None):
        if isinstance(inputs, (list, tuple)) and len(inputs) > 0 and isinstance(inputs[0], DatasetEntry):
            entries: List[DatasetEntry] = inputs
            images = ImageList.from_tensors([e.image for e in entries])
            labels = np.zeros((len(entries), self.num_classes), np.float32)
            for i, e in enumerate(entries):
                if e.label is not None:
                    labels[i, e.label] = 1.0
            import jax.numpy as jnp

            return images.tensor.astype(np.uint8, copy=False), ClassificationTargets(labels=jnp.asarray(labels))
        if self.training:
            raise ValueError("training preprocess expects a list of DatasetEntry")
        return self.get_batch(inputs, self._target_size()), None

    def preprocess_entries(self, entries, max_instances: int = 0):
        """Loader entry point (max_instances is unused for classification)."""
        return self.preprocess(entries)

    def postprocess(
        self,
        output: ClassificationModelOutput,
        inputs,
        class_names: List[str] = [],
        threshold: Optional[float] = None,
        **kw,
    ) -> List[FocoosDetections]:
        threshold = self.threshold if threshold is None else threshold
        probs = _sigmoid(np.asarray(output.logits))
        results = []
        for p in probs:
            keep = np.nonzero(p > threshold)[0]
            results.append(
                FocoosDetections(
                    detections=[
                        FocoosDet(
                            conf=float(p[c]),
                            cls_id=int(c),
                            label=class_names[int(c)] if class_names and int(c) < len(class_names) else None,
                        )
                        for c in keep
                    ]
                )
            )
        return results

    def eval_postprocess(self, output: ClassificationModelOutput, batched_inputs: List[DatasetEntry], **kw):
        probs = _sigmoid(np.asarray(output.logits))
        return [{"logits": p} for p in probs]

    def export_postprocess(self, output, inputs, class_names: List[str] = [], **kw) -> List[FocoosDetections]:
        import jax.numpy as jnp

        model_output = ClassificationModelOutput(logits=jnp.asarray(output[0]), loss=None)
        return self.postprocess(model_output, inputs, class_names, **kw)

    def get_output_names(self) -> List[str]:
        return ["logits"]
