"""fai_detr processor (reference: focoos/models/fai_detr/processor.py).

Decode runs on-device inside jit: flat top-k over Q×C sigmoid scores,
box gather, scale — only [K] scores/labels/boxes leave HBM.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from focoos_tpu.models.fai_detr.config import DETRConfig
from focoos_tpu.models.fai_detr.ports import DETRModelOutput, DETRTargets
from focoos_tpu.ports import DatasetEntry, FocoosDet, FocoosDetections
from focoos_tpu.processor.base_processor import Processor
from focoos_tpu.structures import Boxes, ImageList, Instances


@functools.partial(jax.jit, static_argnames=("top_k",))
def _decode_topk(logits: jnp.ndarray, boxes: jnp.ndarray, top_k: int):
    """[B,Q,C] scores + [B,Q,4] boxes → per-image flat top-k over Q×C
    (reference: fai_detr/processor.py:146-151)."""
    b, q, c = logits.shape
    flat = logits.reshape(b, q * c)
    scores, idx = jax.lax.top_k(flat, min(top_k, q * c))
    labels = idx % c
    qidx = idx // c
    sel = jnp.take_along_axis(boxes, qidx[..., None], axis=1)
    return scores, labels, sel


class DETRProcessor(Processor):
    def __init__(self, config: DETRConfig, image_size: Optional[Union[int, Tuple[int, int]]] = None):
        super().__init__(config, image_size)
        self.top_k = config.top_k
        self.threshold = config.threshold

    # ------------------------------------------------------------------
    def preprocess(self, inputs, dtype=None):
        """Images/DatasetEntries → (NHWC uint8 batch, DETRTargets | None)."""
        if isinstance(inputs, (list, tuple)) and len(inputs) > 0 and isinstance(inputs[0], DatasetEntry):
            return self.preprocess_entries(inputs)
        if self.training:
            raise ValueError("training preprocess expects a list of DatasetEntry")
        return self.get_batch(inputs, self._target_size()), None

    def preprocess_entries(
        self, entries: List[DatasetEntry], max_instances: int = 100
    ) -> Tuple[np.ndarray, Optional[DETRTargets]]:
        """Batch entries and build padded static-shape targets.

        The reference keeps ragged per-image target lists
        (fai_detr/processor.py:81-100); XLA needs static shapes, so targets
        are padded to ``max_instances`` with a validity mask.
        """
        images = ImageList.from_tensors([e.image for e in entries])
        batch = images.tensor.astype(np.uint8, copy=False)
        if not self.training:
            return batch, None
        b = len(entries)
        h, w = batch.shape[1:3]
        labels = np.zeros((b, max_instances), np.int32)
        boxes = np.zeros((b, max_instances, 4), np.float32)
        valid = np.zeros((b, max_instances), bool)
        for i, e in enumerate(entries):
            inst = e.instances
            if inst is None or len(inst) == 0:
                continue
            n = min(len(inst), max_instances)
            bx = inst.boxes.tensor[:n] / np.array([w, h, w, h], np.float32)
            cxcywh = np.concatenate([(bx[:, :2] + bx[:, 2:]) / 2, bx[:, 2:] - bx[:, :2]], axis=1)
            boxes[i, :n] = cxcywh
            labels[i, :n] = inst.classes[:n]
            valid[i, :n] = True
        return batch, DETRTargets(labels=jnp.asarray(labels), boxes=jnp.asarray(boxes), valid=jnp.asarray(valid))

    # ------------------------------------------------------------------
    def postprocess(
        self,
        output: DETRModelOutput,
        inputs,
        class_names: List[str] = [],
        top_k: Optional[int] = None,
        threshold: Optional[float] = None,
    ) -> List[FocoosDetections]:
        top_k = top_k or self.top_k
        threshold = self.threshold if threshold is None else threshold
        image_sizes = self.get_image_sizes(inputs)
        scores, labels, boxes = _decode_topk(output.logits, output.boxes, top_k)
        scores = np.asarray(scores)
        labels = np.asarray(labels)
        boxes = np.asarray(boxes)

        results = []
        for i, (h, w) in enumerate(image_sizes):
            keep = scores[i] > threshold
            bx = boxes[i][keep]
            bx = bx * np.array([w, h, w, h], np.float32)
            bx = np.rint(bx).astype(np.int32)
            results.append(
                FocoosDetections(
                    detections=[
                        FocoosDet(
                            bbox=b_.tolist(),
                            conf=float(s),
                            cls_id=int(l),
                            label=class_names[int(l)] if class_names else None,
                        )
                        for b_, s, l in zip(bx, scores[i][keep], labels[i][keep])
                    ]
                )
            )
        return results

    def eval_postprocess(
        self, output: DETRModelOutput, batched_inputs: List[DatasetEntry], top_k: Optional[int] = None
    ):
        """→ [{"instances": Instances}] scaled to original image size
        (reference: fai_detr/processor.py:121-144)."""
        top_k = top_k or self.top_k
        scores, labels, boxes = _decode_topk(output.logits, output.boxes, top_k)
        scores, labels, boxes = np.asarray(scores), np.asarray(labels), np.asarray(boxes)
        results = []
        for i, entry in enumerate(batched_inputs):
            oh, ow = entry.height or 1, entry.width or 1
            bx = boxes[i] * np.array([ow, oh, ow, oh], np.float32)
            b_obj = Boxes(bx)
            b_obj.clip((oh, ow))
            inst = Instances((oh, ow), boxes=b_obj, scores=scores[i], classes=labels[i])
            inst = inst[b_obj.nonempty()]
            results.append({"instances": inst})
        return results

    def export_postprocess(self, output, inputs, class_names: List[str] = [], **kw) -> List[FocoosDetections]:
        boxes, logits = output[0], output[1]
        model_output = DETRModelOutput(boxes=jnp.asarray(boxes), logits=jnp.asarray(logits), loss=None)
        return self.postprocess(model_output, inputs, class_names, **kw)

    def get_output_names(self) -> List[str]:
        return ["boxes", "logits"]
