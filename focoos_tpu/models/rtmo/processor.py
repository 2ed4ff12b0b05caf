"""rtmo processor (reference: focoos/models/rtmo/processor.py).

The model decodes to static [B, D] arrays on-device; the processor scales
boxes/keypoints back to the original image frame and builds detections.
"""

from __future__ import annotations

from typing import List, Optional, Tuple, Union

import numpy as np

from focoos_tpu.models.rtmo.config import RTMOConfig
from focoos_tpu.models.rtmo.ports import KeypointTargets, RTMOModelOutput
from focoos_tpu.ports import DatasetEntry, FocoosDet, FocoosDetections
from focoos_tpu.processor.base_processor import Processor
from focoos_tpu.structures import Boxes, ImageList, Instances


class RTMOProcessor(Processor):
    # boxes/keypoints come back in the *program's* pixel frame, so a
    # nearest-bucket squash-resize at dispatch would break coordinate scaling
    resize_dispatch_safe = False

    def __init__(self, config: RTMOConfig, image_size: Optional[Union[int, Tuple[int, int]]] = None):
        super().__init__(config, image_size)
        self.threshold = config.score_thr
        self.skeleton = config.skeleton
        self.keypoint_names = config.keypoints

    def preprocess(self, inputs, dtype=None):
        if isinstance(inputs, (list, tuple)) and len(inputs) > 0 and isinstance(inputs[0], DatasetEntry):
            return self.preprocess_entries(inputs)
        if self.training:
            raise ValueError("training preprocess expects a list of DatasetEntry")
        batch = self.get_batch(inputs, self._target_size())
        if self._target_size() is None:
            # pad the raw batch up to 32-divisible so the Focus (space-to-depth)
            # stem and stride-8/16/32 head split evenly
            _, h, w, _ = batch.shape
            ph, pw = (-h) % 32, (-w) % 32
            if ph or pw:
                batch = np.pad(batch, ((0, 0), (0, ph), (0, pw), (0, 0)))
        return batch, None

    def preprocess_entries(self, entries: List[DatasetEntry], max_instances: int = 50):
        import jax.numpy as jnp

        # Pad to 32x: the CSPDarknet Focus stem (space-to-depth) and the
        # stride-8/16/32 head require even splits at every level — odd
        # augmented sizes would break the space-to-depth concat.
        images = ImageList.from_tensors([e.image for e in entries], size_divisibility=32)
        batch = images.tensor.astype(np.uint8, copy=False)
        if not self.training:
            return batch, None
        b = len(entries)
        K = self.config.num_keypoints
        labels = np.zeros((b, max_instances), np.int32)
        boxes = np.zeros((b, max_instances, 4), np.float32)
        kpts = np.zeros((b, max_instances, K, 2), np.float32)
        vis = np.zeros((b, max_instances, K), np.float32)
        areas = np.zeros((b, max_instances), np.float32)
        valid = np.zeros((b, max_instances), bool)
        for i, e in enumerate(entries):
            inst = e.instances
            if inst is None or len(inst) == 0:
                continue
            n = min(len(inst), max_instances)
            boxes[i, :n] = inst.boxes.tensor[:n]
            labels[i, :n] = inst.classes[:n]
            if inst.has("keypoints"):
                kp = inst.keypoints.tensor[:n]
                kpts[i, :n] = kp[..., :2]
                vis[i, :n] = kp[..., 2] > 0
            bw = boxes[i, :n, 2] - boxes[i, :n, 0]
            bh = boxes[i, :n, 3] - boxes[i, :n, 1]
            areas[i, :n] = bw * bh
            valid[i, :n] = True
        return batch, KeypointTargets(
            labels=jnp.asarray(labels),
            boxes=jnp.asarray(boxes),
            keypoints=jnp.asarray(kpts),
            keypoints_visible=jnp.asarray(vis),
            areas=jnp.asarray(areas),
            valid=jnp.asarray(valid),
        )

    # ------------------------------------------------------------------
    def _scaled_arrays(self, output: RTMOModelOutput, input_hw, image_sizes):
        """input_hw=None means the batch was padded, not resized (get_batch with
        no target size): pad regions carry no content so model coordinates are
        already in each image's original pixel frame — no scaling (ADVICE r1:
        scaling by w_i/w_0 here produced wrong coords for mixed-size batches)."""
        scores = np.asarray(output.scores)
        labels = np.asarray(output.labels)
        boxes = np.asarray(output.boxes).copy()
        kpts = np.asarray(output.keypoints).copy()
        kvis = np.asarray(output.keypoints_scores)
        if input_hw is not None:
            ih, iw = input_hw
            for i, (h, w) in enumerate(image_sizes):
                sx, sy = w / iw, h / ih
                boxes[i, :, 0::2] *= sx
                boxes[i, :, 1::2] *= sy
                kpts[i, ..., 0] *= sx
                kpts[i, ..., 1] *= sy
        return scores, labels, boxes, kpts, kvis

    def postprocess(
        self,
        output: RTMOModelOutput,
        inputs,
        class_names: List[str] = [],
        threshold: Optional[float] = None,
        **kw,
    ) -> List[FocoosDetections]:
        threshold = self.threshold if threshold is None else threshold
        image_sizes = self.get_image_sizes(inputs)
        scores, labels, boxes, kpts, kvis = self._scaled_arrays(output, self._target_size(), image_sizes)

        results = []
        for i in range(scores.shape[0]):
            h, w = image_sizes[i]
            keep = scores[i] > threshold
            dets = []
            for s, l, b, kp, kv in zip(
                scores[i][keep], labels[i][keep], boxes[i][keep], kpts[i][keep], kvis[i][keep]
            ):
                # reference int conventions (rtmo/processor.py:183-191):
                # boxes clip to [0, max(h,w)] then TRUNCATE (astype int, not
                # round); keypoint x clips to [0,w], y to [0,h], truncated
                bb = np.clip(b, 0, max(h, w)).astype(int)
                kx = np.clip(kp[:, 0], 0, w).astype(int)
                ky = np.clip(kp[:, 1], 0, h).astype(int)
                dets.append(
                    FocoosDet(
                        bbox=bb.tolist(),
                        conf=float(s),
                        cls_id=int(l),
                        label=class_names[int(l)] if class_names else None,
                        keypoints=[
                            (int(x), int(y), float(v)) for x, y, v in zip(kx, ky, kv)
                        ],
                    )
                )
            results.append(FocoosDetections(detections=dets))
        return results

    def eval_postprocess(self, output: RTMOModelOutput, batched_inputs: List[DatasetEntry], **kw):
        image_sizes = [(e.height or 1, e.width or 1) for e in batched_inputs]
        ts = self._target_size()
        scores = np.asarray(output.scores)
        labels = np.asarray(output.labels)
        boxes = np.asarray(output.boxes).copy()
        kpts = np.asarray(output.keypoints).copy()
        kvis = np.asarray(output.keypoints_scores)
        # per-image input frame: the configured square size, else each entry's
        # own (augmented) image shape — batch padding keeps per-image frames
        for i, (e, (h, w)) in enumerate(zip(batched_inputs, image_sizes)):
            if ts is not None:
                fh, fw = ts
            elif e.image is not None:
                fh, fw = e.image.shape[:2]
            else:
                fh, fw = h, w
            sx, sy = w / fw, h / fh
            boxes[i, :, 0::2] *= sx
            boxes[i, :, 1::2] *= sy
            kpts[i, ..., 0] *= sx
            kpts[i, ..., 1] *= sy
        results = []
        for i, (h, w) in enumerate(image_sizes):
            keep = scores[i] > 0
            b = Boxes(boxes[i][keep])
            b.clip((h, w))
            inst = Instances(
                (h, w),
                boxes=b,
                scores=scores[i][keep],
                classes=labels[i][keep].astype(np.int64),
                keypoints=np.concatenate([kpts[i][keep], kvis[i][keep][..., None]], axis=-1),
            )
            results.append({"instances": inst})
        return results

    def export_postprocess(self, output, inputs, class_names: List[str] = [], **kw) -> List[FocoosDetections]:
        import jax.numpy as jnp

        arr = [jnp.asarray(o) for o in output]
        model_output = RTMOModelOutput(
            scores=arr[0], labels=arr[1], boxes=arr[2], boxes_scores=arr[3],
            keypoints=arr[4], keypoints_scores=arr[5], keypoints_visible=arr[6], loss=None,
        )
        return self.postprocess(model_output, inputs, class_names, **kw)

    def get_output_names(self) -> List[str]:
        return ["scores", "labels", "boxes", "boxes_scores", "keypoints", "keypoints_scores", "keypoints_visible"]
