"""fai_mf processor (reference: focoos/models/fai_mf/processor.py).

Semantic mode: einsum class-probs × masks (or per-pixel argmax). Instance
mode: top-k over Q×C scores, binarized masks, mask-score rescoring, boxes
from masks. Targets are padded to static shapes with masks downsampled to
mask-feature resolution (TPU static-shape design; the criterion
point-samples in normalized coords so resolutions stay consistent).
"""

from __future__ import annotations

from typing import List, Optional, Tuple, Union

import numpy as np

from focoos_tpu.models.fai_mf.config import MaskFormerConfig
from focoos_tpu.models.fai_mf.ports import MaskFormerModelOutput, MaskFormerTargets
from focoos_tpu.ports import DatasetEntry, FocoosDet, FocoosDetections
from focoos_tpu.processor.base_processor import Processor
from focoos_tpu.structures import ImageList, Instances, BitMasks
from focoos_tpu.utils.vision import mask_to_base64_png


def _masks_to_xyxy(masks: np.ndarray) -> np.ndarray:
    """[N, H, W] bool → [N, 4] boxes."""
    boxes = np.zeros((masks.shape[0], 4), np.int32)
    for i, m in enumerate(masks):
        ys, xs = np.nonzero(m)
        if len(xs):
            boxes[i] = [xs.min(), ys.min(), xs.max(), ys.max()]
    return boxes


def _trim_mask(mask: np.ndarray, bbox) -> np.ndarray:
    """Crop a mask to its bbox, EXCLUSIVE of the max row/col — matching the
    reference's ``trim_mask`` (focoos/utils/vision.py:264: ``mask[y1:y2,
    x1:x2]`` on an inclusive-max bbox), verified by e2e pipeline parity."""
    x0, y0, x1, y1 = [int(v) for v in bbox]
    return mask[y0:y1, x0:x1]


def _resize_mask_batch(masks: np.ndarray, size: Tuple[int, int]) -> np.ndarray:
    """[N, H, W] float → bilinear resize to (h, w)."""
    import cv2

    h, w = size
    if masks.shape[1:] == (h, w):
        return masks
    return np.stack([cv2.resize(m.astype(np.float32), (w, h), interpolation=cv2.INTER_LINEAR) for m in masks]) if len(masks) else masks.reshape(0, h, w)


def _device_semantic_argmax(logits, masks):
    """On-device semantic label map: einsum bqc,bqhw→bchw + argmax → int32.

    jitted per (shape, dtype) — the eval loop reuses one batch shape so this
    compiles once. Inputs are the model's eval outputs (softmaxed class probs,
    sigmoided masks), same operands the host ``semantic_inference`` consumes.
    """
    import jax

    global _DEVICE_SEM_ARGMAX
    if _DEVICE_SEM_ARGMAX is None:
        import jax.numpy as jnp

        def fn(lg, mk):
            sem = jnp.einsum("bqc,bqhw->bchw", lg.astype(jnp.float32), mk.astype(jnp.float32))
            am = jnp.argmax(sem, axis=1)
            # uint8 label map when it fits (ADE=150 classes): 4x less D2H
            return am.astype(jnp.uint8 if lg.shape[-1] <= 255 else jnp.int32)

        _DEVICE_SEM_ARGMAX = jax.jit(fn)
    return _DEVICE_SEM_ARGMAX(logits, masks)


_DEVICE_SEM_ARGMAX = None
_DEVICE_INST_DECODE = {}


def _device_instance_decode(logits, masks, top_k: int, mask_threshold: float):
    """On-device instance decode for eval (VERDICT r3 next #5).

    Runs flat top-k over [Q·C] class probs, gathers the k masks, computes the
    mask-score rescoring, binarizes (SAME order as the reference: after the
    model's bilinear upsample to input resolution — fai_mf/processor.py:107-141)
    and BIT-PACKS the binary masks. Only (scores, labels, packed bits) leave
    the device: 1 bit/pixel instead of the bf16 [B, Q, H, W] stack — a 16-32x
    D2H reduction, which dominated instance-seg eval wall time.
    Returns (scores [B,K], labels [B,K] int32, packed [B,K,ceil(HW/8)] uint8,
    boxes [B,K,4] f32 xyxy at input resolution — BitMasks.get_bounding_boxes
    semantics: [xmin, ymin, xmax+1, ymax+1], zeros for empty masks; computing
    them here removes the 0.27 s/img host `np.nonzero` loop that dominated
    instance-seg eval).
    """
    import jax

    key = (int(top_k), float(mask_threshold), logits.shape, masks.shape)
    if key not in _DEVICE_INST_DECODE:
        import jax.numpy as jnp

        def fn(lg, mk):
            b, q, c = lg.shape
            flat = lg.astype(jnp.float32).reshape(b, q * c)
            scores, idx = jax.lax.top_k(flat, min(top_k, q * c))
            labels = (idx % c).astype(jnp.int32)
            qidx = idx // c
            mp = jax.vmap(lambda m, qi: m[qi])(mk.astype(jnp.float32), qidx)  # [b,k,h,w]
            binm = mp > mask_threshold
            small = binm.astype(jnp.float32) * 1e-3
            k = mp.shape[1]
            num = (small.reshape(b, k, -1) * mp.reshape(b, k, -1)).sum(-1)
            den = small.reshape(b, k, -1).sum(-1) + 1e-6
            packed = jnp.packbits(binm.reshape(b, k, -1), axis=-1)
            h, w = binm.shape[-2:]
            any_y = jnp.any(binm, axis=3)  # [b,k,h]
            any_x = jnp.any(binm, axis=2)  # [b,k,w]
            x1 = jnp.argmax(any_x, axis=-1)
            x2 = w - jnp.argmax(any_x[..., ::-1], axis=-1)  # last true + 1
            y1 = jnp.argmax(any_y, axis=-1)
            y2 = h - jnp.argmax(any_y[..., ::-1], axis=-1)
            nonempty = jnp.any(any_x, axis=-1)
            boxes = jnp.stack([x1, y1, x2, y2], -1).astype(jnp.float32) * nonempty[..., None]
            return scores * (num / den), labels, packed, boxes

        _DEVICE_INST_DECODE[key] = jax.jit(fn)
    return _DEVICE_INST_DECODE[key](logits, masks)


class MaskFormerProcessor(Processor):
    def __init__(self, config: MaskFormerConfig, image_size: Optional[Union[int, Tuple[int, int]]] = None):
        super().__init__(config, image_size)
        self.num_classes = config.num_classes
        self.top_k = config.top_k
        self.threshold = config.threshold
        self.mask_threshold = config.mask_threshold
        self.use_mask_score = config.use_mask_score
        self.predict_all_pixels = config.predict_all_pixels
        self.postprocessing_type = config.postprocessing_type

    # ------------------------------------------------------------------
    def preprocess(self, inputs, dtype=None):
        if isinstance(inputs, (list, tuple)) and len(inputs) > 0 and isinstance(inputs[0], DatasetEntry):
            return self.preprocess_entries(inputs)
        if self.training:
            raise ValueError("training preprocess expects a list of DatasetEntry")
        # mask models process inputs at NATIVE resolution — the reference
        # deliberately does not apply image_size at inference
        # (fai_mf/processor.py:94 "we are not using image_size input";
        # bisenetformer/processor.py:90 likewise). Verified by e2e pipeline
        # parity. Fixed-shape serving still goes through export buckets.
        return self.get_batch(inputs, None), None

    def preprocess_entries(self, entries: List[DatasetEntry], max_instances: int = 100, mask_stride: int = 4):
        import jax.numpy as jnp

        images = ImageList.from_tensors([e.image for e in entries])
        batch = images.tensor.astype(np.uint8, copy=False)
        if not self.training:
            return batch, None
        b = len(entries)
        h, w = batch.shape[1:3]
        # conv stride chains produce ceil(h/stride) maps (padded convs)
        hm, wm = -(-h // mask_stride), -(-w // mask_stride)
        labels = np.zeros((b, max_instances), np.int32)
        masks = np.zeros((b, max_instances, hm, wm), np.float32)
        valid = np.zeros((b, max_instances), bool)
        import cv2

        for i, e in enumerate(entries):
            inst = e.instances
            if inst is None or len(inst) == 0:
                continue
            n = min(len(inst), max_instances)
            gt = inst.masks.tensor[:n] if hasattr(inst, "masks") else None
            if gt is None:
                continue
            for j in range(n):
                mj = np.zeros((h, w), np.uint8)
                gj = gt[j].astype(np.uint8)
                mj[: gj.shape[0], : gj.shape[1]] = gj
                masks[i, j] = cv2.resize(mj.astype(np.float32), (wm, hm), interpolation=cv2.INTER_LINEAR)
            labels[i, :n] = inst.classes[:n]
            valid[i, :n] = True
        return batch, MaskFormerTargets(
            labels=jnp.asarray(labels), masks=jnp.asarray(masks), valid=jnp.asarray(valid)
        )

    # ------------------------------------------------------------------
    def semantic_inference(self, cls_probs: np.ndarray, masks: np.ndarray) -> np.ndarray:
        """einsum qc,qhw→chw (reference: fai_mf/processor.py:99-106)."""
        return np.einsum("qc,qhw->chw", cls_probs, masks)

    def instance_inference(self, cls_probs: np.ndarray, masks: np.ndarray) -> Instances:
        """top-k + mask-score rescoring + bbox-from-mask (reference :107-141)."""
        image_size = masks.shape[-2:]
        flat = cls_probs.reshape(-1)
        k = min(self.top_k, flat.size)
        topk = np.argpartition(-flat, k - 1)[:k]
        scores = flat[topk]
        labels = topk % self.num_classes
        qidx = topk // self.num_classes
        mp = masks[qidx]
        binm = mp > self.mask_threshold
        small = binm * 1e-3
        mask_scores = (small.reshape(k, -1) * mp.reshape(k, -1)).sum(1) / (small.reshape(k, -1).sum(1) + 1e-6)
        inst = Instances(
            image_size,
            boxes=BitMasks(binm).get_bounding_boxes(),
            masks=BitMasks(binm),
            scores=scores * mask_scores,
            classes=labels.astype(np.int64),
        )
        return inst

    def panoptic_inference(
        self,
        cls_probs: np.ndarray,   # [Q, C] softmax class probabilities (no void column)
        masks: np.ndarray,       # [Q, H, W] mask probabilities
        thing_ids: Optional[set] = None,
        object_threshold: float = 0.8,
        overlap_threshold: float = 0.8,
        label_divisor: int = 1000,
    ) -> Tuple[np.ndarray, List[dict]]:
        """Combine queries into a panoptic id map (Mask2Former semantics; the
        reference declares the "panoptic" postprocessing option in
        fai_mf/config.py:41 but never implements it — this completes it).

        Returns (pan_map [H, W] int32 with ids ``cls * label_divisor + inst``
        and 0 = void — the encoding PanopticEvaluator consumes — and a
        segments_info list of {id, category_id, isthing, area}).
        """
        thing_ids = thing_ids or set()
        scores = cls_probs.max(-1)
        labels = cls_probs.argmax(-1)
        keep = scores > object_threshold
        h, w = masks.shape[-2:]
        pan = np.zeros((h, w), np.int32)
        segments: List[dict] = []
        if not keep.any():
            return pan, segments

        cur_scores = scores[keep]
        cur_labels = labels[keep]
        cur_masks = masks[keep]
        # each pixel goes to the query with the highest score-weighted mask prob
        mask_ids = (cur_scores[:, None, None] * cur_masks).argmax(0)
        stuff_segment_by_class: dict = {}
        inst_counter: dict = {}
        for k in range(cur_masks.shape[0]):
            cls = int(cur_labels[k])
            orig = cur_masks[k] >= 0.5
            won = (mask_ids == k) & orig
            orig_area = int(orig.sum())
            area = int(won.sum())
            if area == 0 or orig_area == 0 or area / orig_area < overlap_threshold:
                continue
            isthing = cls in thing_ids
            if not isthing and cls in stuff_segment_by_class:
                # merge stuff fragments of the same class into one segment
                seg_id = stuff_segment_by_class[cls]
                pan[won] = seg_id
                for s in segments:
                    if s["id"] == seg_id:
                        s["area"] += area
                continue
            inst = inst_counter.get(cls, 0) + 1
            inst_counter[cls] = inst
            seg_id = cls * label_divisor + inst
            pan[won] = seg_id
            if not isthing:
                stuff_segment_by_class[cls] = seg_id
            segments.append({"id": int(seg_id), "category_id": cls, "isthing": isthing, "area": area})
        return pan, segments

    def eval_postprocess(self, output: MaskFormerModelOutput, batched_inputs: List[DatasetEntry], **kw):
        import os

        if self.postprocessing_type == "semantic" and not os.environ.get("FOCOOS_SEMSEG_EVAL_HOST"):
            # Device path (default): the qc,qhw->chw projection + per-pixel
            # argmax run on device and only an int32 [B, H, W] label map is
            # fetched (~13 MB/batch at 640² instead of the [B, Q, H, W] float
            # mask stack — measured 0.19 → 3 orders faster over the tunnel).
            # The einsum commutes with the spatial crop (it is per-pixel) and
            # with bilinear resize (both linear), so the only semantics change
            # vs the host path is argmax-then-NEAREST-resize to the GT shape
            # (done by SemSegEvaluator.process) instead of bilinear-resize-
            # then-argmax — boundary-pixel-only deltas. Set
            # FOCOOS_SEMSEG_EVAL_HOST=1 for the exact legacy path (reference
            # semantics: focoos/models/fai_mf/processor.py:142-167).
            pred_maps = np.asarray(_device_semantic_argmax(output.logits, output.masks))
            results = []
            for i, entry in enumerate(batched_inputs):
                size = entry.image.shape[:2] if entry.image is not None else pred_maps.shape[-2:]
                results.append({"sem_seg": pred_maps[i][: size[0], : size[1]]})
            return results

        if self.postprocessing_type != "semantic" and not os.environ.get("FOCOOS_INSTSEG_EVAL_HOST"):
            # Device path (default): top-k + mask-score + binarize run on
            # device; only bit-packed binary masks are fetched (1 bit/px vs a
            # bf16 [B, Q, H, W] stack ≈ 16-32x less D2H — the dominant eval
            # cost). Semantics delta vs the host path: binarize happens at
            # model input resolution (reference order: model bilinear-upsample
            # THEN threshold — same order here) and the resize to the original
            # image size is NEAREST on the binary mask instead of bilinear on
            # floats — boundary-pixel-only deltas, same class as the semseg
            # device argmax path above. FOCOOS_INSTSEG_EVAL_HOST=1 restores
            # the exact legacy path (reference: fai_mf/processor.py:107-141).
            import cv2

            from focoos_tpu.structures import BitMasks, Instances

            h_in, w_in = output.masks.shape[-2:]
            scores_d, labels_d, packed_dev, boxes_d = _device_instance_decode(
                output.logits, output.masks, self.top_k, self.mask_threshold
            )
            scores_d = np.asarray(scores_d)
            labels_d = np.asarray(labels_d)
            boxes_d = np.asarray(boxes_d)

            def _exact(entry):
                size = entry.image.shape[:2] if entry.image is not None else (h_in, w_in)
                hw = (entry.height or size[0], entry.width or size[1])
                return (size[0], size[1]) == (h_in, w_in) == hw

            if all(_exact(e) for e in batched_inputs) and not os.environ.get("FOCOOS_INSTSEG_EVAL_FETCH"):
                # no crop/resize anywhere in the batch: the dt masks stay ON
                # DEVICE as packed bits (5.1 MB/img never crosses D2H); the
                # evaluator computes the dt×gt IoU matrix on device and
                # fetches only [K, G] floats (ops/mask_iou.py). Device boxes
                # carry the same get_bounding_boxes convention.
                from focoos_tpu.structures import Boxes

                results = []
                for i, entry in enumerate(batched_inputs):
                    inst = Instances(
                        (h_in, w_in), boxes=Boxes(boxes_d[i]),
                        scores=scores_d[i], classes=labels_d[i].astype(np.int64),
                        masks_packed=packed_dev[i],
                    )
                    inst._masks_packed_hw = (h_in, w_in)
                    results.append({"instances": inst})
                return results

            packed_d = np.asarray(packed_dev)
            results = []
            for i, entry in enumerate(batched_inputs):
                size = entry.image.shape[:2] if entry.image is not None else (h_in, w_in)
                height, width = entry.height or size[0], entry.width or size[1]
                k = packed_d.shape[1]
                binm = np.unpackbits(packed_d[i], axis=-1, count=h_in * w_in).reshape(k, h_in, w_in)
                exact = (size[0], size[1]) == (h_in, w_in) == (height, width)
                binm = binm[:, : size[0], : size[1]]
                if (size[0], size[1]) != (height, width):
                    binm = np.stack([
                        cv2.resize(m, (width, height), interpolation=cv2.INTER_NEAREST) for m in binm
                    ]) if k else binm.reshape(0, height, width)
                binm = binm.astype(bool)
                bm = BitMasks(binm)
                # device boxes are exact (same [xmin,ymin,xmax+1,ymax+1]
                # convention) only when no crop/resize intervened; otherwise
                # the host recomputes them from the transformed masks
                from focoos_tpu.structures import Boxes

                boxes = Boxes(boxes_d[i]) if exact else bm.get_bounding_boxes()
                inst = Instances(
                    (height, width), boxes=boxes, masks=bm,
                    scores=scores_d[i], classes=labels_d[i].astype(np.int64),
                )
                results.append({"instances": inst})
            return results

        cls_pred = np.asarray(output.logits)
        mask_pred = np.asarray(output.masks)
        results = []
        for i, entry in enumerate(batched_inputs):
            size = entry.image.shape[:2] if entry.image is not None else mask_pred.shape[-2:]
            height, width = entry.height or size[0], entry.width or size[1]
            mp = mask_pred[i][:, : size[0], : size[1]]
            mp = _resize_mask_batch(mp, (height, width))
            if self.postprocessing_type == "semantic":
                results.append({"sem_seg": self.semantic_inference(cls_pred[i], mp)})
            else:
                results.append({"instances": self.instance_inference(cls_pred[i], mp)})
        return results

    def postprocess(
        self,
        output: MaskFormerModelOutput,
        inputs,
        class_names: List[str] = [],
        top_k: Optional[int] = None,
        threshold: Optional[float] = None,
        use_mask_score: Optional[bool] = None,
        predict_all_pixels: Optional[bool] = None,
        **kw,
    ) -> List[FocoosDetections]:
        threshold = self.threshold if threshold is None else threshold
        use_mask_score = self.use_mask_score if use_mask_score is None else use_mask_score
        predict_all_pixels = self.predict_all_pixels if predict_all_pixels is None else predict_all_pixels

        image_sizes = self.get_image_sizes(inputs)
        cls_pred = np.asarray(output.logits)  # [B, Q, C] probs
        mask_pred = np.asarray(output.masks)  # [B, Q, H, W] probs

        scores_all = cls_pred.max(-1)
        labels_all = cls_pred.argmax(-1)

        results = []
        for i, (h, w) in enumerate(image_sizes):
            scores, labels, mp = scores_all[i], labels_all[i], mask_pred[i]
            if predict_all_pixels:
                weighted = scores[:, None, None] * mp
                assign = weighted.argmax(0)  # [H, W]
                q = mp.shape[0]
                binm = assign[None] == np.arange(q)[:, None, None]
            else:
                binm = mp >= self.mask_threshold

            keep = binm.sum((-2, -1)) > 1
            scores, labels, binm, mp = scores[keep], labels[keep], binm[keep], mp[keep]

            if use_mask_score and len(scores):
                small = binm.astype(np.float32) * 1e-3
                ms = (small * mp).sum((-2, -1)) / (small.sum((-2, -1)) + 1e-5)
                scores = scores * ms
            if threshold > 0:
                keep = scores > threshold
                scores, labels, binm = scores[keep], labels[keep], binm[keep]

            dets = []
            if len(scores):
                # reference semantics (fai_mf/processor.py:282): the binary
                # mask is bilinearly interpolated to the original size then
                # ``.bool()``-ed — i.e. any nonzero interpolated value is
                # foreground (> 0, not > 0.5)
                resized = _resize_mask_batch(binm.astype(np.float32), (h, w)) > 0
                boxes = _masks_to_xyxy(resized)
                for bx, s, l, m in zip(boxes.tolist(), scores.tolist(), labels.tolist(), resized):
                    dets.append(
                        FocoosDet(
                            bbox=bx,
                            conf=float(s),
                            cls_id=int(l),
                            mask=mask_to_base64_png(_trim_mask(m, bx)),
                            label=class_names[int(l)] if class_names else None,
                        )
                    )
            results.append(FocoosDetections(detections=dets))
        return results

    def export_postprocess(self, output, inputs, class_names: List[str] = [], **kw) -> List[FocoosDetections]:
        import jax.numpy as jnp

        model_output = MaskFormerModelOutput(
            masks=jnp.asarray(output[0]), logits=jnp.asarray(output[1]), loss=None
        )
        return self.postprocess(model_output, inputs, class_names, **kw)

    def get_output_names(self) -> List[str]:
        return ["masks", "logits"]
