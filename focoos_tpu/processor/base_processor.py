"""Processor protocol: model-family-specific pre/post-processing.

TPU re-design of the reference processor layer
(focoos/processor/base_processor.py:55-296): preprocessing produces a
*static-shape* NHWC uint8 batch (host-side cv2 resize — cheap at 640² — with
normalization fused into the model's traced graph); postprocessing splits
into a jit-compiled on-device decode (top-k / argmax — only final
detections leave HBM) plus a host loop that builds ``FocoosDetections``.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple, Union

import numpy as np

from focoos_tpu.ports import DatasetEntry, FocoosDetections, ModelConfig

ImageInput = Union[np.ndarray, "Image.Image", Sequence[Any]]  # noqa: F821


def _to_numpy_rgb(img) -> np.ndarray:
    """PIL / ndarray → HWC uint8 RGB."""
    from PIL import Image

    if isinstance(img, Image.Image):
        return np.asarray(img.convert("RGB"))
    arr = np.asarray(img)
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, axis=-1)
    if arr.shape[-1] == 4:
        arr = arr[..., :3]
    return arr


class Processor:
    """Abstract family processor (reference: focoos/processor/base_processor.py:55)."""

    # True when export outputs are resolution-independent (normalized [0,1]
    # coords like DETR boxes, or masks whose postprocess reads the actual
    # array shape) — only then may a serialized-program runtime squash-resize
    # an odd-size input to the nearest shape bucket. Pixel-frame outputs
    # (RTMO boxes/keypoints) set this False and require an exact-shape
    # program match (ADVICE r2 low).
    resize_dispatch_safe: bool = True

    def __init__(self, config: ModelConfig, image_size: Optional[Union[int, Tuple[int, int]]] = None):
        self.config = config
        self.image_size = image_size
        self.training = False

    def train(self, training: bool = True) -> "Processor":
        self.training = training
        return self

    def eval(self) -> "Processor":
        return self.train(False)

    # ------------------------------------------------------------------
    def get_image_sizes(self, inputs) -> List[Tuple[int, int]]:
        """(h, w) per input image (reference: base_processor.py:176)."""
        if isinstance(inputs, (list, tuple)):
            return [_to_numpy_rgb(x).shape[:2] for x in inputs]
        arr = _to_numpy_rgb(inputs)
        if arr.ndim == 4:
            return [tuple(arr.shape[1:3])] * arr.shape[0]
        return [tuple(arr.shape[:2])]

    def get_batch(
        self,
        inputs,
        target_size: Optional[Tuple[int, int]] = None,
    ) -> np.ndarray:
        """Images → NHWC batch, squash-resized to ``target_size``
        (reference: base_processor.py:223 get_torch_batch).

        Inputs already at target size pass through as uint8 (cast to float
        happens on device — the serving fast path). Inputs that need resizing
        are resized in **float32** with bilinear half-pixel sampling, exactly
        like the reference's ``F.interpolate(..., mode="bilinear",
        align_corners=False)`` on the dtype-converted tensor — so the model
        sees the same non-integer pixel values as the torch pipeline (e2e
        parity; a uint8-rounded resize costs ~0.2% input noise)."""
        import cv2

        if not isinstance(inputs, (list, tuple)):
            arr = np.asarray(inputs) if not hasattr(inputs, "convert") else None
            if arr is not None and arr.ndim == 4:
                imgs = [arr[i] for i in range(arr.shape[0])]
            else:
                imgs = [inputs]
        else:
            imgs = list(inputs)
        imgs = [_to_numpy_rgb(im) for im in imgs]
        if target_size is not None:
            th, tw = target_size
            if all(im.shape[:2] == (th, tw) for im in imgs):
                return np.stack(imgs).astype(np.uint8)
            imgs = [
                im.astype(np.float32)
                if im.shape[:2] == (th, tw)
                else cv2.resize(im.astype(np.float32), (tw, th), interpolation=cv2.INTER_LINEAR)
                for im in imgs
            ]
            return np.stack(imgs)
        h = max(im.shape[0] for im in imgs)
        w = max(im.shape[1] for im in imgs)
        imgs = [np.pad(im, ((0, h - im.shape[0]), (0, w - im.shape[1]), (0, 0))) for im in imgs]
        return np.stack(imgs).astype(np.uint8)

    def _target_size(self) -> Optional[Tuple[int, int]]:
        if self.image_size is None:
            return None
        if isinstance(self.image_size, int):
            return (self.image_size, self.image_size)
        return tuple(self.image_size)  # type: ignore[return-value]

    # ------------------------------------------------------------------
    # family-specific hooks
    def preprocess(self, inputs, dtype=None):
        raise NotImplementedError

    def postprocess(self, output, inputs, class_names: List[str] = [], **kw) -> List[FocoosDetections]:
        raise NotImplementedError

    def eval_postprocess(self, output, batched_inputs: List[DatasetEntry], **kw):
        raise NotImplementedError

    def export_postprocess(self, output, inputs, class_names: List[str] = [], **kw) -> List[FocoosDetections]:
        raise NotImplementedError

    def get_output_names(self) -> List[str]:
        """Names of exported output arrays (analog of ONNX dynamic-axes IO names)."""
        raise NotImplementedError
