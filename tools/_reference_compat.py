"""Import-compat shims to load the reference torch package in this image.

The reference depends on packages absent here (pydantic_settings, pycocotools,
torchvision, fvcore, orjson, supervision, ...). These stubs provide just
enough surface to import and run the reference *model* code for parity
testing. Dev-only."""

import sys
import types

import numpy as np


def _stub_missing_modules():
    # the reference imports pydantic_settings / supervision etc. that are not
    # in this image; stub just enough to import the model code.
    if "pydantic_settings" not in sys.modules:
        m = types.ModuleType("pydantic_settings")

        class BaseSettings:  # noqa
            def __init__(self, **kw):
                pass

        class SettingsConfigDict(dict):  # noqa
            pass

        m.BaseSettings = BaseSettings
        m.SettingsConfigDict = SettingsConfigDict
        sys.modules["pydantic_settings"] = m
    if "pycocotools" not in sys.modules:
        pkg = types.ModuleType("pycocotools")
        mask = types.ModuleType("pycocotools.mask")

        def _unavailable(*a, **k):
            raise RuntimeError("pycocotools stub")

        for fn in ("encode", "decode", "frPyObjects", "area", "toBbox", "merge", "iou"):
            setattr(mask, fn, _unavailable)
        pkg.mask = mask
        sys.modules["pycocotools"] = pkg
        sys.modules["pycocotools.mask"] = mask
    if "torchvision.ops.boxes" not in sys.modules:
        import torch as _torch

        tob = types.ModuleType("torchvision.ops.boxes")

        def box_area(boxes):
            return (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])

        def nms(boxes, scores, iou_threshold):
            order = scores.argsort(descending=True)
            keep = []
            while order.numel() > 0:
                i = order[0].item()
                keep.append(i)
                if order.numel() == 1:
                    break
                rest = order[1:]
                lt = _torch.maximum(boxes[i, :2], boxes[rest, :2])
                rb = _torch.minimum(boxes[i, 2:], boxes[rest, 2:])
                wh = (rb - lt).clamp(min=0)
                inter = wh[:, 0] * wh[:, 1]
                iou = inter / (box_area(boxes[i : i + 1]) + box_area(boxes[rest]) - inter)
                order = rest[iou <= iou_threshold]
            return _torch.tensor(keep, dtype=_torch.long)

        tob.box_area = box_area
        tob.nms = nms
        sys.modules["torchvision.ops.boxes"] = tob
    if "fvcore" not in sys.modules:
        fv = types.ModuleType("fvcore")
        fvt = types.ModuleType("fvcore.transforms")
        fvtt = types.ModuleType("fvcore.transforms.transform")

        import numpy as _np

        # Functional minimal fvcore: enough faithful behavior for the
        # reference's mappers/augmentations to EXECUTE for parity harnesses.
        # Defaults mirror real fvcore: apply_box via the 4 corners through
        # apply_coords, apply_polygons via apply_coords per polygon,
        # TransformList composing in order.
        class Transform:
            def apply_image(self, img):
                return img

            def apply_coords(self, coords):
                return coords

            def apply_box(self, box):
                idx = _np.array([(0, 1), (2, 1), (0, 3), (2, 3)]).flatten()
                coords = _np.asarray(box, dtype=_np.float64).reshape(-1, 4)[:, idx].reshape(-1, 2)
                coords = self.apply_coords(coords).reshape((-1, 4, 2))
                minxy = coords.min(axis=1)
                maxxy = coords.max(axis=1)
                return _np.concatenate((minxy, maxxy), axis=1)

            def apply_polygons(self, polygons):
                return [self.apply_coords(_np.asarray(p, dtype=_np.float64).reshape(-1, 2)) for p in polygons]

            def apply_segmentation(self, seg):
                return seg

            def inverse(self):
                return self

            @classmethod
            def register_type(cls, data_type, func=None):
                def deco(f):
                    return f

                return deco if func is None else None

        class TransformList(Transform):
            def __init__(self, transforms):
                flat = []
                for t in transforms:
                    flat.extend(t.transforms if isinstance(t, TransformList) else [t])
                self.transforms = flat

            def _apply(self, x, meth):
                for t in self.transforms:
                    x = getattr(t, meth)(x)
                return x

            def apply_image(self, img):
                return self._apply(img, "apply_image")

            def apply_coords(self, coords):
                return self._apply(coords, "apply_coords")

            def apply_box(self, box):
                return self._apply(box, "apply_box")

            def apply_polygons(self, polygons):
                return self._apply(polygons, "apply_polygons")

            def apply_segmentation(self, seg):
                return self._apply(seg, "apply_segmentation")

            def __add__(self, other):
                return TransformList([self, other])

            def __iadd__(self, other):
                return TransformList([self, other])

        class NoOpTransform(Transform):
            def __getattr__(self, name):
                if name.startswith("apply_"):
                    return lambda x: x
                raise AttributeError(name)

        class HFlipTransform(Transform):
            def __init__(self, width):
                self.width = width

            def apply_image(self, img):
                return _np.flip(img, axis=1)

            def apply_coords(self, coords):
                coords = _np.asarray(coords, dtype=_np.float64).copy()
                coords[:, 0] = self.width - coords[:, 0]
                return coords

        class VFlipTransform(Transform):
            def __init__(self, height):
                self.height = height

            def apply_image(self, img):
                return _np.flip(img, axis=0)

            def apply_coords(self, coords):
                coords = _np.asarray(coords, dtype=_np.float64).copy()
                coords[:, 1] = self.height - coords[:, 1]
                return coords

        class CropTransform(Transform):
            def __init__(self, x0, y0, w, h, orig_w=None, orig_h=None):
                self.x0, self.y0, self.w, self.h = x0, y0, w, h
                self.orig_w, self.orig_h = orig_w, orig_h

            def apply_image(self, img):
                return img[self.y0:self.y0 + self.h, self.x0:self.x0 + self.w]

            def apply_coords(self, coords):
                coords = _np.asarray(coords, dtype=_np.float64).copy()
                coords[:, 0] -= self.x0
                coords[:, 1] -= self.y0
                return coords

        class PadTransform(Transform):
            def __init__(self, x0=0, y0=0, x1=0, y1=0, orig_w=None, orig_h=None, pad_value=0, seg_pad_value=0):
                self.x0, self.y0, self.x1, self.y1 = x0, y0, x1, y1
                self.pad_value, self.seg_pad_value = pad_value, seg_pad_value

            def apply_image(self, img):
                pads = [(self.y0, self.y1), (self.x0, self.x1)] + [(0, 0)] * (img.ndim - 2)
                return _np.pad(img, pads, constant_values=self.pad_value)

            def apply_segmentation(self, seg):
                pads = [(self.y0, self.y1), (self.x0, self.x1)] + [(0, 0)] * (seg.ndim - 2)
                return _np.pad(seg, pads, constant_values=self.seg_pad_value)

            def apply_coords(self, coords):
                coords = _np.asarray(coords, dtype=_np.float64).copy()
                coords[:, 0] += self.x0
                coords[:, 1] += self.y0
                return coords

        class BlendTransform(Transform):
            def __init__(self, src_image, src_weight, dst_weight):
                self.src_image, self.src_weight, self.dst_weight = src_image, src_weight, dst_weight

            def apply_image(self, img):
                if img.dtype == _np.uint8:
                    img = img.astype(_np.float32)
                    out = self.src_weight * self.src_image + self.dst_weight * img
                    return _np.clip(out, 0, 255).astype(_np.uint8)
                return self.src_weight * self.src_image + self.dst_weight * img

        class ScaleTransform(Transform):
            def __init__(self, *a, **k):
                pass

        for nm, cls_ in (("BlendTransform", BlendTransform), ("CropTransform", CropTransform),
                         ("HFlipTransform", HFlipTransform), ("NoOpTransform", NoOpTransform),
                         ("PadTransform", PadTransform), ("VFlipTransform", VFlipTransform),
                         ("ScaleTransform", ScaleTransform)):
            setattr(fvtt, nm, cls_)
        fvtt.Transform = Transform
        fvtt.TransformList = TransformList
        fv.transforms = fvt
        fvt.transform = fvtt
        sys.modules["fvcore"] = fv
        sys.modules["fvcore.transforms"] = fvt
        sys.modules["fvcore.transforms.transform"] = fvtt
    if "orjson" not in sys.modules:
        import json as _json

        m = types.ModuleType("orjson")
        m.loads = _json.loads
        m.dumps = lambda obj, **kw: _json.dumps(obj).encode()
        m.OPT_INDENT_2 = 0
        m.OPT_SERIALIZE_NUMPY = 0
        sys.modules["orjson"] = m
    for name in (
        "supervision",
        "gradio",
        "typer",
        "onnxruntime",
        "torchvision",
        "torchvision.io",
        "torchvision.io.image",
        "torchvision.ops",
        "torchvision.transforms",
        "torchvision.transforms.functional",
    ):
        if name not in sys.modules:
            try:
                __import__(name)
            except ImportError:
                from unittest.mock import MagicMock

                stub = types.ModuleType(name)

                def _getattr(attr, _n=name):
                    if attr.startswith("__"):
                        raise AttributeError(attr)
                    return MagicMock(name=f"{_n}.{attr}")

                stub.__getattr__ = _getattr
                if name == "torchvision":
                    # MagicMock here is truthy, sending the reference's
                    # nested_tensor_from_tensor_list into its ONNX branch
                    stub._is_tracing = lambda: False
                sys.modules[name] = stub


def _fix_specs():
    import importlib.machinery as _mach

    for _n, _m in list(sys.modules.items()):
        if isinstance(_m, types.ModuleType) and getattr(_m, "__spec__", None) is None and "." not in _n[:0]:
            try:
                _m.__spec__ = _mach.ModuleSpec(_n, None)
            except Exception:
                pass




def install():
    _stub_missing_modules()
    _fix_specs()
    # the reference rtmo model does `from torchvision.ops import nms`
    # (models/rtmo/modelling.py:14); expose the real (pure-torch) NMS from the
    # boxes shim on the torchvision.ops stub so rtmo e2e parity runs the true
    # suppression instead of a MagicMock. This is the documented
    # "monkeypatched NMS" seam: the replacement is the verified-equivalent
    # greedy IoU suppression above.
    if "torchvision.ops" in sys.modules and "torchvision.ops.boxes" in sys.modules:
        ops = sys.modules["torchvision.ops"]
        boxes_mod = sys.modules["torchvision.ops.boxes"]
        ops.nms = boxes_mod.nms
        ops.boxes = boxes_mod
    import importlib.metadata as _md

    _orig_version = _md.version
    _md.version = lambda name: "0.25.0" if name == "focoos" else _orig_version(name)
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
