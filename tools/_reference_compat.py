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

        class Transform:
            def apply_image(self, img):
                return img

            def apply_coords(self, coords):
                return coords

            def apply_box(self, box):
                return box

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
                self.transforms = transforms

        for nm in ("BlendTransform", "CropTransform", "HFlipTransform", "NoOpTransform", "PadTransform",
                   "VFlipTransform", "ScaleTransform", "ResizeTransform"):
            setattr(fvtt, nm, type(nm, (Transform,), {"__init__": lambda self, *a, **k: None}))
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
