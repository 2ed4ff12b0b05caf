"""Numerical parity check: focoos_tpu FAIDetr vs the reference torch FAIDetr.

Builds the torch reference model (random init), converts its state_dict with
focoos_tpu.utils.torch_convert, runs both on the same input, and compares
outputs. This validates the architecture re-derivation + weight converter
end to end without needing network access to pretrained weights.

Dev-only: imports /root/reference (not shipped; the package itself never
depends on it).

Run: python tools/parity_fai_detr.py
"""

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
                sys.modules[name] = stub


def _fix_specs():
    import importlib.machinery as _mach

    for _n, _m in list(sys.modules.items()):
        if isinstance(_m, types.ModuleType) and getattr(_m, "__spec__", None) is None and "." not in _n[:0]:
            try:
                _m.__spec__ = _mach.ModuleSpec(_n, None)
            except Exception:
                pass


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    sys.path.insert(0, "/root/repo")
    _stub_missing_modules()
    _fix_specs()
    import importlib.metadata as _md

    _orig_version = _md.version
    _md.version = lambda name: "0.25.0" if name == "focoos" else _orig_version(name)
    sys.path.insert(0, "/root/reference")

    import torch

    torch.manual_seed(0)

    from focoos.models.fai_detr.config import DETRConfig as TorchDETRConfig
    from focoos.models.fai_detr.modelling import FAIDetr as TorchFAIDetr
    from focoos.nn.backbone.resnet import ResnetConfig as TorchResnetConfig

    tb = TorchResnetConfig(depth=18, variant="d", freeze_norm=False, use_pretrained=False, pretrained=False)
    tcfg = TorchDETRConfig(
        num_classes=13,
        backbone_config=tb,
        num_queries=50,
        transformer_predictor_dec_layers=3,
    )
    tmodel = TorchFAIDetr(tcfg).eval()
    state = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}

    # --- build jax twin
    from focoos_tpu.models.fai_detr.config import DETRConfig
    from focoos_tpu.models.fai_detr.modelling import FAIDetr
    from focoos_tpu.nn.backbone.resnet import ResNet, ResnetConfig
    from focoos_tpu.utils.checkpoint import merge_compatible
    from focoos_tpu.utils.torch_convert import convert_state_dict

    bcfg = ResnetConfig(depth=18, variant="d", freeze_norm=False, use_pretrained=False)
    cfg = DETRConfig(num_classes=13, backbone_config=bcfg, num_queries=50, transformer_predictor_dec_layers=3)
    module = FAIDetr(config=cfg, backbone=ResNet(config=bcfg))

    import jax.numpy as jnp

    h = w = 256
    x_np = np.random.default_rng(0).integers(0, 255, (2, h, w, 3)).astype(np.float32)
    variables = module.init(jax.random.PRNGKey(0), jnp.asarray(x_np), train=False)

    converted, unmatched = convert_state_dict(state, "fai_detr")
    if unmatched:
        print(f"UNMATCHED torch keys ({len(unmatched)}):")
        for k in unmatched[:20]:
            print("   ", k)

    merged, skipped, missing = merge_compatible(dict(variables), converted)
    if skipped:
        print(f"SHAPE-MISMATCHED ({len(skipped)}):")
        for k in skipped[:20]:
            print("   ", k)
    if missing:
        print(f"MISSING in converted ({len(missing)}):")
        for k in missing[:20]:
            print("   ", k)

    # --- forward both
    out_j, _ = module.apply(merged, jnp.asarray(x_np), train=False)
    boxes_j = np.asarray(out_j.boxes)
    logits_j = np.asarray(out_j.logits)

    with torch.no_grad():
        x_t = torch.from_numpy(x_np.transpose(0, 3, 1, 2))
        out_t = tmodel(x_t)
    boxes_t = out_t.boxes.numpy()
    logits_t = out_t.logits.numpy()

    db = np.abs(boxes_j - boxes_t)
    dl = np.abs(logits_j - logits_t)
    print(f"boxes:  max|Δ|={db.max():.2e} mean|Δ|={db.mean():.2e}")
    print(f"logits: max|Δ|={dl.max():.2e} mean|Δ|={dl.mean():.2e}")
    ok = db.max() < 2e-3 and dl.max() < 2e-3
    print("PARITY:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
