"""End-to-end cross-framework pipeline parity: full reference
``FocoosModel.__call__`` (preprocess → torch forward → postprocess,
/root/reference/focoos/models/focoos_model.py:575-621) vs our
``FocoosModel.__call__`` on the SAME uint8 images with the SAME converted
weights (random init — the converter makes them identical).

This covers the seams module-level parity (tools/parity.py) cannot:
float-bilinear squash resize (reference get_torch_batch F.interpolate vs our
float cv2 resize), normalization inside the model, threshold semantics, the
int32 box rounding (reference fai_detr/processor.py:197), mask binarize +
crop + base64 encoding, and RTMO coordinate rescaling. The reference's
`torchvision.ops.nms` is monkeypatched with the verified-equivalent greedy
suppression from tools/_reference_compat.py (torchvision is not installed in
this image) — documented seam.

Usage:  python tools/parity.py --e2e [family|all]
"""

from __future__ import annotations

import base64
import sys

import numpy as np


def _decode_mask(b64: str) -> np.ndarray:
    import cv2

    buf = np.frombuffer(base64.b64decode(b64), np.uint8)
    return cv2.imdecode(buf, cv2.IMREAD_GRAYSCALE) > 127


def compare_detections(
    tag: str,
    ref,
    tpu,
    score_tol: float = 1e-4,
    box_tol: float = 1.0,
    mask_frac_tol: float = 2e-3,
    kpt_tol: float = 1.0,
) -> bool:
    """Compare two FocoosDetections (reference dataclass vs ours)."""
    rd, td = list(ref.detections), list(tpu.detections)
    ok = True
    if len(rd) != len(td):
        print(f"  {tag}: COUNT mismatch ref={len(rd)} tpu={len(td)}")
        rs = sorted((round(d.conf, 3), d.cls_id) for d in rd)
        ts = sorted((round(d.conf, 3), d.cls_id) for d in td)
        print(f"    ref: {rs[:12]}")
        print(f"    tpu: {ts[:12]}")
        return False

    # pair ref↔tpu detections by optimal assignment instead of a sort: many
    # random-init detections have near-equal confidences, and a 1e-7 score
    # delta can swap a sort order, mispairing otherwise-identical boxes.
    # A class mismatch within a matched pair is tolerated ONLY when both
    # confidences agree to ``tie_tol`` — a genuinely ambiguous argmax over
    # near-uniform random-init logits, not a pipeline difference.
    from scipy.optimize import linear_sum_assignment

    tie_tol = 3e-4
    cost = np.zeros((len(rd), len(td)))
    for i_, r in enumerate(rd):
        for j_, t in enumerate(td):
            cost[i_, j_] = (
                abs((r.conf or 0) - (t.conf or 0))
                + 1e-3 * float(np.abs(np.array(r.bbox or [0] * 4) - np.array(t.bbox or [0] * 4)).sum())
                + (0.0 if r.cls_id == t.cls_id else 1e-2)
            )
    ri, ci = linear_sum_assignment(cost)
    pairs = [(rd[a], td[b]) for a, b in zip(ri, ci)]

    ties = 0
    max_ds, max_db, max_dm, max_dk = 0.0, 0.0, 0.0, 0.0
    for r, t in pairs:
        if r.cls_id != t.cls_id:
            if abs((r.conf or 0) - (t.conf or 0)) <= tie_tol:
                ties += 1
                continue
            print(f"  {tag}: cls mismatch {r.cls_id} vs {t.cls_id} (conf {r.conf:.4f}/{t.conf:.4f})")
            ok = False
            continue
        max_ds = max(max_ds, abs((r.conf or 0) - (t.conf or 0)))
        if r.bbox is not None and t.bbox is not None:
            max_db = max(max_db, float(np.abs(np.array(r.bbox) - np.array(t.bbox)).max()))
        if r.mask is not None and t.mask is not None:
            rm, tm = _decode_mask(r.mask), _decode_mask(t.mask)
            if rm.shape != tm.shape:
                print(f"  {tag}: mask shape {rm.shape} vs {tm.shape}")
                ok = False
            else:
                max_dm = max(max_dm, float((rm != tm).mean()))
        elif (r.mask is None) != (t.mask is None):
            print(f"  {tag}: mask presence mismatch")
            ok = False
        if r.keypoints is not None and t.keypoints is not None:
            rk = np.asarray(r.keypoints, np.float64)
            tk = np.asarray(t.keypoints, np.float64)
            if rk.shape == tk.shape:
                max_dk = max(max_dk, float(np.abs(rk[:, :2] - tk[:, :2]).max()))
            else:
                print(f"  {tag}: keypoints shape {rk.shape} vs {tk.shape}")
                ok = False
    ok &= max_ds <= score_tol and max_db <= box_tol and max_dm <= mask_frac_tol and max_dk <= kpt_tol
    tie_str = f" ties={ties}" if ties else ""
    print(
        f"  {tag}: n={len(rd)} max|Δscore|={max_ds:.2e} max|Δbox|={max_db:.1f}px "
        f"mask_diff={max_dm:.2e} max|Δkpt|={max_dk:.1f}px{tie_str} {'OK' if ok else '** MISMATCH **'}"
    )
    return ok


def _images(target: int, seed: int = 0, structured: bool = False):
    """Same uint8 images for both pipelines: one at the model's target size
    (uint8 fast path), two non-square sizes exercising the float resize.

    ``structured=True`` builds coarse-block images (upsampled low-res noise +
    fine noise) instead of pure per-pixel noise: convolutions smooth white
    noise into spatially near-CONSTANT feature statistics, which makes every
    anchor's score a near-tie — structured content gives anchors distinct
    scores so order-sensitive decodes (NMS) are stable."""
    import cv2

    rng = np.random.default_rng(seed)
    sizes = [(target, target), (target - 57, target + 38), (target + 61, target - 49)]
    out = []
    for h, w in sizes:
        if structured:
            coarse = rng.uniform(0, 255, (7, 7, 3)).astype(np.float32)
            img = cv2.resize(coarse, (w, h), interpolation=cv2.INTER_LINEAR)
            img = img + rng.normal(0, 16, (h, w, 3))
            out.append(np.clip(img, 0, 255).astype(np.uint8))
        else:
            out.append(rng.integers(0, 255, (h, w, 3)).astype(np.uint8))
    return out


def _build_ref_focoos_model(tmodel, family: str, task, num_classes: int, im_size, tcfg):
    from focoos.models.focoos_model import FocoosModel as RefFocoosModel
    from focoos.ports import ModelFamily as RefFamily, ModelInfo as RefModelInfo

    info = RefModelInfo(
        name=f"e2e-{family}",
        model_family=RefFamily(family),
        classes=[f"c{i}" for i in range(num_classes)],
        im_size=im_size,
        task=task,
        config=tcfg,
    )
    return RefFocoosModel(tmodel, info)


def _build_tpu_focoos_model(module, variables, family: str, task, num_classes: int, im_size, cfg):
    from focoos_tpu.models.focoos_model import FocoosModel
    from focoos_tpu.ports import ModelFamily, ModelInfo

    info = ModelInfo(
        name=f"e2e-{family}",
        model_family=ModelFamily(family),
        classes=[f"c{i}" for i in range(num_classes)],
        im_size=im_size,
        task=task,
        config={},
    )
    return FocoosModel(module, cfg, info, variables=variables)


def _pair_outputs(ref_fm, tpu_fm, images, **kw):
    for i, img in enumerate(images):
        ref_det = ref_fm(img, **kw)
        tpu_det = tpu_fm([img], **kw)[0]
        yield i, img, ref_det, tpu_det


def e2e_fai_detr(backbone: str = "resnet") -> bool:
    import torch

    from parity import load_converted, make_jax_backbone, make_torch_backbone_cfg

    torch.manual_seed(0)
    from focoos.models.fai_detr.config import DETRConfig as TC
    from focoos.models.fai_detr.modelling import FAIDetr as TM
    from focoos.ports import Task as RefTask

    tcfg = TC(num_classes=13, backbone_config=make_torch_backbone_cfg(backbone),
              num_queries=50, transformer_predictor_dec_layers=3)
    tmodel = TM(tcfg).eval()
    ref_fm = _build_ref_focoos_model(tmodel, "fai_detr", RefTask.DETECTION, 13, 256, tcfg)

    from focoos_tpu.models.fai_detr.config import DETRConfig
    from focoos_tpu.models.fai_detr.modelling import FAIDetr
    from focoos_tpu.ports import Task

    bcfg, bmodule = make_jax_backbone(backbone)
    cfg = DETRConfig(num_classes=13, backbone_config=bcfg, num_queries=50,
                     transformer_predictor_dec_layers=3)
    module = FAIDetr(config=cfg, backbone=bmodule)
    x = np.zeros((1, 256, 256, 3), np.float32)
    merged, clean = load_converted(module, "fai_detr", tmodel, x)
    tpu_fm = _build_tpu_focoos_model(module, merged, "fai_detr", Task.DETECTION, 13, 256, cfg)

    ok = clean
    for i, img, rdet, tdet in _pair_outputs(ref_fm, tpu_fm, _images(256), threshold=0.005):
        # random-init DETR class bias is prior-prob (~0.01 scores); 0.005 keeps
        # a stable, non-trivial detection set on both sides
        ok &= compare_detections(f"img{i} {img.shape[:2]}", rdet, tdet)
    return ok


def e2e_fai_cls(backbone: str = "stdc") -> bool:
    import torch

    from parity import load_converted, make_jax_backbone, make_torch_backbone_cfg

    torch.manual_seed(0)
    from focoos.models.fai_cls.config import ClassificationConfig as TC
    from focoos.models.fai_cls.modelling import FAIClassification as TM
    from focoos.ports import Task as RefTask

    tcfg = TC(num_classes=9, backbone_config=make_torch_backbone_cfg(backbone), num_layers=2)
    tmodel = TM(tcfg).eval()
    ref_fm = _build_ref_focoos_model(tmodel, "fai_cls", RefTask.CLASSIFICATION, 9, 224, tcfg)

    from focoos_tpu.models.fai_cls.config import ClassificationConfig
    from focoos_tpu.models.fai_cls.modelling import FAIClassification
    from focoos_tpu.ports import Task

    bcfg, bmodule = make_jax_backbone(backbone)
    cfg = ClassificationConfig(num_classes=9, backbone_config=bcfg, num_layers=2)
    module = FAIClassification(config=cfg, backbone=bmodule)
    x = np.zeros((1, 224, 224, 3), np.float32)
    merged, clean = load_converted(module, "fai_cls", tmodel, x)
    tpu_fm = _build_tpu_focoos_model(module, merged, "fai_cls", Task.CLASSIFICATION, 9, 224, cfg)

    ok = clean
    for i, img, rdet, tdet in _pair_outputs(ref_fm, tpu_fm, _images(224), threshold=0.3):
        ok &= compare_detections(f"img{i} {img.shape[:2]}", rdet, tdet)
    return ok


def _mf_like(family: str, backbone: str, postprocessing_type: str, **post_kw) -> bool:
    import torch

    from parity import load_converted, make_jax_backbone, make_torch_backbone_cfg

    torch.manual_seed(0)
    if family == "fai_mf":
        from focoos.models.fai_mf.config import MaskFormerConfig as TC
        from focoos.models.fai_mf.modelling import FAIMaskFormer as TM

        from focoos_tpu.models.fai_mf.config import MaskFormerConfig as JC
        from focoos_tpu.models.fai_mf.modelling import FAIMaskFormer as JM

        kw = dict(num_classes=7, num_queries=20, transformer_predictor_dec_layers=4,
                  pixel_decoder_transformer_layers=1, pixel_decoder_feat_dim=64,
                  pixel_decoder_out_dim=64, transformer_predictor_hidden_dim=64,
                  transformer_predictor_out_dim=64, postprocessing_type=postprocessing_type)
    else:
        from focoos.models.bisenetformer.config import BisenetFormerConfig as TC
        from focoos.models.bisenetformer.modelling import BisenetFormer as TM

        from focoos_tpu.models.bisenetformer.config import BisenetFormerConfig as JC
        from focoos_tpu.models.bisenetformer.modelling import BisenetFormer as JM

        kw = dict(num_classes=7, num_queries=20, transformer_predictor_dec_layers=4,
                  pixel_decoder_feat_dim=64, pixel_decoder_out_dim=64,
                  transformer_predictor_hidden_dim=64, transformer_predictor_out_dim=64)

    from focoos.ports import Task as RefTask

    from focoos_tpu.ports import Task

    task_ref = RefTask.INSTANCE_SEGMENTATION if postprocessing_type == "instance" else RefTask.SEMSEG
    task_tpu = Task.INSTANCE_SEGMENTATION if postprocessing_type == "instance" else Task.SEMSEG

    tcfg = TC(backbone_config=make_torch_backbone_cfg(backbone), **kw)
    tmodel = TM(tcfg).eval()
    # random-init class logits are near-uniform (argmax ties) and random-init
    # mask logits hover at exactly the 0.5 binarize threshold (pixel-flip
    # ties), so the postprocess is tie-sensitive to 1e-6 noise; widen both
    # logit spreads by scaling the classifier + mask-embed weights (BEFORE
    # conversion, so both frameworks share the scaled weights) — a
    # test-stability device, not a semantic change
    with torch.no_grad():
        for name, p in tmodel.named_parameters():
            if "classifier" in name or "mask_embed" in name:
                p.mul_(6.0)
    ref_fm = _build_ref_focoos_model(tmodel, family, task_ref, 7, 160, tcfg)

    bcfg, bmodule = make_jax_backbone(backbone)
    cfg = JC(backbone_config=bcfg, **kw)
    module = JM(config=cfg, backbone=bmodule)
    x = np.zeros((1, 160, 160, 3), np.float32)
    merged, clean = load_converted(module, family, tmodel, x)
    tpu_fm = _build_tpu_focoos_model(module, merged, family, task_tpu, 7, 160, cfg)

    ok = clean
    for i, img, rdet, tdet in _pair_outputs(ref_fm, tpu_fm, _images(160), **post_kw):
        # mask-score rescoring divides by tiny binarized sums — scores are
        # extremely tie-sensitive at random init; boxes come from binarized
        # masks so a single-pixel flip moves a box edge
        ok &= compare_detections(f"img{i} {img.shape[:2]}", rdet, tdet,
                                 score_tol=5e-4, box_tol=2.0, mask_frac_tol=5e-3)
    return ok


def e2e_fai_mf(backbone: str = "resnet") -> bool:
    return _mf_like("fai_mf", backbone, "instance", threshold=0.1)


def e2e_bisenetformer(backbone: str = "stdc") -> bool:
    return _mf_like("bisenetformer", backbone, "semantic", threshold=0.1, predict_all_pixels=True)


def e2e_rtmo(backbone: str = "csp_darknet") -> bool:
    import torch

    from parity import load_converted, make_jax_backbone, make_torch_backbone_cfg

    torch.manual_seed(0)
    from focoos.models.rtmo.config import RTMOConfig as TC
    from focoos.models.rtmo.modelling import RTMO as TM
    from focoos.ports import Task as RefTask

    tcfg = TC(num_classes=1, backbone_config=make_torch_backbone_cfg("csp_darknet"))
    tmodel = TM(tcfg).eval()
    # a deep random-init conv stack CONTRACTS spatial variation: the features
    # feeding out_cls are constant across anchors to ~1e-7, so every anchor
    # score is a near-tie and NMS selection order is noise. Amplify the
    # out_cls weights hard (x500) to stretch that residual variation into
    # distinct per-anchor scores, then recenter the bias with a probe forward
    # so the sigmoid stays unsaturated. Both frameworks share the adjusted
    # weights (done BEFORE conversion) — a test-stability device only.
    probe = _images(256, structured=True)[0]
    with torch.no_grad():
        for name, p in tmodel.named_parameters():
            if "out_cls" in name and name.endswith("weight"):
                p.mul_(500.0)
            # diversify box sizes too: at random init every anchor decodes a
            # near-identical box, putting whole grids of pairwise IoUs exactly
            # at the 0.65 NMS threshold where 1e-6 noise flips suppression
            if "out_bbox" in name:
                p.mul_(6.0)
        out = tmodel(torch.from_numpy(probe.transpose(2, 0, 1))[None].float())
        s = out.scores[0].clamp(1e-6, 1 - 1e-6)
        mean_logit = float(torch.log(s / (1 - s)).mean())
        for name, p in tmodel.named_parameters():
            if "out_cls" in name and name.endswith("bias"):
                p.sub_(mean_logit)
    ref_fm = _build_ref_focoos_model(tmodel, "rtmo", RefTask.KEYPOINT, 1, 256, tcfg)

    from focoos_tpu.models.rtmo.config import RTMOConfig
    from focoos_tpu.models.rtmo.modelling import RTMO
    from focoos_tpu.ports import Task

    bcfg, bmodule = make_jax_backbone("csp_darknet")
    cfg = RTMOConfig(num_classes=1, backbone_config=bcfg)
    module = RTMO(config=cfg, backbone=bmodule)
    x = np.zeros((1, 256, 256, 3), np.float32)
    merged, clean = load_converted(module, "rtmo", tmodel, x)
    tpu_fm = _build_tpu_focoos_model(module, merged, "rtmo", Task.KEYPOINT, 1, 256, cfg)

    ok = clean
    # our decode is a fixed-slot top-K (static shapes for XLA): it returns the
    # K highest-scoring post-NMS detections, while the reference returns a
    # ragged full list. Parity contract: our detections == the reference's
    # top-K by score. Compare the top 50 (well inside our 100 slots and the
    # reference's NMS-kept set) sorted by confidence.
    topn = 50
    for i, img, rdet, tdet in _pair_outputs(ref_fm, tpu_fm, _images(256, structured=True), threshold=0.3):
        rtop = sorted(rdet.detections, key=lambda d: -(d.conf or 0))[: topn + 20]
        ttop = sorted(tdet.detections, key=lambda d: -(d.conf or 0))[: topn + 20]
        # cut at a clear score GAP, not a fixed rank: a fixed cut can land
        # inside a group of equal-score anchors where each framework keeps a
        # different (equally valid) member
        k = topn
        while k > 1 and abs(rtop[k - 1].conf - rtop[k].conf) < 1e-5:
            k -= 1
        rdet.detections, tdet.detections = rtop[:k], ttop[:k]
        ok &= compare_detections(f"img{i} {img.shape[:2]} top{k}", rdet, tdet,
                                 score_tol=5e-4, box_tol=1.5, kpt_tol=1.5)
    return ok


E2E_CHECKS = {
    "fai_detr": e2e_fai_detr,
    "fai_cls": e2e_fai_cls,
    "fai_mf": e2e_fai_mf,
    "bisenetformer": e2e_bisenetformer,
    "rtmo": e2e_rtmo,
}


def run(which: str = "all") -> int:
    todo = list(E2E_CHECKS) if which == "all" else [which]
    failures = []
    for fam in todo:
        print(f"== e2e pipeline parity {fam}")
        try:
            ok = E2E_CHECKS[fam]()
        except Exception:
            import traceback

            traceback.print_exc()
            ok = False
        if not ok:
            failures.append(fam)
        print(f"   {'PASS' if ok else 'FAIL'}")
    if failures:
        print("E2E FAILED:", failures)
        return 1
    print("ALL E2E PIPELINE PARITY CHECKS PASSED")
    return 0


if __name__ == "__main__":
    import os

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import jax

    jax.config.update("jax_platforms", "cpu")
    import _reference_compat

    _reference_compat.install()
    sys.exit(run(sys.argv[1] if len(sys.argv) > 1 else "all"))
