"""Numerical parity harness: focoos_tpu models vs the reference torch models.

Builds the torch reference model (random init), converts its state_dict via
focoos_tpu.utils.torch_convert, runs both on the same input, compares
outputs. Validates architecture re-derivation + weight converter without
needing pretrained downloads. Dev-only (imports /root/reference).

Usage:
    python tools/parity.py fai_detr [resnet|stdc]
    python tools/parity.py fai_cls  [resnet|stdc]
    python tools/parity.py bisenetformer [stdc|resnet]
    python tools/parity.py fai_mf  [resnet|stdc]
    python tools/parity.py rtmo
    python tools/parity.py all
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_torch_backbone_cfg(kind: str):
    if kind == "resnet":
        from focoos.nn.backbone.resnet import ResnetConfig

        return ResnetConfig(depth=18, variant="d", freeze_norm=False, use_pretrained=False, pretrained=False)
    if kind == "stdc":
        from focoos.nn.backbone.stdc import STDCConfig

        return STDCConfig(size="nano", use_pretrained=False)
    if kind == "csp_darknet":
        from focoos.nn.backbone.csp_darknet import CSPConfig

        return CSPConfig(size="small", use_pretrained=False)
    raise ValueError(kind)


def make_jax_backbone(kind: str):
    if kind == "resnet":
        from focoos_tpu.nn.backbone.resnet import ResNet, ResnetConfig

        cfg = ResnetConfig(depth=18, variant="d", freeze_norm=False, use_pretrained=False)
        return cfg, ResNet(config=cfg)
    if kind == "stdc":
        from focoos_tpu.nn.backbone.stdc import STDC, STDCConfig

        cfg = STDCConfig(size="nano", use_pretrained=False)
        return cfg, STDC(config=cfg)
    if kind == "csp_darknet":
        from focoos_tpu.nn.backbone.csp_darknet import CSPConfig, CSPDarknet

        cfg = CSPConfig(size="small", use_pretrained=False)
        return cfg, CSPDarknet(config=cfg)
    raise ValueError(kind)


def compare(name, jax_arr, torch_arr, tol=2e-3):
    d = np.abs(np.asarray(jax_arr) - torch_arr.detach().numpy())
    ok = d.max() < tol
    print(f"  {name}: max|Δ|={d.max():.2e} mean|Δ|={d.mean():.2e} {'OK' if ok else '** MISMATCH **'}")
    return ok


def load_converted(module, family, torch_model, example, extra_rngs=()):
    """init jax module, convert torch weights, merge."""
    import jax
    import jax.numpy as jnp

    from focoos_tpu.utils.checkpoint import merge_compatible
    from focoos_tpu.utils.torch_convert import convert_state_dict

    state = {k: v.detach().numpy() for k, v in torch_model.state_dict().items()}
    variables = module.init(jax.random.PRNGKey(0), jnp.asarray(example), train=False)
    converted, unmatched = convert_state_dict(state, family)
    if unmatched:
        print(f"  UNMATCHED torch keys ({len(unmatched)}):")
        for k in unmatched[:15]:
            print("     ", k)
    merged, skipped, missing = merge_compatible(dict(variables), converted)
    if skipped:
        print(f"  SHAPE-MISMATCH ({len(skipped)}):")
        for k in skipped[:15]:
            print("     ", k)
    if missing:
        print(f"  MISSING ({len(missing)}):")
        for k in missing[:15]:
            print("     ", k)
    return merged, (not unmatched and not skipped and not missing)


def parity_fai_detr(backbone: str) -> bool:
    import torch

    torch.manual_seed(0)
    from focoos.models.fai_detr.config import DETRConfig as TC
    from focoos.models.fai_detr.modelling import FAIDetr as TM

    tcfg = TC(num_classes=13, backbone_config=make_torch_backbone_cfg(backbone), num_queries=50,
              transformer_predictor_dec_layers=3)
    tmodel = TM(tcfg).eval()

    from focoos_tpu.models.fai_detr.config import DETRConfig
    from focoos_tpu.models.fai_detr.modelling import FAIDetr

    bcfg, bmodule = make_jax_backbone(backbone)
    cfg = DETRConfig(num_classes=13, backbone_config=bcfg, num_queries=50, transformer_predictor_dec_layers=3)
    module = FAIDetr(config=cfg, backbone=bmodule)

    import jax.numpy as jnp

    x = np.random.default_rng(0).integers(0, 255, (2, 256, 256, 3)).astype(np.float32)
    merged, clean = load_converted(module, "fai_detr", tmodel, x)
    out_j, _ = module.apply(merged, jnp.asarray(x), train=False)
    with __import__("torch").no_grad():
        out_t = tmodel(__import__("torch").from_numpy(x.transpose(0, 3, 1, 2)))
    ok = compare("boxes", out_j.boxes, out_t.boxes) & compare("logits", out_j.logits, out_t.logits)
    return ok and clean


def parity_fai_cls(backbone: str) -> bool:
    import torch

    torch.manual_seed(0)
    from focoos.models.fai_cls.config import ClassificationConfig as TC
    from focoos.models.fai_cls.modelling import FAIClassification as TM

    tcfg = TC(num_classes=9, backbone_config=make_torch_backbone_cfg(backbone), num_layers=2)
    tmodel = TM(tcfg).eval()

    from focoos_tpu.models.fai_cls.config import ClassificationConfig
    from focoos_tpu.models.fai_cls.modelling import FAIClassification

    bcfg, bmodule = make_jax_backbone(backbone)
    cfg = ClassificationConfig(num_classes=9, backbone_config=bcfg, num_layers=2)
    module = FAIClassification(config=cfg, backbone=bmodule)

    import jax.numpy as jnp

    x = np.random.default_rng(1).integers(0, 255, (2, 224, 224, 3)).astype(np.float32)
    merged, clean = load_converted(module, "fai_cls", tmodel, x)
    out_j, _ = module.apply(merged, jnp.asarray(x), train=False)
    with torch.no_grad():
        xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
        # reference normalizes in the processor; replicate before model call
        mean = torch.tensor(tcfg.pixel_mean).view(1, -1, 1, 1)
        std = torch.tensor(tcfg.pixel_std).view(1, -1, 1, 1)
        out_t = tmodel((xt - mean) / std)
    return compare("logits", out_j.logits, out_t.logits) and clean


def parity_fai_mf(backbone: str) -> bool:
    import torch

    torch.manual_seed(0)
    from focoos.models.fai_mf.config import MaskFormerConfig as TC
    from focoos.models.fai_mf.modelling import FAIMaskFormer as TM

    tcfg = TC(
        num_classes=7,
        backbone_config=make_torch_backbone_cfg(backbone),
        num_queries=20,
        transformer_predictor_dec_layers=4,
        pixel_decoder_transformer_layers=1,
        pixel_decoder_feat_dim=64,
        pixel_decoder_out_dim=64,
        transformer_predictor_hidden_dim=64,
        transformer_predictor_out_dim=64,
    )
    tmodel = TM(tcfg).eval()

    from focoos_tpu.models.fai_mf.config import MaskFormerConfig
    from focoos_tpu.models.fai_mf.modelling import FAIMaskFormer

    bcfg, bmodule = make_jax_backbone(backbone)
    cfg = MaskFormerConfig(
        num_classes=7,
        backbone_config=bcfg,
        num_queries=20,
        transformer_predictor_dec_layers=4,
        pixel_decoder_transformer_layers=1,
        pixel_decoder_feat_dim=64,
        pixel_decoder_out_dim=64,
        transformer_predictor_hidden_dim=64,
        transformer_predictor_out_dim=64,
    )
    module = FAIMaskFormer(config=cfg, backbone=bmodule)

    import jax.numpy as jnp

    x = np.random.default_rng(2).integers(0, 255, (2, 160, 160, 3)).astype(np.float32)
    merged, clean = load_converted(module, "fai_mf", tmodel, x)
    out_j, _ = module.apply(merged, jnp.asarray(x), train=False)
    with torch.no_grad():
        out_t = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    ok = compare("logits", out_j.logits, out_t.logits, tol=5e-3) & compare(
        "masks", out_j.masks, out_t.masks, tol=5e-3
    )
    return ok and clean


def parity_bisenetformer(backbone: str) -> bool:
    import torch

    torch.manual_seed(0)
    from focoos.models.bisenetformer.config import BisenetFormerConfig as TC
    from focoos.models.bisenetformer.modelling import BisenetFormer as TM

    kw = dict(
        num_classes=7,
        num_queries=20,
        transformer_predictor_dec_layers=4,
        pixel_decoder_feat_dim=64,
        pixel_decoder_out_dim=64,
        transformer_predictor_hidden_dim=64,
        transformer_predictor_out_dim=64,
    )
    tmodel = TM(TC(backbone_config=make_torch_backbone_cfg(backbone), **kw)).eval()

    from focoos_tpu.models.bisenetformer.config import BisenetFormerConfig
    from focoos_tpu.models.bisenetformer.modelling import BisenetFormer

    bcfg, bmodule = make_jax_backbone(backbone)
    module = BisenetFormer(config=BisenetFormerConfig(backbone_config=bcfg, **kw), backbone=bmodule)

    import jax.numpy as jnp

    x = np.random.default_rng(3).integers(0, 255, (2, 160, 160, 3)).astype(np.float32)
    merged, clean = load_converted(module, "bisenetformer", tmodel, x)
    out_j, _ = module.apply(merged, jnp.asarray(x), train=False)
    with torch.no_grad():
        out_t = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    ok = compare("logits", out_j.logits, out_t.logits, tol=5e-3) & compare(
        "masks", out_j.masks, out_t.masks, tol=5e-3
    )
    return ok and clean


def parity_rtmo(backbone: str = "csp_darknet") -> bool:
    """Compares raw neck+head outputs (pre-NMS) and the DCC decode — the
    post-NMS pipeline is structurally different (static slots) by design."""
    import torch

    torch.manual_seed(0)
    from focoos.models.rtmo.config import RTMOConfig as TC
    from focoos.models.rtmo.modelling import RTMO as TM

    tcfg = TC(num_classes=1, backbone_config=make_torch_backbone_cfg("csp_darknet"))
    tmodel = TM(tcfg).eval()

    from focoos_tpu.models.rtmo.config import RTMOConfig
    from focoos_tpu.models.rtmo.modelling import RTMO

    bcfg, bmodule = make_jax_backbone("csp_darknet")
    cfg = RTMOConfig(num_classes=1, backbone_config=bcfg)
    module = RTMO(config=cfg, backbone=bmodule)

    import jax.numpy as jnp

    x = np.random.default_rng(4).integers(0, 255, (2, 256, 256, 3)).astype(np.float32)
    merged, clean = load_converted(module, "rtmo", tmodel, x)
    out_j, aux_j = module.apply(merged, jnp.asarray(x), train=False)

    with torch.no_grad():
        xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
        feats = tmodel.backbone(xt)
        ms = tmodel.neck(feats)
        cls_scores, bbox_preds, _, kpt_vis, pose_feats = tmodel.head.head_module(ms)

        def flat(ts, ch):
            return torch.cat([t.permute(0, 2, 3, 1).reshape(t.shape[0], -1, ch) for t in ts], dim=1)

        t_cls = flat(cls_scores, 1)
        t_bbox = flat(bbox_preds, 4)
        t_vis = flat(kpt_vis, tcfg.num_keypoints)
        t_pose = flat(pose_feats, tcfg.pose_vec_channels)

    ok = True
    ok &= compare("cls_scores", aux_j.cls_scores, t_cls, tol=5e-3)
    ok &= compare("bbox_preds", aux_j.bbox_preds, t_bbox, tol=5e-3)
    ok &= compare("kpt_vis", aux_j.kpt_vis, t_vis, tol=5e-3)
    ok &= compare("pose_feats", aux_j.pose_feats, t_pose, tol=5e-3)

    # DCC decode parity on synthetic detections
    from focoos_tpu.models.rtmo.modelling import DCC
    import jax

    rngd = np.random.default_rng(5)
    pf = rngd.normal(size=(6, tcfg.pose_vec_channels)).astype(np.float32)
    boxes = np.abs(rngd.normal(80, 20, (6, 2))).astype(np.float32)
    centers = rngd.uniform(40, 200, (6, 2)).astype(np.float32)
    bbox_cs = np.concatenate([centers, boxes], axis=-1)
    grids = rngd.uniform(0, 250, (6, 2)).astype(np.float32)

    dcc_mod = DCC(cfg)
    dcc_vars = {
        "params": merged["params"]["dcc"],
        "batch_stats": merged["batch_stats"]["dcc"],
    }
    kp_j, _, _ = dcc_mod.apply(dcc_vars, jnp.asarray(pf), jnp.asarray(bbox_cs), jnp.asarray(grids))
    with torch.no_grad():
        kp_t = tmodel.head.dcc.forward_test(
            torch.from_numpy(pf), torch.from_numpy(bbox_cs), torch.from_numpy(grids)
        )
    ok &= compare("dcc_keypoints", kp_j, kp_t, tol=5e-3)
    return ok and clean


def parity_backbone(kind: str) -> bool:
    """Standalone backbone parity (res2..res5 outputs)."""
    import torch

    torch.manual_seed(0)
    if kind == "convnextv2":
        from focoos.nn.backbone.convnextv2 import ConvNeXtV2 as TM, ConvNeXtV2Config as TC

        tcfg = TC(model_size="atto", use_pretrained=False)
        from focoos_tpu.nn.backbone.convnextv2 import ConvNeXtV2 as JM, ConvNeXtV2Config as JC

        jcfg = JC(model_size="atto", use_pretrained=False)
    elif kind == "mobilenet_v2":
        from focoos.nn.backbone.mobilenet_v2 import MobileNetV2 as TM, MobileNetV2Config as TC

        tcfg = TC(use_pretrained=False)
        from focoos_tpu.nn.backbone.mobilenet_v2 import MobileNetV2 as JM, MobileNetV2Config as JC

        jcfg = JC(use_pretrained=False)
    elif kind == "swin":
        from focoos.nn.backbone.swin import Swin as TM, SwinConfig as TC

        tcfg = TC(model_size="tiny", use_pretrained=False, drop_path_rate=0.0)
        from focoos_tpu.nn.backbone.swin import Swin as JM, SwinConfig as JC

        jcfg = JC(model_size="tiny", use_pretrained=False)
    else:
        raise ValueError(kind)

    tmodel = TM(tcfg)
    tmodel.eval()  # reference Swin.train() returns None, so don't chain
    jmodule = JM(config=jcfg)

    import jax
    import jax.numpy as jnp

    from focoos_tpu.utils.checkpoint import merge_compatible
    from focoos_tpu.utils.torch_convert import apply_rules, backbone_rules, expand_mha
    from focoos_tpu.utils.checkpoint import unflatten_tree

    x = np.random.default_rng(7).normal(size=(2, 112, 112, 3)).astype(np.float32)
    variables = jmodule.init(jax.random.PRNGKey(0), jnp.asarray(x))
    state = {f"backbone.{k}": v.detach().numpy() for k, v in tmodel.state_dict().items()}
    flat, unmatched = apply_rules(state, backbone_rules(r"backbone", "backbone"))
    flat = expand_mha(flat)
    # strip the extra 'backbone/' level (standalone module has no wrapper scope)
    flat = {k.replace("/backbone/", "/", 1): v for k, v in flat.items()}
    converted = unflatten_tree(flat)
    if unmatched:
        print(f"  UNMATCHED ({len(unmatched)}):")
        for k in unmatched[:10]:
            print("     ", k)
    merged, skipped, missing = merge_compatible(dict(variables), converted)
    if skipped:
        print(f"  SHAPE-MISMATCH ({len(skipped)}):", skipped[:8])
    if missing:
        print(f"  MISSING ({len(missing)}):", missing[:8])

    out_j = jmodule.apply(merged, jnp.asarray(x))
    with torch.no_grad():
        out_t = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    ok = True
    for k in ("res2", "res3", "res4", "res5"):
        ok &= compare(k, out_j[k], out_t[k].permute(0, 2, 3, 1), tol=5e-3)
    return ok and not unmatched and not skipped and not missing


CHECKS = {
    "backbone": parity_backbone,
    "fai_detr": parity_fai_detr,
    "fai_cls": parity_fai_cls,
    "fai_mf": parity_fai_mf,
    "bisenetformer": parity_bisenetformer,
    "rtmo": parity_rtmo,
}


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import _reference_compat

    _reference_compat.install()

    args = sys.argv[1:] or ["all"]
    if args[0] == "--e2e":
        # end-to-end full-pipeline parity (reference FocoosModel.__call__ vs
        # our FocoosModel.__call__ on identical images + converted weights)
        import parity_e2e

        return parity_e2e.run(args[1] if len(args) > 1 else "all")
    if args[0] == "all":
        todo = [
            ("fai_detr", "resnet"),
            ("fai_detr", "stdc"),
            ("fai_cls", "stdc"),
            ("fai_mf", "resnet"),
            ("bisenetformer", "stdc"),
            ("rtmo", "csp_darknet"),
            ("backbone", "convnextv2"),
            ("backbone", "mobilenet_v2"),
            ("backbone", "swin"),
        ]
    else:
        todo = [(args[0], args[1] if len(args) > 1 else "resnet")]

    failures = []
    for fam, bb in todo:
        print(f"== parity {fam} ({bb})")
        try:
            ok = CHECKS[fam](bb)
        except Exception as e:
            import traceback

            traceback.print_exc()
            ok = False
        if not ok:
            failures.append((fam, bb))
        print(f"   {'PASS' if ok else 'FAIL'}")
    if failures:
        print("FAILED:", failures)
        return 1
    print("ALL PARITY CHECKS PASSED")
    return 0


if __name__ == "__main__":
    sys.exit(main())
