"""Training-LOSS parity: focoos_tpu criterions vs the reference torch criterions.

Complements tools/parity.py (module forwards) and tools/parity_e2e.py
(inference pipelines): this runs the same converted weights + the same batch
+ the same targets through BOTH frameworks' full training losses
(matcher → per-layer criterion → weighting → normalization) and asserts the
weighted loss components agree. It is the training-side slice of the
dataset-accuracy-parity story that is provable offline: if the forward, the
matching, the loss math, and the normalization all agree, fine-tuning departs
from the reference only through optimizer/init seeds.

Per family:
  fai_detr       — VFL + L1 + GIoU, Hungarian (scipy) vs auction matching,
                   deep supervision incl. encoder layer
                   (reference: focoos/models/fai_detr/modelling.py:409-612)
  fai_cls        — BCE/CE logits loss (focoos/models/fai_cls/modelling.py)
  fai_mf /
  bisenetformer  — CE + dice + sigmoid-CE mask losses with POINT SAMPLING:
                   the reference samples mask points with torch RNG
                   (get_uncertain_point_coords_with_randomness); for parity
                   both sides are pinned to the deterministic regime
                   importance_sample_ratio=1 (pure uncertainty top-k)
                   (reference: focoos/models/fai_mf/loss.py)
  rtmo           — SimOTA assignment + OKS/IoU/cls losses
                   (reference: focoos/models/rtmo/loss.py)

Comparison scheme: last-layer components by key; aux layers as a SORTED
multiset per loss type (the two frameworks suffix aux layers differently);
plus the weighted grand total.

Usage: python tools/parity_loss.py [fai_detr|fai_cls|fai_mf|bisenetformer|rtmo|all]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parity import load_converted, make_jax_backbone, make_torch_backbone_cfg  # noqa: E402

TOL = 5e-4


def _cmp_scalar(name, j, t, tol=TOL):
    j, t = float(j), float(t)
    d = abs(j - t)
    rel = d / max(abs(t), 1e-6)
    ok = d < tol or rel < tol
    print(f"  {name}: jax={j:.6f} torch={t:.6f} |Δ|={d:.2e} {'OK' if ok else '** MISMATCH **'}")
    return ok


def _cmp_groups(jax_losses: dict, torch_losses: dict, types) -> bool:
    """Compare last-layer keys exactly; aux layers as sorted multisets."""
    ok = True
    jtot = sum(float(v) for v in jax_losses.values())
    ttot = sum(float(v) for v in torch_losses.values())
    ok &= _cmp_scalar("total(all weighted terms)", jtot, ttot, tol=2e-3)
    for t in types:
        ok &= _cmp_scalar(t, jax_losses[t], torch_losses[t])
        jaux = sorted(float(v) for k, v in jax_losses.items() if k.startswith(t + "_"))
        taux = sorted(float(v) for k, v in torch_losses.items() if k.startswith(t + "_"))
        if len(jaux) != len(taux):
            print(f"  {t}_aux: count mismatch jax={len(jaux)} torch={len(taux)} ** MISMATCH **")
            ok = False
            continue
        for i, (a, b) in enumerate(zip(jaux, taux)):
            ok &= _cmp_scalar(f"{t}_aux[{i}] (sorted)", a, b)
    return ok


def _ragged_targets_detr(rng, b, n, num_classes):
    """Same targets in both formats: ragged torch list / padded jax struct."""
    import torch

    from focoos_tpu.models.fai_detr.ports import DETRTargets as JT

    counts = rng.integers(1, n + 1, b)
    labels = rng.integers(0, num_classes, (b, n)).astype(np.int32)
    cxy = rng.uniform(0.25, 0.75, (b, n, 2))
    wh = rng.uniform(0.1, 0.4, (b, n, 2))
    boxes = np.concatenate([cxy, wh], -1).astype(np.float32)
    valid = np.arange(n)[None] < counts[:, None]

    from focoos.models.fai_detr.ports import DETRTargets as TT

    tt = [
        TT(labels=torch.from_numpy(labels[i, : counts[i]]).long(),
           boxes=torch.from_numpy(boxes[i, : counts[i]]))
        for i in range(b)
    ]
    import jax.numpy as jnp

    jt = JT(labels=jnp.asarray(labels), boxes=jnp.asarray(boxes), valid=jnp.asarray(valid))
    return tt, jt


def loss_parity_fai_detr(backbone: str = "resnet") -> bool:
    import torch

    torch.manual_seed(0)
    from focoos.models.fai_detr.config import DETRConfig as TC
    from focoos.models.fai_detr.modelling import FAIDetr as TM

    tcfg = TC(num_classes=13, backbone_config=make_torch_backbone_cfg(backbone), num_queries=50,
              transformer_predictor_dec_layers=3)
    tmodel = TM(tcfg).train()

    from focoos_tpu.models.fai_detr.config import DETRConfig
    from focoos_tpu.models.fai_detr.loss import detr_criterion
    from focoos_tpu.models.fai_detr.modelling import FAIDetr

    bcfg, bmodule = make_jax_backbone(backbone)
    cfg = DETRConfig(num_classes=13, backbone_config=bcfg, num_queries=50, transformer_predictor_dec_layers=3)
    module = FAIDetr(config=cfg, backbone=bmodule)

    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    x = rng.integers(0, 255, (2, 128, 128, 3)).astype(np.float32)
    merged, clean = load_converted(module, "fai_detr", tmodel, x)

    tt, jt = _ragged_targets_detr(rng, 2, 6, 13)

    with torch.no_grad():
        out_t = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2)), tt)
    torch_losses = {k: float(v) for k, v in out_t.loss.items()}

    (_, aux), _ = module.apply(merged, jnp.asarray(x), train=True, mutable=["batch_stats"])
    jax_losses = {k: float(v) for k, v in detr_criterion(aux, jt, cfg).items() if k != "total"}

    return _cmp_groups(jax_losses, torch_losses, ["loss_vfl", "loss_bbox", "loss_giou"]) and clean


def loss_parity_fai_cls(backbone: str = "resnet", grads: bool = False) -> bool:
    import torch

    torch.manual_seed(0)
    from focoos.models.fai_cls.config import ClassificationConfig as TC
    from focoos.models.fai_cls.modelling import FAIClassification as TM

    # dropout is stochastic in torch train mode — pin it off on both sides
    tcfg = TC(num_classes=9, backbone_config=make_torch_backbone_cfg(backbone), dropout_rate=0.0)
    tmodel = TM(tcfg).train()

    from focoos_tpu.models.fai_cls.config import ClassificationConfig
    from focoos_tpu.models.fai_cls.loss import classification_loss
    from focoos_tpu.models.fai_cls.modelling import FAIClassification
    from focoos_tpu.models.fai_cls.ports import ClassificationTargets

    bcfg, bmodule = make_jax_backbone(backbone)
    cfg = ClassificationConfig(num_classes=9, backbone_config=bcfg, dropout_rate=0.0)
    module = FAIClassification(config=cfg, backbone=bmodule)

    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    x = rng.integers(0, 255, (4, 96, 96, 3)).astype(np.float32)
    merged, clean = load_converted(module, "fai_cls", tmodel, x)

    onehot = np.eye(9, dtype=np.float32)[rng.integers(0, 9, (4,))]
    from focoos.models.fai_cls.ports import ClassificationTargets as TT

    tt = [TT(labels=torch.from_numpy(onehot[i])) for i in range(4)]

    with torch.no_grad():
        xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
        # reference normalizes in the processor; replicate before model call
        mean = torch.tensor(tcfg.pixel_mean).view(1, -1, 1, 1)
        std = torch.tensor(tcfg.pixel_std).view(1, -1, 1, 1)
        out_t = tmodel((xt - mean) / std, tt)
    torch_losses = {k: float(v) for k, v in out_t.loss.items()}

    (out_j, _), _ = module.apply(
        merged, jnp.asarray(x), train=True, mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(0)}
    )
    jt = ClassificationTargets(labels=jnp.asarray(onehot))
    jl = classification_loss(out_j.logits, jt, cfg)
    jax_losses = {k: float(v) for k, v in jl.items() if k != "total"}

    ok = True
    for k in torch_losses:
        ok &= _cmp_scalar(k, jax_losses.get(k, float("nan")), torch_losses[k])

    if grads:
        out_g = tmodel((torch.from_numpy(x.transpose(0, 3, 1, 2)) - mean) / std, tt)
        sum(out_g.loss.values()).backward()
        tgrads = {k: (p.grad.detach().numpy() if p.grad is not None else np.zeros(p.shape, np.float32))
                  for k, p in tmodel.named_parameters()}
        from focoos_tpu.utils.torch_convert import convert_state_dict

        gconv, _ = convert_state_dict(tgrads, "fai_cls", verbose=False)

        def total_loss(params):
            vars_ = {"params": params, "batch_stats": merged["batch_stats"]}
            (oj, _), _ = module.apply(vars_, jnp.asarray(x), train=True, mutable=["batch_stats"],
                                      rngs={"dropout": jax.random.PRNGKey(0)})
            return classification_loss(oj.logits, jt, cfg)["loss_cls"]

        jgrads = jax.grad(total_loss)(merged["params"])
        ok &= _compare_grad_trees(gconv.get("params", {}), jgrads)

    return ok and clean


def _point_grid(p: int):
    """Deterministic sqrt(p)×sqrt(p) grid of (x, y) centers in (0, 1)."""
    g = int(np.sqrt(p))
    assert g * g == p
    c = (np.arange(g, dtype=np.float32) + 0.5) / g
    xx, yy = np.meshgrid(c, c, indexing="xy")
    return np.stack([xx.reshape(-1), yy.reshape(-1)], -1)  # [P, 2]


def _block_mask_targets(rng, b, n, img_hw, mask_hw, num_classes):
    """Same GT in both formats. Masks are constant over (img/blocks) blocks so
    the full-res (torch) and mask-res (jax) copies point-sample IDENTICALLY at
    the deterministic grid (every sample point's bilinear neighborhood sits
    inside one block at both resolutions)."""
    import torch

    g = 4  # block grid
    bits = rng.random((b, n, g, g)) > 0.55
    bits[..., 1:3, 1:3] |= rng.random((b, n, 2, 2)) > 0.5
    bits[:, :, 0, 0] = True  # never empty
    up_img = np.kron(bits, np.ones((img_hw[0] // g, img_hw[1] // g))).astype(np.float32)
    up_msk = np.kron(bits, np.ones((mask_hw[0] // g, mask_hw[1] // g))).astype(np.float32)
    labels = rng.integers(0, num_classes, (b, n)).astype(np.int32)
    counts = rng.integers(1, n + 1, b)
    valid = np.arange(n)[None] < counts[:, None]

    from focoos.models.fai_mf.ports import MaskFormerTargets as TT

    tt = [
        TT(labels=torch.from_numpy(labels[i, : counts[i]]).long(),
           masks=torch.from_numpy(up_img[i, : counts[i]]))
        for i in range(b)
    ]
    import jax.numpy as jnp

    from focoos_tpu.models.fai_mf.ports import MaskFormerTargets as JT

    jt = JT(labels=jnp.asarray(labels), masks=jnp.asarray(up_msk), valid=jnp.asarray(valid))
    return tt, jt


def _loss_parity_mask_family(family: str, backbone: str = "resnet", grads: bool = False) -> bool:
    """Shared mask-classification criterion parity (fai_mf / bisenetformer).

    Both frameworks sample mask points randomly (reference: torch.rand in the
    matcher + get_uncertain_point_coords_with_randomness in the loss;
    ours: jax.random). RNGs cannot be aligned across frameworks, so BOTH are
    pinned to the same deterministic point grid for the comparison — this
    still exercises matcher costs, auction-vs-scipy assignment, CE/dice/BCE
    math, deep supervision, weighting and num_masks normalization.
    """
    import torch

    torch.manual_seed(0)
    num_points = 16
    kw = dict(
        num_classes=7, num_queries=20, transformer_predictor_dec_layers=4,
        pixel_decoder_feat_dim=64, pixel_decoder_out_dim=64,
        transformer_predictor_hidden_dim=64, transformer_predictor_out_dim=64,
        criterion_num_points=num_points,
    )
    if family == "fai_mf":
        from focoos.models.fai_mf.config import MaskFormerConfig as TC
        from focoos.models.fai_mf.modelling import FAIMaskFormer as TM
        import focoos.models.fai_mf.loss as tfl

        from focoos_tpu.models.fai_mf.config import MaskFormerConfig as JC
        from focoos_tpu.models.fai_mf.modelling import FAIMaskFormer as JM

        tcfg = TC(backbone_config=make_torch_backbone_cfg(backbone), pixel_decoder_transformer_layers=1, **kw)
        jkw = dict(kw, pixel_decoder_transformer_layers=1)
        mask_hw = (32, 32)  # mask features at H/4
    else:
        from focoos.models.bisenetformer.config import BisenetFormerConfig as TC
        from focoos.models.bisenetformer.modelling import BisenetFormer as TM
        import focoos.models.bisenetformer.loss as tfl

        from focoos_tpu.models.bisenetformer.config import BisenetFormerConfig as JC
        from focoos_tpu.models.bisenetformer.modelling import BisenetFormer as JM

        tcfg = TC(backbone_config=make_torch_backbone_cfg(backbone), **kw)
        jkw = kw
        mask_hw = (16, 16)  # bisenet head emits masks at H/8

    tmodel = TM(tcfg).train()

    bcfg, bmodule = make_jax_backbone(backbone)
    module = JM(config=JC(backbone_config=bcfg, **jkw), backbone=bmodule)
    jcfg = module.config

    import jax
    import jax.numpy as jnp

    import focoos_tpu.models.fai_mf.loss as jfl
    from focoos_tpu.models.fai_mf.loss import maskformer_criterion

    rng = np.random.default_rng(11)
    x = rng.integers(0, 255, (2, 128, 128, 3)).astype(np.float32)
    merged, clean = load_converted(module, family, tmodel, x)

    tt, jt = _block_mask_targets(rng, 2, 5, (128, 128), mask_hw, 7)
    grid = _point_grid(num_points)

    # pin both frameworks' point sampling to the same deterministic grid
    tgrid = torch.from_numpy(grid)
    orig_rand, orig_unc = torch.rand, tfl.get_uncertain_point_coords_with_randomness
    orig_mc, orig_usc = jfl._matcher_coords, jfl.uncertainty_sampled_coords

    def fake_rand(*shape, **kwargs):
        if tuple(shape) == (1, num_points, 2):
            return tgrid[None].to(**{k: v for k, v in kwargs.items() if k in ("device", "dtype")})
        return orig_rand(*shape, **kwargs)

    try:
        torch.rand = fake_rand
        tfl.get_uncertain_point_coords_with_randomness = (
            lambda logits, fn, p, o, i: tgrid[None].expand(logits.shape[0], p, 2).to(logits.device)
        )
        jfl._matcher_coords = lambda r, b, p: jnp.broadcast_to(jnp.asarray(grid)[None, None], (b, 1, p, 2))
        jfl.uncertainty_sampled_coords = (
            lambda r, src, p, o, i: jnp.broadcast_to(jnp.asarray(grid)[None], (src.shape[0], p, 2))
        )

        out_t = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2)), tt)
        torch_losses = {k: float(v) for k, v in out_t.loss.items()}

        gok = True
        if grads:
            sum(out_t.loss.values()).backward()
            tgrads = {k: (p.grad.detach().numpy() if p.grad is not None else np.zeros(p.shape, np.float32))
                      for k, p in tmodel.named_parameters()}
            from focoos_tpu.utils.torch_convert import convert_state_dict

            gconv, _ = convert_state_dict(tgrads, family, verbose=False)

            def total_loss(params):
                vars_ = {"params": params, "batch_stats": merged["batch_stats"]}
                (_, aux2), _ = module.apply(vars_, jnp.asarray(x), train=True, mutable=["batch_stats"])
                return maskformer_criterion(jax.random.PRNGKey(1), aux2, jt, jcfg)["total"]

            # rel gate 2e-2, MEASURED: perturbing the input by 1e-3 (rel
            # ~4e-6 of pixel scale) moves the torch backbone gradients by
            # rel 3e-2 — the masked-attention sign thresholds make the mf
            # training gradient chaotic at the 3% level; our jax-vs-torch
            # delta is 0.8%, 4x below that self-sensitivity floor.
            jgrads = jax.grad(total_loss)(merged["params"])
            gok = _compare_grad_trees(gconv.get("params", {}), jgrads, rel_tol=2e-2)

        (_, aux), _ = module.apply(
            merged, jnp.asarray(x), train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(0)},
        )
        jl = maskformer_criterion(jax.random.PRNGKey(1), aux, jt, jcfg)
        jax_losses = {k: float(v) for k, v in jl.items() if k != "total"}
    finally:
        torch.rand = orig_rand
        tfl.get_uncertain_point_coords_with_randomness = orig_unc
        jfl._matcher_coords = orig_mc
        jfl.uncertainty_sampled_coords = orig_usc

    return _cmp_groups(jax_losses, torch_losses, ["loss_ce", "loss_mask", "loss_dice"]) and clean and gok


def loss_parity_fai_mf() -> bool:
    return _loss_parity_mask_family("fai_mf")


def loss_parity_bisenetformer() -> bool:
    return _loss_parity_mask_family("bisenetformer")


def loss_parity_rtmo(grads: bool = False) -> bool:
    """SimOTA assignment + IoU/OKS/vis/MLE/VFL losses
    (reference: focoos/models/rtmo/modelling.py:950-1045 + loss.py)."""
    import torch

    torch.manual_seed(0)
    from focoos.models.rtmo.config import RTMOConfig as TC
    from focoos.models.rtmo.modelling import RTMO as TM

    tcfg = TC(num_classes=1, backbone_config=make_torch_backbone_cfg("csp_darknet"))
    tmodel = TM(tcfg).train()

    from focoos_tpu.models.rtmo.config import RTMOConfig
    from focoos_tpu.models.rtmo.loss import rtmo_criterion
    from focoos_tpu.models.rtmo.modelling import RTMO
    from focoos_tpu.models.rtmo.ports import KeypointTargets as JT

    bcfg, bmodule = make_jax_backbone("csp_darknet")
    cfg = RTMOConfig(num_classes=1, backbone_config=bcfg)
    module = RTMO(config=cfg, backbone=bmodule)

    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(5)
    b, n, k = 2, 4, tcfg.num_keypoints
    x = rng.integers(0, 255, (b, 128, 128, 3)).astype(np.float32)
    merged, clean = load_converted(module, "rtmo", tmodel, x)

    # same GT, both formats: boxes xyxy abs, keypoints abs, areas = box area
    counts = rng.integers(1, n + 1, b)
    x0y0 = rng.uniform(8, 64, (b, n, 2)).astype(np.float32)
    wh = rng.uniform(24, 56, (b, n, 2)).astype(np.float32)
    boxes = np.concatenate([x0y0, np.minimum(x0y0 + wh, 127.0)], -1)
    kpts = np.stack(
        [rng.uniform(boxes[..., 0], boxes[..., 2], (k, b, n)).transpose(1, 2, 0),
         rng.uniform(boxes[..., 1], boxes[..., 3], (k, b, n)).transpose(1, 2, 0)], -1
    ).astype(np.float32)
    vis = (rng.random((b, n, k)) > 0.2).astype(np.float32)
    vis[..., 0] = 1.0
    areas = ((boxes[..., 2] - boxes[..., 0]) * (boxes[..., 3] - boxes[..., 1])).astype(np.float32)
    labels = np.zeros((b, n), np.int32)
    valid = np.arange(n)[None] < counts[:, None]

    from focoos.models.rtmo.ports import KeypointTargets as TT

    tt = [
        TT(boxes=torch.from_numpy(boxes[i, : counts[i]]),
           labels=torch.from_numpy(labels[i, : counts[i]]).long(),
           keypoints=torch.from_numpy(kpts[i, : counts[i]]),
           keypoints_visible=torch.from_numpy(vis[i, : counts[i]]),
           areas=torch.from_numpy(areas[i, : counts[i]]),
           scores=None, priors=None, keypoints_visible_weights=None)
        for i in range(b)
    ]
    jt = JT(labels=jnp.asarray(labels), boxes=jnp.asarray(boxes), keypoints=jnp.asarray(kpts),
            keypoints_visible=jnp.asarray(vis), areas=jnp.asarray(areas), valid=jnp.asarray(valid))

    out_t = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2)), tt)
    torch_losses = {kk: float(v) for kk, v in out_t.loss.items() if kk.startswith("loss")}

    (_, aux), new_state = module.apply(
        merged, jnp.asarray(x), train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(0)},
    )
    jl, _ = rtmo_criterion(
        {"params": merged["params"], "batch_stats": new_state["batch_stats"]}, aux, jt, cfg
    )
    jax_losses = {kk: float(v) for kk, v in jl.items() if kk.startswith("loss")}

    ok = True
    for kk in sorted(torch_losses):
        # loss_mle runs pose features through train-mode BN batch statistics
        # and a GAU into -log(prob + 1e-4) of near-zero probabilities; the
        # cross-framework f32 noise floor there is ~1% (measured: the SimOTA
        # positives sets are IDENTICAL, sigma's offset is fully explained by
        # the 0.02 pose-feature noise, and a 3e-4 input perturbation moves
        # the torch loss by only 3e-4 — i.e. amplification, not semantics).
        tol = 2e-2 if kk == "loss_mle" else 2e-3
        ok &= _cmp_scalar(kk, jax_losses.get(kk, float("nan")), torch_losses[kk], tol=tol)

    if grads:
        # The MLE loss backward cannot be compared end-to-end across
        # frameworks: cross-framework train-mode BN forward noise (~0.02 abs
        # on pose features after ~60 BN layers of compounding) is amplified
        # by the DCC's large softmax logits and -log(prob+1e-4) into O(0.3)
        # relative gradient differences — torch's own probe moves 5e-3 per
        # 1e-3 input noise, i.e. it's input sensitivity, not semantics. So:
        # (1) compare the full gradient tree with MLE EXCLUDED (gate 5e-2 —
        # bbox/oks/vis/cls measured at 1.5-2.8e-2 vs the same chaos floor),
        # (2) verify the MLE path in ISOLATION with IDENTICAL inputs, where
        # it matches torch to 1e-5 (see _grad_rtmo_mle_isolated).
        total_t = sum(v for kk, v in out_t.loss.items() if kk != "loss_mle")
        total_t.backward()
        tgrads = {kk: (p.grad.detach().numpy() if p.grad is not None else np.zeros(p.shape, np.float32))
                  for kk, p in tmodel.named_parameters()}
        from focoos_tpu.utils.torch_convert import convert_state_dict

        gconv, _ = convert_state_dict(tgrads, "rtmo", verbose=False)

        def total_loss(params):
            vars_ = {"params": params, "batch_stats": merged["batch_stats"]}
            (_, aux2), ns2 = module.apply(vars_, jnp.asarray(x), train=True, mutable=["batch_stats"],
                                          rngs={"dropout": jax.random.PRNGKey(0)})
            jl2, _ = rtmo_criterion(
                {"params": params, "batch_stats": ns2["batch_stats"]}, aux2, jt, cfg
            )
            return jl2["total"] - jl2["loss_mle"]

        jgrads = jax.grad(total_loss)(merged["params"])
        # drop dcc leaves: without the MLE loss they only receive the tiny
        # decode-path contribution, which the reference head never trains
        gconv_nodcc = {kk: v for kk, v in gconv.get("params", {}).items() if kk != "dcc"}
        ok &= _compare_grad_trees(gconv_nodcc, jgrads, rel_tol=5e-2)
        ok &= _grad_rtmo_mle_isolated(tmodel, module, merged, x, tt, jt, cfg)

    return ok and clean


def _grad_rtmo_mle_isolated(tmodel, module, merged, x, tt, jt, cfg) -> bool:
    """MLE/DCC loss + gradients with IDENTICAL inputs on both sides.

    Extracts the reference's positives (pose features, decoded boxes, priors,
    matched targets) and runs BOTH MLE implementations from those exact
    tensors — isolating the DCC/target-heatmap/log-likelihood math from the
    upstream forward noise. Expected agreement: loss ≤1e-6, grads ≤1e-4.
    """
    import torch

    from focoos.models.rtmo.modelling import bbox_xyxy2cs, decode_bbox, decode_kpt_reg, flatten_predictions

    import jax
    import jax.numpy as jnp

    from focoos_tpu.models.rtmo.modelling import DCC

    k = cfg.num_keypoints
    head = tmodel.head
    with torch.no_grad():
        xt = (torch.from_numpy(x.transpose(0, 3, 1, 2)) - tmodel.pixel_mean) / tmodel.pixel_std
        feats = tmodel.neck(tmodel.backbone(xt))
        cls_scores, bbox_preds, kpt_offsets, kpt_vis, pose_vecs = head.head_module(feats)
        featmap_sizes = [c.shape[2:] for c in cls_scores]
        mlvl = head.prior_generator.grid_priors(featmap_sizes, dtype=cls_scores[0].dtype, device="cpu",
                                                with_stride=True)
        fpriors = torch.cat(mlvl)
        fcls = flatten_predictions(cls_scores)
        fobj = torch.ones_like(fcls).detach().narrow(-1, 0, 1) * 1e4
        fbbox = flatten_predictions(bbox_preds)
        fkptoff = flatten_predictions(kpt_offsets)
        fkv = flatten_predictions(kpt_vis)
        fpose = flatten_predictions(pose_vecs)
        fbboxd = decode_bbox(fbbox, fpriors[..., :2], fpriors[..., -1])
        fkptd = decode_kpt_reg(fkptoff, fpriors[..., :2], fpriors[..., -1], k)
        T = head._get_targets(fpriors, fcls, fobj, fbboxd, fkptd, fkv, tt)
        (pos_masks, _c, _o, _w, _bt, _bat, kpt_t, _kat, vis_t, _vw, pos_areas, pos_priors, _gi, _nf) = T

    pose_pos = fpose.view(-1, fpose.size(-1))[pos_masks].detach().requires_grad_(True)
    bbox_pos = fbboxd.view(-1, 4)[pos_masks].detach().requires_grad_(True)
    bcs = torch.cat(bbox_xyxy2cs(bbox_pos, head.bbox_padding), dim=1)
    _kcc, (px_t, py_t), sig_t = head.dcc.forward_train(pose_pos, bcs, pos_priors[..., :2])
    hmx_t, hmy_t = head.dcc.generate_target_heatmap(kpt_t, bcs, sig_t, pos_areas)
    prob_t = (px_t * hmx_t).sum(-1) * (py_t * hmy_t).sum(-1)
    loss_t = ((-torch.log(prob_t + 1e-4)) * vis_t).flatten(1).mean(1).mean()
    gp_t, gb_t = torch.autograd.grad(loss_t, [pose_pos, bbox_pos])

    (_, _aux), new_state = module.apply(merged, jnp.asarray(x), train=True, mutable=["batch_stats"],
                                        rngs={"dropout": jax.random.PRNGKey(0)})
    dcc = DCC(cfg)
    dcc_vars = {"params": merged["params"]["dcc"], "batch_stats": new_state["batch_stats"]["dcc"]}
    p_prior = jnp.asarray(pos_priors[..., :2].numpy())
    t_kpts = jnp.asarray(kpt_t.numpy())
    t_vis = jnp.asarray(vis_t.numpy())
    t_areas = jnp.asarray(pos_areas.numpy())

    def mle_loss(p_pose, p_boxes):
        cs_scale = (p_boxes[..., 2:] - p_boxes[..., :2]) * 1.25
        cs_center = (p_boxes[..., 2:] + p_boxes[..., :2]) * 0.5
        bbox_csj = jnp.concatenate([cs_center, cs_scale], axis=-1).astype(jnp.float32)
        (_cc, (px, py), sig), _ = dcc.apply(dcc_vars, p_pose, bbox_csj, p_prior.astype(jnp.float32),
                                            train=True, mutable=["batch_stats"])
        hm_x, hm_y = dcc.target_heatmaps(t_kpts, bbox_csj, sig, t_areas)
        prob = jnp.sum(px * hm_x, -1) * jnp.sum(py * hm_y, -1)
        mle = -jnp.log(prob + 1e-4) * t_vis
        return jnp.mean(jnp.mean(mle, axis=-1))

    p0 = jnp.asarray(pose_pos.detach().numpy())
    b0 = jnp.asarray(bbox_pos.detach().numpy())
    lj = float(mle_loss(p0, b0))
    gp_j, gb_j = jax.grad(mle_loss, argnums=(0, 1))(p0, b0)

    def rel(a_, b_):
        a_, b_ = np.asarray(a_, np.float64), np.asarray(b_, np.float64)
        return float(np.linalg.norm(a_ - b_) / max(np.linalg.norm(b_), 1e-12))

    rl = abs(lj - float(loss_t)) / max(abs(float(loss_t)), 1e-9)
    rp, rb = rel(gp_j, gp_t.numpy()), rel(gb_j, gb_t.numpy())
    ok = rl < 1e-5 and rp < 1e-4 and rb < 1e-4
    print(f"  mle isolated (identical inputs): loss rel={rl:.2e}, d/d(pose) rel={rp:.2e}, "
          f"d/d(bbox) rel={rb:.2e} {'OK' if ok else '** MISMATCH **'}")
    return ok


def _compare_grad_trees(gconv, jgrads, min_leaves=50, rel_tol=5e-3) -> bool:
    """Calibrated gradient-tree comparison (see grad_parity_fai_detr)."""
    import jax

    flatj = {jax.tree_util.keystr(k): v for k, v in jax.tree_util.tree_leaves_with_path(jgrads)}
    flatt = {jax.tree_util.keystr(k): v for k, v in jax.tree_util.tree_leaves_with_path(gconv)}
    gnorm = float(np.sqrt(sum(float(np.sum(np.square(np.asarray(v)))) for v in flatt.values())))
    ok = True
    worst = []
    for k, tv in flatt.items():
        jv = flatj.get(k)
        if jv is None:
            print(f"  MISSING jax grad leaf {k}")
            ok = False
            continue
        tv = np.asarray(tv)
        jv = np.asarray(jv)
        err = float(np.linalg.norm(jv - tv))
        rel = err / max(float(np.linalg.norm(tv)), 1e-6)
        worst.append((rel, k))
        if rel > rel_tol and err > 2e-4 * gnorm:
            print(f"  GRAD MISMATCH {k}: rel_l2={rel:.2e} err={err:.2e} (global ‖g‖={gnorm:.2e})")
            ok = False
    worst.sort(reverse=True)
    print(f"  gradient leaves compared: {len(flatt)} (global ‖g‖={gnorm:.3f}); worst rel_l2: "
          + ", ".join(f"{k.split(chr(39))[-2] if chr(39) in k else k}={r:.1e}" for r, k in worst[:3]))
    return ok and len(flatt) > min_leaves


def grad_parity_fai_detr(backbone: str = "resnet") -> bool:
    """Full PARAMETER-GRADIENT parity through the training backward.

    torch autograd through SetCriterion vs jax.grad through detr_criterion,
    same converted weights, same batch, same targets. The torch gradient
    state_dict is mapped into the flax tree with the SAME converter rules as
    the weights (every rule is a linear transform — transpose/slice — so it
    maps cotangents exactly). With forwards, losses AND gradients equal,
    the training dynamics can only differ through optimizer/init seeds.
    """
    import torch

    torch.manual_seed(0)
    from focoos.models.fai_detr.config import DETRConfig as TC
    from focoos.models.fai_detr.modelling import FAIDetr as TM

    tcfg = TC(num_classes=13, backbone_config=make_torch_backbone_cfg(backbone), num_queries=50,
              transformer_predictor_dec_layers=3)
    tmodel = TM(tcfg).train()

    from focoos_tpu.models.fai_detr.config import DETRConfig
    from focoos_tpu.models.fai_detr.loss import detr_criterion
    from focoos_tpu.models.fai_detr.modelling import FAIDetr

    bcfg, bmodule = make_jax_backbone(backbone)
    cfg = DETRConfig(num_classes=13, backbone_config=bcfg, num_queries=50, transformer_predictor_dec_layers=3)
    module = FAIDetr(config=cfg, backbone=bmodule)

    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    x = rng.integers(0, 255, (2, 128, 128, 3)).astype(np.float32)
    merged, clean = load_converted(module, "fai_detr", tmodel, x)
    tt, jt = _ragged_targets_detr(rng, 2, 6, 13)

    # torch backward
    out_t = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2)), tt)
    total_t = sum(out_t.loss.values())
    total_t.backward()
    tgrads = {k: p.grad.detach().numpy() if p.grad is not None else np.zeros(p.shape, np.float32)
              for k, p in tmodel.named_parameters()}

    # map torch grads into the flax tree with the weight-converter rules
    from focoos_tpu.utils.torch_convert import convert_state_dict

    gconv, _ = convert_state_dict(tgrads, "fai_detr", verbose=False)
    gconv = gconv.get("params", {})

    # jax backward
    def total_loss(params):
        vars_ = {"params": params, "batch_stats": merged["batch_stats"]}
        (_, aux), _ = module.apply(vars_, jnp.asarray(x), train=True, mutable=["batch_stats"])
        return detr_criterion(aux, jt, cfg)["total"]

    jgrads = jax.grad(total_loss)(merged["params"])

    # compare every leaf present in the converted grad tree.
    # Gate: per-leaf relative L2 ≤ 5e-3, OR the absolute error is within the
    # MEASURED f32 noise floor against the global gradient norm (≤2e-4·‖g‖).
    # The second arm covers (a) mathematically-zero leaves — softmax
    # attention is invariant to the key-projection bias, so k_proj.bias true
    # grads are exactly 0 and both frameworks produce only reduction-order
    # residue there — and (b) cancellation-dominated leaves like MSDA
    # sampling_offsets. Both calibrations were measured, not assumed:
    # the MSDA location gradient matches torch grid_sample in ISOLATION to
    # 1e-6, while IN-MODEL torch-f32 differs from torch-f64 on
    # sampling_offsets.weight by rel 0.42 (err/‖g‖=1.95e-4) — i.e. torch
    # disagrees with its own f64 ground truth there MORE than we disagree
    # with torch-f32 (rel 0.04, err/‖g‖=1.8e-5).
    return _compare_grad_trees(gconv, jgrads, min_leaves=100) and clean


def optimizer_parity(opt_name: str = "ADAMW") -> bool:
    """Optimizer-STEP parity: same parameters + same gradients → same update.

    Verifies the whole solver stack against the reference's
    (focoos/trainer/solver/build.py): param-group LR multipliers
    (backbone/decoder/head with the 'classifier' exemption), per-group
    decoupled weight decay incl. the norm/embed exceptions, global-norm
    gradient clipping, and the AdamW/SGD core math (bias correction, eps,
    momentum). Synthetic gradients g = 0.01*sin(137*p) + 0.002 are
    elementwise in the parameter, so the weight converter's linear rules map
    them identically on both sides.
    """
    import torch

    torch.manual_seed(0)
    from focoos.models.fai_detr.config import DETRConfig as TC
    from focoos.models.fai_detr.modelling import FAIDetr as TM
    from focoos.trainer.solver.build import build_optimizer as t_build_optimizer

    tcfg = TC(num_classes=7, backbone_config=make_torch_backbone_cfg("resnet"), num_queries=20,
              transformer_predictor_dec_layers=2)
    tmodel = TM(tcfg).train()

    from focoos_tpu.models.fai_detr.config import DETRConfig
    from focoos_tpu.models.fai_detr.modelling import FAIDetr
    from focoos_tpu.ports import TrainerArgs
    from focoos_tpu.trainer.solver import build_optimizer as j_build_optimizer

    bcfg, bmodule = make_jax_backbone("resnet")
    cfg = DETRConfig(num_classes=7, backbone_config=bcfg, num_queries=20, transformer_predictor_dec_layers=2)
    module = FAIDetr(config=cfg, backbone=bmodule)

    import jax
    import jax.numpy as jnp

    x = np.random.default_rng(0).integers(0, 255, (1, 64, 64, 3)).astype(np.float32)
    merged, clean = load_converted(module, "fai_detr", tmodel, x)

    lr, wd, clip = 1e-3, 1e-4, 0.1
    mults = dict(backbone_multiplier=0.1, decoder_multiplier=0.5, head_multiplier=2.0)

    t_opt = t_build_optimizer(opt_name, lr, wd, tmodel, weight_decay_norm=0.0, weight_decay_embed=0.0,
                              clip_gradients=clip, **mults)
    for _, p in tmodel.named_parameters():
        p.grad = (0.01 * torch.sin(137.0 * p.detach()) + 0.002).clone()
    t_opt.step()
    tnew = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}

    from focoos_tpu.utils.torch_convert import convert_state_dict

    tnew_conv, _ = convert_state_dict(tnew, "fai_detr", verbose=False)

    args = TrainerArgs(run_name="opt_parity", learning_rate=lr, weight_decay=wd,
                       weight_decay_norm=0.0, weight_decay_embed=0.0, clip_gradients=clip,
                       optimizer=opt_name, scheduler="MULTISTEP", max_iters=100,
                       scheduler_extra={"milestones": [1000], "warmup_iters": 0}, **mults)
    tx, _sched = j_build_optimizer(merged["params"], args)
    opt_state = tx.init(merged["params"])
    grads = jax.tree.map(lambda p: 0.01 * jnp.sin(137.0 * p) + 0.002, merged["params"])
    updates, _ = tx.update(grads, opt_state, merged["params"])
    jnew = jax.tree.map(lambda p, u: p + u, merged["params"], updates)

    flatj = {jax.tree_util.keystr(k): v for k, v in jax.tree_util.tree_leaves_with_path(jnew)}
    flatt = {jax.tree_util.keystr(k): v
             for k, v in jax.tree_util.tree_leaves_with_path(tnew_conv.get("params", {}))}
    flatp = {jax.tree_util.keystr(k): v for k, v in jax.tree_util.tree_leaves_with_path(merged["params"])}
    ok = True
    worst = (0.0, "")
    for k, tv in flatt.items():
        jv, pv = flatj.get(k), flatp.get(k)
        if jv is None:
            continue
        dt = np.asarray(tv, np.float64) - np.asarray(pv, np.float64)  # torch's update
        dj = np.asarray(jv, np.float64) - np.asarray(pv, np.float64)  # ours
        err = float(np.linalg.norm(dj - dt))
        rel = err / max(float(np.linalg.norm(dt)), 1e-12)
        if rel > worst[0]:
            worst = (rel, k)
        # second arm: both updates are reconstructed by subtracting f32
        # params, so leaves with |p| >> |Δ| (e.g. the -4.6 classifier bias
        # init) carry an irreducible ~eps·‖p‖ cancellation error
        if rel > 1e-4 and err > 4 * 1.2e-7 * float(np.linalg.norm(np.asarray(pv, np.float64))):
            print(f"  UPDATE MISMATCH {k}: rel={rel:.2e} ‖Δt‖={np.linalg.norm(dt):.2e}")
            ok = False
    print(f"  {opt_name}: {len(flatt)} leaves' updates compared; worst rel={worst[0]:.2e} ({worst[1][-45:]})")
    return ok and clean


CHECKS = {
    "fai_detr": loss_parity_fai_detr,
    "fai_cls": loss_parity_fai_cls,
    "fai_mf": loss_parity_fai_mf,
    "bisenetformer": loss_parity_bisenetformer,
    "rtmo": loss_parity_rtmo,
    "grad_fai_detr": grad_parity_fai_detr,
    "grad_fai_cls": lambda: loss_parity_fai_cls(grads=True),
    "grad_fai_mf": lambda: _loss_parity_mask_family("fai_mf", grads=True),
    "grad_bisenetformer": lambda: _loss_parity_mask_family("bisenetformer", grads=True),
    "grad_rtmo": lambda: loss_parity_rtmo(grads=True),
    "opt_adamw": lambda: optimizer_parity("ADAMW"),
    "opt_sgd": lambda: optimizer_parity("SGD"),
    "schedules": lambda: schedule_parity(),
}


def schedule_parity() -> bool:
    """LR schedules vs the reference's Warmup{MultiStep,Cosine,Poly}LR —
    the factor sequence over the whole run must match step-for-step
    (reference: focoos/trainer/solver/lr_scheduler.py)."""
    import torch

    from focoos.trainer.solver.build import build_lr_scheduler

    from focoos_tpu.trainer.solver import build_schedule

    import jax.numpy as jnp

    max_iters, base_lr = 200, 1e-3
    cases = [
        ("MULTISTEP", {"milestones": [80, 150], "gamma": 0.1, "warmup_iters": 10, "warmup_factor": 0.001}),
        ("COSINE", {"warmup_iters": 20, "warmup_factor": 0.001}),
        ("POLY", {"power": 0.9, "warmup_iters": 15, "warmup_factor": 0.001}),
        ("MULTISTEP", {"milestones": [120], "gamma": 0.5, "warmup_iters": 0}),
    ]
    # EMA decay ramp (reference EMAUpdater: decay*(1-exp(-x/warmups)), x
    # 1-based — solver/ema.py:101-114; our step counter is 0-based)
    import math

    from focoos_tpu.trainer.solver import ema_decay_schedule

    fn = ema_decay_schedule(0.999, 2000)
    ref_fn = lambda xx: 0.999 * (1 - math.exp(-xx / 2000))
    ema_ok = all(
        abs(float(fn(jnp.asarray(s))) - ref_fn(s + 1)) < 1e-7 for s in [0, 1, 10, 500, 1999, 10000]
    )
    print(f"  EMA ramp decay*(1-exp(-x/warmup)): {'OK' if ema_ok else '** MISMATCH **'}")

    ok = ema_ok
    for name, extra in cases:
        dummy = torch.nn.Linear(2, 2)
        t_opt = torch.optim.SGD(dummy.parameters(), lr=base_lr)
        t_sched = build_lr_scheduler(name, max_iters, t_opt, extra=dict(extra))
        t_lrs = []
        for _ in range(max_iters):
            t_lrs.append(t_opt.param_groups[0]["lr"])
            t_opt.step()
            t_sched.step()
        j_sched = build_schedule(name, base_lr, max_iters, dict(extra))
        j_lrs = [float(j_sched(jnp.asarray(i))) for i in range(max_iters)]
        d = np.abs(np.asarray(j_lrs) - np.asarray(t_lrs))
        rel = float(d.max() / base_lr)
        good = rel < 1e-6
        print(f"  {name} {extra}: max|Δlr|/base={rel:.2e} {'OK' if good else '** MISMATCH **'}")
        if not good:
            bad = int(np.argmax(d))
            print(f"    first-worst step {bad}: torch={t_lrs[bad]:.8f} jax={j_lrs[bad]:.8f}")
        ok &= good
    return ok


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")  # env vars are ignored under the axon plugin
    import _reference_compat

    _reference_compat.install()
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    fams = list(CHECKS) if which == "all" else [which]
    ok = True
    for f in fams:
        print(f"== loss parity: {f} ==")
        ok &= CHECKS[f]()
    print("ALL LOSS PARITY CHECKS PASSED" if ok else "LOSS PARITY FAILURES")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
