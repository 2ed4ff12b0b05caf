"""CLOSED-LOOP training parity: N coupled optimizer steps, torch vs jax.

The last offline-retirable slice of the ±0.1-mAP risk (VERDICT r3 missing #1
/ next #2): tools/parity_loss.py proves forward/loss/gradient/optimizer-step
parity INDIVIDUALLY; this couples them — identical converted init, identical
synthetic batches, N real optimizer steps through BOTH frameworks' full
training stacks (reference: focoos/trainer/trainer.py:723-773 run_step →
forward → criterion → backward → global-norm clip → AdamW → LR schedule),
then measures:

  1. per-step total-loss drift        (pointwise |Δ|/loss at every step)
  2. final param-space drift          (global + worst-leaf relative L2 after
                                       mapping torch params through the
                                       weight-converter rules)
  3. held-out output drift            (boxes/logits/masks on a batch neither
                                       side trained on)
  4. evaluator delta                  (our COCO evaluator run on BOTH final
                                       weight sets over a fixed synthetic val
                                       split — the bbox/AP delta attributable
                                       to training-dynamics divergence alone)

Both sides run fp32, no autocast/GradScaler (bf16/fp16 is a DELIBERATE
divergence from coupled-parity conditions; the reference's GradScaler exists
only for fp16 underflow). Mask-family point sampling is pinned to the same
deterministic grid on both sides (same regime as parity_loss).

Divergence is EXPECTED to grow with N — fp32 reduction-order noise is
amplified by the chaotic training map (measured self-sensitivity: a 1e-3
input perturbation moves torch's own backbone grads by rel 3e-2, see
parity_loss.py:345). The gates below are calibrated against that floor, not
against zero.

Usage: python tools/parity_train.py [fai_detr|fai_mf|bisenetformer|fai_cls|all] [--steps 50]

Families covered: fai_detr, fai_mf, bisenetformer (shared mask criterion,
own dual-path forward), fai_cls. rtmo is EXCLUDED by measurement, not
omission: its MLE loss composes train-mode BN forward noise through
-log(prob+1e-4), which makes coupled trajectories incomparable across
frameworks (see parity_loss.py — the rtmo criterion is verified in
isolation at 1e-5 instead).
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parity import load_converted, make_jax_backbone, make_torch_backbone_cfg  # noqa: E402
from parity_loss import _block_mask_targets, _point_grid, _ragged_targets_detr  # noqa: E402

LR, WD, CLIP = 1e-4, 1e-4, 0.1
MULTS = dict(backbone_multiplier=0.1, decoder_multiplier=1.0, head_multiplier=1.0)


def _rel_l2(a: np.ndarray, b: np.ndarray) -> float:
    num = float(np.linalg.norm(np.asarray(a, np.float64) - np.asarray(b, np.float64)))
    den = float(np.linalg.norm(np.asarray(b, np.float64))) + 1e-12
    return num / den


def _param_drift(tmodel, jparams, family):
    """Map final torch params through the converter and compare leaf-wise."""
    import torch

    from focoos_tpu.utils.checkpoint import flatten_tree
    from focoos_tpu.utils.torch_convert import convert_state_dict

    tsd = {k: p.detach().numpy() for k, p in tmodel.named_parameters()}
    conv, _ = convert_state_dict(tsd, family, verbose=False)
    tflat = flatten_tree(conv.get("params", {}))
    jflat = flatten_tree(jparams)
    rels, glob_num, glob_den = [], 0.0, 0.0
    for k, tv in tflat.items():
        if k not in jflat or jflat[k].shape != tv.shape:
            continue
        jv = np.asarray(jflat[k], np.float64)
        tv = np.asarray(tv, np.float64)
        glob_num += float(np.sum((jv - tv) ** 2))
        glob_den += float(np.sum(tv**2))
        rels.append((_rel_l2(jv, tv), k))
    rels.sort(reverse=True)
    return (glob_num / (glob_den + 1e-12)) ** 0.5, rels[:5], len(rels)


def _train_loop_parity(family: str, steps: int) -> bool:
    import torch

    torch.manual_seed(0)
    import jax
    import jax.numpy as jnp

    from focoos.trainer.solver.build import build_lr_scheduler as t_sched
    from focoos.trainer.solver.build import build_optimizer as t_build_optimizer

    from focoos_tpu.ports import TrainerArgs
    from focoos_tpu.trainer.solver import build_optimizer as j_build_optimizer
    from focoos_tpu.trainer.train_step import build_train_step, create_train_state

    b, res, ncls = 2, 128, 7
    rng = np.random.default_rng(21)

    if family == "fai_detr":
        from focoos.models.fai_detr.config import DETRConfig as TC
        from focoos.models.fai_detr.modelling import FAIDetr as TM

        from focoos_tpu.models.fai_detr.config import DETRConfig as JC
        from focoos_tpu.models.fai_detr.loss import make_loss_fn
        from focoos_tpu.models.fai_detr.modelling import FAIDetr as JM

        tcfg = TC(num_classes=ncls, backbone_config=make_torch_backbone_cfg("resnet"),
                  num_queries=20, transformer_predictor_dec_layers=2)
        tmodel = TM(tcfg).train()
        bcfg, bmodule = make_jax_backbone("resnet")
        cfg = JC(num_classes=ncls, backbone_config=bcfg, num_queries=20,
                 transformer_predictor_dec_layers=2)
        module = JM(config=cfg, backbone=bmodule)

        def make_targets(r):
            return _ragged_targets_detr(r, b, 5, ncls)

        torch_in = lambda img: torch.from_numpy(img.transpose(0, 3, 1, 2))  # noqa: E731
        unpin = lambda: None  # noqa: E731
    elif family == "fai_cls":
        from focoos.models.fai_cls.config import ClassificationConfig as TC
        from focoos.models.fai_cls.modelling import FAIClassification as TM
        from focoos.models.fai_cls.ports import ClassificationTargets as TT

        from focoos_tpu.models.fai_cls.config import ClassificationConfig as JC
        from focoos_tpu.models.fai_cls.loss import make_loss_fn
        from focoos_tpu.models.fai_cls.modelling import FAIClassification as JM
        from focoos_tpu.models.fai_cls.ports import ClassificationTargets as JT

        # dropout is stochastic in torch train mode — pinned off on both sides
        # (same regime as parity_loss.loss_parity_fai_cls)
        tcfg = TC(num_classes=ncls, backbone_config=make_torch_backbone_cfg("resnet"),
                  dropout_rate=0.0)
        tmodel = TM(tcfg).train()
        bcfg, bmodule = make_jax_backbone("resnet")
        cfg = JC(num_classes=ncls, backbone_config=bcfg, dropout_rate=0.0)
        module = JM(config=cfg, backbone=bmodule)

        def make_targets(r):
            onehot = np.eye(ncls, dtype=np.float32)[r.integers(0, ncls, (b,))]
            tt = [TT(labels=torch.from_numpy(onehot[i])) for i in range(b)]
            return tt, JT(labels=jnp.asarray(onehot))

        # the reference normalizes classification inputs in the PROCESSOR
        # (models/fai_cls/processor.py), not the model; ours normalizes
        # in-model — replicate the processor step before the torch call
        _m = torch.tensor(tcfg.pixel_mean).view(1, -1, 1, 1)
        _s = torch.tensor(tcfg.pixel_std).view(1, -1, 1, 1)
        torch_in = lambda img: (torch.from_numpy(img.transpose(0, 3, 1, 2)) - _m) / _s  # noqa: E731
        unpin = lambda: None  # noqa: E731
    else:
        # mask-criterion families: fai_mf and bisenetformer share our loss
        # module (focoos_tpu/models/bisenetformer/loss.py re-exports fai_mf's)
        # but the torch side has its OWN loss copy per family — pin both.
        import focoos_tpu.models.fai_mf.loss as jfl

        num_points = 16
        kw = dict(num_classes=ncls, num_queries=20, transformer_predictor_dec_layers=2,
                  pixel_decoder_feat_dim=64, pixel_decoder_out_dim=64,
                  transformer_predictor_hidden_dim=64, transformer_predictor_out_dim=64,
                  criterion_num_points=num_points)
        if family == "fai_mf":
            import focoos.models.fai_mf.loss as tfl
            from focoos.models.fai_mf.config import MaskFormerConfig as TC
            from focoos.models.fai_mf.modelling import FAIMaskFormer as TM

            from focoos_tpu.models.fai_mf.config import MaskFormerConfig as JC
            from focoos_tpu.models.fai_mf.loss import make_loss_fn
            from focoos_tpu.models.fai_mf.modelling import FAIMaskFormer as JM

            kw["pixel_decoder_transformer_layers"] = 1
            mask_div = 4  # TransformerFPN mask features at H/4
        else:
            import focoos.models.bisenetformer.loss as tfl
            from focoos.models.bisenetformer.config import BisenetFormerConfig as TC
            from focoos.models.bisenetformer.modelling import BisenetFormer as TM

            from focoos_tpu.models.bisenetformer.config import BisenetFormerConfig as JC
            from focoos_tpu.models.bisenetformer.loss import make_loss_fn
            from focoos_tpu.models.bisenetformer.modelling import BisenetFormer as JM

            mask_div = 8  # bisenet head emits masks at H/8
        tcfg = TC(backbone_config=make_torch_backbone_cfg("resnet"), **kw)
        tmodel = TM(tcfg).train()
        bcfg, bmodule = make_jax_backbone("resnet")
        module = JM(config=JC(backbone_config=bcfg, **kw), backbone=bmodule)
        cfg = module.config

        def make_targets(r):
            return _block_mask_targets(r, b, 4, (res, res),
                                       (res // mask_div, res // mask_div), ncls)

        torch_in = lambda img: torch.from_numpy(img.transpose(0, 3, 1, 2))  # noqa: E731

        # pin BOTH frameworks' point sampling to one deterministic grid for
        # the whole run (same regime as parity_loss; rngs can't be aligned)
        grid = _point_grid(num_points)
        tgrid = torch.from_numpy(grid)
        orig_rand, orig_unc = torch.rand, tfl.get_uncertain_point_coords_with_randomness
        orig_mc, orig_usc = jfl._matcher_coords, jfl.uncertainty_sampled_coords

        def fake_rand(*shape, **kwargs):
            if tuple(shape) == (1, num_points, 2):
                return tgrid[None].to(**{k: v for k, v in kwargs.items() if k in ("device", "dtype")})
            return orig_rand(*shape, **kwargs)

        torch.rand = fake_rand
        tfl.get_uncertain_point_coords_with_randomness = (
            lambda logits, fn, p, o, i: tgrid[None].expand(logits.shape[0], p, 2).to(logits.device)
        )
        jfl._matcher_coords = lambda r, bb, p: jnp.broadcast_to(jnp.asarray(grid)[None, None], (bb, 1, p, 2))
        jfl.uncertainty_sampled_coords = (
            lambda r, src, p, o, i: jnp.broadcast_to(jnp.asarray(grid)[None], (src.shape[0], p, 2))
        )

        def unpin():
            torch.rand = orig_rand
            tfl.get_uncertain_point_coords_with_randomness = orig_unc
            jfl._matcher_coords = orig_mc
            jfl.uncertainty_sampled_coords = orig_usc

    try:
        # shared init (converter also asserts forward parity at step 0)
        x0 = rng.integers(0, 255, (b, res, res, 3)).astype(np.float32)
        init_sd = {k: v.clone() for k, v in tmodel.state_dict().items()}
        merged, clean = load_converted(module, family, tmodel, x0)
        assert clean, "converted-init forward parity failed"

        # identical batch stream (8 distinct batches, cycled)
        n_batches = 8
        batches = []
        for i in range(n_batches):
            br = np.random.default_rng(100 + i)
            img = br.integers(0, 255, (b, res, res, 3)).astype(np.float32)
            tt, jt = make_targets(br)
            batches.append((img, tt, jt))

        def torch_run(model, grad_noise: float = 0.0):
            """The reference training stack (trainer.py:723-773, fp32).

            ``grad_noise`` > 0 multiplies every gradient entry by
            (1 + grad_noise·±1) with a fresh deterministic sign pattern per
            step — the control's model of per-step cross-framework compute
            noise (reduction-order / layout differences re-injected at EVERY
            backward, not once at init)."""
            topt = t_build_optimizer("ADAMW", LR, WD, model, weight_decay_norm=0.0,
                                     weight_decay_embed=0.0, clip_gradients=CLIP, **MULTS)
            tsched = t_sched("MULTISTEP", steps, topt)
            gen = torch.Generator().manual_seed(1234)
            losses = []
            for it in range(steps):
                img, tt, jt = batches[it % n_batches]
                topt.zero_grad()
                out_t = model(torch_in(img), tt)
                tloss = sum(out_t.loss.values())
                tloss.backward()
                if grad_noise > 0.0:
                    with torch.no_grad():
                        for p in model.parameters():
                            if p.grad is not None:
                                sign = torch.randint(0, 2, p.grad.shape, generator=gen,
                                                     dtype=torch.float32) * 2.0 - 1.0
                                p.grad.mul_(1.0 + grad_noise * sign)
                topt.step()
                tsched.step()
                losses.append(float(tloss))
            return losses

        print(f"[{family}] {steps} coupled steps, b{b}@{res}, lr={LR} (MULTISTEP+warmup), clip={CLIP}")

        # --- CONTROL ARM: torch vs torch with PER-STEP gradient noise at the
        # cross-framework compute-noise scale. Converted params are
        # bit-identical (transposes are exact), but NHWC-vs-NCHW conv
        # reduction orders differ at every forward/backward — i.e. fresh
        # noise is injected into the gradients at EVERY step, not once at
        # init. Scale 1e-5 is MEASURED, not assumed: the step-1 cross-
        # framework loss delta is ~1e-5 relative (and load_converted forward
        # parity sits at the same scale) — that is the per-step numeric
        # difference between the two frameworks'' compute. The control reproduces exactly that injection
        # schedule inside pure torch and measures how fast the reference
        # diverges FROM ITSELF — the floor any cross-framework trajectory
        # comparison must be judged against.
        tmodel_ctl = type(tmodel)(tcfg).train()
        tmodel_ctl.load_state_dict({k: v.clone() for k, v in init_sd.items()})
        ctl_losses = torch_run(tmodel_ctl, grad_noise=1e-5)

        # --- main arm: torch reference stack -----------------------------
        main_losses = torch_run(tmodel)

        # --- jax side: our training stack --------------------------------
        args = TrainerArgs(run_name="parity", learning_rate=LR, weight_decay=WD,
                           weight_decay_norm=0.0, weight_decay_embed=0.0,
                           clip_gradients=CLIP, max_iters=steps, scheduler="MULTISTEP",
                           optimizer="ADAMW", **MULTS)
        tx, _ = j_build_optimizer(merged["params"], args)
        state = create_train_state(dict(merged), tx)
        loss_fn = make_loss_fn(module, cfg)
        step = build_train_step(loss_fn, tx, donate=False)
        jrng = jax.random.PRNGKey(0)
        jax_losses = []
        for it in range(steps):
            img, tt, jt = batches[it % n_batches]
            state, metrics = step(state, (jnp.asarray(img), jt), jax.random.fold_in(jrng, it))
            jax_losses.append(float(metrics["total_loss"]))

        drifts, ctl_drifts = [], []
        for it in range(steps):
            t = main_losses[it]
            drifts.append(abs(jax_losses[it] - t) / max(abs(t), 1e-9))
            ctl_drifts.append(abs(ctl_losses[it] - t) / max(abs(t), 1e-9))
            if it < 3 or (it + 1) % 5 == 0:
                print(f"  step {it + 1:3d}: torch={t:.6f} jax={jax_losses[it]:.6f} "
                      f"rel|Δ|={drifts[-1]:.2e} (ctl {ctl_drifts[-1]:.2e})")

        glob, worst, n_leaves = _param_drift(tmodel, state.params, family)
        # control param drift: torch-final vs perturbed-torch-final, through
        # the SAME converter mapping so the metric is apples-to-apples
        from focoos_tpu.utils.torch_convert import convert_state_dict

        ctl_sd = {k: p.detach().numpy() for k, p in tmodel_ctl.named_parameters()}
        ctl_conv, _ = convert_state_dict(ctl_sd, family, verbose=False)
        ctl_glob, ctl_worst, _ = _param_drift(tmodel, ctl_conv.get("params", {}), family)
        print(f"  loss drift:  jax-vs-torch max={max(drifts):.2e}  "
              f"control(torch per-step grad noise 1e-5) max={max(ctl_drifts):.2e}")
        print(f"  param drift: jax-vs-torch global rel-L2={glob:.2e}  control={ctl_glob:.2e} "
              f"({n_leaves} leaves)")
        for r, k in worst[:3]:
            print(f"    worst jax-vs-torch leaf: {k} rel={r:.2e}")

        # held-out output drift: run OUR forward with both final weight sets
        ho = np.random.default_rng(999).integers(0, 255, (b, res, res, 3)).astype(np.float32)
        tsd = {k: (p.detach().numpy() if hasattr(p, "detach") else p)
               for k, p in tmodel.state_dict().items()}
        conv, _ = convert_state_dict(tsd, family, verbose=False)
        vars_torch_final = {"params": conv["params"],
                            "batch_stats": conv.get("batch_stats", state.batch_stats)}
        vars_jax_final = {"params": state.params, "batch_stats": state.batch_stats}
        out_j, _ = module.apply(vars_jax_final, jnp.asarray(ho), train=False)
        out_t2, _ = module.apply(vars_torch_final, jnp.asarray(ho), train=False)
        out_rel = max(
            _rel_l2(np.asarray(a), np.asarray(bb))
            for a, bb in zip(jax.tree.leaves(out_j), jax.tree.leaves(out_t2))
        )
        print(f"  held-out output drift (max leaf rel-L2): {out_rel:.2e}")

        # GATES — judged against the measured control floor, not against zero:
        # the jax trajectory must diverge from torch NO FASTER than torch
        # diverges from itself under an ULP init perturbation (x3 headroom
        # because our "perturbation" — f32 convert/reduction-order noise —
        # is a few ULP, not exactly one), plus absolute early-step coupling.
        early = max(drifts[: min(3, steps)])
        ok_early = early < 1e-3
        ok_loss = max(drifts) < max(3.0 * max(ctl_drifts), 1e-3)
        ok_param = glob < max(3.0 * ctl_glob, 1e-3)
        print(f"  GATES: early-coupling(<1e-3)={'OK' if ok_early else 'FAIL'} ({early:.1e}); "
              f"loss<=3x control={'OK' if ok_loss else 'FAIL'}; "
              f"param<=3x control={'OK' if ok_param else 'FAIL'}")
        return ok_early and ok_loss and ok_param
    finally:
        unpin()


def evaluator_delta_fai_detr(steps: int) -> bool:
    """Run our COCO evaluator with BOTH frameworks' final fai_detr weights on
    one fixed synthetic val set; the bbox/AP delta is the end-metric cost of
    training-dynamics divergence (reference flow: trainer/trainer.py _val →
    evaluation/evaluator.py inference_on_dataset)."""
    # The coupled loop above already converges torch->jax params to ~1e-3;
    # here we re-run a SHORT coupled loop and push both through eval.
    import torch

    torch.manual_seed(0)
    import jax
    import jax.numpy as jnp

    from focoos.trainer.solver.build import build_lr_scheduler as t_sched
    from focoos.trainer.solver.build import build_optimizer as t_build_optimizer
    from focoos.models.fai_detr.config import DETRConfig as TC
    from focoos.models.fai_detr.modelling import FAIDetr as TM

    from focoos_tpu.models.fai_detr.config import DETRConfig as JC
    from focoos_tpu.models.fai_detr.loss import make_loss_fn
    from focoos_tpu.models.fai_detr.modelling import FAIDetr as JM
    from focoos_tpu.ports import TrainerArgs
    from focoos_tpu.trainer.solver import build_optimizer as j_build_optimizer
    from focoos_tpu.trainer.train_step import build_train_step, create_train_state
    from focoos_tpu.utils.torch_convert import convert_state_dict

    b, res, ncls = 2, 128, 7
    rng = np.random.default_rng(33)
    tcfg = TC(num_classes=ncls, backbone_config=make_torch_backbone_cfg("resnet"),
              num_queries=20, transformer_predictor_dec_layers=2)
    tmodel = TM(tcfg).train()
    bcfg, bmodule = make_jax_backbone("resnet")
    cfg = JC(num_classes=ncls, backbone_config=bcfg, num_queries=20,
             transformer_predictor_dec_layers=2)
    module = JM(config=cfg, backbone=bmodule)
    x0 = rng.integers(0, 255, (b, res, res, 3)).astype(np.float32)
    merged, clean = load_converted(module, "fai_detr", tmodel, x0)
    assert clean

    lr = 3e-4  # overfit regime: learn the painted boxes fast
    topt = t_build_optimizer("ADAMW", lr, WD, tmodel, clip_gradients=CLIP, **MULTS)
    ts = t_sched("MULTISTEP", steps, topt)
    args = TrainerArgs(run_name="pe", learning_rate=lr, weight_decay=WD, clip_gradients=CLIP,
                       max_iters=steps, scheduler="MULTISTEP", optimizer="ADAMW", **MULTS)
    tx, _ = j_build_optimizer(merged["params"], args)
    state = create_train_state(dict(merged), tx)
    step = build_train_step(make_loss_fn(module, cfg), tx, donate=False)

    # fixed val set doubles as the train batch source (overfit regime makes
    # AP respond strongly to weights — a SENSITIVE drift probe). Images are
    # LEARNABLE: each GT box is painted as a bright class-colored rectangle
    # on a dark background, so AP rises well above 0 within ~100 steps.
    val = []
    for i in range(4):
        br = np.random.default_rng(500 + i)
        tt, jt = _ragged_targets_detr(br, b, 5, ncls)
        img = np.full((b, res, res, 3), 30.0, np.float32)
        img += br.normal(0, 5, img.shape).astype(np.float32)
        boxes = np.asarray(jt.boxes)  # cxcywh normalized
        labels = np.asarray(jt.labels)
        valid = np.asarray(jt.valid)
        for bi in range(b):
            for ni in range(boxes.shape[1]):
                if not valid[bi, ni]:
                    continue
                cx, cy, w_, h_ = boxes[bi, ni] * res
                x1, y1 = int(max(0, cx - w_ / 2)), int(max(0, cy - h_ / 2))
                x2, y2 = int(min(res, cx + w_ / 2)), int(min(res, cy + h_ / 2))
                c = labels[bi, ni]
                color = np.array([60 + 25 * c, 230 - 25 * c, 40 + 30 * (c % 3)], np.float32)
                img[bi, y1:y2, x1:x2] = color
        val.append((img.clip(0, 255), tt, jt))

    # control arm: pure torch + per-step gradient noise at the measured
    # cross-framework scale (same rationale as _train_loop_parity) — its AP
    # delta vs the clean torch run is the chaos floor for the AP metric
    tmodel_ctl = type(tmodel)(tcfg).train()
    tmodel_ctl.load_state_dict({k: v.clone() for k, v in tmodel.state_dict().items()})
    topt_ctl = t_build_optimizer("ADAMW", lr, WD, tmodel_ctl, clip_gradients=CLIP, **MULTS)
    ts_ctl = t_sched("MULTISTEP", steps, topt_ctl)
    gen = torch.Generator().manual_seed(99)

    for it in range(steps):
        img, tt, jt = val[it % len(val)]
        topt.zero_grad()
        loss = sum(tmodel(torch.from_numpy(img.transpose(0, 3, 1, 2)), tt).loss.values())
        loss.backward()
        topt.step()
        ts.step()
        topt_ctl.zero_grad()
        loss_c = sum(tmodel_ctl(torch.from_numpy(img.transpose(0, 3, 1, 2)), tt).loss.values())
        loss_c.backward()
        with torch.no_grad():
            for p in tmodel_ctl.parameters():
                if p.grad is not None:
                    sign = torch.randint(0, 2, p.grad.shape, generator=gen, dtype=torch.float32) * 2.0 - 1.0
                    p.grad.mul_(1.0 + 1e-5 * sign)
        topt_ctl.step()
        ts_ctl.step()
        state, _ = step(state, (jnp.asarray(img), jt), jax.random.fold_in(jax.random.PRNGKey(0), it))

    tsd = {k: (p.detach().numpy() if hasattr(p, "detach") else p) for k, p in tmodel.state_dict().items()}
    conv, _ = convert_state_dict(tsd, "fai_detr", verbose=False)
    tsd_c = {k: (p.detach().numpy() if hasattr(p, "detach") else p) for k, p in tmodel_ctl.state_dict().items()}
    conv_c, _ = convert_state_dict(tsd_c, "fai_detr", verbose=False)

    from focoos_tpu.trainer.evaluation.coco_eval import CocoStyleEvaluator

    def run_eval(variables):
        ev = CocoStyleEvaluator(ncls, "bbox")
        for img, tt, jt in val:
            out, _ = module.apply(variables, jnp.asarray(img), train=False)
            boxes = np.asarray(out.boxes, np.float64)  # [b,Q,4] xyxy-normalized
            logits = np.asarray(out.logits, np.float64)
            for i in range(b):
                scores = 1 / (1 + np.exp(-logits[i]))
                cls = scores.argmax(-1).astype(np.int64)
                sc = scores.max(-1)
                bx = boxes[i] * res
                gt = np.asarray(jt.boxes[i]) * res  # cxcywh abs -> xyxy
                gt_boxes = np.stack([gt[:, 0] - gt[:, 2] / 2, gt[:, 1] - gt[:, 3] / 2,
                                     gt[:, 0] + gt[:, 2] / 2, gt[:, 1] + gt[:, 3] / 2], -1)
                valid = np.asarray(jt.valid[i])
                gt_boxes = gt_boxes[valid]
                areas = (gt_boxes[:, 2] - gt_boxes[:, 0]) * (gt_boxes[:, 3] - gt_boxes[:, 1])
                ev.add_image(
                    dt_classes=cls, dt_scores=sc, dt_boxes=bx,
                    gt_classes=np.asarray(jt.labels[i], np.int64)[valid],
                    gt_boxes=gt_boxes, gt_areas=areas,
                )
        return ev.summarize("bbox")

    m_jax = run_eval({"params": state.params, "batch_stats": state.batch_stats})
    m_torch = run_eval({"params": conv["params"], "batch_stats": conv.get("batch_stats", state.batch_stats)})
    m_ctl = run_eval({"params": conv_c["params"], "batch_stats": conv_c.get("batch_stats", state.batch_stats)})
    ap_j = float(m_jax.get("AP", 0.0) or 0.0)
    ap_t = float(m_torch.get("AP", 0.0) or 0.0)
    ap_c = float(m_ctl.get("AP", 0.0) or 0.0)
    d = abs(ap_j - ap_t)
    d_ctl = abs(ap_c - ap_t)
    print(f"[fai_detr evaluator delta @{steps} steps] jax-trained AP={ap_j:.3f} "
          f"torch-trained AP={ap_t:.3f} |Δ|={d:.3f}  (control torch+noise AP={ap_c:.3f} |Δ|={d_ctl:.3f})")
    # saturated-overfit regime: both frameworks must reach the same quality.
    # Gate: jax's AP delta within 1 point absolute, or within 3x the chaos
    # floor the control measures (mid-curve AP is hypersensitive: the control
    # itself swings by several points before saturation).
    ok = d <= 1.0 or d <= 3.0 * max(d_ctl, 0.1)
    print(f"  GATE: |ΔAP| <= 1.0 or <= 3x control -> {'OK' if ok else 'FAIL'}")
    return ok


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import _reference_compat

    _reference_compat.install()

    ap = argparse.ArgumentParser()
    ap.add_argument("what", nargs="?", default="all",
                    choices=["fai_detr", "fai_mf", "bisenetformer", "fai_cls", "all", "eval"])
    ap.add_argument("--steps", type=int, default=50)
    ns = ap.parse_args()

    results = {}
    if ns.what in ("fai_detr", "all"):
        results["fai_detr loop"] = _train_loop_parity("fai_detr", ns.steps)
    if ns.what in ("fai_mf", "all"):
        results["fai_mf loop"] = _train_loop_parity("fai_mf", ns.steps)
    if ns.what in ("bisenetformer", "all"):
        results["bisenetformer loop"] = _train_loop_parity("bisenetformer", ns.steps)
    if ns.what in ("fai_cls", "all"):
        results["fai_cls loop"] = _train_loop_parity("fai_cls", ns.steps)
    if ns.what in ("eval", "all"):
        results["fai_detr evaluator delta"] = evaluator_delta_fai_detr(max(300, 2 * ns.steps))

    print("\n== closed-loop training parity ==")
    for k, v in results.items():
        print(f"  {k}: {'PASS' if v else 'FAIL'}")
    sys.exit(0 if all(results.values()) else 1)


if __name__ == "__main__":
    main()
