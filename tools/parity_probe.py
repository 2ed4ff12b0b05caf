"""End-metric overfit probes, multi-seed (VERDICT r4 next #3 and #6).

Three arms from ONE converted init on learnable synthetic scenes:
  torch        — the reference training stack (trainer.py:723-773 semantics)
  torch+noise  — control: per-step gradient noise at the measured
                 cross-framework compute-noise scale (1e-5; see
                 parity_train.py for the calibration argument)
  jax          — our full training stack (train_step.py)

All three final weight sets are scored with OUR evaluator core through OUR
jax forward (torch weights mapped by the converter), so the only varying
factor is the training dynamics. Unlike the coupled-trajectory parity in
parity_train.py, this needs no comparable per-step numerics — which is what
makes an rtmo probe possible at all (its MLE loss composes train-mode BN
noise through -log(p+1e-4); coupled trajectories are incomparable, end
metrics are fine — reference losses: focoos/models/rtmo/loss.py:360-940).

Families:
  detr    — bbox/AP probe (painted class-colored boxes), as in
            parity_train.evaluator_delta_fai_detr but seedable
  rtmo    — OKS keypoint-AP probe: persons painted as gray boxes with a
            fixed per-keypoint color-dot template (reference trains rtmo
            through the same loop as every family, trainer.py:723-773)
  bisenet — mIoU probe for the mask-criterion family at 128² (8-px-aligned
            painted class rectangles so img-res and mask-res GT agree
            exactly)

Gate per seed (same as r4's detr probe): |Δmetric(jax, torch)| <= 1.0 point
absolute or <= 3x the control's delta. The multi-seed spread is the point:
one seed cannot separate "fine" from "subtly biased" (VERDICT r4 weak #5).

Usage: python tools/parity_probe.py [detr|rtmo|bisenet|all]
                                    [--steps 300] [--seeds 3]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parity import load_converted, make_jax_backbone, make_torch_backbone_cfg  # noqa: E402

LR, WD, CLIP = 3e-4, 1e-4, 0.1
MULTS = dict(backbone_multiplier=0.1, decoder_multiplier=1.0, head_multiplier=1.0)
NOISE = 1e-5  # measured cross-framework per-step compute-noise scale


def _three_arms(tmodel, tcfg, merged, module, cfg, make_loss_fn, batches, steps, jt_of, tt_of):
    """Run the three training arms; return the three final variable sets
    (torch arms mapped through the weight converter)."""
    import torch

    import jax
    import jax.numpy as jnp

    from focoos.trainer.solver.build import build_lr_scheduler as t_sched
    from focoos.trainer.solver.build import build_optimizer as t_build_optimizer

    from focoos_tpu.ports import TrainerArgs
    from focoos_tpu.trainer.solver import build_optimizer as j_build_optimizer
    from focoos_tpu.trainer.train_step import build_train_step, create_train_state
    from focoos_tpu.utils.torch_convert import convert_state_dict

    init_sd = {k: v.clone() for k, v in tmodel.state_dict().items()}
    tmodel_ctl = type(tmodel)(tcfg).train()
    tmodel_ctl.load_state_dict({k: v.clone() for k, v in init_sd.items()})

    def torch_run(model, grad_noise):
        topt = t_build_optimizer("ADAMW", LR, WD, model, weight_decay_norm=0.0,
                                 weight_decay_embed=0.0, clip_gradients=CLIP, **MULTS)
        tsched = t_sched("MULTISTEP", steps, topt)
        gen = torch.Generator().manual_seed(99)
        for it in range(steps):
            img = batches[it % len(batches)][0]
            tt = tt_of(batches[it % len(batches)])
            topt.zero_grad()
            loss = sum(model(torch.from_numpy(img.transpose(0, 3, 1, 2)), tt).loss.values())
            loss.backward()
            if grad_noise > 0:
                with torch.no_grad():
                    for p in model.parameters():
                        if p.grad is not None:
                            sign = torch.randint(0, 2, p.grad.shape, generator=gen,
                                                 dtype=torch.float32) * 2.0 - 1.0
                            p.grad.mul_(1.0 + grad_noise * sign)
            topt.step()
            tsched.step()

    t0 = time.monotonic()
    torch_run(tmodel, 0.0)
    torch_run(tmodel_ctl, NOISE)
    t_torch = time.monotonic() - t0

    args = TrainerArgs(run_name="probe", learning_rate=LR, weight_decay=WD,
                       weight_decay_norm=0.0, weight_decay_embed=0.0,
                       clip_gradients=CLIP, max_iters=steps, scheduler="MULTISTEP",
                       optimizer="ADAMW", **MULTS)
    tx, _ = j_build_optimizer(merged["params"], args)
    state = create_train_state(dict(merged), tx)
    step = build_train_step(make_loss_fn(module, cfg), tx, donate=False)
    t0 = time.monotonic()
    for it in range(steps):
        img = batches[it % len(batches)][0]
        jt = jt_of(batches[it % len(batches)])
        state, _ = step(state, (jnp.asarray(img), jt),
                        jax.random.fold_in(jax.random.PRNGKey(0), it))
    print(f"    arms trained: torch(x2) {t_torch:.0f}s, jax {time.monotonic() - t0:.0f}s",
          file=sys.stderr, flush=True)

    def conv_vars(model):
        tsd = {k: (p.detach().numpy() if hasattr(p, "detach") else p)
               for k, p in model.state_dict().items()}
        conv, _ = convert_state_dict(tsd, _FAMILY[0], verbose=False)
        return {"params": conv["params"],
                "batch_stats": conv.get("batch_stats", state.batch_stats)}

    return (conv_vars(tmodel), conv_vars(tmodel_ctl),
            {"params": state.params, "batch_stats": state.batch_stats})


_FAMILY = [None]  # set per probe for the converter


# ---------------------------------------------------------------- detr ----
def probe_detr(steps: int, seed: int):
    import torch

    torch.manual_seed(seed)
    import jax.numpy as jnp

    from focoos.models.fai_detr.config import DETRConfig as TC
    from focoos.models.fai_detr.modelling import FAIDetr as TM

    from focoos_tpu.models.fai_detr.config import DETRConfig as JC
    from focoos_tpu.models.fai_detr.loss import make_loss_fn
    from focoos_tpu.models.fai_detr.modelling import FAIDetr as JM
    from focoos_tpu.trainer.evaluation.coco_eval import CocoStyleEvaluator

    from parity_loss import _ragged_targets_detr

    _FAMILY[0] = "fai_detr"
    b, res, ncls = 2, 128, 7
    rng = np.random.default_rng(seed)
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

    batches = []
    for i in range(4):
        br = np.random.default_rng(seed * 1000 + 500 + i)
        tt, jt = _ragged_targets_detr(br, b, 5, ncls)
        img = np.full((b, res, res, 3), 30.0, np.float32)
        img += br.normal(0, 5, img.shape).astype(np.float32)
        boxes, labels, valid = np.asarray(jt.boxes), np.asarray(jt.labels), np.asarray(jt.valid)
        for bi in range(b):
            for ni in range(boxes.shape[1]):
                if not valid[bi, ni]:
                    continue
                cx, cy, w_, h_ = boxes[bi, ni] * res
                x1, y1 = int(max(0, cx - w_ / 2)), int(max(0, cy - h_ / 2))
                x2, y2 = int(min(res, cx + w_ / 2)), int(min(res, cy + h_ / 2))
                c = labels[bi, ni]
                img[bi, y1:y2, x1:x2] = np.array(
                    [60 + 25 * c, 230 - 25 * c, 40 + 30 * (c % 3)], np.float32)
        batches.append((img.clip(0, 255), tt, jt))

    vt, vc, vj = _three_arms(tmodel, tcfg, merged, module, cfg, make_loss_fn,
                             batches, steps, lambda bch: bch[2], lambda bch: bch[1])

    def score(variables):
        ev = CocoStyleEvaluator(ncls, "bbox")
        for img, tt, jt in batches:
            out, _ = module.apply(variables, jnp.asarray(img), train=False)
            bx_all = np.asarray(out.boxes, np.float64) * res
            lg = np.asarray(out.logits, np.float64)
            for i in range(b):
                scores = 1 / (1 + np.exp(-lg[i]))
                gt = np.asarray(jt.boxes[i]) * res
                gt_boxes = np.stack([gt[:, 0] - gt[:, 2] / 2, gt[:, 1] - gt[:, 3] / 2,
                                     gt[:, 0] + gt[:, 2] / 2, gt[:, 1] + gt[:, 3] / 2], -1)
                valid = np.asarray(jt.valid[i])
                gt_boxes = gt_boxes[valid]
                ev.add_image(
                    dt_classes=scores.argmax(-1).astype(np.int64),
                    dt_scores=scores.max(-1), dt_boxes=bx_all[i],
                    gt_classes=np.asarray(jt.labels[i], np.int64)[valid],
                    gt_boxes=gt_boxes,
                    gt_areas=(gt_boxes[:, 2] - gt_boxes[:, 0]) * (gt_boxes[:, 3] - gt_boxes[:, 1]),
                )
        return float(ev.summarize("bbox").get("AP", 0.0) or 0.0)

    return score(vt), score(vc), score(vj), "bbox/AP"


# ---------------------------------------------------------------- rtmo ----
# fixed stick-figure-ish template: keypoint j sits at (U[j], V[j]) relative
# to its person box — a deterministic, learnable box→pose mapping
_KPT_U = np.array([0.5, 0.42, 0.58, 0.34, 0.66, 0.25, 0.75, 0.15, 0.85,
                   0.1, 0.9, 0.35, 0.65, 0.3, 0.7, 0.28, 0.72])
_KPT_V = np.array([0.08, 0.05, 0.05, 0.08, 0.08, 0.25, 0.25, 0.45, 0.45,
                   0.6, 0.6, 0.55, 0.55, 0.75, 0.75, 0.95, 0.95])


def probe_rtmo(steps: int, seed: int):
    import torch

    torch.manual_seed(seed)
    import jax.numpy as jnp

    from focoos.models.rtmo.config import RTMOConfig as TC
    from focoos.models.rtmo.modelling import RTMO as TM
    from focoos.models.rtmo.ports import KeypointTargets as TT

    from focoos_tpu.models.rtmo.config import RTMOConfig as JC
    from focoos_tpu.models.rtmo.loss import make_loss_fn
    from focoos_tpu.models.rtmo.modelling import RTMO as JM
    from focoos_tpu.models.rtmo.ports import KeypointTargets as JT
    from focoos_tpu.trainer.evaluation.coco_eval import CocoStyleEvaluator

    _FAMILY[0] = "rtmo"
    b, res, n = 2, 128, 3
    rng = np.random.default_rng(seed)
    tcfg = TC(num_classes=1, backbone_config=make_torch_backbone_cfg("csp_darknet"))
    tmodel = TM(tcfg).train()
    bcfg, bmodule = make_jax_backbone("csp_darknet")
    cfg = JC(num_classes=1, backbone_config=bcfg)
    module = JM(config=cfg, backbone=bmodule)
    k = len(_KPT_U)
    x0 = rng.integers(0, 255, (b, res, res, 3)).astype(np.float32)
    merged, clean = load_converted(module, "rtmo", tmodel, x0)
    assert clean

    # distinct bright color per keypoint id (learnable dot signature)
    colors = np.stack([
        np.array([(37 * j + 120) % 200 + 55, (91 * j + 40) % 200 + 55, (53 * j + 200) % 200 + 55])
        for j in range(k)
    ]).astype(np.float32)

    batches = []
    for i in range(4):
        br = np.random.default_rng(seed * 1000 + 700 + i)
        counts = br.integers(1, n + 1, b)
        x0y0 = br.uniform(4, 60, (b, n, 2)).astype(np.float32)
        wh = br.uniform(36, 60, (b, n, 2)).astype(np.float32)
        boxes = np.concatenate([x0y0, np.minimum(x0y0 + wh, res - 1.0)], -1)
        w_ = boxes[..., 2] - boxes[..., 0]
        h_ = boxes[..., 3] - boxes[..., 1]
        kx = boxes[..., 0:1] + _KPT_U[None, None] * w_[..., None]
        ky = boxes[..., 1:2] + _KPT_V[None, None] * h_[..., None]
        kpts = np.stack([kx, ky], -1).astype(np.float32)  # [b, n, k, 2]
        vis = np.ones((b, n, k), np.float32)
        areas = (w_ * h_).astype(np.float32)
        labels = np.zeros((b, n), np.int32)
        valid = np.arange(n)[None] < counts[:, None]

        img = np.full((b, res, res, 3), 25.0, np.float32)
        img += br.normal(0, 4, img.shape).astype(np.float32)
        for bi in range(b):
            for ni in range(counts[bi]):
                x1, y1, x2, y2 = boxes[bi, ni].astype(int)
                img[bi, y1:y2, x1:x2] = 90.0  # person silhouette
                for j in range(k):
                    px, py = int(kpts[bi, ni, j, 0]), int(kpts[bi, ni, j, 1])
                    img[bi, max(0, py - 1): py + 2, max(0, px - 1): px + 2] = colors[j]
        tt = [TT(boxes=torch.from_numpy(boxes[i2, : counts[i2]]),
                 labels=torch.from_numpy(labels[i2, : counts[i2]]).long(),
                 keypoints=torch.from_numpy(kpts[i2, : counts[i2]]),
                 keypoints_visible=torch.from_numpy(vis[i2, : counts[i2]]),
                 areas=torch.from_numpy(areas[i2, : counts[i2]]),
                 scores=None, priors=None, keypoints_visible_weights=None)
              for i2 in range(b)]
        jt = JT(labels=jnp.asarray(labels), boxes=jnp.asarray(boxes),
                keypoints=jnp.asarray(kpts), keypoints_visible=jnp.asarray(vis),
                areas=jnp.asarray(areas), valid=jnp.asarray(valid))
        batches.append((img.clip(0, 255), tt, jt, boxes, kpts, vis, areas, valid))

    vt, vc, vj = _three_arms(tmodel, tcfg, merged, module, cfg, make_loss_fn,
                             batches, steps, lambda bch: bch[2], lambda bch: bch[1])

    def score(variables):
        ev = CocoStyleEvaluator(1, "oks")
        for img, tt, jt, boxes, kpts, vis, areas, valid in batches:
            out, _ = module.apply(variables, jnp.asarray(img), train=False)
            sc = np.asarray(out.scores, np.float64)
            dbx = np.asarray(out.boxes, np.float64)
            dkp = np.asarray(out.keypoints, np.float64)
            dks = np.asarray(out.keypoints_scores, np.float64)
            for i in range(b):
                keep = sc[i] > 0.01
                dt_kpts = np.concatenate([dkp[i][keep], dks[i][keep][..., None]], -1)
                gsel = valid[i]
                gt_kpts = np.concatenate([kpts[i][gsel], vis[i][gsel][..., None]], -1)
                ev.add_image(
                    dt_classes=np.zeros(int(keep.sum()), np.int64),
                    dt_scores=sc[i][keep], dt_kpts=dt_kpts, dt_boxes=dbx[i][keep],
                    gt_classes=np.zeros(int(gsel.sum()), np.int64),
                    gt_areas=areas[i][gsel].astype(np.float64),
                    gt_kpts=gt_kpts,
                )
        return float(ev.summarize("keypoints").get("AP", 0.0) or 0.0)

    return score(vt), score(vc), score(vj), "keypoints/AP"


# ------------------------------------------------------------- bisenet ----
def probe_bisenet(steps: int, seed: int):
    import torch

    torch.manual_seed(seed)
    import jax.numpy as jnp

    from focoos.models.bisenetformer.config import BisenetFormerConfig as TC
    from focoos.models.bisenetformer.modelling import BisenetFormer as TM
    from focoos.models.bisenetformer.ports import BisenetFormerTargets as TT

    from focoos_tpu.models.bisenetformer.config import BisenetFormerConfig as JC
    from focoos_tpu.models.bisenetformer.loss import make_loss_fn
    from focoos_tpu.models.bisenetformer.modelling import BisenetFormer as JM
    from focoos_tpu.models.fai_mf.ports import MaskFormerTargets as JT
    from focoos_tpu.trainer.evaluation.evaluators import SemSegEvaluator
    from focoos_tpu.ports import DatasetEntry

    _FAMILY[0] = "bisenetformer"
    b, res, ncls, n = 2, 128, 5, 4
    mask_div = 8  # bisenet head emits masks at H/8
    rng = np.random.default_rng(seed)
    kw = dict(num_classes=ncls, num_queries=20, transformer_predictor_dec_layers=2,
              pixel_decoder_feat_dim=64, pixel_decoder_out_dim=64,
              transformer_predictor_hidden_dim=64, transformer_predictor_out_dim=64,
              criterion_num_points=256)
    tcfg = TC(backbone_config=make_torch_backbone_cfg("resnet"), **kw)
    tmodel = TM(tcfg).train()
    bcfg, bmodule = make_jax_backbone("resnet")
    module = JM(config=JC(backbone_config=bcfg, **kw), backbone=bmodule)
    cfg = module.config
    x0 = rng.integers(0, 255, (b, res, res, 3)).astype(np.float32)
    merged, clean = load_converted(module, "bisenetformer", tmodel, x0)
    assert clean

    g = res // mask_div  # mask-res grid; rectangles aligned to mask_div px
    batches = []
    for i in range(4):
        br = np.random.default_rng(seed * 1000 + 900 + i)
        img = np.full((b, res, res, 3), 30.0, np.float32)
        img += br.normal(0, 4, img.shape).astype(np.float32)
        seg = np.zeros((b, res, res), np.int64)  # class 0 = background
        masks_img = np.zeros((b, n, res, res), np.float32)
        masks_msk = np.zeros((b, n, g, g), np.float32)
        labels = np.zeros((b, n), np.int32)
        for bi in range(b):
            # background as instance 0 covers everything not painted later
            order = br.permutation(ncls - 1)[: n - 1] + 1
            labels[bi, 0] = 0
            for ni, c in enumerate(order, start=1):
                gx1, gy1 = br.integers(0, g - 4, 2)
                gw, gh = br.integers(3, min(8, g - max(gx1, gy1)), 2)
                x1, y1, x2, y2 = gx1 * mask_div, gy1 * mask_div, (gx1 + gw) * mask_div, (gy1 + gh) * mask_div
                seg[bi, y1:y2, x1:x2] = c
                img[bi, y1:y2, x1:x2] = np.array(
                    [50 + 40 * c, 240 - 40 * c, 30 + 45 * (c % 4)], np.float32)
                labels[bi, ni] = c
            for ni in range(n):
                # instance ni's region: exactly the pixels its class owns
                m = seg[bi] == labels[bi, ni]
                masks_img[bi, ni] = m.astype(np.float32)
                masks_msk[bi, ni] = m[::mask_div, ::mask_div].astype(np.float32)
        valid = np.ones((b, n), bool)
        tt = [TT(labels=torch.from_numpy(labels[i2]).long(),
                 masks=torch.from_numpy(masks_img[i2]))
              for i2 in range(b)]
        jt = JT(labels=jnp.asarray(labels), masks=jnp.asarray(masks_msk),
                valid=jnp.asarray(valid))
        batches.append((img.clip(0, 255), tt, jt, seg))

    vt, vc, vj = _three_arms(tmodel, tcfg, merged, module, cfg, make_loss_fn,
                             batches, steps, lambda bch: bch[2], lambda bch: bch[1])

    def score(variables):
        ev = SemSegEvaluator(num_classes=ncls)
        for img, tt, jt, seg in batches:
            out, _ = module.apply(variables, jnp.asarray(img), train=False)
            sem = jnp.einsum("bqc,bqhw->bchw", out.logits.astype(jnp.float32),
                             out.masks.astype(jnp.float32))
            pred = np.asarray(jnp.argmax(sem, 1))
            for i in range(b):
                up = np.kron(pred[i], np.ones((seg.shape[1] // pred.shape[1],
                                               seg.shape[2] // pred.shape[2]), np.int64))
                ev.process([DatasetEntry(sem_seg=seg[i])], [{"sem_seg": up}])
        return float(ev.evaluate()["sem_seg"]["mIoU"])

    return score(vt), score(vc), score(vj), "sem_seg/mIoU"


PROBES = {"detr": probe_detr, "rtmo": probe_rtmo, "bisenet": probe_bisenet}


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import _reference_compat

    _reference_compat.install()

    ap = argparse.ArgumentParser()
    ap.add_argument("what", nargs="?", default="all", choices=[*PROBES, "all"])
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--seeds", type=int, default=3)
    ns = ap.parse_args()

    todo = list(PROBES) if ns.what == "all" else [ns.what]
    results = {}
    all_ok = True
    for fam in todo:
        rows = []
        for s in range(ns.seeds):
            t0 = time.monotonic()
            m_t, m_c, m_j, metric = PROBES[fam](ns.steps, seed=11 + 7 * s)
            d, d_ctl = abs(m_j - m_t), abs(m_c - m_t)
            ok = d <= 1.0 or d <= 3.0 * max(d_ctl, 0.1)
            rows.append(dict(seed=11 + 7 * s, torch=round(m_t, 3), ctl=round(m_c, 3),
                             jax=round(m_j, 3), d=round(d, 3), d_ctl=round(d_ctl, 3),
                             ok=ok, wall_s=round(time.monotonic() - t0, 1)))
            print(f"[{fam} seed {11 + 7 * s}] {metric}: torch={m_t:.2f} ctl={m_c:.2f} "
                  f"jax={m_j:.2f} |d|={d:.2f} (ctl {d_ctl:.2f}) "
                  f"{'OK' if ok else 'FAIL'} [{rows[-1]['wall_s']}s]", flush=True)
            print(json.dumps({fam: rows}), flush=True)
        ds = [r["d"] for r in rows]
        dcs = [r["d_ctl"] for r in rows]
        summary = dict(metric=metric, rows=rows,
                       d_mean=round(float(np.mean(ds)), 3), d_max=round(max(ds), 3),
                       d_ctl_mean=round(float(np.mean(dcs)), 3),
                       ok=all(r["ok"] for r in rows))
        results[fam] = summary
        all_ok &= summary["ok"]
        print(f"== {fam}: |d| mean {summary['d_mean']} max {summary['d_max']} "
              f"(ctl mean {summary['d_ctl_mean']}) -> {'PASS' if summary['ok'] else 'FAIL'}",
              flush=True)
    print(json.dumps(results), flush=True)
    os._exit(0 if all_ok else 1)


if __name__ == "__main__":
    main()
