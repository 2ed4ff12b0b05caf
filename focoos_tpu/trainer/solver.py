"""Optimizer + LR-schedule construction (reference: focoos/trainer/solver/).

The reference builds torch per-parameter groups by walking named_modules
(solver/build.py:39-103); here the same policy is expressed as pure
functions over pytree paths, composed into a single optax chain:

    clip_by_global_norm → adam/sgd/rmsprop moments → per-leaf weight decay
    → per-leaf LR multiplier → global schedule

Everything is a jit-compatible GradientTransformation; schedules are plain
``step -> lr`` functions (solver/lr_scheduler.py parity: POLY / MULTISTEP /
COSINE / FIXED, each with linear warmup).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from focoos_tpu.ports import TrainerArgs

# ---------------------------------------------------------------------------
# schedules
# ---------------------------------------------------------------------------


def _warmup_factor(step: jnp.ndarray, warmup_iters: int, warmup_factor: float) -> jnp.ndarray:
    """Linear warmup (reference: solver/lr_scheduler.py:_get_warmup_factor_at_iter)."""
    if warmup_iters <= 0:
        return jnp.ones_like(step, jnp.float32)
    alpha = jnp.clip(step.astype(jnp.float32) / warmup_iters, 0.0, 1.0)
    return jnp.where(step >= warmup_iters, 1.0, warmup_factor * (1 - alpha) + alpha)


def build_schedule(
    name: str,
    base_lr: float,
    max_iters: int,
    extra: Optional[dict] = None,
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    extra = dict(extra or {})
    warmup_iters = int(extra.pop("warmup_iters", 0))
    warmup_factor = float(extra.pop("warmup_factor", 1.0))
    extra.pop("warmup_method", None)
    name = name.upper()

    if name == "FIXED":

        def sched(step):
            return base_lr * _warmup_factor(step, warmup_iters, warmup_factor)

    elif name == "POLY":
        power = float(extra.pop("power", 0.9))
        constant_ending = float(extra.pop("constant_ending", 0.0))

        def sched(step):
            w = _warmup_factor(step, warmup_iters, warmup_factor)
            frac = jnp.power(1.0 - step.astype(jnp.float32) / max_iters, power)
            if constant_ending > 0:
                frac = jnp.maximum(frac, constant_ending)
            return base_lr * w * frac

    elif name == "MULTISTEP":
        # reference default: NO milestones — constant LR unless the user
        # passes scheduler_extra={"milestones": [...]} (WarmupMultiStepLR
        # lr_scheduler.py:78 milestones=[]). A [0.5, 0.75] default here
        # silently trained at 10-100x lower LR in the final half vs the
        # reference — caught by tools/parity_train.py closed-loop drift.
        milestones = [int(m * max_iters) for m in extra.pop("milestones", [])]
        gamma = float(extra.pop("gamma", 0.1))

        def sched(step):
            w = _warmup_factor(step, warmup_iters, warmup_factor)
            k = sum(jnp.where(step >= m, 1.0, 0.0) for m in milestones)
            return base_lr * w * jnp.power(gamma, k)

    elif name == "COSINE":

        def sched(step):
            w = _warmup_factor(step, warmup_iters, warmup_factor)
            return base_lr * w * 0.5 * (1.0 + jnp.cos(jnp.pi * step.astype(jnp.float32) / max_iters))

    else:
        raise NotImplementedError(f"Scheduler {name} not supported (POLY/FIXED/COSINE/MULTISTEP)")

    return sched


# ---------------------------------------------------------------------------
# per-leaf hyperparameter policy
# ---------------------------------------------------------------------------


def _path_str(path: Tuple) -> str:
    return "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path).lower()


def leaf_hyperparams(
    params: Any,
    base_wd: float,
    wd_norm: float = 0.0,
    wd_embed: float = 0.0,
    backbone_multiplier: float = 0.1,
    decoder_multiplier: float = 1.0,
    head_multiplier: float = 1.0,
    freeze_paths: Tuple[str, ...] = (),
    freeze_bn: bool = False,
) -> Tuple[Any, Any]:
    """→ (lr_mult_tree, wd_tree) following the reference policy
    (solver/build.py:81-101): substring matches on the parameter path.

    ``freeze_paths`` / ``freeze_bn`` zero both the LR multiplier and the
    weight decay for matching leaves — the functional analog of torch's
    ``requires_grad=False`` (reference: nn/backbone/resnet.py:221 freeze_at,
    trainer/trainer.py:329 freeze_bn→FrozenBatchNorm2d). Zeroing the final
    update (not just the grad) matters: decoupled AdamW weight decay would
    otherwise still move frozen weights.
    """

    # The reference matches SUBSTRINGS of torch module names
    # (solver/build.py:81-96), and its module tree nests differently from our
    # flax tree: torch `pixel_decoder.backbone.*` means the backbone hits
    # BOTH the backbone and pixel_decoder branches (multipliers stack), and
    # torch `head.predictor.*` / `head.dcc.*` hit the head branch while our
    # trees root them at `predictor` / `dcc`. Verified update-for-update
    # against torch optimizers in tools/parity_loss.py::optimizer_parity.
    has_pixel_decoder = isinstance(params, dict) and "pixel_decoder" in params

    # Norm detection must be STRUCTURAL, not by name: the reference exempts
    # norms by module TYPE (build.py:53-67 isinstance(...norm types)), and
    # flax norm layers are exactly the param dicts holding `scale` without
    # `kernel` (LayerNorm/BatchNorm/GroupNorm). A name heuristic misses e.g.
    # the predictor's `enc_output_1` LayerNorm — caught by
    # tools/parity_loss.py::optimizer_parity.
    norm_parents = set()
    for kp, _leaf in jax.tree_util.tree_leaves_with_path(params):
        parent = _path_str(kp[:-1])
        leaf_name = _path_str(kp[-1:])
        if leaf_name == "scale":
            norm_parents.add(parent)

    def _is_norm_param(p: str) -> bool:
        return p.rsplit("/", 1)[0] in norm_parents

    def _is_bn(p: str) -> bool:
        return "/bn/" in p or p.endswith("/bn")

    def _frozen(p: str) -> bool:
        return any(fp in p for fp in freeze_paths) or (freeze_bn and _is_bn(p))

    def _is_head(p: str) -> bool:
        # reference: anything under the DETR/MF/RTMO head module ("head" in
        # torch name). Our equivalents: predictor/*, dcc/*, *head* roots.
        return p.startswith("predictor/") or p.startswith("dcc/") or "head" in p

    def _in_decoder(p: str) -> bool:
        # reference "pixel_decoder" branch: the decoder subtree AND the
        # backbone nested inside it (detr/mf/bisenet; rtmo/cls have none)
        return "pixel_decoder" in p or (has_pixel_decoder and "backbone" in p)

    def mult(path, leaf):
        p = _path_str(path)
        if _frozen(p):
            return jnp.asarray(0.0, jnp.float32)
        m = 1.0
        if "backbone" in p:
            m *= backbone_multiplier
        if _in_decoder(p):
            m *= decoder_multiplier
        if _is_head(p) and "classifier" not in p:
            m *= head_multiplier
        return jnp.asarray(m, jnp.float32)

    def wd(path, leaf):
        p = _path_str(path)
        if _frozen(p):
            return jnp.asarray(0.0, jnp.float32)
        if _is_bn(p) or "norm" in p or _is_norm_param(p):
            return jnp.asarray(wd_norm, jnp.float32)
        if "embed" in p:
            return jnp.asarray(wd_embed, jnp.float32)
        # reference quirk kept as-is: the pixel_decoder branch zeroes wd when
        # BACKBONE multiplier is 0 (build.py:88 checks backbone_multiplier)
        zeroed = (
            ("backbone" in p and backbone_multiplier == 0)
            or (_in_decoder(p) and backbone_multiplier == 0)
            or (_is_head(p) and "classifier" not in p and head_multiplier == 0)
        )
        return jnp.asarray(0.0 if zeroed else base_wd, jnp.float32)

    lr_tree = jax.tree_util.tree_map_with_path(mult, params)
    wd_tree = jax.tree_util.tree_map_with_path(wd, params)
    return lr_tree, wd_tree


def _per_leaf_weight_decay(wd_tree: Any) -> optax.GradientTransformation:
    def init(params):
        return optax.EmptyState()

    def update(updates, state, params=None):
        assert params is not None
        updates = jax.tree.map(lambda u, p, w: u + w * p, updates, params, wd_tree)
        return updates, state

    return optax.GradientTransformation(init, update)


def _per_leaf_scale(mult_tree: Any) -> optax.GradientTransformation:
    def init(params):
        return optax.EmptyState()

    def update(updates, state, params=None):
        updates = jax.tree.map(lambda u, m: u * m, updates, mult_tree)
        return updates, state

    return optax.GradientTransformation(init, update)


def build_optimizer(
    params: Any, args: TrainerArgs, freeze_paths: Tuple[str, ...] = ()
) -> Tuple[optax.GradientTransformation, Callable]:
    """→ (tx, schedule_fn). Mirrors reference build_optimizer + LRScheduler hook."""
    schedule = build_schedule(args.scheduler, args.learning_rate, args.max_iters, args.scheduler_extra)
    lr_tree, wd_tree = leaf_hyperparams(
        params,
        base_wd=args.weight_decay,
        wd_norm=args.weight_decay_norm,
        wd_embed=args.weight_decay_embed,
        backbone_multiplier=args.backbone_multiplier,
        decoder_multiplier=args.decoder_multiplier,
        head_multiplier=args.head_multiplier,
        freeze_paths=tuple(freeze_paths),
        freeze_bn=bool(getattr(args, "freeze_bn", False)),
    )
    extra = dict(args.optimizer_extra or {})
    name = args.optimizer.upper()
    if name == "ADAMW":
        core = optax.scale_by_adam(b1=extra.get("betas", (0.9, 0.999))[0], b2=extra.get("betas", (0.9, 0.999))[1])
    elif name == "SGD":
        core = optax.trace(decay=extra.get("momentum", 0.9), nesterov=extra.get("nesterov", False))
    elif name == "RMSPROP":
        core = optax.scale_by_rms(decay=extra.get("alpha", 0.99))
    else:
        raise NotImplementedError(f"Optimizer {name} not supported (ADAMW/SGD/RMSPROP)")

    chain = []
    if args.clip_gradients and args.clip_gradients > 0:
        chain.append(optax.clip_by_global_norm(args.clip_gradients))
    chain.append(core)
    chain.append(_per_leaf_weight_decay(wd_tree))
    chain.append(_per_leaf_scale(lr_tree))
    chain.append(optax.scale_by_schedule(lambda step: -schedule(step)))
    return optax.chain(*chain), schedule


def ema_decay_schedule(decay: float, warmup: int) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """EMA decay ramp — the reference's exponential warmup
    ``decay * (1 - exp(-x / warmups))`` with x = 1-based update count
    (solver/ema.py:101-104; EMAUpdater.update increments BEFORE evaluating,
    ema.py:112-114 — our step counter is 0-based pre-increment, hence +1).
    A timm-style harmonic ramp was used here before round 3; it reaches the
    asymptote ~3x faster, changing which updates dominate the EMA early on.
    """

    def fn(step):
        x = step.astype(jnp.float32) + 1.0
        if warmup > 0:
            return decay * (1.0 - jnp.exp(-x / float(warmup)))
        return jnp.asarray(decay, jnp.float32)

    return fn
