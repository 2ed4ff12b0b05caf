"""FocoosTrainer — orchestration + iteration loop (reference: focoos/trainer/trainer.py).

The torch run_step (data → autocast forward → GradScaler backward → clip →
step, reference :723-773) collapses into ONE pre-compiled XLA program
(focoos_tpu/trainer/train_step.py) executed over the data mesh; the host loop
only feeds batches, stamps metrics into EventStorage and drives hooks.
"""

from __future__ import annotations

import os
import time
import traceback
import weakref
from typing import Any, Callable, Dict, Iterable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from focoos_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from focoos_tpu.ports import ArtifactName, ModelStatus, Task, TrainerArgs
from focoos_tpu.trainer.checkpointer import Checkpointer, PeriodicCheckpointerMixin
from focoos_tpu.trainer.events import EventStorage
from focoos_tpu.trainer import hooks as hooks_mod
from focoos_tpu.trainer.hooks import EarlyStopException, HookBase
from focoos_tpu.trainer.solver import build_optimizer, ema_decay_schedule
from focoos_tpu.trainer.train_step import build_train_step, create_train_state
from focoos_tpu.utils.logger import get_logger

logger = get_logger(__name__)

TASK_METRICS = {
    Task.DETECTION: "bbox/AP",
    Task.SEMSEG: "sem_seg/mIoU",
    Task.INSTANCE_SEGMENTATION: "segm/AP",
    Task.CLASSIFICATION: "classification/f1",
    Task.KEYPOINT: "keypoints/AP",
}


class TrainerLoop:
    """Iteration-based loop (reference: trainer/trainer.py:587-905)."""

    def __init__(
        self,
        step_fn: Callable,
        state,
        data_iter: Iterable,
        max_iter: int,
        start_iter: int = 0,
        gather_metric_period: int = 1,
        nan_guard: bool = True,
        steps_per_call: int = 1,
        single_step_fn: Optional[Callable] = None,
    ):
        self.step_fn = step_fn
        # fallback for ragged micro-batch groups under steps_per_call>1:
        # K sequential single-step dispatches preserve exact K=1 numerics
        # (zero-padding ragged shapes into the stacked scan would enter BN
        # batch statistics — reference never pads ACROSS steps).
        self.single_step_fn = single_step_fn
        self.state = state
        self._data_iter = iter(data_iter)
        self.max_iter = max_iter
        self.start_iter = start_iter
        self.iter = start_iter
        self.gather_metric_period = gather_metric_period
        self.nan_guard = nan_guard
        self.steps_per_call = max(1, int(steps_per_call))
        self.hooks: List[HookBase] = []
        self.storage: Optional[EventStorage] = None
        self._rng = jax.random.PRNGKey(0)
        self._pending_metrics = None
        self._warned_kgroup_pad = False

    def register_hooks(self, hooks: List[Optional[HookBase]]) -> None:
        hooks = [h for h in hooks if h is not None]
        for h in hooks:
            h.trainer = weakref.proxy(self)
        self.hooks.extend(hooks)

    def hook_state_dict(self) -> dict:
        return {type(h).__name__: h.state_dict() for h in self.hooks if h.state_dict()}

    def load_hook_state_dict(self, state: dict) -> None:
        for h in self.hooks:
            if type(h).__name__ in state:
                h.load_state_dict(state[type(h).__name__])

    # ------------------------------------------------------------------
    def train(self) -> None:
        logger.info(f"Starting training from iteration {self.start_iter} to {self.max_iter}")
        with EventStorage(self.start_iter) as self.storage:
            try:
                for h in self.hooks:
                    h.before_train()
                self.iter = self.start_iter
                while self.iter < self.max_iter:
                    self.storage.iter = self.iter
                    for h in self.hooks:
                        h.before_step()
                    self.run_step()
                    for h in self.hooks:
                        h.after_step()
                    self.iter += self.steps_per_call
                # keep reference semantics: self.iter == max_iter after the loop
                self.iter = min(self.iter, self.max_iter)
            except EarlyStopException:
                logger.info("Early stopping triggered")
            except Exception:
                logger.error(f"Exception during training:\n{traceback.format_exc()}")
                raise
            finally:
                self._flush_metrics(force=True)
                for h in self.hooks:
                    h.after_train()

    def run_step(self) -> None:
        t0 = time.perf_counter()
        if self.steps_per_call == 1:
            batch = next(self._data_iter)
            parts = None
        else:
            # stack K same-shape batches along a new leading axis for the
            # scanned step. Ragged groups fall back to K sequential
            # single-step dispatches (exact K=1 numerics — see below);
            # fixed-size augmentations keep the fast stacked path.
            parts = [next(self._data_iter) for _ in range(self.steps_per_call)]
            shapes = [tuple(l.shape for l in jax.tree.leaves(p)) for p in parts]
            if all(s == shapes[0] for s in shapes):
                batch = jax.tree.map(lambda *xs: jnp.stack(xs), *parts)
                parts = None
            elif self.single_step_fn is None:
                raise ValueError(
                    f"steps_per_call={self.steps_per_call} received ragged micro-batch shapes "
                    f"and no single-step fallback is available. Zero-padding ragged shapes "
                    f"across micro-batches would contaminate BatchNorm batch statistics "
                    f"(the reference never pads ACROSS steps — focoos/structures.py:682-806 "
                    f"pads only within one batch). Use fixed-size augmentations, or build the "
                    f"loop with single_step_fn."
                )
        data_time = time.perf_counter() - t0

        self._rng, step_rng = jax.random.split(self._rng)
        prev = self._pending_metrics
        if parts is not None:
            # ragged fallback: K sequential real steps, one per micro-batch —
            # numerically identical to steps_per_call=1 (same step body, same
            # per-step rng stream as the scanned path). Costs K dispatches and
            # a compile per distinct shape, same as K=1 would.
            if not self._warned_kgroup_pad:
                self._warned_kgroup_pad = True
                logger.warning(
                    f"steps_per_call={self.steps_per_call} got ragged micro-batch shapes "
                    f"{sorted(set(s for ss in ([tuple(l.shape for l in jax.tree.leaves(p)) for p in parts]) for s in ss))[:4]}; "
                    "falling back to sequential single-step dispatch (exact numerics, "
                    "no dispatch amortization). Use fixed-size augmentations to regain "
                    "the stacked fast path."
                )
            metric_arrs = []
            keys = None
            for part, r in zip(parts, jax.random.split(step_rng, self.steps_per_call)):
                self.state, m = self.single_step_fn(self.state, part, r)
                if isinstance(m, tuple) and len(m) == 2 and isinstance(m[0], tuple):
                    keys, arr = m
                    metric_arrs.append(arr)
                else:
                    metric_arrs.append(m)
            if keys is not None:
                metrics = (keys, jnp.mean(jnp.stack(metric_arrs), axis=0))
            else:
                metrics = jax.tree.map(lambda *xs: jnp.mean(jnp.stack(xs), axis=0), *metric_arrs)
        else:
            self.state, metrics = self.step_fn(self.state, batch, step_rng)
        # one-step-delayed fetch: step k's metrics are pulled AFTER step k+1
        # is dispatched, so the (blocking) device→host transfer overlaps the
        # device computing the next step instead of stalling on this one.
        self._pending_metrics = (metrics, data_time, self.iter)
        if prev is not None and (prev[2] + 1) % self.gather_metric_period == 0:
            self._flush_one(prev)

    def _flush_metrics(self, force: bool = False) -> None:
        if self._pending_metrics is None:
            return
        prev, self._pending_metrics = self._pending_metrics, None
        if force or (prev[2] + 1) % self.gather_metric_period == 0:
            self._flush_one(prev)

    def _flush_one(self, pending) -> None:
        metrics, data_time, rec_iter = pending
        if isinstance(metrics, tuple) and len(metrics) == 2 and isinstance(metrics[0], tuple):
            keys, arr = metrics  # packed form: one transfer for all scalars
            metrics = dict(zip(keys, np.asarray(arr)))
        else:
            metrics = jax.device_get(metrics)
        total = float(metrics.get("total_loss", 0.0))
        if self.nan_guard and not np.isfinite(total):
            raise FloatingPointError(f"Loss became {total} at iteration {rec_iter}; aborting (NaN guard)")
        if self.storage is not None:
            cur = self.storage.iter
            self.storage.iter = rec_iter
            try:
                self.storage.put_scalar("data_time", data_time, smoothing_hint=True)
                for k, v in metrics.items():
                    self.storage.put_scalar(k, float(np.asarray(v)), smoothing_hint=True)
            finally:
                self.storage.iter = cur


# ---------------------------------------------------------------------------


def _make_family_loss_fn(model) -> Callable:
    """Look up <family>.loss.make_loss_fn (each family module defines it)."""
    import importlib

    family = model.model_info.model_family
    mod = importlib.import_module(f"focoos_tpu.models.{family.value}.loss")
    return mod.make_loss_fn(model.module, model.config)


def _freeze_paths_for(model) -> tuple:
    """Parameter-path substrings to freeze, from the backbone config.

    ``freeze_at=N`` freezes the stem plus stages res2..res{N+1}, matching the
    reference (nn/backbone/resnet.py:221-224: conv1 + res_layers[:freeze_at]).
    Implemented as optimizer masks — idiomatic replacement for
    ``requires_grad=False`` in a functional framework.
    """
    bcfg = getattr(getattr(model, "config", None), "backbone_config", None)
    freeze_at = getattr(bcfg, "freeze_at", -1)
    if freeze_at is None or freeze_at < 0:
        return ()
    paths = ["backbone/conv1"]  # stem (conv1_1..conv1_3 for resnet-c/d variants)
    for i in range(min(int(freeze_at), 4)):
        paths.append(f"backbone/res{i + 2}_")
    return tuple(paths)


def _versioned_run_dir(output_dir: str, run_name: str) -> str:
    """run-dir versioning (reference: trainer/trainer.py:84-93)."""
    base = os.path.join(output_dir, run_name)
    path = base
    v = 1
    while os.path.exists(path) and os.listdir(path):
        path = f"{base}.v{v}"
        v += 1
    os.makedirs(path, exist_ok=True)
    return path


class FocoosTrainer:
    """Training orchestration (reference: trainer/trainer.py:59-584)."""

    def __init__(self, model, args: TrainerArgs, train_dataset, val_dataset=None):
        self.model = model
        self.args = args
        self.train_dataset = train_dataset
        self.val_dataset = val_dataset
        self.run_dir = _versioned_run_dir(args.output_dir, args.run_name)
        self.model_info = model.model_info

    # ------------------------------------------------------------------
    def _set_status(self, status: ModelStatus, failure_reason: Optional[str] = None) -> None:
        """Status state machine persisted to model_info.json
        (reference: trainer/trainer.py:558-584)."""
        self.model_info.status = status
        if failure_reason:
            self.model_info.description = f"{self.model_info.description or ''} [FAILED: {failure_reason[:300]}]"
        self.model_info.dump_json(self.run_dir)

    def _build_loader(self):
        from focoos_tpu.data.loaders import build_train_loader

        return build_train_loader(
            self.train_dataset,
            processor=self.model.processor,
            total_batch_size=self.args.batch_size,
            num_workers=self.args.workers,
            seed=self.args.seed,
            max_instances=self.args.max_instances_per_image,
        )

    def train(self) -> Dict[str, Any]:
        args = self.args
        from focoos_tpu.utils.logger import capture_all_output

        capture_all_output(os.path.join(self.run_dir, ArtifactName.LOGS.value))
        from focoos_tpu.utils.system import seed_all_rng

        seed_all_rng(args.seed)

        self._set_status(ModelStatus.TRAINING_STARTING)
        model = self.model
        model.processor.train(True)

        # mesh + optimizer + compiled step
        n_dev = len(jax.devices()) if args.num_devices in (-1, 0) else args.num_devices
        if args.mesh_shape and len(args.mesh_shape) == 2:
            from focoos_tpu.parallel.sharding import make_mesh_2d

            mesh = make_mesh_2d(*args.mesh_shape, devices=jax.devices()[:n_dev])
        else:
            shape = tuple(args.mesh_shape) if args.mesh_shape else (n_dev,)
            mesh = make_mesh(shape, devices=jax.devices()[:n_dev])
        logger.info(f"Training on mesh {mesh} | global batch {args.batch_size} | sharding={args.sharding}")

        # freeze wiring (reference: resnet.py:221 freeze_at, trainer.py:329 freeze_bn)
        freeze_paths = _freeze_paths_for(model)
        if args.freeze_bn:
            from focoos_tpu.nn.layers import common as _nn_common

            _nn_common.FREEZE_ALL_BN = True  # read at trace time by every BatchNorm
            logger.info("freeze_bn: all BatchNorm layers use frozen running stats")
        if freeze_paths:
            logger.info(f"Frozen parameter groups: {freeze_paths}")

        tx, schedule = build_optimizer(model.variables["params"], args, freeze_paths=freeze_paths)
        state = create_train_state(dict(model.variables), tx, ema_enabled=args.ema_enabled)
        loss_fn = _make_family_loss_fn(model)
        ema_fn = ema_decay_schedule(args.ema_decay, args.ema_warmup) if args.ema_enabled else None
        spc = max(1, int(getattr(args, "steps_per_call", 1)))
        st_shard = None
        if getattr(args, "sharding", "dp") != "dp":
            from focoos_tpu.parallel.sharding import state_shardings as _state_shardings

            st_shard = _state_shardings(state, mesh, mode=args.sharding)
        single_step_fn = None
        if spc > 1:
            from focoos_tpu.trainer.train_step import build_multi_train_step

            step_fn = build_multi_train_step(
                loss_fn, tx, spc, mesh=mesh, ema_decay_fn=ema_fn, donate=args.donate_state,
                pack_metrics=True, state_shardings=st_shard,
            )
            # ragged-shape fallback: exact K=1 numerics, no BN contamination
            single_step_fn = build_train_step(
                loss_fn, tx, mesh=mesh, ema_decay_fn=ema_fn, donate=args.donate_state,
                pack_metrics=True, state_shardings=st_shard,
            )
            logger.info(f"Multi-step dispatch: {spc} optimizer steps per host call")
        else:
            step_fn = build_train_step(loss_fn, tx, mesh=mesh, ema_decay_fn=ema_fn, donate=args.donate_state,
                                       pack_metrics=True, state_shardings=st_shard)
        if st_shard is None:
            state = replicate(state, mesh)
        else:
            from focoos_tpu.parallel.sharding import device_put_state

            state = device_put_state(state, st_shard)

        loader = self._build_loader()
        from focoos_tpu.data.loaders import device_prefetch

        def device_batches():
            for batch in loader:
                # device placement happens HERE, inside the prefetch thread,
                # so the upload of batch k+1 overlaps step k's compute.
                # multi-step: leaves are stacked in the loop; jit in_shardings
                # places the stacked [K, ...] batch (leading axis unsharded).
                yield batch if spc > 1 else shard_batch(batch, mesh)

        ckpt_dir = args.ckpt_dir or os.path.join(self.run_dir, "ckpt")
        checkpointer = Checkpointer(state, ckpt_dir)
        start_iter = 0
        resume_extra = {}
        if args.resume:
            loaded, ok = checkpointer.resume_or_load(None, resume=True)
            if ok:
                state, resume_extra = loaded
                if st_shard is None:
                    state = replicate(state, mesh)
                else:
                    state = device_put_state(state, st_shard)
                start_iter = int(resume_extra.get("iteration", -1)) + 1
                logger.info(f"Resumed from iteration {start_iter}")

        loop = TrainerLoop(
            step_fn,
            state,
            device_prefetch(device_batches()),
            max_iter=args.max_iters,
            start_iter=start_iter,
            gather_metric_period=args.gather_metric_period,
            steps_per_call=spc,
            single_step_fn=single_step_fn,
        )
        self._register_hooks(loop, checkpointer, schedule)
        if args.resume and start_iter > 0 and isinstance(resume_extra.get("hooks"), dict):
            loop.load_hook_state_dict(resume_extra["hooks"])

        self._set_status(ModelStatus.TRAINING_RUNNING)
        try:
            loop.train()
        except Exception as e:
            self._set_status(ModelStatus.TRAINING_ERROR, failure_reason=str(e))
            raise
        finally:
            if args.freeze_bn:
                from focoos_tpu.nn.layers import common as _nn_common

                _nn_common.FREEZE_ALL_BN = False
            # stop the mapper workers NOW: the sampler is infinite, so without
            # an explicit close the worker processes keep mapping (bounded by
            # the queue caps, but still a burst of wasted host work) into the
            # post-training phase — the final eval runs in this same process
            close = getattr(loader, "close", None)
            if close is not None:
                close()

        # final artifacts (reference: trainer/trainer.py:360-416)
        final_state = jax.device_get(loop.state)
        params = final_state.ema_params if (args.ema_enabled and final_state.ema_params is not None) else final_state.params
        model.variables = {"params": params, "batch_stats": final_state.batch_stats}
        weights_path = os.path.join(self.run_dir, ArtifactName.WEIGHTS.value)
        model.save_weights(weights_path)
        self.model_info.weights_uri = weights_path
        self._set_status(ModelStatus.TRAINING_COMPLETED)
        model.processor.train(False)

        metrics = self._final_metrics(loop)
        logger.info(f"Training complete. Artifacts in {self.run_dir}")
        return {"run_dir": self.run_dir, "metrics": metrics, "iterations": loop.iter}

    def _register_hooks(self, loop: TrainerLoop, checkpointer: Checkpointer, schedule) -> None:
        """(reference: trainer/trainer.py:472-556)"""
        args = self.args
        writers = [
            hooks_mod.CommonMetricPrinter(max_iter=args.max_iters),
            hooks_mod.JSONWriter(os.path.join(self.run_dir, ArtifactName.METRICS.value)),
        ]
        try:
            writers.append(hooks_mod.TensorboardWriter(os.path.join(self.run_dir, "tb")))
        except ImportError:
            pass

        periodic = PeriodicCheckpointerMixin(
            checkpointer, args.checkpointer_period, args.max_iters, args.checkpointer_max_to_keep
        )
        primary_metric = TASK_METRICS.get(self.model.task, "total_loss")

        hooks: List[Optional[HookBase]] = [
            hooks_mod.IterationTimer(),
            hooks_mod.LRSchedulerHook(schedule),
            hooks_mod.MemoryStatsHook(period=args.log_period),
        ]
        if self.val_dataset is not None and args.eval_period > 0:
            hooks.append(hooks_mod.EvalHook(args.eval_period, lambda: self._val(loop)))
            hooks.append(hooks_mod.BestCheckpointer(checkpointer, primary_metric))
            if args.early_stop:
                hooks.append(hooks_mod.EarlyStoppingHook(args.patience, primary_metric))
            # sample-prediction mosaics (reference: trainer.py:536 VisualizationHook)
            hooks.append(
                hooks_mod.VisualizationHook(
                    args.eval_period, lambda: self._render_val_samples(loop, args.samples)
                )
            )
        hooks.append(hooks_mod.PeriodicCheckpointerHook(periodic))
        hooks.append(hooks_mod.PeriodicWriter(writers, period=args.log_period))
        if args.sync_to_hub:
            # (reference: trainer.py:549 SyncToHubHook — network failures are
            # swallowed inside the hook so training never dies on the uplink)
            try:
                from focoos_tpu.hub.focoos_hub import FocoosHUB

                remote = FocoosHUB().get_remote_model(self.model_info.focoos_model or self.model_info.name)
                hooks.append(hooks_mod.SyncToHubHook(remote, self.run_dir, period=max(args.log_period, 60)))
            except Exception as e:
                logger.warning(f"sync_to_hub requested but hub unavailable: {e}")
        loop.register_hooks(hooks)

    def _val(self, loop: TrainerLoop) -> Optional[Dict[str, float]]:
        """In-training validation (reference: trainer/trainer.py:441-470)."""
        if self.val_dataset is None:
            return None
        from focoos_tpu.trainer.evaluation import evaluate_dataset

        # keep params on device: the eval forward consumes them in place
        # (device_get would round-trip the full parameter set through host)
        state = loop.state
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        old = self.model.variables
        self.model.variables = variables
        self.model.processor.train(False)
        try:
            results = evaluate_dataset(self.model, self.val_dataset, batch_size=max(1, self.args.batch_size // 2))
        finally:
            self.model.variables = old
            self.model.processor.train(True)
        return results

    def _render_val_samples(self, loop: TrainerLoop, n: int) -> Optional[np.ndarray]:
        """Annotated-prediction mosaic over the first N val images
        (reference: hooks/visualization.py:39) — written to
        ``run_dir/visualizations/`` and stored as an EventStorage image."""
        if self.val_dataset is None or n <= 0:
            return None
        from focoos_tpu.utils.vision import annotate_image

        state = loop.state  # device params feed the jitted forward directly
        old = self.model.variables
        self.model.variables = {"params": state.params, "batch_stats": state.batch_stats}
        self.model.processor.train(False)
        try:
            tiles = []
            # square render size: one compile for the whole mosaic regardless
            # of per-image val shapes (avoids a recompile per distinct shape)
            rs = self.model.im_size
            rs = int(rs[0] if isinstance(rs, (tuple, list)) else (rs or 640))
            for i in range(min(n, len(self.val_dataset))):
                entry = self.val_dataset[i]
                img = entry.image if entry.image is not None else None
                if img is None:
                    continue
                img = np.asarray(img)
                if img.shape[:2] != (rs, rs):
                    import cv2

                    img = cv2.resize(img, (rs, rs), interpolation=cv2.INTER_LINEAR)
                dets = self.model.infer(img, threshold=0.3)
                tiles.append(annotate_image(img, dets, task=self.model.task,
                                            classes=self.model.classes))
        except Exception as e:  # visualization must never kill training
            logger.warning(f"visualization render failed: {e}")
            return None
        finally:
            self.model.variables = old
            self.model.processor.train(True)
        if not tiles:
            return None
        # square-ish mosaic grid, tiles padded to the max tile size
        import math

        cols = int(math.ceil(math.sqrt(len(tiles))))
        rows = int(math.ceil(len(tiles) / cols))
        th = max(t.shape[0] for t in tiles)
        tw = max(t.shape[1] for t in tiles)
        mosaic = np.zeros((rows * th, cols * tw, 3), np.uint8)
        for k, t in enumerate(tiles):
            r, c = divmod(k, cols)
            mosaic[r * th : r * th + t.shape[0], c * tw : c * tw + t.shape[1]] = t
        vis_dir = os.path.join(self.run_dir, "visualizations")
        os.makedirs(vis_dir, exist_ok=True)
        try:
            import cv2

            cv2.imwrite(os.path.join(vis_dir, f"iter_{loop.iter:07d}.jpg"), mosaic[..., ::-1])
        except Exception:
            pass
        return mosaic

    def _final_metrics(self, loop: TrainerLoop) -> Dict[str, float]:
        if self.val_dataset is None:
            return {}
        from focoos_tpu.trainer.evaluation import evaluate_dataset

        self.model.processor.train(False)
        results = evaluate_dataset(self.model, self.val_dataset, batch_size=max(1, self.args.batch_size // 2))
        self.model_info.val_metrics = hooks_mod._flatten_metrics(results) if results else None
        self.model_info.dump_json(self.run_dir)
        return results or {}


def run_train(model, args: TrainerArgs, train_dataset, val_dataset=None) -> Dict[str, Any]:
    """Entry point (reference: trainer/trainer.py:921)."""
    return FocoosTrainer(model, args, train_dataset, val_dataset).train()


def run_eval(model, args: TrainerArgs, val_dataset) -> Dict[str, Any]:
    """Standalone evaluation (reference: trainer/trainer.py:956, FocoosTrainer.eval :226)."""
    from focoos_tpu.trainer.evaluation import evaluate_dataset

    model.processor.train(False)
    results = evaluate_dataset(model, val_dataset, batch_size=args.batch_size)
    return results or {}
