"""FocoosModel — the user-facing model handle (reference: focoos/models/focoos_model.py).

Owns ``(flax module, variables, ModelInfo, Processor)`` and exposes the
same verbs as the reference: ``__call__ / infer / benchmark / train / eval /
export``. The forward path is a jit-compiled pure function cached per input
shape — the analog of the reference's autocast+no_grad eager forward, but
AOT-compiled by XLA.
"""

from __future__ import annotations

import os
import time
from typing import Any, Dict, List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from focoos_tpu.ports import (
    ArtifactName,
    FocoosDetections,
    InferLatency,
    LatencyMetrics,
    ModelConfig,
    ModelInfo,
    RuntimeType,
    Task,
)
from focoos_tpu.processor.processor_manager import ProcessorManager
from focoos_tpu.utils import checkpoint as ckpt_util
from focoos_tpu.utils.logger import get_logger

logger = get_logger(__name__)


class FocoosModel:
    """High-level model API (reference: focoos/models/focoos_model.py:100)."""

    def __init__(
        self,
        module,
        config: ModelConfig,
        model_info: ModelInfo,
        variables: Optional[Dict[str, Any]] = None,
        weights_dir: Optional[str] = None,
        init_weights: bool = True,
        dtype: Optional[str] = None,
    ):
        self.module = module
        self.config = config
        self.model_info = model_info
        self.compute_dtype = dtype or "float32"
        self.processor = ProcessorManager.get_processor(model_info.model_family, config, model_info.im_size)
        self._fwd_cache: Dict[Tuple, Any] = {}

        if variables is not None:
            self.variables = variables
        else:
            local = os.path.join(weights_dir, ArtifactName.WEIGHTS.value) if weights_dir else None
            if init_weights and local and os.path.isfile(local):
                # fast path: a checkpoint that covers EVERY leaf needs no init
                # compute at all — eval_shape gives the structure, the npz
                # fills it (matters over remote device tunnels, where eager
                # init costs one mini-compile per op: 313 s for fai-detr-l)
                loaded = ckpt_util.load_variables_npz(local)
                filled, skipped, missing = ckpt_util.fill_structure(self._variables_structure(), loaded)
                if not skipped and not missing:
                    self.variables = jax.tree.map(jnp.asarray, filled)
                    logger.info(f"Loaded weights from {local} (structure fill, no init)")
                else:
                    self.variables = self._init_variables()
                    self.load_weights(local)
            else:
                self.variables = self._init_variables()

    # ------------------------------------------------------------------
    @property
    def name(self) -> str:
        return self.model_info.name

    @property
    def task(self) -> Task:
        return self.model_info.task

    @property
    def classes(self) -> List[str]:
        return self.model_info.classes

    @property
    def im_size(self) -> Tuple[int, int]:
        s = self.model_info.im_size or 640
        return (s, s) if isinstance(s, int) else tuple(s)

    def _variables_structure(self):
        """Variable pytree as ShapeDtypeStructs — tracing only, zero compute."""
        import functools

        h, w = self.im_size
        x = jax.ShapeDtypeStruct((1, h, w, 3), jnp.float32)
        fn = functools.partial(self.module.init, train=False)
        return jax.eval_shape(fn, jax.random.PRNGKey(0), x)

    def _init_variables(self) -> Dict[str, Any]:
        import functools

        h, w = self.im_size
        x = jnp.zeros((1, h, w, 3), jnp.float32)
        fn = functools.partial(self.module.init, train=False)
        if jax.default_backend() != "cpu":
            # one fused init program (persistently cached) instead of one
            # mini-compile per op — eager init over a remote device tunnel
            # costs ~0.56 s per op x 556 ops on fai-detr-l
            fn = jax.jit(fn)
        with jax.default_device(jax.local_devices()[0]):
            variables = fn(jax.random.PRNGKey(0), x)
        return jax.tree.map(jnp.asarray, dict(variables))

    def load_weights(self, path: str, strict: bool = False) -> None:
        """Shape-tolerant weight load (reference: base_model.py:98-143)."""
        loaded = ckpt_util.load_variables_npz(path)
        merged, skipped, missing = ckpt_util.merge_compatible(dict(self.variables), loaded, strict=strict)
        if skipped:
            logger.warning(f"load_weights: {len(skipped)} shape-mismatched keys skipped (e.g. {skipped[:3]})")
        if missing:
            logger.warning(f"load_weights: {len(missing)} keys missing from checkpoint (e.g. {missing[:3]})")
        self.variables = jax.tree.map(jnp.asarray, merged)
        logger.info(f"Loaded weights from {path}")

    def save_weights(self, path: str) -> str:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        ckpt_util.save_variables_npz(path, self.variables)
        return path

    # ------------------------------------------------------------------
    def _forward_fn(self, batch_shape: Tuple[int, ...]):
        """jit-compiled forward for a given input shape (engine analog)."""
        key = batch_shape
        if key not in self._fwd_cache:
            module = self.module

            @jax.jit
            def fwd(variables, images):
                out, _aux = module.apply(variables, images, train=False)
                return out

            self._fwd_cache[key] = fwd
        return self._fwd_cache[key]

    def forward(self, images: Union[np.ndarray, jnp.ndarray]):
        """Raw batched forward: NHWC uint8/float → family ModelOutput."""
        images = jnp.asarray(images)
        return self._forward_fn(tuple(images.shape))(self.variables, images)

    def __call__(
        self,
        inputs,
        top_k: Optional[int] = None,
        threshold: Optional[float] = None,
        **kw,
    ) -> List[FocoosDetections]:
        """preprocess → jitted forward → postprocess with per-stage latency
        (reference: focoos_model.py:575-621)."""
        t0 = time.perf_counter()
        batch, _ = self.processor.preprocess(inputs)
        t1 = time.perf_counter()
        out = self.forward(batch)
        out = jax.block_until_ready(out)
        t2 = time.perf_counter()
        results = self.processor.postprocess(
            out, inputs, class_names=self.classes, top_k=top_k, threshold=threshold, **kw
        )
        t3 = time.perf_counter()
        latency = InferLatency(preprocess=t1 - t0, inference=t2 - t1, postprocess=t3 - t2)
        for r in results:
            r.latency = latency
        return results

    def infer(
        self,
        image,
        threshold: Optional[float] = None,
        annotate: bool = False,
        **kw,
    ) -> FocoosDetections:
        """Single-image inference (reference: focoos_model.py:370-416)."""
        from focoos_tpu.utils.vision import annotate_image, image_loader

        t0 = time.perf_counter()
        arr = image_loader(image)
        t1 = time.perf_counter()
        res = self([arr], threshold=threshold, **kw)[0]
        if res.latency:
            res.latency.imload = t1 - t0
        if annotate:
            t2 = time.perf_counter()
            res.image = annotate_image(arr, res, task=self.task, classes=self.classes)
            if res.latency:
                res.latency.annotate = time.perf_counter() - t2
        return res

    # ------------------------------------------------------------------
    def benchmark(self, iterations: int = 50, size: Optional[Union[int, Tuple[int, int]]] = None) -> LatencyMetrics:
        """Device-only forward latency (reference: focoos_model.py:694).

        Measures via a chained ``lax.scan`` of forwards with a data dependency
        between iterations, fetching one scalar per trial — the only timing
        method that survives remote device tunnels, where per-call
        ``block_until_ready`` returns before device completion and adds
        host RTT to every sample.
        """
        size = size or self.im_size
        hw = (size, size) if isinstance(size, int) else tuple(size)
        x = jnp.asarray(np.random.rand(1, *hw, 3).astype(np.float32) * 255.0)
        module, variables = self.module, self.variables
        chain = max(1, iterations // 5)

        @jax.jit
        def run(img):
            def body(im, _):
                out, _aux = module.apply(variables, im, train=False)
                leaf = jax.tree.leaves(out)[0]
                return im + (jnp.mean(leaf) * 1e-24).astype(im.dtype), None

            final, _ = jax.lax.scan(body, img, None, length=chain)
            return jnp.mean(final)

        float(run(x))  # compile + warm
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(run(x))  # scalar fetch forces completion
            times.append((time.perf_counter() - t0) * 1000 / chain)
        arr = np.array(times)
        dev = jax.local_devices()[0]
        return LatencyMetrics(
            fps=int(round(1000.0 / arr.mean())),
            engine=f"xla.{dev.platform}",
            min=round(float(arr.min()), 3),
            max=round(float(arr.max()), 3),
            mean=round(float(arr.mean()), 3),
            std=round(float(arr.std()), 3),
            im_size=hw[0],
            device=str(dev.device_kind),
        )

    def end2end_benchmark(self, iterations: int = 50, size: Optional[int] = None) -> LatencyMetrics:
        """preprocess+forward+postprocess latency (reference: focoos_model.py:723)."""
        size = size or self.im_size[0]
        img = np.random.randint(0, 255, (size, size, 3), np.uint8)
        self([img])  # warmup/compile
        times = []
        for _ in range(iterations):
            t0 = time.perf_counter()
            self([img])
            times.append((time.perf_counter() - t0) * 1000)
        arr = np.array(times)
        dev = jax.local_devices()[0]
        return LatencyMetrics(
            fps=int(round(1000.0 / arr.mean())),
            engine=f"xla.{dev.platform}.e2e",
            min=round(float(arr.min()), 3),
            max=round(float(arr.max()), 3),
            mean=round(float(arr.mean()), 3),
            std=round(float(arr.std()), 3),
            im_size=size,
            device=str(dev.device_kind),
        )

    # ------------------------------------------------------------------
    def train(self, args, train_dataset, val_dataset=None, hub=None):
        """Run fine-tuning (reference: focoos_model.py:221-274)."""
        from focoos_tpu.trainer.trainer import run_train

        return run_train(self, args, train_dataset, val_dataset)

    def eval(self, args, val_dataset):
        from focoos_tpu.trainer.trainer import run_eval

        return run_eval(self, args, val_dataset)

    def export(
        self,
        runtime_type: RuntimeType = RuntimeType.XLA_TPU_BF16,
        out_dir: Optional[str] = None,
        image_size: Optional[Union[int, Tuple[int, int]]] = None,
        batch_size: int = 1,
        size_buckets=None,
        overwrite: bool = False,
    ):
        """Export an AOT-servable artifact and return an InferModel
        (reference: focoos_model.py:418-573). ``size_buckets`` serializes
        extra fixed-shape StableHLO programs for shape-bucketed serving.
        ``overwrite=False`` reuses an existing artifact dir (reference
        ExportCfg.overwrite semantics)."""
        from focoos_tpu.infer.export import export_model

        return export_model(self, runtime_type, out_dir, image_size, batch_size,
                            size_buckets=size_buckets, overwrite=overwrite)
