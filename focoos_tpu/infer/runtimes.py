"""Inference runtimes — the XLA engine layer.

Replaces the reference's ONNXRuntime/TensorRT/TorchScript backends
(focoos/infer/runtimes/): the AOT-compiled XLA executable *is* the engine.
``XLARuntime`` jit-compiles the exported forward with a persistent
compilation cache on disk (the analog of the TRT engine cache,
focoos/infer/runtimes/onnx.py:93-97); ``StableHLORuntime`` executes a
serialized ``jax.export`` artifact.
"""

from __future__ import annotations

import functools
import os
import time
from typing import Any, Callable, Dict, List, Optional, Tuple

import numpy as np

from focoos_tpu.ports import COMPILE_CACHE_DIR, LatencyMetrics, RuntimeType
from focoos_tpu.utils.logger import get_logger

logger = get_logger(__name__)


def _enable_compile_cache() -> None:
    import jax

    try:
        os.makedirs(COMPILE_CACHE_DIR, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", COMPILE_CACHE_DIR)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def _chained_device_benchmark(fwd: Callable, x: np.ndarray, iterations: int,
                              engine: str, im_size: int) -> LatencyMetrics:
    """Chained ``lax.scan`` of forwards with a data dependency between
    iterations, one scalar fetch per trial — the only timing method that
    survives remote device tunnels (per-call ``block_until_ready`` returns
    before device completion and adds host RTT to every sample; same method
    as FocoosModel.benchmark, ADVICE r1 low)."""
    import jax
    import jax.numpy as jnp

    chain = max(1, iterations // 5)

    @jax.jit
    def run(img):
        def body(im, _):
            out = fwd(im)
            leaf = jax.tree.leaves(out)[0]
            return im + (jnp.mean(leaf.astype(jnp.float32)) * 1e-24).astype(im.dtype), None

        final, _ = jax.lax.scan(body, img, None, length=chain)
        return jnp.mean(final.astype(jnp.float32))

    xs = jnp.asarray(x)
    float(run(xs))  # compile + warm
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(run(xs))  # scalar fetch forces completion
        times.append((time.perf_counter() - t0) * 1000 / chain)
    arr = np.array(times)
    dev = jax.local_devices()[0]
    return LatencyMetrics(
        fps=int(round(1000 / arr.mean())),
        engine=engine,
        min=round(float(arr.min()), 3),
        max=round(float(arr.max()), 3),
        mean=round(float(arr.mean()), 3),
        std=round(float(arr.std()), 3),
        im_size=im_size,
        device=str(dev.device_kind),
    )


class BaseRuntime:
    """(reference: infer/runtimes/base.py:10)"""

    def __call__(self, images: np.ndarray) -> List[np.ndarray]:
        raise NotImplementedError

    def _traced_forward(self) -> Optional[Callable]:
        """A jit-traceable ``f(images) -> pytree`` for device-timed
        benchmarking, or None to fall back to host wall timing."""
        return None

    def _benchmark_input(self, size: int) -> np.ndarray:
        return np.random.randint(0, 255, (1, size, size, 3), np.uint8)

    def benchmark(self, iterations: int = 50, size: int = 640) -> LatencyMetrics:
        import jax

        x = self._benchmark_input(size)
        fwd = self._traced_forward()
        if fwd is not None:
            try:
                return _chained_device_benchmark(fwd, x, iterations, type(self).__name__, size)
            except Exception as e:  # e.g. platform mismatch in an exported artifact
                logger.warning(f"device-timed benchmark failed ({e}); falling back to wall timing")
        for _ in range(3):
            self(x)
        times = []
        for _ in range(iterations):
            t0 = time.perf_counter()
            self(x)  # __call__ copies outputs to host, which forces completion
            times.append((time.perf_counter() - t0) * 1000)
        arr = np.array(times)
        dev = jax.local_devices()[0]
        return LatencyMetrics(
            fps=int(round(1000 / arr.mean())),
            engine=type(self).__name__,
            min=round(float(arr.min()), 3),
            max=round(float(arr.max()), 3),
            mean=round(float(arr.mean()), 3),
            std=round(float(arr.std()), 3),
            im_size=size,
            device=str(dev.device_kind),
        )


class XLARuntime(BaseRuntime):
    """jit-compiled params runtime (analog of ONNX_TRT16 / TORCHSCRIPT_32).

    Weights are CLOSED OVER by default (``const_weights=True``): XLA embeds
    them as literals and constant-folds through the graph, exactly like a
    TensorRT engine bakes its weights. Measured on v5e (tools/ab_const_args.py,
    same chip, same process): fai-detr-l b16 35.24 vs 38.94 ms device-busy
    (-9.5%), fai-cls-m b128 2.45 vs 3.03 ms (-19%) vs weights-as-arguments.
    The trade is engine-build cost (larger program to compile/serialize —
    the TRT-engine-cache analog, infer/runtimes/onnx.py:93-97) for steady-
    state speed; serving weights are fixed, so the compile-cache key stays
    stable. Pass ``const_weights=False`` for frequently-swapped weights.

    ``data_parallel=True`` serves batches sharded over every local device:
    params replicate, the batch splits on a 1-D ``data`` mesh and GSPMD
    partitions the forward — the multi-chip serving analog of the reference's
    single-GPU ONNX session (infer/runtimes/onnx.py). Batches that don't
    divide the mesh are padded up and cropped after.
    """

    def __init__(self, module, variables: Dict[str, Any], output_names: List[str],
                 dtype: Optional[str] = None, data_parallel: bool = False,
                 const_weights: bool = True):
        import jax

        _enable_compile_cache()
        self.module = module
        self.variables = variables
        self.output_names = output_names
        self.const_weights = const_weights
        self._fns: Dict[Tuple, Callable] = {}
        self._mesh = None
        if data_parallel and len(jax.devices()) > 1:
            from jax.sharding import Mesh

            self._mesh = Mesh(np.array(jax.devices()), ("data",))

    def _fn(self, shape: Tuple) -> Callable:
        import jax

        if shape not in self._fns:
            module = self.module

            if self._mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                batch_sharding = NamedSharding(self._mesh, P("data"))
                replicated = NamedSharding(self._mesh, P())

                if self.const_weights:
                    variables = jax.device_put(self.variables, replicated)

                    @functools.partial(jax.jit, in_shardings=(batch_sharding,))
                    def fwd(images):
                        out, _ = module.apply(variables, images, train=False)
                        return out

                else:

                    @functools.partial(jax.jit, in_shardings=(replicated, batch_sharding))
                    def fwd(variables, images):
                        out, _ = module.apply(variables, images, train=False)
                        return out

            elif self.const_weights:
                variables = jax.device_put(self.variables)

                @jax.jit
                def fwd(images):
                    out, _ = module.apply(variables, images, train=False)
                    return out

            else:

                @jax.jit
                def fwd(variables, images):
                    out, _ = module.apply(variables, images, train=False)
                    return out

            self._fns[shape] = fwd
        return self._fns[shape]

    def __call__(self, images: np.ndarray) -> List[np.ndarray]:
        import jax
        import jax.numpy as jnp

        x = jnp.asarray(images)
        n = x.shape[0]
        pad = 0
        if self._mesh is not None:
            d = self._mesh.devices.size
            pad = (-n) % d
            if pad:
                x = jnp.concatenate([x, jnp.repeat(x[-1:], pad, axis=0)], axis=0)
        fn = self._fn(tuple(x.shape))
        out = jax.block_until_ready(fn(x) if self.const_weights else fn(self.variables, x))
        return [np.asarray(getattr(out, name))[:n] for name in self.output_names]

    def _traced_forward(self):
        module, variables = self.module, self.variables
        return lambda images: module.apply(variables, images, train=False)[0]


class Int8XLARuntime(BaseRuntime):
    """Weight-only INT8 serving (analog of the reference's ONNX INT8 runtime,
    infer/quantizer.py:200-209 quantize_static execution path).

    Kernels stay int8 in device memory (half the HBM footprint of bf16,
    quarter of fp32); the per-channel dequant ``q.astype(f32) * scale``
    happens inside the jitted forward where XLA fuses it into consumers.
    """

    def __init__(self, module, flat_store: Dict[str, np.ndarray], output_names: List[str],
                 act_scales: Optional[Dict[str, float]] = None):
        import jax.numpy as jnp

        _enable_compile_cache()
        self.module = module
        self.output_names = output_names
        # device-resident flat store; int8 leaves stay int8
        self._store = {k: jnp.asarray(v) for k, v in flat_store.items()}
        # calibrated static per-layer activation scales (module path → scale);
        # None → each QDQ conv falls back to a dynamic per-tensor absmax
        self._act_scales = act_scales
        self._fns: Dict[Tuple, Callable] = {}

    def _fn(self, shape: Tuple) -> Callable:
        import jax
        import jax.numpy as jnp

        if shape not in self._fns:
            from focoos_tpu.nn.layers import common as nn_common
            from focoos_tpu.utils.checkpoint import unflatten_tree

            module = self.module
            act_scales = self._act_scales

            @jax.jit
            def fwd(store, images):
                flat = {}
                for k, v in store.items():
                    if k.endswith("@q"):
                        flat[k[:-2]] = v.astype(jnp.float32) * store[k[:-2] + "@scale"]
                    elif not k.endswith("@scale"):
                        flat[k] = v
                variables = unflatten_tree(flat)
                # the fn body runs at trace time, so this flips every ConvNorm
                # in the traced graph onto the int8 QDQ path (and the weight
                # requantization there is exact: the store already holds
                # int8-rounded values). Context-scoped so concurrent traces of
                # other models never see it (ADVICE r2 low).
                with nn_common.int8_qdq_mode(act_scales=act_scales):
                    out, _ = module.apply(variables, images, train=False)
                return out

            self._fns[shape] = fwd
        return self._fns[shape]

    def __call__(self, images: np.ndarray) -> List[np.ndarray]:
        import jax
        import jax.numpy as jnp

        x = jnp.asarray(images)
        out = jax.block_until_ready(self._fn(tuple(x.shape))(self._store, x))
        return [np.asarray(getattr(out, n)) for n in self.output_names]

    def _traced_forward(self):
        import jax.numpy as jnp

        from focoos_tpu.nn.layers import common as nn_common
        from focoos_tpu.utils.checkpoint import unflatten_tree

        module, store = self.module, self._store

        def fwd(images):
            flat = {}
            for k, v in store.items():
                if k.endswith("@q"):
                    flat[k[:-2]] = v.astype(jnp.float32) * store[k[:-2] + "@scale"]
                elif not k.endswith("@scale"):
                    flat[k] = v
            variables = unflatten_tree(flat)
            with nn_common.int8_qdq_mode(act_scales=self._act_scales):
                return module.apply(variables, images, train=False)[0]

        return fwd


class TFSavedModelRuntime(BaseRuntime):
    """Executes the jax2tf SavedModel artifact through pure TensorFlow — the
    out-of-JAX serving check (what a TF Serving / TFLite / tf2onnx consumer
    would load; reference analog: the ONNXRuntime session, infer/runtimes/
    onnx.py). No JAX at inference time."""

    def __init__(self, artifact_dir: str, output_names: List[str]):
        import tensorflow as tf  # hard dep only for this runtime

        self.output_names = output_names
        self._loaded = tf.saved_model.load(artifact_dir)
        self._serve = self._loaded.signatures["serving_default"]
        spec = self._serve.structured_input_signature[1]["images"]
        self._shape = tuple(int(d) for d in spec.shape)

    def __call__(self, images: np.ndarray) -> List[np.ndarray]:
        import tensorflow as tf

        if tuple(images.shape) != self._shape:
            raise ValueError(f"SavedModel serves fixed shape {self._shape}, got {images.shape}")
        out = self._serve(images=tf.constant(images.astype(np.uint8)))
        return [np.asarray(out[name]) for name in self.output_names]

    def _traced_forward(self):  # pragma: no cover - bench path needs JAX
        raise NotImplementedError("TF SavedModel runtime is not jit-traceable")


class StableHLORuntime(BaseRuntime):
    """Executes serialized jax.export artifacts (the exchange format —
    analog of a .onnx file; reference ExportFormat.ONNX).

    Multi-shape dispatch: sibling ``model_{H}x{W}.stablehlo`` programs written
    by the bucketed export are loaded as shape buckets; a request whose (H, W)
    has no exact program is squash-resized to the closest bucket by area —
    the ONNX dynamic-axes analog (reference: fai_detr/processor.py:242-251;
    same squash-resize semantics as Processor.get_batch)."""

    def __init__(self, artifact_path: str, output_names: List[str],
                 allow_resize_dispatch: bool = True):
        import glob
        import re

        from jax import export as jax_export

        _enable_compile_cache()

        def load(path):
            with open(path, "rb") as f:
                return jax_export.deserialize(f.read())

        self._programs: Dict[Tuple[int, int], Any] = {}
        self._exported = load(artifact_path)
        self._programs[self._hw(self._exported)] = self._exported
        for p in glob.glob(os.path.join(os.path.dirname(artifact_path), "model_*x*.stablehlo")):
            if re.match(r"model_\d+x\d+\.stablehlo$", os.path.basename(p)):
                prog = load(p)
                self._programs[self._hw(prog)] = prog
        self.output_names = output_names
        # False for pixel-frame-output models (RTMO): the program would return
        # coordinates in the bucket's frame while the processor rescales from
        # its own configured size → require an exact-shape program match
        self._allow_resize = allow_resize_dispatch
        # each serialized program has a fixed batch; larger inputs are chunked
        try:
            self._batch = int(self._exported.in_avals[0].shape[0])
        except Exception:
            self._batch = 1

    @staticmethod
    def _hw(exported) -> Tuple[int, int]:
        shape = exported.in_avals[0].shape
        return (int(shape[1]), int(shape[2]))

    def _pick_program(self, h: int, w: int):
        if (h, w) in self._programs:
            return self._programs[(h, w)], False
        if not self._allow_resize:
            raise ValueError(
                f"no exported program for input {h}x{w} and this model's outputs "
                f"are pixel-frame (resize dispatch unsafe); available: "
                f"{sorted(self._programs)} — export a matching size bucket"
            )
        area = h * w
        best = min(self._programs, key=lambda hw: abs(hw[0] * hw[1] - area))
        return self._programs[best], True

    def _call_fixed(self, images, program=None) -> List[np.ndarray]:
        import jax

        outs = (program or self._exported).call(images)
        outs = jax.block_until_ready(outs)
        flat = outs if isinstance(outs, (list, tuple)) else [outs]
        return [np.asarray(o) for o in flat]

    def __call__(self, images: np.ndarray) -> List[np.ndarray]:
        images = np.asarray(images)
        program, needs_resize = self._pick_program(images.shape[1], images.shape[2])
        if needs_resize:
            import cv2

            th, tw = self._hw(program)
            images = np.stack(
                [cv2.resize(im, (tw, th), interpolation=cv2.INTER_LINEAR) for im in images]
            ).astype(images.dtype)
        n, b = images.shape[0], self._batch
        if n == b:
            return self._call_fixed(images, program)
        # pad-and-chunk to the artifact's fixed batch (ONNX fixed-axis analog)
        chunks: List[List[np.ndarray]] = []
        for i in range(0, n, b):
            part = images[i : i + b]
            if part.shape[0] < b:
                part = np.concatenate([part, np.repeat(part[-1:], b - part.shape[0], axis=0)])
            chunks.append(self._call_fixed(part, program))
        return [np.concatenate([c[k] for c in chunks])[:n] for k in range(len(chunks[0]))]

    def _traced_forward(self):
        return self._exported.call

    def _benchmark_input(self, size: int) -> np.ndarray:
        # the exported program has fixed input avals — benchmark at its shape
        try:
            aval = self._exported.in_avals[0]
            shape = tuple(int(d) for d in aval.shape)
            return (np.random.rand(*shape) * 255).astype(aval.dtype)
        except Exception:
            return super()._benchmark_input(size)


def load_calibration_scales(artifact_dir: str) -> Optional[Dict[str, float]]:
    """Load calibrated per-layer activation scales written by
    ``Quantizer.calibrate`` (calibration.npz: module path → input absmax).
    Returns path → scale (absmax/127), or None when no calibration exists —
    the reference's static-MinMax vs dynamic distinction
    (focoos/infer/quantizer.py:51-124)."""
    path = os.path.join(artifact_dir, "calibration.npz")
    if not os.path.isfile(path):
        return None
    with np.load(path) as data:
        scales = {k: float(data[k]) / 127.0 for k in data.files}
    logger.info(f"Loaded {len(scales)} calibrated activation scales from {path}")
    return scales or None


def load_runtime(
    runtime_type: RuntimeType,
    *,
    module=None,
    variables=None,
    artifact_path: Optional[str] = None,
    output_names: List[str],
    data_parallel: bool = False,
    allow_resize_dispatch: bool = True,
) -> BaseRuntime:
    """RuntimeType → runtime factory (reference: infer/runtimes/load_runtime.py:25)."""
    if runtime_type in (RuntimeType.XLA_TPU_BF16, RuntimeType.XLA_TPU_FP32, RuntimeType.XLA_CPU):
        assert module is not None and variables is not None
        return XLARuntime(module, variables, output_names, data_parallel=data_parallel)
    if runtime_type == RuntimeType.XLA_TPU_INT8:
        assert module is not None and artifact_path is not None
        with np.load(artifact_path) as data:
            store = {k: data[k] for k in data.files}
        act_scales = load_calibration_scales(os.path.dirname(artifact_path))
        return Int8XLARuntime(module, store, output_names, act_scales=act_scales)
    if runtime_type == RuntimeType.STABLEHLO:
        assert artifact_path is not None
        return StableHLORuntime(artifact_path, output_names, allow_resize_dispatch=allow_resize_dispatch)
    if runtime_type == RuntimeType.TF_SAVEDMODEL:
        assert artifact_path is not None
        try:
            import tensorflow  # noqa: F401
        except ImportError as e:  # optional-dep guard (reference load_runtime.py:25-80)
            raise ImportError(
                "RuntimeType.TF_SAVEDMODEL requires tensorflow; install it or "
                "serve via XLA_* / STABLEHLO runtimes") from e
        return TFSavedModelRuntime(artifact_path, output_names)
    raise ValueError(f"Unsupported runtime type: {runtime_type}")
