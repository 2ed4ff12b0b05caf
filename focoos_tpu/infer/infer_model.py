"""InferModel — serve-path model handle over an exported artifact dir
(reference: focoos/infer/infer_model.py:54-319)."""

from __future__ import annotations

import os
import time
from typing import List, Optional

import numpy as np

from focoos_tpu.ports import (
    ArtifactName,
    FocoosDetections,
    InferLatency,
    LatencyMetrics,
    ModelInfo,
    RuntimeType,
)
from focoos_tpu.utils.logger import get_logger

logger = get_logger(__name__)


class InferModel:
    def __init__(self, model_dir: str, runtime_type: RuntimeType = RuntimeType.XLA_TPU_BF16,
                 data_parallel: bool = False):
        info_path = os.path.join(model_dir, ArtifactName.INFO.value)
        if not os.path.isfile(info_path):
            raise FileNotFoundError(f"model_info.json not found in {model_dir}")
        self.model_dir = model_dir
        self.model_info = ModelInfo.from_json(info_path)
        self.runtime_type = runtime_type

        from focoos_tpu.model_manager import ConfigManager, ModelManager
        from focoos_tpu.processor.processor_manager import ProcessorManager

        family = self.model_info.model_family
        ModelManager._ensure_family_registered(family.value)
        self.config = ConfigManager.from_dict(family, self.model_info.config)
        self.processor = ProcessorManager.get_processor(family, self.config, self.model_info.im_size)

        from focoos_tpu.infer.runtimes import load_runtime

        output_names = self.processor.get_output_names()
        if runtime_type == RuntimeType.STABLEHLO:
            artifact = os.path.join(model_dir, ArtifactName.STABLEHLO.value)
            if not os.path.isfile(artifact):
                raise FileNotFoundError(
                    f"{artifact} missing — export with RuntimeType.STABLEHLO first "
                    f"(extension↔runtime validation, reference infer_model.py:96)"
                )
            self.runtime = load_runtime(
                runtime_type, artifact_path=artifact, output_names=output_names,
                allow_resize_dispatch=self.processor.resize_dispatch_safe,
            )
        elif runtime_type == RuntimeType.TF_SAVEDMODEL:
            artifact = os.path.join(model_dir, ArtifactName.SAVEDMODEL.value)
            if not os.path.isdir(artifact):
                raise FileNotFoundError(
                    f"{artifact} missing — export with RuntimeType.TF_SAVEDMODEL first"
                )
            self.runtime = load_runtime(
                runtime_type, artifact_path=artifact, output_names=output_names,
            )
        elif runtime_type == RuntimeType.XLA_TPU_INT8:
            artifact = os.path.join(model_dir, ArtifactName.WEIGHTS_INT8.value)
            if not os.path.isfile(artifact):
                raise FileNotFoundError(
                    f"{artifact} missing — export with RuntimeType.XLA_TPU_INT8 first"
                )
            builder_model = ModelManager.get(model_dir, dtype="bfloat16")
            self.runtime = load_runtime(
                runtime_type, module=builder_model.module, artifact_path=artifact,
                output_names=output_names,
            )
        else:
            dtype = "bfloat16" if runtime_type == RuntimeType.XLA_TPU_BF16 else "float32"
            builder_model = ModelManager.get(model_dir, dtype=dtype)
            self.runtime = load_runtime(
                runtime_type, module=builder_model.module, variables=builder_model.variables,
                output_names=output_names, data_parallel=data_parallel,
            )

    @property
    def classes(self) -> List[str]:
        return self.model_info.classes

    # ------------------------------------------------------------------
    def __call__(self, inputs, threshold: Optional[float] = None, **kw) -> List[FocoosDetections]:
        t0 = time.perf_counter()
        batch, _ = self.processor.preprocess(inputs)
        t1 = time.perf_counter()
        raw = self.runtime(batch)
        t2 = time.perf_counter()
        results = self.processor.export_postprocess(raw, inputs, class_names=self.classes, threshold=threshold, **kw)
        t3 = time.perf_counter()
        lat = InferLatency(preprocess=t1 - t0, inference=t2 - t1, postprocess=t3 - t2)
        for r in results:
            r.latency = lat
        return results

    def infer(self, image, threshold: Optional[float] = None, annotate: bool = False, **kw) -> FocoosDetections:
        from focoos_tpu.utils.vision import annotate_image, image_loader

        t0 = time.perf_counter()
        arr = image_loader(image)
        t1 = time.perf_counter()
        res = self([arr], threshold=threshold, **kw)[0]
        if res.latency:
            res.latency.imload = t1 - t0
        if annotate:
            res.image = annotate_image(arr, res, task=self.model_info.task, classes=self.classes)
        return res

    def benchmark(self, iterations: int = 50, size: Optional[int] = None) -> LatencyMetrics:
        s = size or (self.model_info.im_size if isinstance(self.model_info.im_size, int) else self.model_info.im_size[0])
        return self.runtime.benchmark(iterations=iterations, size=s)

    def end2end_benchmark(self, iterations: int = 50, size: Optional[int] = None) -> LatencyMetrics:
        import jax

        s = size or (self.model_info.im_size if isinstance(self.model_info.im_size, int) else self.model_info.im_size[0])
        img = np.random.randint(0, 255, (s, s, 3), np.uint8)
        self([img])
        times = []
        for _ in range(iterations):
            t0 = time.perf_counter()
            self([img])
            times.append((time.perf_counter() - t0) * 1000)
        arr = np.array(times)
        dev = jax.local_devices()[0]
        return LatencyMetrics(
            fps=int(round(1000 / arr.mean())),
            engine=f"{type(self.runtime).__name__}.e2e",
            min=round(float(arr.min()), 3),
            max=round(float(arr.max()), 3),
            mean=round(float(arr.mean()), 3),
            std=round(float(arr.std()), 3),
            im_size=s,
            device=str(dev.device_kind),
        )
