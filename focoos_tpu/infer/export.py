"""Model export (reference: focoos_model.py:418-573 FocoosModel.export).

Two artifact kinds:
- PARAMS (``model_final.npz`` + model_info.json): portable weights; the
  runtime re-jits with the persistent compile cache (TRT-engine-cache analog).
- STABLEHLO (``model.stablehlo``): a serialized ``jax.export`` program with
  the forward graph baked at a fixed (batch, H, W) — the .onnx analog.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple, Union

import numpy as np

from focoos_tpu.ports import ArtifactName, MODELS_DIR, RuntimeType
from focoos_tpu.utils.logger import get_logger

logger = get_logger(__name__)


def export_model(
    model,
    runtime_type: RuntimeType = RuntimeType.XLA_TPU_BF16,
    out_dir: Optional[str] = None,
    image_size: Optional[Union[int, Tuple[int, int]]] = None,
    batch_size: int = 1,
    size_buckets: Optional[Tuple] = None,
    overwrite: bool = False,
):
    """→ InferModel over the exported artifact dir.

    ``size_buckets``: extra (H, W) sizes to also serialize (STABLEHLO only);
    the runtime dispatches each request to the closest bucket by area.
    ``overwrite=False`` reuses a complete existing artifact dir (reference
    ExportCfg.overwrite, ports.py:1335).
    """
    from focoos_tpu.infer.infer_model import InferModel

    out_dir = out_dir or os.path.join(MODELS_DIR, model.name, "export")
    _artifact_ok = (
        runtime_type != RuntimeType.STABLEHLO
        or os.path.isfile(os.path.join(out_dir, ArtifactName.STABLEHLO.value))
    ) and (
        runtime_type != RuntimeType.TF_SAVEDMODEL
        or os.path.isdir(os.path.join(out_dir, ArtifactName.SAVEDMODEL.value))
    )
    if not overwrite and os.path.isfile(os.path.join(out_dir, ArtifactName.INFO.value)) and _artifact_ok:
        logger.info(f"Reusing existing export at {out_dir} (overwrite=False)")
        return InferModel(out_dir, runtime_type=runtime_type)
    os.makedirs(out_dir, exist_ok=True)

    size = image_size or model.im_size
    hw = (size, size) if isinstance(size, int) else tuple(size)

    # always write portable weights + card
    model.save_weights(os.path.join(out_dir, ArtifactName.WEIGHTS.value))
    model.model_info.im_size = hw[0] if hw[0] == hw[1] else hw
    model.model_info.dump_json(out_dir)

    if runtime_type == RuntimeType.XLA_TPU_INT8:
        from focoos_tpu.infer.quantizer import quantize_weights_int8

        store, _snr = quantize_weights_int8(model.variables)
        import numpy as _np

        path = os.path.join(out_dir, ArtifactName.WEIGHTS_INT8.value)
        _np.savez(path, **store)
        logger.info(f"Exported int8 weights to {path} ({os.path.getsize(path) / 1e6:.1f} MB)")

    if runtime_type == RuntimeType.TF_SAVEDMODEL:
        # portable out-of-JAX artifact (the .onnx analog, reference
        # focoos_model.py:501-515): jax2tf with native_serialization wraps the
        # StableHLO program in a TF graph; the SavedModel serves under TF
        # Serving / converts to TFLite / tf2onnx offline with no JAX runtime.
        # Weights are baked as constants (same contract as the XLA engine's
        # const_weights and the reference's ONNX export).
        import jax
        import tensorflow as tf
        from jax.experimental import jax2tf

        module = model.module
        variables = jax.device_put(model.variables)
        output_names = model.processor.get_output_names()

        def forward(images):
            out, _ = module.apply(variables, images, train=False)
            return {n: getattr(out, n) for n in output_names}

        tf_fn = tf.function(
            jax2tf.convert(forward, native_serialization=True),
            input_signature=[tf.TensorSpec((batch_size, *hw, 3), tf.uint8, name="images")],
            autograph=False,
        )
        wrapper = tf.Module()
        wrapper.serve = tf_fn
        sm_dir = os.path.join(out_dir, ArtifactName.SAVEDMODEL.value)
        tf.saved_model.save(
            wrapper, sm_dir,
            signatures={tf.saved_model.DEFAULT_SERVING_SIGNATURE_DEF_KEY: tf_fn},
        )
        logger.info(f"Exported TF SavedModel @{hw} to {sm_dir}")

    if runtime_type == RuntimeType.STABLEHLO:
        import jax
        import jax.numpy as jnp
        from jax import export as jax_export

        module = model.module
        variables = model.variables

        def forward(images):
            out, _ = module.apply(variables, images, train=False)
            return tuple(getattr(out, n) for n in model.processor.get_output_names())

        def _serialize(shape_hw, path):
            spec = jax.ShapeDtypeStruct((batch_size, *shape_hw, 3), jnp.uint8)
            exported = jax_export.export(jax.jit(forward))(spec)
            with open(path, "wb") as f:
                f.write(exported.serialize())
            logger.info(f"Exported StableHLO @{shape_hw} to {path} ({os.path.getsize(path) / 1e6:.1f} MB)")

        # primary program at the configured size (back-compat single-file load)
        _serialize(hw, os.path.join(out_dir, ArtifactName.STABLEHLO.value))
        # bucketed multi-shape export: one program per extra size, dispatched
        # by input shape at serve time — the ONNX dynamic-axes analog
        # (reference: models/fai_detr/processor.py:242-251)
        for b in size_buckets or ():
            bhw = (b, b) if isinstance(b, int) else tuple(b)
            if bhw == hw:
                continue
            _serialize(bhw, os.path.join(out_dir, f"model_{bhw[0]}x{bhw[1]}.stablehlo"))

    logger.info(f"Export complete → {out_dir}")
    return InferModel(out_dir, runtime_type=runtime_type)
