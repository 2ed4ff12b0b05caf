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
):
    """→ InferModel over the exported artifact dir."""
    from focoos_tpu.infer.infer_model import InferModel

    out_dir = out_dir or os.path.join(MODELS_DIR, model.name, "export")
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

    if runtime_type == RuntimeType.STABLEHLO:
        import jax
        import jax.numpy as jnp
        from jax import export as jax_export

        module = model.module
        variables = model.variables

        def forward(images):
            out, _ = module.apply(variables, images, train=False)
            return tuple(getattr(out, n) for n in model.processor.get_output_names())

        spec = jax.ShapeDtypeStruct((batch_size, *hw, 3), jnp.uint8)
        exported = jax_export.export(jax.jit(forward))(spec)
        path = os.path.join(out_dir, ArtifactName.STABLEHLO.value)
        with open(path, "wb") as f:
            f.write(exported.serialize())
        logger.info(f"Exported StableHLO artifact to {path} ({os.path.getsize(path) / 1e6:.1f} MB)")

    logger.info(f"Export complete → {out_dir}")
    return InferModel(out_dir, runtime_type=runtime_type)
