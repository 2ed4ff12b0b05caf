"""Gradio web demo (reference: focoos/cli/gradio_app.py).

Gracefully gated: gradio is an optional dependency (not present in minimal
images); the CLI surfaces a clear error when missing.
"""

from __future__ import annotations

from typing import Optional

from focoos_tpu.utils.logger import get_logger

logger = get_logger(__name__)


def launch(model_name: str, image_size: Optional[int] = None, share: bool = False):
    try:
        import gradio as gr
    except ImportError as e:
        raise RuntimeError(
            "gradio is not installed — `pip install gradio` to use the web demo"
        ) from e

    import numpy as np

    from focoos_tpu.model_manager import ModelManager

    model = ModelManager.get(model_name, image_size=image_size)

    def predict(image: np.ndarray, threshold: float):
        res = model.infer(image, threshold=threshold, annotate=True)
        table = [
            [d.label or d.cls_id, round(d.conf or 0, 3), d.bbox]
            for d in res.detections
        ]
        return res.image if res.image is not None else image, table

    demo = gr.Interface(
        fn=predict,
        inputs=[gr.Image(type="numpy"), gr.Slider(0.0, 1.0, value=0.5, label="threshold")],
        outputs=[gr.Image(type="numpy", label="annotated"), gr.Dataframe(headers=["label", "conf", "bbox"])],
        title=f"focoos-tpu · {model_name}",
    )
    demo.launch(share=share)
    return demo
