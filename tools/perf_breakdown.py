"""Per-stage device timing of fai-detr-l @640 on TPU (chained-scan method,
see bench.py for why per-call host timing is unusable here)."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def chain_time(fn, x, iters=24, trials=3):
    """fn: img -> scalar-dependent img. Returns ms per iteration."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(img):
        def body(im, _):
            return fn(im), None

        final, _ = jax.lax.scan(body, img, None, length=iters)
        return jnp.mean(final)

    float(run(x))  # compile
    best = 1e9
    for _ in range(trials):
        t0 = time.perf_counter()
        float(run(x))
        best = min(best, time.perf_counter() - t0)
    return best / iters * 1000


def main():
    import jax
    import jax.numpy as jnp

    from focoos_tpu.model_manager import ModelManager
    from focoos_tpu.models.fai_detr.modelling import HybridEncoder, TransformerPredictor

    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 640
    model = ModelManager.get("fai-detr-l-coco", dtype="bfloat16")
    v = model.variables
    module = model.module
    cfg = model.config

    x = jnp.asarray(np.random.rand(bs, size, size, 3).astype(np.float32) * 255)

    def full(img):
        out, _ = module.apply(v, img, train=False)
        return img + (jnp.mean(out.logits) * 1e-24).astype(img.dtype)

    # backbone only
    bb_vars = {"params": v["params"]["backbone"], "batch_stats": v["batch_stats"]["backbone"]}
    backbone = module.backbone

    def bb_only(img):
        feats = backbone.apply(bb_vars, img.astype(jnp.bfloat16))
        return img + (jnp.mean(feats["res5"].astype(jnp.float32)) * 1e-24).astype(img.dtype)

    # backbone + hybrid encoder
    enc = HybridEncoder(
        backbone=backbone, feat_dim=cfg.pixel_decoder_feat_dim, out_dim=cfg.pixel_decoder_out_dim,
        nhead=cfg.pixel_decoder_nhead, dim_feedforward=cfg.pixel_decoder_dim_feedforward,
        num_encoder_layers=cfg.pixel_decoder_num_encoder_layers, expansion=cfg.pixel_decoder_expansion,
        dtype=jnp.bfloat16,
    )
    enc_vars = {
        "params": {**v["params"]["pixel_decoder"], "backbone": v["params"]["backbone"]},
        "batch_stats": {**v["batch_stats"]["pixel_decoder"], "backbone": v["batch_stats"]["backbone"]},
    }

    def bb_enc(img):
        _, ms = enc.apply(enc_vars, img.astype(jnp.bfloat16))
        return img + (jnp.mean(ms[0].astype(jnp.float32)) * 1e-24).astype(img.dtype)

    t_full = chain_time(full, x)
    t_bb = chain_time(bb_only, x)
    t_enc = chain_time(bb_enc, x)
    print(f"batch={bs} size={size}")
    print(f"backbone:            {t_bb:7.2f} ms")
    print(f"backbone+encoder:    {t_enc:7.2f} ms  (encoder {t_enc - t_bb:.2f})")
    print(f"full model:          {t_full:7.2f} ms  (predictor {t_full - t_enc:.2f})")
    print(f"throughput:          {bs / t_full * 1000:7.1f} img/s")


if __name__ == "__main__":
    main()
