"""fai_detr model contract tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from focoos_tpu.models.fai_detr.config import DETRConfig
from focoos_tpu.models.fai_detr.modelling import FAIDetr, generate_anchors
from focoos_tpu.nn.backbone.resnet import ResNet, ResnetConfig


@pytest.fixture(scope="module")
def tiny_detr():
    bcfg = ResnetConfig(depth=18, variant="d", freeze_norm=False, use_pretrained=False)
    cfg = DETRConfig(
        num_classes=11, backbone_config=bcfg, num_queries=20, transformer_predictor_dec_layers=2
    )
    model = FAIDetr(config=cfg, backbone=ResNet(config=bcfg))
    x = jnp.zeros((1, 128, 128, 3), jnp.float32)
    vars_ = model.init(jax.random.PRNGKey(0), x)
    return model, vars_, cfg


@pytest.mark.slow
def test_forward_shapes(tiny_detr):
    model, vars_, cfg = tiny_detr
    x = jnp.ones((2, 128, 128, 3), jnp.float32) * 127.0
    out, aux = model.apply(vars_, x)
    assert out.boxes.shape == (2, 20, 4)
    assert out.logits.shape == (2, 20, 11)
    assert aux.dec_logits.shape == (2, 2, 20, 11)
    # sigmoided scores in [0, 1]
    assert float(jnp.min(out.logits)) >= 0.0
    assert float(jnp.max(out.logits)) <= 1.0
    # boxes normalized
    assert bool(jnp.all(jnp.isfinite(out.boxes)))


def test_forward_jit_compiles(tiny_detr):
    model, vars_, _ = tiny_detr
    fwd = jax.jit(lambda v, x: model.apply(v, x)[0].boxes)
    x = jnp.zeros((1, 128, 128, 3), jnp.float32)
    b1 = fwd(vars_, x)
    b2 = fwd(vars_, x)
    np.testing.assert_allclose(np.asarray(b1), np.asarray(b2))


def test_generate_anchors_matches_reference_semantics():
    anchors, valid = generate_anchors([(2, 2), (4, 4)])
    assert anchors.shape == (20, 4)
    assert valid.shape == (20, 1)
    # first level cell center at (0.25, 0.25), wh = 0.05 * 4 = 0.2
    a0 = 1 / (1 + np.exp(-anchors[0]))
    np.testing.assert_allclose(a0, [0.25, 0.25, 0.2, 0.2], atol=1e-6)
