"""Backbone shape/contract tests (reference model: tests/test_backbone.py)."""

import jax
import jax.numpy as jnp
import pytest

from focoos_tpu.nn.backbone.resnet import ResNet, ResnetConfig


@pytest.mark.parametrize("depth,expansion", [(18, 1), (50, 4)])
def test_resnet_shapes(depth, expansion):
    cfg = ResnetConfig(depth=depth, variant="d", freeze_norm=False, use_pretrained=False)
    model = ResNet(config=cfg)
    x = jnp.zeros((2, 64, 96, 3), jnp.float32)
    vars_ = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(vars_, x)
    assert set(out) == {"res2", "res3", "res4", "res5"}
    for i, k in enumerate(["res2", "res3", "res4", "res5"]):
        stride = 2 ** (i + 2)
        assert out[k].shape == (2, 64 // stride, 96 // stride, [64, 128, 256, 512][i] * expansion)


def test_resnet_output_shape_descriptor():
    cfg = ResnetConfig(depth=50, use_pretrained=False)
    model = ResNet(config=cfg)
    shapes = model.output_shape()
    assert shapes["res5"].channels == 2048
    assert shapes["res5"].stride == 32
    assert shapes["res2"].stride == 4


def test_resnet_variant_b_stem():
    cfg = ResnetConfig(depth=18, variant="b", freeze_norm=False, use_pretrained=False)
    model = ResNet(config=cfg)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    vars_ = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(vars_, x)
    assert out["res2"].shape == (1, 16, 16, 64)
