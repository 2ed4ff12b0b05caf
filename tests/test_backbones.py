"""Backbone shape/contract tests (reference model: tests/test_backbone.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from focoos_tpu.nn.backbone.resnet import ResNet, ResnetConfig


@pytest.mark.parametrize(
    "depth,expansion",
    [(18, 1), pytest.param(50, 4, marks=pytest.mark.slow)],  # depth-50 is the heavy compile
)
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


@pytest.mark.slow
def test_resnet_remat_identical_numerics():
    """jax.checkpoint rematerialization: forward bit-identical, grads equal
    to reassociation noise."""
    import jax
    import jax.numpy as jnp

    from focoos_tpu.nn.backbone.resnet import ResNet, ResnetConfig

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 3))
    m0 = ResNet(config=ResnetConfig(depth=18, remat=False))
    m1 = ResNet(config=ResnetConfig(depth=18, remat=True))
    v = m0.init(jax.random.PRNGKey(1), x)

    o0 = m0.apply(v, x)["res5"]
    o1 = m1.apply(v, x)["res5"]
    np.testing.assert_array_equal(np.asarray(o0), np.asarray(o1))

    def loss(mod):
        def f(params):
            out = mod.apply({"params": params, "batch_stats": v.get("batch_stats", {})}, x)
            return sum(jnp.sum(o**2) for o in out.values())
        return f

    g0 = jax.grad(loss(m0))(v["params"])
    g1 = jax.grad(loss(m1))(v["params"])
    rel = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(a)) + 1e-9)), g0, g1)
    assert max(jax.tree.leaves(rel)) < 1e-5


@pytest.mark.slow
def test_swin_remat_forward_identical():
    import jax

    from focoos_tpu.nn.backbone.swin import Swin, SwinConfig

    x = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 64, 3))
    cfg = dict(model_size=None, embed_dim=24, depths=(1, 1, 1, 1), num_heads=(2, 2, 2, 2),
               window_size=4, drop_path_rate=0.0)
    m0 = Swin(config=SwinConfig(**cfg, remat=False))
    m1 = Swin(config=SwinConfig(**cfg, remat=True))
    v = m0.init(jax.random.PRNGKey(1), x)
    o0 = m0.apply(v, x)["res5"]
    o1 = m1.apply(v, x)["res5"]
    # remat changes XLA fusion boundaries -> reassociation noise only
    np.testing.assert_allclose(np.asarray(o0), np.asarray(o1), atol=1e-5)


def test_resnet_space_to_depth_exact():
    """s2d stem reformulation: same params, outputs equal to fp rounding,
    odd sizes included."""
    from focoos_tpu.nn.backbone.resnet import ResNet, ResnetConfig

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 3))
    m0 = ResNet(config=ResnetConfig(depth=18, space_to_depth=False))
    m1 = ResNet(config=ResnetConfig(depth=18, space_to_depth=True))
    v = m0.init(jax.random.PRNGKey(1), x)
    o0 = m0.apply(v, x)
    o1 = m1.apply(v, x)
    for k in o0:
        np.testing.assert_allclose(np.asarray(o0[k]), np.asarray(o1[k]), atol=2e-4)
    xo = jax.random.normal(jax.random.PRNGKey(2), (1, 63, 63, 3))
    vo = m0.init(jax.random.PRNGKey(1), xo)
    np.testing.assert_allclose(np.asarray(m0.apply(vo, xo)["res5"]),
                               np.asarray(m1.apply(vo, xo)["res5"]), atol=2e-4)
