"""Library-layer tests (reference: focoos/nn/layers/{misc,aspp,dcn,attention,
position_encoding}.py) + freeze-mask solver behavior."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture(scope="module")
def key():
    return jax.random.PRNGKey(0)


def test_drop_path_deterministic_identity(key):
    from focoos_tpu.nn.layers.misc import DropPath

    x = jnp.ones((4, 8, 8, 16))
    m = DropPath(0.5)
    v = m.init(key, x)
    assert (m.apply(v, x, deterministic=True) == x).all()
    # no dropout rng provided -> identity even in train mode
    assert (m.apply(v, x, deterministic=False) == x).all()


def test_drop_path_stochastic_scaling(key):
    from focoos_tpu.nn.layers.misc import DropPath

    x = jnp.ones((512, 2, 2, 1))
    m = DropPath(0.25)
    v = m.init(key, x)
    out = np.asarray(m.apply(v, x, deterministic=False, rngs={"dropout": key}))
    per_sample = np.unique(out.reshape(512, -1))
    # samples are either fully dropped or scaled by 1/keep
    np.testing.assert_allclose(sorted(per_sample), [0.0, 1 / 0.75], rtol=1e-6)
    # expectation preserved within sampling noise
    assert abs(out.mean() - 1.0) < 0.1


def test_aspp_and_dcn_shapes(key):
    from focoos_tpu.nn.layers.misc import ASPP, DeformableConv2d

    x = jnp.ones((2, 16, 16, 32))
    m = ASPP(out_channels=64, dilations=(2, 4, 6))
    y = m.apply(m.init(key, x), x)
    assert y.shape == (2, 16, 16, 64)

    d = DeformableConv2d(features=48, stride=2)
    y = d.apply(d.init(key, x), x)
    assert y.shape == (2, 8, 8, 48)


def test_dcn_zero_offsets_matches_regular_conv(key):
    """With zero-initialized offsets and modulation off, DCN == regular conv."""
    from focoos_tpu.nn.layers.misc import DeformableConv2d

    x = jax.random.normal(key, (1, 8, 8, 4))
    d = DeformableConv2d(features=6, modulated=False)
    v = d.init(key, x)
    kernel = v["params"]["kernel"]  # [k*k*c, F]
    y = d.apply(v, x)
    # reference computation: explicit 3x3 patch extraction (taps in (ky,kx) row-major)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    patches = jnp.concatenate(
        [xp[:, i : i + 8, j : j + 8] for i in range(3) for j in range(3)], axis=-1
    )
    expect = patches.reshape(1, 8, 8, -1) @ kernel
    np.testing.assert_allclose(np.asarray(y), np.asarray(expect), atol=1e-5)


def test_conditional_attention_shapes(key):
    from focoos_tpu.nn.layers.misc import ConditionalCrossAttention, ConditionalSelfAttention

    q = jnp.ones((2, 10, 64))
    kv = jnp.ones((2, 20, 64))
    sa = ConditionalSelfAttention(64)
    assert sa.apply(sa.init(key, q, q), q, q).shape == (2, 10, 64)
    ca = ConditionalCrossAttention(64)
    assert ca.apply(ca.init(key, q, kv, kv, q, kv), q, kv, kv, q, kv).shape == (2, 10, 64)


def test_position_embeddings(key):
    from focoos_tpu.nn.layers.misc import PositionEmbeddingLearned, get_sine_pos_embed

    p = PositionEmbeddingLearned(num_pos_feats=32, max_size=20)
    v = p.init(key, 8, 12)
    assert p.apply(v, 8, 12).shape == (8, 12, 64)
    emb = get_sine_pos_embed(jnp.zeros((3, 5, 4)), num_pos_feats=16)
    assert emb.shape == (3, 5, 64)


def test_solver_freeze_masks():
    from focoos_tpu.trainer.solver import leaf_hyperparams

    params = {
        "backbone": {"conv1_1": {"conv": {"kernel": jnp.ones(1)}},
                     "res2_block0": {"conv": {"kernel": jnp.ones(1)}},
                     "res3_block0": {"conv": {"kernel": jnp.ones(1)},
                                     "bn": {"scale": jnp.ones(1)}}},
        "head": {"classifier": {"kernel": jnp.ones(1)}},
    }
    lr, wd = leaf_hyperparams(
        params, base_wd=1e-4, freeze_paths=("backbone/conv1", "backbone/res2_"), freeze_bn=True
    )
    assert float(lr["backbone"]["conv1_1"]["conv"]["kernel"]) == 0.0
    assert float(lr["backbone"]["res2_block0"]["conv"]["kernel"]) == 0.0
    assert float(lr["backbone"]["res3_block0"]["conv"]["kernel"]) > 0.0
    assert float(lr["backbone"]["res3_block0"]["bn"]["scale"]) == 0.0  # freeze_bn
    assert float(wd["backbone"]["conv1_1"]["conv"]["kernel"]) == 0.0
    assert float(wd["head"]["classifier"]["kernel"]) == pytest.approx(1e-4)


@pytest.mark.slow
def test_swin_convnext_drop_path_train_mode(key):
    """drop_path active in train mode changes outputs; eval is deterministic."""
    from focoos_tpu.nn.backbone.convnextv2 import ConvNeXtV2, ConvNeXtV2Config

    cfg = ConvNeXtV2Config(model_size=None, depths=(2, 2, 2, 2), embed_dims=(16, 32, 64, 128),
                           drop_path_rate=0.5)
    m = ConvNeXtV2(config=cfg)
    x = jax.random.normal(key, (2, 64, 64, 3))
    v = m.init(key, x)
    e1 = m.apply(v, x, train=False)
    e2 = m.apply(v, x, train=False)
    np.testing.assert_array_equal(np.asarray(e1["res5"]), np.asarray(e2["res5"]))
    t1 = m.apply(v, x, train=True, rngs={"dropout": jax.random.PRNGKey(1)})
    t2 = m.apply(v, x, train=True, rngs={"dropout": jax.random.PRNGKey(2)})
    assert not np.array_equal(np.asarray(t1["res5"]), np.asarray(t2["res5"]))


def test_vit_helpers_window_roundtrip(key):
    from focoos_tpu.nn.layers.vit_helpers import window_partition, window_unpartition

    x = jax.random.normal(key, (2, 13, 17, 4))
    wins, pad_hw = window_partition(x, 7)
    assert wins.shape == (2 * 2 * 3, 7, 7, 4)
    back = window_unpartition(wins, 7, pad_hw, (13, 17))
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_vit_helpers_rel_pos_and_patch_embed(key):
    from focoos_tpu.nn.layers.vit_helpers import PatchEmbed, add_decomposed_rel_pos, get_rel_pos

    rp = jnp.ones((11, 8))
    assert get_rel_pos(6, 6, rp).shape == (6, 6, 8)
    attn = add_decomposed_rel_pos(jnp.zeros((2, 36, 36)), jnp.ones((2, 36, 8)), rp, rp, (6, 6), (6, 6))
    assert attn.shape == (2, 36, 36)
    pe = PatchEmbed(embed_dim=32)
    v = pe.init(key, jnp.ones((1, 64, 64, 3)))
    assert pe.apply(v, jnp.ones((1, 64, 64, 3))).shape == (1, 4, 4, 32)


def test_phase_pack_stem_conv_matches_plain():
    """_PhasePackConv3x3s2 (5x5/s4 phase-packed + depth-to-space) must equal
    the plain 3x3/s2/p1 conv to fp rounding for any H,W % 4 == 0."""
    import jax
    import jax.numpy as jnp

    from focoos_tpu.nn.layers.common import _PhasePackConv3x3s2

    rng = jax.random.PRNGKey(0)
    for h, w, c, f in [(32, 48, 3, 32), (16, 16, 8, 16)]:
        x = jax.random.normal(rng, (2, h, w, c), jnp.float32)
        mod = _PhasePackConv3x3s2(f)
        vs = mod.init(rng, x)
        y_fast = mod.apply(vs, x)
        k = vs["params"]["kernel"]
        dn = jax.lax.conv_dimension_numbers(x.shape, k.shape, ("NHWC", "HWIO", "NHWC"))
        y_ref = jax.lax.conv_general_dilated(x, k, (2, 2), ((1, 1), (1, 1)), dimension_numbers=dn)
        assert y_fast.shape == y_ref.shape
        assert float(jnp.abs(y_fast - y_ref).max()) < 5e-6


def test_banded_conv_matches_plain():
    """_BandedConv3x3 (block-banded matmul over the flattened (W,C) lane
    axis — the measured v5e stem win) must equal the plain 3x3/p1 conv to fp
    rounding at strides 1 and 2, and fall back exactly when Wo can't tile."""
    import jax
    import jax.numpy as jnp

    from focoos_tpu.nn.layers.common import _BandedConv3x3

    rng = jax.random.PRNGKey(0)
    for s, h, w, c, f in [(2, 64, 96, 3, 32), (1, 64, 64, 32, 32), (1, 40, 40, 16, 24), (2, 30, 30, 3, 8)]:
        x = jax.random.normal(rng, (2, h, w, c), jnp.float32)
        mod = _BandedConv3x3(f, stride=s)
        vs = mod.init(rng, x)
        y_fast = mod.apply(vs, x)
        k = vs["params"]["kernel"]
        dn = jax.lax.conv_dimension_numbers(x.shape, k.shape, ("NHWC", "HWIO", "NHWC"))
        y_ref = jax.lax.conv_general_dilated(x, k, (s, s), ((1, 1), (1, 1)), dimension_numbers=dn)
        assert y_fast.shape == y_ref.shape
        assert float(jnp.abs(y_fast - y_ref).max()) < 5e-6

    # gradients flow through the banded path (slices/concat/dot are all
    # differentiable — the auto heuristic only enables it at inference, but
    # an explicit stem_banded=True must train correctly too)
    x = jax.random.normal(rng, (1, 32, 32, 3), jnp.float32)
    mod = _BandedConv3x3(8, stride=2)
    vs = mod.init(rng, x)
    g = jax.grad(lambda v: jnp.sum(mod.apply(v, x) ** 2))(vs)
    assert float(jnp.abs(g["params"]["kernel"]).max()) > 0


def test_resnet_stem_banded_exact():
    """ResNet with stem_banded=True: same params, same outputs (fp rounding)
    as the default stem — the checkpoint-compatibility contract."""
    import jax
    import jax.numpy as jnp

    from focoos_tpu.nn.backbone.resnet import ResNet, ResnetConfig

    x = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 64, 3), jnp.float32)
    m0 = ResNet(config=ResnetConfig(depth=18, stem_banded=False))
    m1 = ResNet(config=ResnetConfig(depth=18, stem_banded=True))
    v = m0.init(jax.random.PRNGKey(0), x)
    y0 = m0.apply(v, x)
    y1 = m1.apply(v, x)  # identical param tree by construction
    for k in y0:
        assert float(jnp.abs(y0[k] - y1[k]).max()) < 1e-4


def test_stdc_stem_banded_exact():
    """STDC (fai-detr-m / bisenetformer backbone) with stem_banded=True:
    same params, same outputs as the default stem."""
    import jax
    import jax.numpy as jnp

    from focoos_tpu.nn.backbone.stdc import STDC, STDCConfig

    x = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 64, 3), jnp.float32)
    m0 = STDC(config=STDCConfig(size="nano", stem_banded=False))
    m1 = STDC(config=STDCConfig(size="nano", stem_banded=True))
    v = m0.init(jax.random.PRNGKey(0), x)
    y0, _ = m0.apply(v, x, mutable=["batch_stats"])
    y1, _ = m1.apply(v, x, mutable=["batch_stats"])
    for k in y0:
        assert float(jnp.abs(y0[k] - y1[k]).max()) < 1e-4


def test_masked_batchnorm_matches_subset_stats():
    """_MaskedBatchNorm (rtmo DCC): with a mask, train-mode statistics must
    equal plain BN statistics computed on ONLY the valid rows — the invariant
    that keeps the static positive-slot padding out of the criterion's BN
    (reference runs DCC on exactly the positives, rtmo/modelling.py:1002)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from focoos_tpu.models.rtmo.modelling import _MaskedBatchNorm

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(2.0, 3.0, (4, 6, 8)), jnp.float32)  # [B, P, F]
    mask = jnp.asarray(rng.random((4, 6)) > 0.4)

    mod = _MaskedBatchNorm()
    vs = mod.init(jax.random.PRNGKey(0), x, train=True)
    y, updated = mod.apply(vs, x, train=True, mask=mask, mutable=["batch_stats"])

    # reference: plain flax BN over the flat valid subset
    import flax.linen as nn

    valid_rows = np.asarray(x.reshape(-1, 8))[np.asarray(mask).reshape(-1)]
    ref = nn.BatchNorm(use_running_average=False, momentum=0.9, epsilon=1e-5)
    rvs = ref.init(jax.random.PRNGKey(0), jnp.asarray(valid_rows))
    y_ref, r_updated = ref.apply(rvs, jnp.asarray(valid_rows), mutable=["batch_stats"])

    got = np.asarray(y.reshape(-1, 8))[np.asarray(mask).reshape(-1)]
    np.testing.assert_allclose(got, np.asarray(y_ref), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(updated["batch_stats"]["mean"]),
        np.asarray(r_updated["batch_stats"]["mean"]), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(updated["batch_stats"]["var"]),
        np.asarray(r_updated["batch_stats"]["var"]), rtol=2e-4, atol=2e-5)

    # no mask + train: identical to plain flax BN on the full tensor
    y2, u2 = mod.apply(vs, x, train=True, mutable=["batch_stats"])
    flat = x.reshape(-1, 8)
    rvs2 = ref.init(jax.random.PRNGKey(0), flat)
    y2_ref, u2_ref = ref.apply(rvs2, flat, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(y2.reshape(-1, 8)), np.asarray(y2_ref), rtol=2e-5, atol=2e-5)

    # eval mode: running stats, mask ignored
    ye = mod.apply(vs, x, train=False)
    assert ye.shape == x.shape
