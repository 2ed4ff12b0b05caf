"""Weight-converter unit tests (full numerical parity vs the live torch
reference is in tools/parity.py; these keep the rule machinery honest in CI
without the reference checkout)."""

import numpy as np
import pytest


def test_conv_weight_transposes_oihw_to_hwio():
    from focoos_tpu.utils.torch_convert import _conv

    w = np.arange(2 * 3 * 4 * 5, dtype=np.float32).reshape(2, 3, 4, 5)  # OIHW
    out = _conv(w)
    assert out.shape == (4, 5, 3, 2)  # HWIO
    np.testing.assert_array_equal(out, w.transpose(2, 3, 1, 0))


def test_linear_weight_transposes():
    from focoos_tpu.utils.torch_convert import _linear

    w = np.arange(6, dtype=np.float32).reshape(2, 3)
    np.testing.assert_array_equal(_linear(w), w.T)


def test_resnet_rule_coverage_on_fabricated_state_dict():
    """Every tensor of a fabricated torch-style resnet-18 stem+block maps to a
    flax path; nothing falls through unmatched."""
    from focoos_tpu.utils.torch_convert import apply_rules, backbone_rules

    state = {}

    def bn(prefix):
        for suffix, shape in (("weight", (8,)), ("bias", (8,)),
                              ("running_mean", (8,)), ("running_var", (8,)),
                              ("num_batches_tracked", ())):
            state[f"{prefix}.{suffix}"] = np.zeros(shape, np.float32)

    state["backbone.conv1.conv1_1.conv.weight"] = np.zeros((8, 3, 3, 3), np.float32)
    bn("backbone.conv1.conv1_1.norm")
    state["backbone.res_layers.0.blocks.0.branch2a.conv.weight"] = np.zeros((8, 8, 3, 3), np.float32)
    bn("backbone.res_layers.0.blocks.0.branch2a.norm")

    flat, unmatched = apply_rules(state, backbone_rules(r"backbone", "backbone"))
    assert unmatched == [], unmatched
    # num_batches_tracked is intentionally skipped, the rest must land
    assert any(k.startswith("params/backbone/conv1_1/conv/kernel") for k in flat)
    assert any("res2_block0" in k and "branch2a" in k for k in flat)
    assert any(k.startswith("batch_stats/") and k.endswith("/mean") for k in flat)


def test_expand_mha_splits_in_proj():
    from focoos_tpu.utils.torch_convert import expand_mha

    d = 4
    w = np.arange(3 * d * d, dtype=np.float32).reshape(3 * d, d)
    b = np.arange(3 * d, dtype=np.float32)
    flat = {
        "params/x/attn@in_proj_weight": w,
        "params/x/attn@in_proj_bias": b,
    }
    out = expand_mha(flat)
    assert set(out) == {
        "params/x/attn/q_proj/kernel", "params/x/attn/q_proj/bias",
        "params/x/attn/k_proj/kernel", "params/x/attn/k_proj/bias",
        "params/x/attn/v_proj/kernel", "params/x/attn/v_proj/bias",
    }
    np.testing.assert_array_equal(out["params/x/attn/q_proj/kernel"], w[:d].T)
    np.testing.assert_array_equal(out["params/x/attn/v_proj/bias"], b[2 * d :])


def test_unflatten_tree_nesting():
    from focoos_tpu.utils.torch_convert import unflatten_tree

    tree = unflatten_tree({
        "params/a/b/kernel": np.ones(1),
        "params/a/c": np.zeros(1),
        "batch_stats/a/bn/mean": np.zeros(1),
    })
    assert tree["params"]["a"]["b"]["kernel"].shape == (1,)
    assert tree["batch_stats"]["a"]["bn"]["mean"].shape == (1,)
