"""FSDP / tensor-parallel sharding rules (parallel/sharding.py).

The reference has no analog — its distributed layer is DDP-only
(focoos/utils/distributed/dist.py). Here we verify that the richer GSPMD
layout constraints (ZeRO-style FSDP over `data`, Megatron TP over `model`,
and both combined on a 2-D mesh) change NOTHING numerically: sharded
training must match single-device training to float tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import PartitionSpec as P

from focoos_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS, make_mesh, replicate, shard_batch
from focoos_tpu.parallel.sharding import (
    device_put_state,
    make_mesh_2d,
    spec_for,
    state_shardings,
)
from focoos_tpu.trainer.train_step import build_train_step, create_train_state


@pytest.fixture(scope="module")
def mesh2d():
    assert len(jax.devices()) >= 8
    return make_mesh_2d(4, 2, devices=jax.devices()[:8])


# ---------------------------------------------------------------------------
# rule unit tests
# ---------------------------------------------------------------------------


def test_spec_for_tp_rules(mesh2d):
    # column-parallel: qkv / linear1 kernels shard the OUTPUT features
    s = spec_for("['decoder']['self_attn']['q_proj']['kernel']", (256, 256), mesh2d, "tp")
    assert s == P(None, MODEL_AXIS)
    s = spec_for("['decoder']['linear1']['kernel']", (256, 1024), mesh2d, "tp")
    assert s == P(None, MODEL_AXIS)
    s = spec_for("['decoder']['linear1']['bias']", (1024,), mesh2d, "tp")
    assert s == P(MODEL_AXIS)
    # row-parallel: out_proj / linear2 kernels shard the INPUT features
    # (trailing Nones are stripped to the canonical PartitionSpec form)
    s = spec_for("['decoder']['self_attn']['out_proj']['kernel']", (256, 256), mesh2d, "tp")
    assert s == P(MODEL_AXIS)
    s = spec_for("['decoder']['linear2']['kernel']", (1024, 256), mesh2d, "tp")
    assert s == P(MODEL_AXIS)
    # row-parallel bias is added after the psum -> replicated
    s = spec_for("['decoder']['linear2']['bias']", (256,), mesh2d, "tp")
    assert s == P()
    # `output_proj` (MSDA's out projection) is row-parallel too
    s = spec_for("['cross_attn']['output_proj']['kernel']", (256, 256), mesh2d, "tp")
    assert s == P(MODEL_AXIS)


def test_spec_for_fsdp_and_combined(mesh2d):
    # FSDP shards the largest divisible axis of big leaves over `data`
    s = spec_for("['backbone']['conv']['kernel']", (3, 3, 256, 512), mesh2d, "fsdp", min_fsdp_size=1)
    assert s == P(None, None, None, DATA_AXIS)
    # small leaves stay replicated (below min_fsdp_size)
    s = spec_for("['norm']['scale']", (256,), mesh2d, "fsdp")
    assert s == P()
    # indivisible axes are skipped
    s = spec_for("['head']['bias']", (7,), mesh2d, "fsdp", min_fsdp_size=1)
    assert s == P()
    # combined: TP takes `model` on the output dim, FSDP takes `data` on the input dim
    s = spec_for("['dec']['linear1']['kernel']", (256, 1024), mesh2d, "fsdp_tp", min_fsdp_size=1)
    assert s == P(DATA_AXIS, MODEL_AXIS)
    # scalars always replicated
    assert spec_for("['count']", (), mesh2d, "fsdp_tp") == P()


def test_state_shardings_covers_opt_state(mesh2d):
    """The regex rules must hit the SAME leaves inside optax's mu/nu trees
    (param paths repeat there), so optimizer state shards like the params."""
    params = {"linear1": {"kernel": jnp.zeros((64, 128)), "bias": jnp.zeros((128,))}}
    tx = optax.adamw(1e-3)
    state = create_train_state({"params": params}, tx)
    sh = state_shardings(state, mesh2d, "fsdp_tp", min_fsdp_size=1)
    assert sh.params["linear1"]["kernel"].spec == P(DATA_AXIS, MODEL_AXIS)
    mu = sh.opt_state[0].mu  # ScaleByAdamState
    assert mu["linear1"]["kernel"].spec == P(DATA_AXIS, MODEL_AXIS)
    assert sh.step.spec == P()


# ---------------------------------------------------------------------------
# numerics: sharded == single-device
# ---------------------------------------------------------------------------


class _TinyTransformerConv:
    """Conv + BN + attention-shaped denses — exercises every rule class."""

    def build(self):
        import flax.linen as nn

        class SelfAttn(nn.Module):
            dim: int = 16
            @nn.compact
            def __call__(self, x):
                q = nn.Dense(self.dim, name="q_proj")(x)
                k = nn.Dense(self.dim, name="k_proj")(x)
                v = nn.Dense(self.dim, name="v_proj")(x)
                a = jax.nn.softmax(q @ k.swapaxes(-1, -2) / 4.0, axis=-1)
                return nn.Dense(self.dim, name="out_proj")(a @ v)

        class Net(nn.Module):
            @nn.compact
            def __call__(self, x, train: bool):
                # use_bias=False: a bias feeding straight into BN has an exactly-zero
                # gradient, so Adam amplifies cross-device reduction-order noise into
                # ±lr sign flips on it — a degenerate param, not a sharding bug.
                x = nn.Conv(16, (3, 3), use_bias=False)(x)
                x = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
                x = jax.nn.relu(x)
                b, h, w, c = x.shape
                t = x.reshape(b, h * w, c)
                t = t + SelfAttn()(t)
                t = t + nn.Dense(c, name="linear2")(jax.nn.gelu(nn.Dense(32, name="linear1")(t)))
                return nn.Dense(4)(t.mean(axis=1))

        return Net()


@pytest.mark.slow
@pytest.mark.parametrize("mode", ["fsdp", "fsdp_tp"])
def test_sharded_train_matches_single_device(mode, mesh2d):
    module = _TinyTransformerConv().build()
    key = jax.random.PRNGKey(0)
    images = jax.random.normal(key, (16, 8, 8, 3))
    labels = jax.random.randint(jax.random.fold_in(key, 1), (16,), 0, 4)
    variables = module.init(jax.random.PRNGKey(2), images[:1], train=True)

    def loss_fn(vars_, batch, rng):
        x, y = batch
        logits, new_state = module.apply(vars_, x, train=True, mutable=["batch_stats"])
        loss = optax.softmax_cross_entropy_with_integer_labels(logits, y).mean()
        return loss, ({"ce": loss}, new_state)

    # SGD+momentum: exercises a sharded optimizer-state tree (mu) while keeping
    # updates proportional to gradients — Adam's sign-like normalization turns
    # cross-device reduction-order noise on small-gradient params into ±lr
    # divergence at random init (adamw structure is covered by the spec test).
    tx = optax.sgd(0.1, momentum=0.9)

    def init_state():
        return create_train_state(
            {"params": variables["params"], "batch_stats": variables["batch_stats"]}, tx
        )

    # single device, no mesh
    s1 = init_state()
    step1 = build_train_step(loss_fn, tx, donate=False)
    m1 = None
    for i in range(3):
        s1, m1 = step1(s1, (images, labels), jax.random.PRNGKey(i))

    # 4x2 (data x model) mesh with sharded state
    s2 = init_state()
    sh = state_shardings(s2, mesh2d, mode, min_fsdp_size=1)
    s2 = device_put_state(s2, sh)
    step2 = build_train_step(loss_fn, tx, mesh=mesh2d, donate=False, state_shardings=sh)
    m2 = None
    for i in range(3):
        s2, m2 = step2(s2, shard_batch((images, labels), mesh2d), jax.random.PRNGKey(i))

    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-5, atol=1e-6),
        s1.params, jax.device_get(s2.params),
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-5, atol=1e-6),
        s1.batch_stats, jax.device_get(s2.batch_stats),
    )
    assert float(m1["total_loss"]) == pytest.approx(float(m2["total_loss"]), rel=1e-4)

    # the state really is distributed: a TP'd kernel's per-device shard is smaller
    if mode == "fsdp_tp":
        leaf = s2.params["SelfAttn_0"]["q_proj"]["kernel"]
        db = leaf.sharding.shard_shape(leaf.shape)
        assert int(np.prod(db)) < int(np.prod(leaf.shape))


def test_trainer_accepts_sharding_arg(tmp_path):
    """TrainerArgs.sharding + 2-D mesh_shape round-trips through to_dict."""
    from focoos_tpu.ports import TrainerArgs

    a = TrainerArgs(run_name="x", mesh_shape=(4, 2), sharding="fsdp_tp")
    d = a.to_dict()
    assert d["sharding"] == "fsdp_tp"
    assert TrainerArgs.from_dict(d).sharding == "fsdp_tp"


def test_fsdp_tp_hlo_contains_expected_collectives(mesh2d):
    """Structure, not just numerics: the compiled fsdp_tp train step must
    contain the ZeRO-3 collectives (per-layer all-gather of params,
    reduce-scatter of grads) and TP's psum (all-reduce). A silent no-op
    sharding (e.g. regex missing every path) would pass the numerics test
    by accident of replication — this pins the mechanism."""
    import optax

    module = _TinyTransformerConv().build()
    images = jax.random.normal(jax.random.PRNGKey(0), (16, 8, 8, 3))
    labels = jax.random.randint(jax.random.PRNGKey(1), (16,), 0, 4)
    variables = module.init(jax.random.PRNGKey(2), images[:1], train=True)

    def loss_fn(vars_, batch, rng):
        x, y = batch
        logits, new_state = module.apply(vars_, x, train=True, mutable=["batch_stats"])
        loss = optax.softmax_cross_entropy_with_integer_labels(logits, y).mean()
        return loss, ({"ce": loss}, new_state)

    tx = optax.sgd(0.1, momentum=0.9)
    state = create_train_state(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]}, tx
    )
    sh = state_shardings(state, mesh2d, "fsdp_tp", min_fsdp_size=1)
    step = build_train_step(loss_fn, tx, mesh=mesh2d, donate=False, state_shardings=sh)
    batch = shard_batch((images, labels), mesh2d)
    state = device_put_state(state, sh)
    compiled = step.lower(state, batch, jax.random.PRNGKey(0)).compile()
    hlo = compiled.as_text()
    assert "all-gather" in hlo, "FSDP should all-gather sharded params"
    assert "reduce-scatter" in hlo or "all-reduce" in hlo, "grads need reduce-scatter/all-reduce"
    assert "all-reduce" in hlo, "TP row-parallel outputs and DP grads need psums"
