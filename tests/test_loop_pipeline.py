"""Host-loop pipelining: packed metrics, one-step-delayed flush, device
prefetch (the round-3 host-path work; see docs/tpu_design.md "Train-loop
host path"). The reference's torch loop fetches loss synchronously every
iteration (focoos/trainer/trainer.py:723-773); here every device→host
transfer is a single packed array fetched one step late so it overlaps the
next step's compute."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest


def _toy_loss(variables, batch, rng):
    w = variables["params"]["w"]
    pred = batch["x"] @ w
    loss = jnp.mean((pred - batch["y"]) ** 2)
    return loss, ({"mse": loss, "aux": jnp.float32(1.5)}, {})


def _toy_setup():
    from focoos_tpu.trainer.train_step import create_train_state

    tx = optax.sgd(0.1)
    variables = {"params": {"w": jnp.ones((4, 2))}}
    state = create_train_state(dict(variables), tx)
    batch = {"x": jnp.ones((8, 4)), "y": jnp.zeros((8, 2))}
    return tx, state, batch


def test_packed_metrics_matches_dict():
    from focoos_tpu.trainer.train_step import build_train_step

    tx, state, batch = _toy_setup()
    rng = jax.random.PRNGKey(0)

    plain = build_train_step(_toy_loss, tx, donate=False)
    packed = build_train_step(_toy_loss, tx, donate=False, pack_metrics=True)

    _, m_plain = plain(state, batch, rng)
    _, m_packed = packed(state, batch, rng)

    keys, arr = m_packed
    assert set(keys) == set(m_plain) == {"mse", "aux", "total_loss", "grad_norm"}
    got = dict(zip(keys, np.asarray(arr)))
    for k in m_plain:
        np.testing.assert_allclose(got[k], float(m_plain[k]), rtol=1e-6)


def test_packed_metrics_multi_step():
    from focoos_tpu.trainer.train_step import build_multi_train_step

    tx, state, batch = _toy_setup()
    rng = jax.random.PRNGKey(0)
    stacked = jax.tree.map(lambda x: jnp.stack([x, x]), batch)

    packed = build_multi_train_step(_toy_loss, tx, steps_per_call=2, donate=False, pack_metrics=True)
    _, (keys, arr) = packed(state, stacked, rng)
    assert "total_loss" in keys and arr.shape == (len(keys),)
    assert np.isfinite(np.asarray(arr)).all()


class _FakeStep:
    """Host-side step fn: returns packed metrics like the real builder."""

    def __init__(self):
        self.calls = 0

    def __call__(self, state, batch, rng):
        self.calls += 1
        arr = jnp.asarray([float(self.calls), 0.0], jnp.float32)
        return state, (("total_loss", "zero"), arr)


def _make_loop(step, n_iters, period=1, batches=None):
    from focoos_tpu.trainer.trainer import TrainerLoop

    if batches is None:
        batches = iter(lambda: {"x": np.zeros(1)}, None)  # infinite sentinel-free
    return TrainerLoop(step, {}, batches, max_iter=n_iters, gather_metric_period=period)


def test_delayed_flush_records_every_iteration():
    loop = _make_loop(_FakeStep(), 5)
    loop.train()
    hist = loop.storage.history("total_loss")
    values = [v for v, _ in hist.values()]
    # every step's metrics arrive despite the one-step delay
    assert values == [1.0, 2.0, 3.0, 4.0, 5.0]
    # and they are attributed to the iteration that produced them
    iters = [it for _, it in hist.values()]
    assert iters == [0, 1, 2, 3, 4]


def test_delayed_flush_respects_gather_period():
    loop = _make_loop(_FakeStep(), 6, period=3)
    loop.train()
    hist = loop.storage.history("total_loss")
    values = [v for v, _ in hist.values()]
    # period boundaries (iters 2 and 5) plus the forced final flush
    assert 3.0 in values and 6.0 in values and 1.0 not in values


def test_nan_guard_fires_one_step_late():
    class NaNStep(_FakeStep):
        def __call__(self, state, batch, rng):
            self.calls += 1
            v = float("nan") if self.calls == 2 else 1.0
            return state, (("total_loss",), jnp.asarray([v], jnp.float32))

    loop = _make_loop(NaNStep(), 10)
    with pytest.raises(FloatingPointError, match="iteration 1"):
        loop.train()


def test_device_prefetch_order_and_error():
    from focoos_tpu.data.loaders import device_prefetch

    out = list(device_prefetch(iter(range(7)), depth=2))
    assert out == list(range(7))

    def boom():
        yield 1
        raise RuntimeError("producer died")

    it = device_prefetch(boom(), depth=2)
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="producer died"):
        list(it)
