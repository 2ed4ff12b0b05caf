"""The jitted training step — the TPU analog of TrainerLoop.run_step
(focoos/trainer/trainer.py:723-773).

One ``train_step`` call = forward (bf16 optional) + criterion + backward +
global-norm clip + optimizer update + EMA, compiled into a single XLA
program over the data mesh. Gradient averaging across devices is implicit:
the loss is a mean over the *global* batch, so GSPMD inserts the psum — no
DDP wrapper, no GradScaler (bf16 needs no loss scaling).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    ema_params: Optional[Any] = None


def create_train_state(
    variables: Dict[str, Any],
    tx: optax.GradientTransformation,
    ema_enabled: bool = False,
) -> TrainState:
    params = variables["params"]
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params),
        ema_params=jax.tree.map(jnp.copy, params) if ema_enabled else None,
    )


def _make_step_body(
    loss_fn: Callable,
    tx: optax.GradientTransformation,
    ema_decay_fn: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
):
    """The un-jitted single-step body shared by single and multi-step builds."""

    def step_fn(state: TrainState, batch: Any, rng: jnp.ndarray) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        variables = {"params": state.params, "batch_stats": state.batch_stats}

        def wrapped(params):
            v = {"params": params, "batch_stats": state.batch_stats}
            total, (metrics, new_model_state) = loss_fn(v, batch, rng)
            return total, (metrics, new_model_state)

        (total, (metrics, new_model_state)), grads = jax.value_and_grad(wrapped, has_aux=True)(state.params)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        new_ema = state.ema_params
        if state.ema_params is not None and ema_decay_fn is not None:
            d = ema_decay_fn(state.step)
            new_ema = jax.tree.map(lambda e, p: e * d + p * (1.0 - d), state.ema_params, new_params)

        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_model_state.get("batch_stats", state.batch_stats),
            opt_state=new_opt_state,
            ema_params=new_ema,
        )
        metrics = dict(metrics)
        metrics["total_loss"] = total
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    return step_fn


def _pack_metrics(step_fn):
    """Wrap a step body so metrics come back as ONE stacked f32 array.

    A dict of 10-15 scalar device arrays costs one host round trip per leaf
    on remote-attached devices; a single [N] array is one transfer. Keys are
    captured at trace time (dict keys are static under tracing) into
    ``keys_cell`` so the host side can rebuild the dict.
    """
    keys_cell: list = []

    def fn(state, batch, rng):
        new_state, metrics = step_fn(state, batch, rng)
        keys = sorted(metrics)
        if not keys_cell:
            keys_cell.extend(keys)
        return new_state, jnp.stack([jnp.asarray(metrics[k], jnp.float32) for k in keys])

    return fn, keys_cell


def _host_unpack(jitted, keys_cell):
    def host_fn(state, batch, rng):
        new_state, arr = jitted(state, batch, rng)
        return new_state, (tuple(keys_cell), arr)

    return host_fn


def build_train_step(
    loss_fn: Callable,  # (variables, batch, rng) -> (total_loss, (metrics, new_model_state))
    tx: optax.GradientTransformation,
    mesh: Optional[Mesh] = None,
    ema_decay_fn: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
    donate: bool = True,
    pack_metrics: bool = False,
    state_shardings: Any = None,
):
    """Compile a full train step.

    ``loss_fn`` must be pure and already close over the module/criterion; it
    receives ``variables = {"params", "batch_stats"}`` and the sharded batch.
    With ``pack_metrics`` the metrics come back as ``(keys, stacked_array)``
    — one device→host transfer instead of one per scalar (the trainer uses
    this; tests and tools keep the plain dict).

    ``state_shardings`` (a TrainState-shaped pytree of NamedShardings, see
    parallel/sharding.state_shardings) turns on FSDP/TP: the state enters and
    leaves the step sharded; GSPMD inserts the per-layer all-gathers and
    reduce-scatters. Default (None) replicates the state — plain DP.
    """
    step_fn = _make_step_body(loss_fn, tx, ema_decay_fn)
    keys_cell = None
    if pack_metrics:
        step_fn, keys_cell = _pack_metrics(step_fn)

    if mesh is None:
        jitted = jax.jit(step_fn, donate_argnums=(0,) if donate else ())
    else:
        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("data"))
        st = repl if state_shardings is None else state_shardings
        jitted = jax.jit(
            step_fn,
            in_shardings=(st, data, repl),
            out_shardings=(st, repl),
            donate_argnums=(0,) if donate else (),
        )
    return _host_unpack(jitted, keys_cell) if pack_metrics else jitted


def build_multi_train_step(
    loss_fn: Callable,
    tx: optax.GradientTransformation,
    steps_per_call: int,
    mesh: Optional[Mesh] = None,
    ema_decay_fn: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
    donate: bool = True,
    pack_metrics: bool = False,
    state_shardings: Any = None,
):
    """K optimizer steps per host dispatch via ``lax.scan``.

    The TPU-idiomatic fix for host-bound training loops (remote tunnels,
    small models, slow drivers): one dispatch + one metric fetch amortize
    over ``steps_per_call`` real steps. The LR schedule still advances per
    inner step (it reads the optax step counter). Metrics returned are the
    mean over the K inner steps.

    Input batch: a pytree whose leaves are stacked ``[K, ...]``.
    """
    single = _make_step_body(loss_fn, tx, ema_decay_fn)

    def multi_fn(state, batches, rng):
        rngs = jax.random.split(rng, steps_per_call)

        def body(state, xs):
            batch, r = xs
            state, metrics = single(state, batch, r)
            return state, metrics

        state, metrics = jax.lax.scan(body, state, (batches, rngs))
        return state, jax.tree.map(lambda m: jnp.mean(m, axis=0), metrics)

    keys_cell = None
    if pack_metrics:
        multi_fn, keys_cell = _pack_metrics(multi_fn)

    if mesh is None:
        jitted = jax.jit(multi_fn, donate_argnums=(0,) if donate else ())
    else:
        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P(None, "data"))  # leading K axis unsharded
        st = repl if state_shardings is None else state_shardings
        jitted = jax.jit(
            multi_fn,
            in_shardings=(st, data, repl),
            out_shardings=(st, repl),
            donate_argnums=(0,) if donate else (),
        )
    return _host_unpack(jitted, keys_cell) if pack_metrics else jitted
