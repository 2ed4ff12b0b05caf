"""GPipe-style pipeline parallelism as a differentiable JAX transform.

The reference has no pipeline story at all (its distributed layer is DDP,
focoos/utils/distributed/dist.py); on TPU pods, pipelining over ICI is the
standard way to scale past what tensor parallelism's per-layer collectives
can amortize. This module implements it the TPU-native way: no schedulers,
no send/recv threads, no per-stage processes — the whole schedule is ONE
``lax.scan`` inside ONE ``shard_map``, activations move between stages with
``lax.ppermute`` (which XLA lowers to ICI ring transfers), and the backward
pass is ordinary autodiff: the transpose of ``ppermute`` is the reverse
``ppermute``, and grad-of-scan replays the schedule in reverse — i.e. the
backward pipeline falls out of the forward one for free.

Layout
------
- Stage parameters are stacked on a leading ``S`` axis and sharded
  ``P(axis)`` — each device holds exactly its stage's weights.
- The batch is split into ``M`` microbatches; the scan runs the classic
  GPipe schedule of ``T = M + S - 1`` ticks. At tick ``t`` device ``i``
  works on microbatch ``t - i`` (when in range) — the usual staircase with
  ``(S-1)/M`` bubble overhead.
- Stage-local outputs (e.g. DETR's per-layer aux heads) stay resident on
  their stage and come back with a leading ``S`` axis sharded over the pipe
  axis; downstream reductions over that axis become psums over ICI.
- The final carry is only valid on the last stage, so it is masked and
  ``psum``-broadcast back to every stage (one collective over the pipe
  axis; its transpose feeds the backward pipeline's entry point).

Composition: the pipe axis can be one axis of a larger mesh — batch dims
sharded over ``data`` (and/or kernels over ``model``) compose transparently,
since every collective here names only ``axis``.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

PIPE_AXIS = "pipe"


def stack_stage_params(per_stage: Sequence[Any]) -> Any:
    """Stack per-stage param pytrees on a new leading S axis.

    All stages must be structurally identical (same tree, same leaf shapes) —
    that is what makes the single-program pipeline possible.
    """
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *per_stage)


def _split_micro(x: jnp.ndarray, m: int) -> jnp.ndarray:
    b = x.shape[0]
    assert b % m == 0, f"batch {b} not divisible by {m} microbatches"
    return x.reshape(m, b // m, *x.shape[1:])


def pipeline_apply(
    stage_fn: Callable[..., Tuple[Any, Any]],
    stage_params: Any,
    carry_in: Any,
    n_micro: int,
    mesh: Mesh,
    axis: str = PIPE_AXIS,
    consts: Any = None,
    shared: Any = None,
    batch_spec: P = P(),
) -> Tuple[Any, Any]:
    """Run ``carry -> stage_fn(params_i, carry, consts, shared, i) -> (carry, out_i)``
    through all ``S`` pipeline stages, microbatched GPipe-style.

    Args:
      stage_fn: ``(params, carry, consts, shared, stage_idx) -> (new_carry,
        stage_out)``. ``params`` is ONE stage's (unstacked) param tree;
        ``stage_idx`` is a traced int32 scalar (``lax.axis_index``) for
        stage-dependent behavior. ``stage_out`` may be any pytree (or None) —
        it is collected per stage per microbatch.
      stage_params: pytree stacked on a leading S axis (see
        ``stack_stage_params``); S must equal the mesh's ``axis`` size.
      carry_in: pytree of ``[B, ...]`` arrays entering stage 0.
      n_micro: number of microbatches M (must divide B).
      consts: pytree of ``[B, ...]`` per-sample side inputs every stage reads
        (e.g. DETR's encoder memory). Microbatched like the carry, but held
        resident on every stage (replicated over the pipe axis) instead of
        ppermuted — each stage indexes the microbatch it is working on.
        Non-batch constants should simply be closed over in ``stage_fn``.
      shared: pytree of parameters used identically by EVERY stage (e.g.
        DETR's shared query-pos head). Replicated over the pipe axis; its
        gradient is the psum of the per-stage contributions (shard_map's
        transpose inserts it).
      batch_spec: PartitionSpec of the batch dim of ``carry_in``/``consts``
        leaves (e.g. ``P("data")`` when composing with data parallelism).

    Returns:
      ``(carry_out, stage_outs)`` where ``carry_out`` matches ``carry_in``'s
      structure/shapes (replicated over the pipe axis) and ``stage_outs`` has
      a leading ``S`` axis sharded over the pipe axis, then ``[B, ...]``.
    """
    s = mesh.shape[axis]
    m = int(n_micro)

    carry_mb = jax.tree.map(lambda x: _split_micro(x, m), carry_in)  # [M, b, ...]
    consts_mb = None if consts is None else jax.tree.map(lambda x: _split_micro(x, m), consts)

    def per_device(params_blk, carry_mb, consts_mb, shared):
        # params_blk leaves have a leading stage axis of local size 1
        params = jax.tree.map(lambda x: x[0], params_blk)
        idx = lax.axis_index(axis)
        is_first = idx == 0
        is_last = idx == s - 1

        zero_carry = jax.tree.map(lambda x: jnp.zeros_like(x[0]), carry_mb)

        def tick(state, t):
            held, out_buf, done_buf = state
            # my microbatch id this tick: t - idx (valid when 0 <= it < M)
            mb = t - idx
            valid = (mb >= 0) & (mb < m)
            mb_c = jnp.clip(mb, 0, m - 1)
            # stage 0 ingests microbatch t (while t < M); everyone else uses
            # what the previous stage ppermuted in at the end of last tick.
            fresh = jax.tree.map(lambda x: lax.dynamic_index_in_dim(x, mb_c, 0, keepdims=False), carry_mb)
            cur = jax.tree.map(lambda f, h: jnp.where(is_first, f, h), fresh, held)
            kt = (
                None
                if consts_mb is None
                else jax.tree.map(lambda x: lax.dynamic_index_in_dim(x, mb_c, 0, keepdims=False), consts_mb)
            )

            new_carry, stage_out = stage_fn(params, cur, kt, shared, idx)
            if stage_out is not None:
                out_buf = jax.tree.map(
                    lambda buf, o: lax.dynamic_update_index_in_dim(
                        buf, jnp.where(valid, o, lax.dynamic_index_in_dim(buf, mb_c, 0, keepdims=False)), mb_c, 0
                    ),
                    out_buf, stage_out,
                )
            # last stage banks its finished microbatch
            bank = valid & is_last
            done_buf = jax.tree.map(
                lambda buf, o: lax.dynamic_update_index_in_dim(
                    buf, jnp.where(bank, o, lax.dynamic_index_in_dim(buf, mb_c, 0, keepdims=False)), mb_c, 0
                ),
                done_buf, new_carry,
            )
            # shift the pipeline: stage i -> i+1 (ring; the wraparound into
            # stage 0 is overwritten by the fresh ingest next tick)
            perm = [(i, (i + 1) % s) for i in range(s)]
            held = jax.tree.map(lambda x: lax.ppermute(x, axis, perm), new_carry)
            return (held, out_buf, done_buf), None

        # probe one stage application to get out_buf structure
        k0 = None if consts_mb is None else jax.tree.map(lambda x: x[0], consts_mb)
        out_shapes = jax.eval_shape(
            lambda p, c, k, sh: stage_fn(p, c, k, sh, jnp.int32(0))[1], params, zero_carry, k0, shared
        )
        out_buf0 = (
            None
            if out_shapes is None
            else jax.tree.map(lambda sh: jnp.zeros((m,) + tuple(sh.shape), sh.dtype), out_shapes)
        )
        done_buf0 = jax.tree.map(lambda x: jnp.zeros((m,) + x.shape[1:], x.dtype), carry_mb)

        state0 = (jax.tree.map(lambda x: x[0], carry_mb), out_buf0, done_buf0)
        (held, out_buf, done_buf), _ = lax.scan(tick, state0, jnp.arange(m + s - 1, dtype=jnp.int32))

        # final carries live on the last stage only: mask + psum-broadcast
        done_buf = jax.tree.map(lambda x: jnp.where(is_last, x, jnp.zeros_like(x)), done_buf)
        done_buf = jax.tree.map(lambda x: lax.psum(x, axis), done_buf)
        if out_buf is not None:
            # add the local stage axis back (size 1 per device -> S global)
            out_buf = jax.tree.map(lambda x: x[None], out_buf)
        return done_buf, out_buf

    # out_specs must match the (carry, outs) structure, which depends on
    # stage_fn's stage_out — probe it once at the abstract level.
    zero_c = jax.tree.map(lambda x: jnp.zeros_like(x[0]), carry_mb)
    k0 = None if consts_mb is None else jax.tree.map(lambda x: x[0], consts_mb)
    p0 = jax.tree.map(lambda x: x[0] if hasattr(x, "shape") else x, stage_params)
    out_sh = jax.eval_shape(lambda p, c, k, sh: stage_fn(p, c, k, sh, jnp.int32(0))[1], p0, zero_c, k0, shared)

    carry_spec = jax.tree.map(lambda _: _pfx(batch_spec), carry_mb)
    outs_spec = None if out_sh is None else jax.tree.map(lambda _: _pfx2(axis, batch_spec), out_sh)
    shard_fn = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(
            jax.tree.map(lambda _: P(axis), stage_params),
            carry_spec,
            (jax.tree.map(lambda _: _pfx(batch_spec), consts_mb) if consts_mb is not None else None),
            (jax.tree.map(lambda _: P(), shared) if shared is not None else None),
        ),
        out_specs=(carry_spec, outs_spec),
        check_vma=False,
    )

    done_mb, outs = shard_fn(stage_params, carry_mb, consts_mb, shared)
    carry_out = jax.tree.map(lambda x: x.reshape(-1, *x.shape[2:]), done_mb)
    if outs is not None:
        outs = jax.tree.map(lambda x: x.reshape(x.shape[0], -1, *x.shape[3:]), outs)
    return carry_out, outs


def _pfx(batch_spec: P) -> P:
    """Microbatch buffers: [M, b, ...] — M unsharded, batch dim as given."""
    return P(None, *batch_spec)


def _pfx2(axis: str, batch_spec: P) -> P:
    """Per-stage outputs: [S, M, b, ...]."""
    return P(axis, None, *batch_spec)
