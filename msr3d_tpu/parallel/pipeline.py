"""Pipeline parallelism over the mesh's ``pp`` axis (GPipe schedule).

The reference has no pipeline parallelism (SURVEY §2.8: absent — a 7B
LLM fits per-GPU). This module makes the axis real: a GPipe-style
pipeline built the TPU-native way — ``shard_map`` over the mesh with
stage weights sharded along a stacked leading axis, activations handed
to the next stage with ``lax.ppermute`` over ICI, and the microbatch
schedule rolled into one ``lax.fori_loop`` inside a single compiled
program.

Schedule: S stages × M microbatches take ``M + S - 1`` ticks; at tick t,
stage s computes microbatch ``t - s`` (devices run every tick — the
bubble ticks compute on zeros, which is how SPMD pipelines express
idling). Composes with the ``dp`` axis: shard the microbatch's batch dim
over ``dp`` in ``in_specs`` and the same program is data-parallel too.

``stage_fn(stage_params, x, extra)`` must preserve the shape/dtype of
``x`` (the ring carry is a fixed buffer) — true for transformer blocks,
whose carry is the (mb, T, H) hidden state. ``extra`` carries per-
microbatch side inputs that every stage needs (positions, masks):
replicated across stages, indexed by the microbatch id each stage is
processing at the current tick. The real-model integration (embedding →
N Llama blocks → norm + head) lives in ``parallel/llm_pp.py``.

Differentiable end to end (``ppermute`` has a transpose rule), so a
``jax.grad`` over :func:`pipeline_apply` trains pipelined stages —
verified grad-exact against the sequential stack, including for the
full MSR3DNetwork train step (tests/test_pipeline.py).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from msr3d_tpu.parallel.mesh import DATA_AXIS, PIPELINE_AXIS

__all__ = ["pipeline_apply", "stack_stage_params"]


def stack_stage_params(per_stage_params: list) -> Any:
    """[stage0_tree, stage1_tree, ...] → one tree with a leading stage
    axis per leaf — the layout ``pipeline_apply`` shards over ``pp``."""
    return jax.tree_util.tree_map(
        lambda *leaves: jnp.stack(leaves), *per_stage_params
    )


def pipeline_apply(
    mesh: Mesh,
    stage_fn: Callable,
    stacked_params: Any,  # leaves (S, ...) — sharded over pp
    microbatches: jax.Array,  # (M, mb, ...) — optionally dp-sharded on mb
    *,
    extras: Any = None,  # pytree of (M, mb, ...) per-microbatch side inputs
    data_parallel: bool = False,
    auto_axes: frozenset = frozenset(),
) -> jax.Array:
    """Run ``stage_fn`` S times over each microbatch, pipelined.

    Semantically equivalent to

        for s in range(S): x = stage_fn(params[s], x, extra)

    applied to every microbatch, but stage s's weights live only on the
    ``pp=s`` devices and microbatches stream through the ring.
    ``stage_fn`` takes ``(params, x)`` when ``extras`` is None, else
    ``(params, x, extra)`` — and must return an array of ``x``'s exact
    shape/dtype. Returns outputs shaped like ``microbatches``.

    ``auto_axes``: mesh axes left to GSPMD *inside* the per-device body
    (partial-manual shard_map). Passing ``{'tp'}`` with stacked params
    additionally megatron-sharded over ``tp`` runs each pipeline stage
    tensor-parallel — the stage's dots partition over tp and XLA inserts
    the reductions, composing dp × tp × pp in one program. Requires the
    call to sit under ``jit`` (partial-manual shard_map with committed
    auto-sharded operands trips an eager-mode path in jax 0.9).
    """
    n_stages = mesh.shape[PIPELINE_AXIS]
    for path, leaf in jax.tree_util.tree_leaves_with_path(stacked_params):
        if leaf.shape[:1] != (n_stages,):
            raise ValueError(
                f"stacked_params leaf {jax.tree_util.keystr(path)} has leading "
                f"dim {leaf.shape[:1]} — must equal the pp mesh axis size "
                f"({n_stages}); build it with stack_stage_params or reshape "
                f"(L, ...) block params to (S, L//S, ...)"
            )
    m = microbatches.shape[0]
    ticks = m + n_stages - 1

    batch_spec = P(None, DATA_AXIS) if data_parallel else P()
    param_spec = jax.tree_util.tree_map(lambda _: P(PIPELINE_AXIS), stacked_params)
    extras_spec = jax.tree_util.tree_map(lambda _: batch_spec, extras)

    def per_device(params_block, xs, extras_local):
        # params_block leaves: (1, ...) — this device's stage
        params_local = jax.tree_util.tree_map(lambda a: a[0], params_block)
        s = lax.axis_index(PIPELINE_AXIS)
        zero = jnp.zeros_like(xs[0])
        fwd = [(i, (i + 1) % n_stages) for i in range(n_stages)]

        def run_stage(params, x, mb_idx):
            if extras_local is None:
                return stage_fn(params, x)
            extra = jax.tree_util.tree_map(
                lambda e: lax.dynamic_index_in_dim(e, mb_idx, 0, keepdims=False),
                extras_local,
            )
            return stage_fn(params, x, extra)

        def tick(t, carry):
            act, outs = carry
            # previous tick's activations move one stage down the ring;
            # the wrap-around into stage 0 is discarded (replaced by the
            # next microbatch feed)
            shifted = lax.ppermute(act, PIPELINE_AXIS, fwd)
            feed_idx = jnp.clip(t, 0, m - 1)
            feed = jnp.where(t < m, xs[feed_idx], zero)
            x_in = jnp.where(s == 0, feed, shifted)
            # stage s at tick t processes microbatch t - s (clipped into
            # range during bubble ticks — those outputs are discarded)
            mb_idx = jnp.clip(t - s, 0, m - 1)
            y = run_stage(params_local, x_in, mb_idx)

            out_idx = t - (n_stages - 1)
            do_write = (s == n_stages - 1) & (out_idx >= 0)
            updated = lax.dynamic_update_index_in_dim(
                outs, y, jnp.clip(out_idx, 0, m - 1), 0
            )
            outs = jnp.where(do_write, updated, outs)
            return y, outs

        outs0 = jnp.zeros_like(xs)
        _, outs = lax.fori_loop(0, ticks, tick, (zero, outs0))
        # only the last stage holds real outputs — broadcast over the ring
        outs = jnp.where(s == n_stages - 1, outs, jnp.zeros_like(outs))
        return lax.psum(outs, PIPELINE_AXIS)

    kw = {}
    if auto_axes:
        unknown = set(auto_axes) - set(mesh.axis_names)
        assert not unknown, f"auto_axes not in mesh: {unknown}"
        kw["axis_names"] = frozenset(mesh.axis_names) - frozenset(auto_axes)
    return shard_map(
        per_device,
        mesh=mesh,
        in_specs=(param_spec, batch_spec, extras_spec),
        out_specs=batch_spec,
        check_vma=False,
        **kw,
    )(stacked_params, microbatches, extras)
