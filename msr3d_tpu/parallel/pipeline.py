"""Pipeline parallelism over the mesh's ``pp`` axis (GPipe schedule).

The reference has no pipeline parallelism (SURVEY §2.8: absent — a 7B
LLM fits per-GPU) and the mesh here reserves the ``pp`` axis at size 1.
This module makes the axis real: a generic GPipe-style pipeline built
the TPU-native way — ``shard_map`` over the mesh with stage weights
sharded along a stacked leading axis, activations handed to the next
stage with ``lax.ppermute`` over ICI, and the microbatch schedule rolled
into one ``lax.fori_loop`` inside a single compiled program.

Schedule: S stages × M microbatches take ``M + S - 1`` ticks; at tick t,
stage s computes microbatch ``t - s`` (devices run every tick — the
bubble ticks compute on zeros, which is how SPMD pipelines express
idling). Composes with the ``dp`` axis: shard the microbatch's batch dim
over ``dp`` in ``in_specs`` and the same program is data-parallel too.

Differentiable end to end (``ppermute`` has a transpose rule), so a
``jax.grad`` over :func:`pipeline_apply` trains pipelined stages.
"""

from __future__ import annotations

from typing import Any, Callable

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
    stage_fn: Callable[[Any, jax.Array], jax.Array],
    stacked_params: Any,  # leaves (S, ...) — sharded over pp
    microbatches: jax.Array,  # (M, mb, ...) — optionally dp-sharded on mb
    *,
    data_parallel: bool = False,
) -> jax.Array:
    """Run ``stage_fn`` S times over each microbatch, pipelined.

    Semantically equivalent to

        for s in range(S): x = stage_fn(params[s], x)

    applied to every microbatch, but stage s's weights live only on the
    ``pp=s`` devices and microbatches stream through the ring.
    Returns outputs shaped like ``microbatches``.
    """
    n_stages = mesh.shape[PIPELINE_AXIS]
    m = microbatches.shape[0]
    ticks = m + n_stages - 1

    batch_spec = P(None, DATA_AXIS) if data_parallel else P()
    param_spec = jax.tree_util.tree_map(lambda _: P(PIPELINE_AXIS), stacked_params)

    def per_device(params_block, xs):
        # params_block leaves: (1, ...) — this device's stage
        params_local = jax.tree_util.tree_map(lambda a: a[0], params_block)
        s = lax.axis_index(PIPELINE_AXIS)
        zero = jnp.zeros_like(xs[0])
        fwd = [(i, (i + 1) % n_stages) for i in range(n_stages)]

        def tick(t, carry):
            act, outs = carry
            # previous tick's activations move one stage down the ring;
            # the wrap-around into stage 0 is discarded (replaced by the
            # next microbatch feed)
            shifted = lax.ppermute(act, PIPELINE_AXIS, fwd)
            feed_idx = jnp.clip(t, 0, m - 1)
            feed = jnp.where(t < m, xs[feed_idx], zero)
            x_in = jnp.where(s == 0, feed, shifted)
            y = stage_fn(params_local, x_in)

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

    return shard_map(
        per_device,
        mesh=mesh,
        in_specs=(param_spec, batch_spec),
        out_specs=batch_spec,
        check_vma=False,
    )(stacked_params, microbatches)
