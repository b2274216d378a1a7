"""Training state + jitted train/eval steps (pjit over the device mesh).

Replaces the reference's Accelerate/DDP machinery (trainer/build.py:147-153,
common/misc.py:134-243) with single-controller JAX:

  - ``TrainState``: params/opt_state/step pytree (flax.struct)
  - ``make_train_step``: ONE jit containing grad-accum (lax.scan over
    microbatches — configs/msr3d.yaml:33 uses 5), grad clip, masked
    optimizer update. Batch arrives sharded over the ``dp`` mesh axis;
    XLA inserts the gradient all-reduce over ICI (no NCCL, no DDP wrapper).
  - learnable-only checkpoint filtering mirrors ``save_func``
    (leo_trainer.py:445-454): only LoRA/projections/scene-encoder leaves
    are persisted, a few tens of MB instead of 7B params.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class TrainState:
    params: Any  # full variables dict ({"params": ..., "batch_stats"?: ...})
    opt_state: Any
    step: jax.Array  # scalar int32

    @staticmethod
    def create(variables, optimizer, trainable_mask=None):
        params = variables["params"]
        if trainable_mask is not None:
            params, _ = partition_params(params, trainable_mask)
        return TrainState(
            params=variables,
            opt_state=optimizer.init(params),
            step=jnp.zeros((), jnp.int32),
        )


def tree_zeros_like(tree):
    return jax.tree_util.tree_map(jnp.zeros_like, tree)


def _is_none(x):
    return x is None


def partition_params(params: Any, trainable_mask: Any):
    """Split a param tree into (trainable, frozen) trees with None at the
    complementary positions (equinox-style partition). None leaves vanish
    from jax's flattening, so gradients/optimizer state/accumulators only
    materialize for the trainable subset — essential when the frozen base
    is a 13.5 GB LLM."""
    train = jax.tree_util.tree_map(
        lambda p, m: p if m else None, params, trainable_mask
    )
    frozen = jax.tree_util.tree_map(
        lambda p, m: None if m else p, params, trainable_mask
    )
    return train, frozen


def combine_params(train: Any, frozen: Any) -> Any:
    return jax.tree_util.tree_map(
        lambda t, f: f if t is None else t, train, frozen, is_leaf=_is_none
    )


def make_train_step(
    apply_fn: Callable,
    optimizer: optax.GradientTransformation,
    *,
    accum_steps: int = 1,
    donate: bool = True,
    trainable_mask: Optional[Any] = None,
):
    """Build the jitted train step.

    ``apply_fn(variables, batch, rngs) -> scalar mean loss``.
    The batch's leading axis layout is ``(accum, micro_batch, ...)`` when
    accum_steps > 1, else ``(batch, ...)``.

    A reserved batch key ``"__mb_weights__"`` ((accum,) float32) weights
    each microbatch's contribution: grads/loss become weighted means over
    microbatches with weight>0. The epoch-tail group (fewer real batches
    than accum_steps) pads itself with weight-0 duplicates so no data is
    dropped — matching the reference's ``accelerator.accumulate``
    tail handling (reference trainer/leo_trainer.py:211) without a
    second compile at a different scan length.

    With ``trainable_mask`` (bool pytree over params), gradients are taken
    ONLY w.r.t. the trainable subtree — the optimizer must then be built
    WITHOUT its own mask (its state spans just the trainable leaves; this
    is also what ``TrainState.create(..., trainable_mask=...)`` does).

    Returns ``train_step(state, batch, rng) -> (state, metrics)``.
    """

    def step_fn(state: TrainState, batch, rng):
        mb_weights = None
        if isinstance(batch, dict) and "__mb_weights__" in batch:
            batch = dict(batch)
            mb_weights = batch.pop("__mb_weights__")
        params = state.params["params"]
        other_vars = {k: v for k, v in state.params.items() if k != "params"}
        if trainable_mask is not None:
            train_params, frozen_params = partition_params(params, trainable_mask)
        else:
            train_params, frozen_params = params, None

        def loss_for(train_p, micro_batch, micro_rng):
            full = (
                combine_params(train_p, frozen_params)
                if trainable_mask is not None
                else train_p
            )
            variables = dict(other_vars)
            variables["params"] = full
            return apply_fn(variables, micro_batch, micro_rng)

        grad_fn = jax.value_and_grad(loss_for)

        if accum_steps > 1:
            weights = (
                jnp.ones((accum_steps,), jnp.float32)
                if mb_weights is None
                else mb_weights.astype(jnp.float32)
            )

            def micro(carry, inp):
                grads_acc, loss_acc = carry
                micro_batch, micro_rng, w = inp
                loss, grads = grad_fn(train_params, micro_batch, micro_rng)
                grads_acc = jax.tree_util.tree_map(
                    lambda a, g: a + w * g, grads_acc, grads
                )
                return (grads_acc, loss_acc + w * loss), None

            rngs = jax.random.split(rng, accum_steps)
            init = (tree_zeros_like(train_params), jnp.zeros((), jnp.float32))
            (grads, loss_sum), _ = jax.lax.scan(
                micro, init, (batch, rngs, weights)
            )
            scale = 1.0 / jnp.maximum(jnp.sum(weights), 1.0)
            grads = jax.tree_util.tree_map(lambda g: g * scale, grads)
            loss = loss_sum * scale
        else:
            loss, grads = grad_fn(train_params, batch, rng)

        updates, new_opt_state = optimizer.update(
            grads, state.opt_state, train_params
        )
        new_train = optax.apply_updates(train_params, updates)
        new_params = (
            combine_params(new_train, frozen_params)
            if trainable_mask is not None
            else new_train
        )
        new_variables = dict(other_vars)
        new_variables["params"] = new_params
        new_state = TrainState(
            params=new_variables, opt_state=new_opt_state, step=state.step + 1
        )
        metrics = {
            "loss": loss,
            "grad_norm": optax.global_norm(grads),
            "step": state.step + 1,
        }
        return new_state, metrics

    # the batch (argnum 1) is donated too: every caller (LeoTrainer,
    # bench_train, the overfit scripts) materializes a fresh device
    # batch per step, and donating it lets buffer assignment reuse the
    # ~35 MB accum-stacked fp32 point clouds for temps once the embed
    # pass has consumed them — the margin that decides whether the
    # next micro-batch size fits (b3×a7-flash missed by 34 MB without)
    return jax.jit(step_fn, donate_argnums=(0, 1) if donate else ())


def filter_learnable(params: Any, trainable_mask: Any) -> Any:
    """Keep only trainable leaves (None elsewhere) for weights-only saves."""
    return jax.tree_util.tree_map(
        lambda p, m: p if m else None, params, trainable_mask
    )


def merge_learnable(base_params: Any, learnable: Any) -> Any:
    """load_model(strict=False) analog: overlay saved learnable leaves."""
    return jax.tree_util.tree_map(
        lambda b, l: b if l is None else l,
        base_params,
        learnable,
        is_leaf=lambda x: x is None,
    )
