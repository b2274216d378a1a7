"""Optimizer + LR schedule construction (optax).

Parity with optim/build.py:7-17 + optim/scheduler.py:5-25:
  - AdamW (default: lr 3e-5, betas (0.9, 0.999), wd 0.05 —
    configs/msr3d.yaml:42-47), Lamb, Adam, SGD by name
  - schedules as multiplicative factors on the base lr:
    warmup_cosine, warmup_exp, warmup_cosine_instructblip (default:
    1e-3-floor linear warmup → cosine)
  - grad-clip (global norm 5.0, solver.grad_norm) and trainable-mask
    (LoRA + projections + scene encoder) folded into the optax chain —
    frozen leaves get zero updates, replacing torch's requires_grad.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax


def warmup_cosine(step, warmup_step, total_step):
    warm = step / jnp.maximum(warmup_step, 1)
    decay = jnp.maximum(
        0.5 * (1 + jnp.cos((step - warmup_step) / jnp.maximum(total_step - warmup_step, 1) * math.pi)),
        1e-5,
    )
    return jnp.where(step <= warmup_step, warm, decay)


def warmup_exp(step, warmup_step, total_step, gamma=0.9):
    warm = step / jnp.maximum(warmup_step, 1)
    decay = gamma ** (step * 1.0 / jnp.maximum(total_step - warmup_step, 1))
    return jnp.where(step <= warmup_step, warm, decay)


def warmup_cosine_instructblip(step, warmup_step, total_step):
    warm = 1e-3 + step / jnp.maximum(warmup_step, 1) * (1 - 1e-3)
    decay = 0.5 * (
        1 + jnp.cos((step - warmup_step) / jnp.maximum(total_step - warmup_step, 1) * math.pi)
    )
    return jnp.where(step <= warmup_step, warm, decay)


SCHEDULES = {
    "warmup_cosine": warmup_cosine,
    "warmup_exp": warmup_exp,
    "warmup_cosine_instructblip": warmup_cosine_instructblip,
}


def make_schedule(name: str, base_lr: float, warmup_steps: int, total_steps: int, **kw):
    fn = SCHEDULES[name]

    def schedule(step):
        return base_lr * fn(step, warmup_steps, total_steps, **kw)

    return schedule


def build_optim(
    cfg,
    total_steps: int,
    trainable_mask: Optional[Any] = None,
) -> tuple[optax.GradientTransformation, Callable]:
    """cfg = full config (reference layout). Returns (optimizer, schedule_fn).

    ``trainable_mask``: pytree of bools over params; frozen leaves receive
    zero updates (optax.masked).
    """
    solver = cfg.solver
    opt_name = solver.optim.name
    args = dict(solver.optim.args.items())
    lr = float(args.pop("lr"))
    sched_args = dict(solver.sched.args.items())
    warmup = int(sched_args.pop("warmup_steps"))
    schedule = make_schedule(solver.sched.name, lr, warmup, total_steps, **sched_args)

    if opt_name == "AdamW":
        betas = args.pop("betas", [0.9, 0.999])
        tx = optax.adamw(
            learning_rate=schedule,
            b1=betas[0],
            b2=betas[1],
            weight_decay=args.pop("weight_decay", 0.0),
            eps=args.pop("eps", 1e-8),
        )
    elif opt_name == "Adam":
        betas = args.pop("betas", [0.9, 0.999])
        tx = optax.adam(learning_rate=schedule, b1=betas[0], b2=betas[1])
    elif opt_name == "Lamb":
        tx = optax.lamb(
            learning_rate=schedule, weight_decay=args.pop("weight_decay", 0.0)
        )
    elif opt_name == "SGD":
        tx = optax.sgd(learning_rate=schedule, momentum=args.pop("momentum", 0.0))
    else:
        raise ValueError(f"unknown optimizer {opt_name!r}")

    chain = []
    grad_norm = solver.get("grad_norm")
    if grad_norm:
        chain.append(optax.clip_by_global_norm(float(grad_norm)))
    chain.append(tx)
    optimizer = optax.chain(*chain)

    if trainable_mask is not None:
        # NOTE: optax.masked alone is wrong for freezing — unmasked leaves
        # would receive the raw gradient as their update. multi_transform
        # routes frozen leaves to set_to_zero instead.
        labels = jax.tree_util.tree_map(
            lambda m: "train" if m else "freeze", trainable_mask
        )
        optimizer = optax.multi_transform(
            {"train": optimizer, "freeze": optax.set_to_zero()}, labels
        )

    return optimizer, schedule
