"""Parameter sharding rules (PartitionSpec trees) for pjit.

The reference is DDP-only (SURVEY.md §2.8); here the LLM is additionally
tensor-parallel-ready over the ``tp`` mesh axis (megatron layout):

  q/k/v/gate/up kernels  (in, out) → shard out      P(None, "tp")
  o/down kernels         (in, out) → shard in       P("tp", None)
  embeddings             (vocab, h) → shard vocab   P("tp", None)
  lm_head                (h, vocab) → shard vocab   P(None, "tp")
  LoRA a (in, r) / b (r, out)      → follow base out/in where it matters
  everything else (norms, scene encoder, image tower) → replicated

XLA inserts the all-reduce after o_proj/down_proj automatically from these
shardings (scaling-book recipe: annotate, don't hand-write collectives).
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from msr3d_tpu.parallel.mesh import MODEL_AXIS

_COL_PARALLEL = ("q_proj", "k_proj", "v_proj", "gate_proj", "up_proj")
_ROW_PARALLEL = ("o_proj", "down_proj")


def llama_param_spec(path: str) -> P:
    """PartitionSpec for one LLM param, by its tree path string."""
    for name in _COL_PARALLEL:
        if f"'{name}'" in path:
            if "lora_a" in path:
                return P()  # (in, r): small, replicate
            if "lora_b" in path:
                return P(None, MODEL_AXIS)  # (r, out): follow base out-shard
            return P(None, MODEL_AXIS)
    for name in _ROW_PARALLEL:
        if f"'{name}'" in path:
            if "lora_a" in path:
                return P(MODEL_AXIS, None)  # (in, r): follow base in-shard
            if "lora_b" in path:
                return P()
            return P(MODEL_AXIS, None)
    if "embed_tokens" in path:
        return P(MODEL_AXIS, None)  # (vocab, h)
    if "lm_head" in path:
        return P(None, MODEL_AXIS)  # (h, vocab)
    return P()


def network_param_specs(params: Any) -> Any:
    """PartitionSpec pytree for full MSR3DNetwork variables."""

    def spec_for(path_tuple, leaf):
        path = jax.tree_util.keystr(path_tuple)
        if "'llm'" in path:
            spec = llama_param_spec(path)
            # guard: only shard dims that exist and are divisible later;
            # rank mismatch (e.g. 1-D norm scales) → replicate
            if len([a for a in spec if a is not None]) > getattr(leaf, "ndim", 0):
                return P()
            if spec != P() and leaf.ndim < len(spec):
                return P()
            return spec
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def _divisible(leaf, spec: P, mesh: Mesh) -> bool:
    """True iff every sharded dim of ``leaf`` divides by its axis size."""
    for dim, axis in enumerate(spec):
        if axis is None:
            continue
        size = mesh.shape[axis] if isinstance(axis, str) else int(
            np.prod([mesh.shape[a] for a in axis])
        )
        if leaf.shape[dim] % size != 0:
            return False
    return True


def shard_variables(mesh: Mesh, variables: Any) -> Any:
    """device_put a variables pytree with the tp sharding rules applied.

    Dims that do not divide by their mesh axis (e.g. an unpadded
    tokenizer vocab against tp=4) fall back to replication for that leaf —
    the production alternative is padding the table, but a crash helps
    nobody for the odd leaf out. Every fallback is reported once (a
    silently-replicated tp layout loses the memory benefit and can OOM
    where the user expected sharding).
    """
    specs = network_param_specs(variables)
    fallbacks: list = []

    def put_with_path(path, x, s):
        if s != P() and not _divisible(x, s, mesh):
            fallbacks.append(
                f"{jax.tree_util.keystr(path)} shape={tuple(x.shape)} spec={s}"
            )
            s = P()
        return jax.device_put(x, NamedSharding(mesh, s))

    out = jax.tree_util.tree_map_with_path(put_with_path, variables, specs)
    if fallbacks:
        import logging

        logging.getLogger("msr3d_tpu.sharding").warning(
            "shard_variables: %d leaves fell back to full replication "
            "(dim not divisible by mesh axis): %s",
            len(fallbacks),
            "; ".join(fallbacks[:8]) + ("; ..." if len(fallbacks) > 8 else ""),
        )
    return out


def state_shardings(mesh: Mesh, state: Any) -> Any:
    """NamedSharding tree for a TrainState (params + opt_state + step).

    Optimizer moments follow their parameters; scalars replicate.
    """
    def to_sharding(specs):
        return jax.tree_util.tree_map(
            lambda s: NamedSharding(mesh, s), specs,
            is_leaf=lambda x: isinstance(x, P),
        )

    param_specs = network_param_specs(state.params)

    def opt_spec(path_tuple, leaf):
        path = jax.tree_util.keystr(path_tuple)
        if getattr(leaf, "ndim", 0) >= 2 and "'llm'" in path:
            return llama_param_spec(path)
        return P()

    opt_specs = jax.tree_util.tree_map_with_path(opt_spec, state.opt_state)
    return type(state)(
        params=to_sharding(param_specs),
        opt_state=to_sharding(opt_specs),
        step=NamedSharding(mesh, P()),
    )
