"""Pipeline-parallel (and scan-over-layers) execution of the REAL LLM.

The reference has no pipeline parallelism (SURVEY §2.8) — its 7B model
fits one GPU. This module makes the ``pp`` mesh axis a capability of the
actual ``MSR3DNetwork``/``LlamaModel``, not a toy: the L transformer
blocks are stored STACKED (one (L, ...) leaf per block parameter), split
into S = pp contiguous stages of K = L/S layers, and executed with the
GPipe ``shard_map``/``ppermute`` schedule from ``parallel/pipeline.py``.
Each stage runs its K blocks with ``lax.scan`` over the stacked leaves —
which doubles as plain scan-over-layers when pp = 1 (one compiled block
body instead of L inlined copies).

Placement: the embedding lookup, splice/scene encoder, final norm and LM
head run OUTSIDE the pipeline, replicated across the pp axis. They are
<4% of 7B params, all frozen (no optimizer state), and the lookup/one
matmul they cost per step is noise next to the L blocks — replicating
them buys exactness and a uniform (mb, T, H) ring carry. Documented in
DESIGN.md §8.

Exactness: the pipelined train step (loss AND grads) matches the
sequential ``MSR3DNetwork.__call__`` bit-for-bit up to reduction order —
verified in tests/test_pipeline.py on the virtual 8-device mesh and run
by ``__graft_entry__.dryrun_multichip`` on the full network.

Limits: teacher-forcing forward only (no KV caches — generation fits a
chip or uses tp), deterministic block execution (LoRA dropout 0, the
flagship config's setting).
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from msr3d_tpu.models.llm.llama import FrozenHead, LlamaBlock, LlamaConfig, RMSNorm
from msr3d_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS, PIPELINE_AXIS
from msr3d_tpu.parallel.pipeline import pipeline_apply

__all__ = [
    "stack_llm_blocks",
    "unstack_llm_blocks",
    "scan_blocks",
    "llm_logits_from_blocks",
    "make_pp_apply_fn",
    "pp_state_shardings",
]

_LAYER_RE = re.compile(r"^layer_(\d+)$")


def stack_llm_blocks(variables: Any, llm_key: str = "llm") -> Any:
    """Standard variables tree (llm.layer_0 … layer_{L-1}) → stacked
    layout: the per-layer subtrees become ONE ``blocks`` subtree whose
    leaves carry a leading (L,) axis. Non-block llm params (embed_tokens,
    final_norm, lm_head) and all non-llm params are untouched."""
    params = variables["params"]
    llm = dict(params[llm_key])
    layers = sorted(
        (int(m.group(1)), k)
        for k, m in ((k, _LAYER_RE.match(k)) for k in llm)
        if m
    )
    assert layers, f"no layer_i subtrees under params/{llm_key}"
    per_layer = [llm.pop(k) for _, k in layers]
    llm["blocks"] = jax.tree_util.tree_map(
        lambda *ls: jnp.stack(ls), *per_layer
    )
    new_params = dict(params)
    new_params[llm_key] = llm
    out = dict(variables)
    out["params"] = new_params
    return out


def unstack_llm_blocks(variables: Any, llm_key: str = "llm") -> Any:
    """Inverse of :func:`stack_llm_blocks` (checkpoint interop)."""
    params = variables["params"]
    llm = dict(params[llm_key])
    blocks = llm.pop("blocks")
    n_layers = jax.tree_util.tree_leaves(blocks)[0].shape[0]
    for i in range(n_layers):
        llm[f"layer_{i}"] = jax.tree_util.tree_map(lambda a, i=i: a[i], blocks)
    new_params = dict(params)
    new_params[llm_key] = llm
    out = dict(variables)
    out["params"] = new_params
    return out


# policy names resolve via llama.resolve_remat_policy ("full" | "dots" |
# "residuals")


def scan_blocks(
    cfg: LlamaConfig,
    blocks_params: Any,  # leaves (L, ...) or (K, ...)
    x: jax.Array,  # (B, T, H)
    positions: jax.Array,
    attn_bias: Optional[jax.Array],
    key_valid: Optional[jax.Array] = None,
    *,
    remat: bool = False,
    remat_policy: str = "full",
) -> jax.Array:
    """Apply a stack of LlamaBlocks via ONE scanned block body."""
    block = LlamaBlock(cfg)

    def body(h, layer_params):
        h2, _ = block.apply(
            {"params": layer_params}, h, positions, attn_bias,
            key_valid=key_valid,
        )
        return h2, None

    if remat:
        from msr3d_tpu.models.llm.llama import resolve_remat_policy

        body = jax.checkpoint(
            body, prevent_cse=False, policy=resolve_remat_policy(remat_policy)
        )
    x, _ = lax.scan(body, x, blocks_params)
    return x


def _positions_and_bias(cfg: LlamaConfig, attention_mask: jax.Array):
    """Mirror LlamaModel.__call__'s prefill masking exactly."""
    t = attention_mask.shape[1]
    positions = jnp.maximum(jnp.cumsum(attention_mask, axis=1) - 1, 0)
    if cfg.sp_axis is not None:
        return positions, None, attention_mask.astype(bool)
    causal = jnp.tril(jnp.ones((t, t), dtype=bool))
    mask = causal[None, None, :, :] & attention_mask[:, None, None, :].astype(bool)
    attn_bias = jnp.where(mask, 0.0, -1e30).astype(jnp.float32)
    return positions, attn_bias, None


def llm_logits_from_blocks(
    cfg: LlamaConfig,
    llm_params: Dict[str, Any],  # stacked layout: {embed_tokens, blocks, ...}
    inputs_embeds: jax.Array,  # (B, T, H)
    attention_mask: jax.Array,  # (B, T)
    *,
    mesh: Optional[Mesh] = None,
    microbatches: int = 1,
    data_parallel: bool = False,
    tensor_parallel: bool = False,
    remat: bool = False,
    remat_policy: str = "full",
    answer_start: Optional[int] = None,
) -> jax.Array:
    """Teacher-forcing logits through stacked blocks.

    ``mesh`` with a pp axis > 1 → GPipe pipeline over the blocks;
    otherwise a plain scan-over-layers on the local device(s).
    ``answer_start``: emit logits ONLY for positions
    ``answer_start-1 .. T-2`` (the window that predicts answer tokens) —
    pair with ``sequence_ce_loss_windowed`` for an exactly-equal loss
    with a W-wide instead of T-wide fp32 logits buffer.
    """
    blocks = llm_params["blocks"]
    n_layers = jax.tree_util.tree_leaves(blocks)[0].shape[0]
    x = inputs_embeds.astype(cfg.dtype)
    positions, attn_bias, key_valid = _positions_and_bias(cfg, attention_mask)

    n_stages = mesh.shape[PIPELINE_AXIS] if mesh is not None else 1
    if n_stages > 1:
        assert n_layers % n_stages == 0, (
            f"{n_layers} layers not divisible into pp={n_stages} stages"
        )
        assert key_valid is None, "pp × sp composition not supported yet"
        k = n_layers // n_stages
        stage_params = jax.tree_util.tree_map(
            lambda a: a.reshape((n_stages, k) + a.shape[1:]), blocks
        )
        b, t, h = x.shape
        m = microbatches
        assert b % m == 0, f"batch {b} not divisible into {m} microbatches"
        mb = b // m

        def stage_fn(params_k, xs, extra):
            pos_mb, bias_mb = extra
            return scan_blocks(
                cfg, params_k, xs, pos_mb, bias_mb, remat=remat
            )

        hidden = pipeline_apply(
            mesh,
            stage_fn,
            stage_params,
            x.reshape(m, mb, t, h),
            extras=(
                positions.reshape(m, mb, t),
                attn_bias.reshape((m, mb) + attn_bias.shape[1:]),
            ),
            data_parallel=data_parallel,
            auto_axes=(
                frozenset({MODEL_AXIS}) if tensor_parallel else frozenset()
            ),
        )
        x = hidden.reshape(b, t, h)
    else:
        x = scan_blocks(
            cfg, blocks, x, positions, attn_bias, key_valid,
            remat=remat, remat_policy=remat_policy,
        )

    if answer_start is not None:
        x = x[:, answer_start - 1 : -1]
    x = RMSNorm(cfg.rms_norm_eps, cfg.dtype).apply(
        {"params": llm_params["final_norm"]}, x
    )
    if cfg.tie_word_embeddings:
        kernel = llm_params["embed_tokens"]["embedding"].T.astype(cfg.dtype)
        return x @ lax.stop_gradient(kernel)
    return FrozenHead(cfg.vocab_size, cfg.dtype, cfg.param_dtype).apply(
        {"params": llm_params["lm_head"]}, x
    )


def make_pp_apply_fn(
    network,
    mesh: Mesh,
    *,
    microbatches: int = 1,
    data_parallel: bool = False,
    tensor_parallel: bool = False,
    remat: bool = False,
):
    """Loss function running the FULL MSR3DNetwork with its LLM blocks
    pipelined over the mesh's pp axis.

    ``apply_fn(variables, batch, rng) -> (B,) per-sequence loss`` — the
    drop-in for ``make_train_step``'s apply_fn (mean() taken by caller or
    here; we return the scalar mean like the trainer's default).
    ``variables`` must be in the STACKED layout (stack_llm_blocks).
    Scene encoder / splice / embedding / norm / head run outside the
    pipeline (replicated over pp, sharded over dp by GSPMD as usual).
    """
    from msr3d_tpu.models.msr3d import sequence_ce_loss_windowed

    cfg = network.cfg.llm

    def apply_fn(variables, batch, rng):
        llm_params = variables["params"]["llm"]
        full_embeds, full_attn, targets = network.apply(
            variables, **batch, method=network.embeds_for_loss,
            deterministic=False, rngs={"dropout": rng},
        )
        # answer-window logits: prompt targets are all -100, so the CE
        # is exactly the full-width loss with a T→W smaller fp32 buffer
        answer_start = int(batch["input_ids"].shape[-1])
        logits = llm_logits_from_blocks(
            cfg, llm_params, full_embeds, full_attn,
            mesh=mesh, microbatches=microbatches,
            data_parallel=data_parallel,
            tensor_parallel=tensor_parallel, remat=remat,
            answer_start=answer_start,
        ).astype(jnp.float32)
        return sequence_ce_loss_windowed(logits, targets, answer_start).mean()

    return apply_fn


def pp_state_shardings(
    mesh: Mesh, variables: Any, *, tensor_parallel: bool = False
) -> Any:
    """NamedSharding tree for stacked-layout variables: block leaves'
    leading (L,) axis sharded over pp (stage-contiguous), all else
    replicated.

    ``tensor_parallel=True`` composes the megatron tp rules onto the
    stacked block leaves (the tp spec shifted one dim right of the
    leading layer axis): q/k/v/gate/up out-sharded, o/down in-sharded,
    lora following the base where it matters. Non-block llm params
    (embed/norm/head, <4%% of weights, frozen) stay replicated. Leaves
    whose sharded dim does not divide the tp axis fall back to
    pp-only."""
    from msr3d_tpu.parallel.sharding import _divisible, llama_param_spec

    use_tp = tensor_parallel and mesh.shape.get(MODEL_AXIS, 1) > 1
    fallbacks: list = []

    def spec_for(path, leaf):
        pstr = jax.tree_util.keystr(path)
        if "'blocks'" not in pstr:
            return NamedSharding(mesh, P())
        if use_tp:
            base = llama_param_spec(pstr)
            if base != P():
                spec = P(PIPELINE_AXIS, *base)
                if leaf.ndim >= len(spec) and _divisible(leaf, spec, mesh):
                    return NamedSharding(mesh, spec)
                fallbacks.append(
                    f"{pstr} shape={tuple(getattr(leaf, 'shape', ()))} "
                    f"wanted={spec}"
                )
        return NamedSharding(mesh, P(PIPELINE_AXIS))

    out = jax.tree_util.tree_map_with_path(spec_for, variables)
    if fallbacks:
        import logging

        logging.getLogger("msr3d_tpu.sharding").warning(
            "pp_state_shardings: %d block leaves fell back to pp-only "
            "(tp dim not divisible) — the tp memory plan does not hold "
            "for them: %s",
            len(fallbacks),
            "; ".join(fallbacks[:8]) + ("; ..." if len(fallbacks) > 8 else ""),
        )
    return out
