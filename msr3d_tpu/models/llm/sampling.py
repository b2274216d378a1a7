"""Autoregressive decoding on TPU: greedy + beam search with KV cache.

Decode parity targets (model/msr3d/msr3d.py:445-524): HF ``generate`` with
num_beams=5, max_length=256, min_length=1, repetition_penalty=3.0,
length_penalty=1. The decode loop is a ``lax.while_loop`` over a
donated, statically-shaped KV cache — no host round-trips per token.

HF semantics replicated:
  - repetition penalty (CTRL): score>0 → score/p, score<0 → score·p,
    applied over the *generated* ids (generation starts from
    inputs_embeds, so there are no prompt ids to penalize)
  - min_length: EOS logit masked to -inf below min length
  - beam search with length_penalty=1 and early-stopped beams held
    frozen via per-beam finished flags
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp
from jax import lax


def apply_repetition_penalty(
    logits: jax.Array, seen: jax.Array, penalty: float
) -> jax.Array:
    """CTRL repetition penalty.

    logits (B, V); ``seen`` (B, V) bool marks tokens generated so far —
    maintained incrementally by the decode loop (an O(B) scatter per step;
    the one-hot-over-history alternative reads B·G·V floats every step).
    """
    if penalty == 1.0:
        return logits
    penalized = jnp.where(logits > 0, logits / penalty, logits * penalty)
    return jnp.where(seen, penalized, logits)


def _mask_min_length(
    logits: jax.Array, step: jax.Array, min_length: int, eos_id: int
) -> jax.Array:
    if min_length <= 1:
        return logits
    return jnp.where(
        (step < min_length - 1)
        & (jnp.arange(logits.shape[-1]) == eos_id)[None, :],
        -jnp.inf,
        logits,
    )


def greedy_decode(
    decode_step: Callable,
    kv_caches: Dict[str, jax.Array],
    cache_mask: jax.Array,  # (B, S)
    next_positions: jax.Array,  # (B,)
    first_token_logits: jax.Array,  # (B, V) logits at the last prompt position
    *,
    max_new_tokens: int,
    eos_id: int,
    pad_id: int,
    prompt_len: int,
    min_length: int = 1,
    repetition_penalty: float = 1.0,
) -> jax.Array:
    """Greedy decode loop.

    ``decode_step(token_ids (B,1), positions (B,1), kv_caches, cache_index,
    cache_mask) -> (logits (B,1,V), new_kv_caches)`` — typically a jitted
    closure over the model params.

    Returns generated ids (B, max_new_tokens), padded with ``pad_id`` after
    EOS (EOS itself is kept, mirroring HF outputs before the reference's
    0→2 remap, msr3d.py:515).
    """
    b, v = first_token_logits.shape

    def pick(logits, seen, step):
        logits = apply_repetition_penalty(logits, seen, repetition_penalty)
        logits = _mask_min_length(logits, step, min_length, eos_id)
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)  # (B,)

    def mark(seen, tok):
        return seen.at[jnp.arange(b), tok].set(True)

    generated0 = jnp.full((b, max_new_tokens), pad_id, jnp.int32)
    seen0 = jnp.zeros((b, v), bool)
    tok0 = pick(first_token_logits, seen0, jnp.int32(0))
    generated0 = generated0.at[:, 0].set(tok0)
    seen0 = mark(seen0, tok0)
    finished0 = tok0 == eos_id

    def cond(state):
        step, _, _, _, _, _, finished = state
        return (step < max_new_tokens) & ~jnp.all(finished)

    def body(state):
        step, generated, seen, caches, cmask, positions, finished = state
        tok = generated[:, step - 1]
        cache_index = prompt_len + step - 1
        cmask = cmask.at[:, cache_index].set(True)
        logits, caches = decode_step(
            tok[:, None], positions[:, None], caches, cache_index, cmask
        )
        nxt = pick(logits[:, -1, :].astype(jnp.float32), seen, step)
        nxt = jnp.where(finished, pad_id, nxt)
        generated = generated.at[:, step].set(nxt)
        seen = jnp.where(finished[:, None], seen, mark(seen, nxt))
        finished = finished | (nxt == eos_id)
        return step + 1, generated, seen, caches, cmask, positions + 1, finished

    state = (
        jnp.int32(1), generated0, seen0, kv_caches, cache_mask,
        next_positions.astype(jnp.int32), finished0,
    )
    _, generated, _, _, _, _, _ = lax.while_loop(cond, body, state)
    return generated


def beam_search_decode(
    decode_step: Callable,
    kv_caches: Dict[str, jax.Array],
    cache_mask: jax.Array,
    next_positions: jax.Array,
    first_token_logits: jax.Array,
    *,
    num_beams: int,
    max_new_tokens: int,
    eos_id: int,
    pad_id: int,
    prompt_len: int,
    min_length: int = 1,
    repetition_penalty: float = 1.0,
    length_penalty: float = 1.0,
) -> jax.Array:
    """Beam search (HF-compatible scoring) on static shapes.

    The prompt's KV cache is broadcast over beams; each step expands
    B·K beams, scores log-probs (+ repetition penalty + min-length mask),
    and keeps the top-K continuations. Finished beams are frozen with
    score/len^length_penalty ranking at the end. Returns (B, max_new_tokens).
    """
    b, v = first_token_logits.shape
    k = num_beams

    def flat(x):  # (B, K, ...) → (B·K, ...)
        return x.reshape((b * k,) + x.shape[2:])

    def unflat(x):  # (B·K, ...) → (B, K, ...)
        return x.reshape((b, k) + x.shape[1:])

    # expand caches/masks/positions over beams
    def expand(x, beam_axis):
        reps = [1] * (x.ndim + 1)
        x = jnp.expand_dims(x, beam_axis)
        reps[beam_axis] = k
        return jnp.tile(x, reps)

    caches = {
        "k": _expand_cache(kv_caches["k"], k),
        "v": _expand_cache(kv_caches["v"], k),
    }
    cmask = flat(expand(cache_mask, 1))  # (B·K, S)
    positions = flat(expand(next_positions, 1))  # (B·K,)

    def score_logits(logits, seen, step):
        logits = apply_repetition_penalty(logits, seen, repetition_penalty)
        logits = _mask_min_length(logits, step, min_length, eos_id)
        return jax.nn.log_softmax(logits, axis=-1)

    # --- step 0: pick top-K first tokens per batch from the shared prompt ---
    # (no generated tokens yet → no repetition penalty, only min-length mask)
    generated0 = jnp.full((b * k, max_new_tokens), pad_id, jnp.int32)
    logp0 = jax.nn.log_softmax(
        _mask_min_length(first_token_logits, jnp.int32(0), min_length, eos_id),
        axis=-1,
    )  # (B, V)
    top_logp, top_tok = lax.top_k(logp0, k)  # (B, K)
    generated = generated0.at[:, 0].set(flat(top_tok))
    seen = jnp.zeros((b * k, v), bool).at[jnp.arange(b * k), flat(top_tok)].set(True)
    gen_len = jnp.ones((b * k,), jnp.float32)
    beam_scores = flat(top_logp)  # (B·K,)
    finished = flat(top_tok) == eos_id

    neg_inf = jnp.float32(-1e9)

    def cond(state):
        step, _, _, _, _, _, _, _, finished = state
        return (step < max_new_tokens) & ~jnp.all(finished)

    def body(state):
        (step, generated, seen, gen_len, caches, cmask, positions, beam_scores,
         finished) = state
        tok = generated[:, step - 1]
        cache_index = prompt_len + step - 1
        cmask = cmask.at[:, cache_index].set(True)
        logits, caches = decode_step(
            tok[:, None], positions[:, None], caches, cache_index, cmask
        )
        logp = score_logits(
            logits[:, -1, :].astype(jnp.float32), seen, step
        )  # (B·K, V)

        # finished beams: only "pad continuation" allowed at score 0
        cont = jnp.where(
            finished[:, None],
            jnp.where(jnp.arange(v)[None, :] == pad_id, 0.0, neg_inf),
            logp,
        )
        total = beam_scores[:, None] + cont  # (B·K, V)
        total = unflat(total).reshape(b, k * v)
        top_scores, top_idx = lax.top_k(total, k)  # (B, K)
        src_beam = top_idx // v  # (B, K) which beam it came from
        new_tok = (top_idx % v).astype(jnp.int32)

        # reindex state by source beam
        gather = (jnp.arange(b)[:, None] * k + src_beam).reshape(-1)  # (B·K,)
        generated = generated[gather]
        seen = seen[gather]
        gen_len = gen_len[gather]
        caches = {
            "k": caches["k"][:, gather],
            "v": caches["v"][:, gather],
        }
        cmask = cmask[gather]
        positions = positions[gather]
        finished = finished[gather]

        new_tok_flat = flat(new_tok)
        emit = jnp.where(finished, pad_id, new_tok_flat)
        generated = generated.at[:, step].set(emit)
        seen = jnp.where(
            finished[:, None],
            seen,
            seen.at[jnp.arange(b * k), emit].set(True),
        )
        gen_len = gen_len + (~finished).astype(jnp.float32)
        beam_scores = flat(top_scores)
        # finished beams keep their frozen score (pad continuation adds 0)
        finished = finished | (emit == eos_id)
        return (
            step + 1, generated, seen, gen_len, caches, cmask, positions + 1,
            beam_scores, finished,
        )

    state = (
        jnp.int32(1), generated, seen, gen_len, caches, cmask, positions,
        beam_scores, finished,
    )
    (_, generated, seen, gen_len, _, _, _, beam_scores, finished) = lax.while_loop(
        cond, body, state
    )

    # final ranking: score / len^length_penalty (HF GenerationMixin)
    lengths = unflat(gen_len)  # (B, K)
    norm_scores = unflat(beam_scores) / jnp.power(
        jnp.maximum(lengths, 1.0), length_penalty
    )
    best = jnp.argmax(norm_scores, axis=-1)  # (B,)
    out = unflat(generated)[jnp.arange(b), best]
    return out


def _expand_cache(cache: jax.Array, k: int) -> jax.Array:
    """(L, B, S, h, d) → (L, B·K, S, h, d) by repeating each batch row K times."""
    l, b, s, h, d = cache.shape
    return jnp.repeat(cache, k, axis=1)
