"""Does XLA overlap a compute-bound prefill with a bandwidth-bound decode
inside ONE program?

Motivation: at b80 serving, a step is ~2.2 s of prefill-side (MXU-bound)
plus ~1.1 s of decode (HBM-bound), strictly sequential. If one XLA
program computing an *independent* prefill and decode interleaves them
on the two units, a chunked-prefill serving mode (decode batch A while
prefilling batch B) could approach max(prefill, decode) instead of the
sum — worth building only if the overlap is real.

Measures, at 7B geometry (int8 weights + int8 KV, b=40 per stream):
  1. prefill-only program        (208 tokens)
  2. decode-only program         (16 fori_loop'ed steps over a full cache)
  3. combined program            (both, independent inputs)
and reports (t1 + t2) / t3 — >1.15 would justify the serving mode.

Timing via the repo's tunnel-safe discipline: chain two iterations with
a data dependency, sync by value fetch.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from msr3d_tpu.models.llm.llama import LlamaConfig, LlamaModel, _make_cache

B, S, NEW = 40, 208, 16


def main():
    cfg = LlamaConfig(
        vocab_size=32000, hidden_size=4096, intermediate_size=11008,
        num_hidden_layers=32, num_attention_heads=32,
        max_position_embeddings=2048, lora_rank=0, dtype=jnp.bfloat16,
        param_dtype=jnp.bfloat16, quantize=True, kv_quantize=True,
    )
    model = LlamaModel(cfg)
    rng = np.random.default_rng(0)
    embeds = jnp.asarray(rng.normal(size=(B, S, cfg.hidden_size)) * 0.02, jnp.bfloat16)
    mask = jnp.ones((B, S), jnp.int32)

    print("init...", flush=True)
    v_body = jax.jit(
        lambda e: model.init(jax.random.PRNGKey(0), e, mask, S,
                             method=LlamaModel.prefill_with_cache)
    )(embeds)
    v_embed = jax.jit(
        lambda: model.init(jax.random.PRNGKey(1), jnp.zeros((1, 1), jnp.int32),
                           method=LlamaModel.embed_tokens)
    )()
    variables = {"params": {**v_embed["params"], **v_body["params"]}}

    # a filled prompt cache for the decode stream
    _, _, prompt_kv, _, next_pos = jax.jit(
        lambda v, e: model.apply(v, e, mask, S, method=LlamaModel.prefill_with_cache,
                                 logits_last_only=True)
    )(variables, embeds)
    gen_kv0 = _make_cache(cfg, B, NEW)
    tok0 = jnp.full((B, 1), 7, jnp.int32)

    def prefill_fn(v, e):
        logits, *_ = model.apply(
            v, e, mask, S, method=LlamaModel.prefill_with_cache,
            logits_last_only=True,
        )
        return jnp.sum(logits.astype(jnp.float32))

    def decode_fn(v, pkv, gkv, tok, pos):
        def body(i, carry):
            tok, pos, gkv, acc = carry
            emb = model.apply(v, tok, method=LlamaModel.embed_tokens)
            slot = jnp.arange(NEW)[None, :]
            gmask = (slot < i + 1).astype(jnp.int32) * jnp.ones((B, 1), jnp.int32)
            logits, new_gkv = model.apply(
                v, emb, pos, pkv, mask, gkv, i, gmask,
                method=LlamaModel.decode_step_shared,
            )
            nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)[:, None]
            return nxt, pos + 1, new_gkv, acc + jnp.sum(logits.astype(jnp.float32))

        _, _, _, acc = jax.lax.fori_loop(0, NEW, body, (tok, pos, gkv, 0.0))
        return acc

    jp = jax.jit(prefill_fn)
    jd = jax.jit(decode_fn)

    def jc(v, e, pkv, gkv, tok, pos):
        return prefill_fn(v, e) + decode_fn(v, pkv, gkv, tok, pos)

    jc = jax.jit(jc)

    def timed(fn, *args, iters=3):
        float(fn(*args))  # compile + warm
        t0 = time.perf_counter()
        for _ in range(iters):
            float(fn(*args))  # value fetch = tunnel-safe sync
        return (time.perf_counter() - t0) / iters

    pos0 = next_pos[:, None]
    t_p = timed(jp, variables, embeds)
    t_d = timed(jd, variables, prompt_kv, gen_kv0, tok0, pos0)
    t_c = timed(jc, variables, embeds, prompt_kv, gen_kv0, tok0, pos0)
    print(f"prefill-only : {t_p*1e3:8.1f} ms")
    print(f"decode-only  : {t_d*1e3:8.1f} ms  ({NEW} steps)")
    print(f"combined     : {t_c*1e3:8.1f} ms")
    print(f"sum/combined : {(t_p + t_d) / t_c:.3f}  (>1.15 → overlap is real)")


if __name__ == "__main__":
    main()
