"""Flash-decode attention kernel (ops/pallas/flash_decode.py): interpreter
parity vs the XLA oracle, and end-to-end greedy-token equality through the
LLM decode loop with the flag on vs off."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from msr3d_tpu.ops.pallas.flash_decode import (
    flash_decode_attention,
    flash_decode_attention_xla,
)


def _quant(arr):
    amax = np.max(np.abs(arr), axis=-1)
    scale = np.maximum(amax, 1e-6) / 127.0
    q = np.clip(np.round(arr / scale[..., None]), -127, 127).astype(np.int8)
    return q, scale.astype(np.float32)


@pytest.fixture
def attn_inputs(rng):
    # head-major layout: K/V (B, H, S, D), scales (B, H, S)
    b, h, d, s_p, s_g = 2, 4, 128, 64, 32
    q = rng.normal(size=(b, h, d)).astype(np.float32)
    kp, ks = _quant(rng.normal(size=(b, h, s_p, d)).astype(np.float32))
    vp, vs = _quant(rng.normal(size=(b, h, s_p, d)).astype(np.float32))
    kg, kgs = _quant(rng.normal(size=(b, h, s_g, d)).astype(np.float32))
    vg, vgs = _quant(rng.normal(size=(b, h, s_g, d)).astype(np.float32))
    bias = np.zeros((b, s_p + s_g), np.float32)
    bias[:, -20:] = -1e30  # mask unwritten generated slots
    bias[0, :5] = -1e30  # left-padded prompt
    to_bf16 = lambda x: jnp.asarray(x, jnp.bfloat16)
    return (
        to_bf16(q),
        jnp.asarray(kp), jnp.asarray(vp), to_bf16(ks), to_bf16(vs),
        jnp.asarray(kg), jnp.asarray(vg), to_bf16(kgs), to_bf16(vgs),
        jnp.asarray(bias),
    )


def test_kernel_matches_xla_oracle(attn_inputs):
    got = flash_decode_attention(*attn_inputs, interpret=True)
    want = flash_decode_attention_xla(*attn_inputs)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=2e-2, atol=2e-2,  # bf16 accumulation-order differences
    )
    # masked positions carried no weight: perturbing them changes nothing
    q, kp, vp, ks, vs, kg, vg, kgs, vgs, bias = attn_inputs
    kg2 = kg.at[:, :, -5:].set(77)
    got2 = flash_decode_attention(q, kp, vp, ks, vs, kg2, vg, kgs, vgs, bias,
                                  interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(got2))


def test_llm_greedy_tokens_match_flag_off(rng):
    """Full decode loop: flash on vs off must produce identical tokens."""
    import dataclasses

    from msr3d_tpu.models.llm.llama import LlamaConfig, LlamaModel
    from msr3d_tpu.models.llm.sampling import greedy_decode_shared

    base = LlamaConfig(
        vocab_size=211, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=1,
        max_position_embeddings=128, lora_rank=0, dtype=jnp.bfloat16,
        kv_quantize=True,
    )

    ids = jnp.asarray(rng.integers(5, 200, size=(2, 9)), jnp.int32)
    attn = jnp.ones((2, 9), jnp.int32)

    def run(cfg):
        from msr3d_tpu.models.llm.llama import _make_cache

        model = LlamaModel(cfg)
        v_body = model.init(
            jax.random.PRNGKey(0), jnp.zeros((2, 9, 128), jnp.bfloat16), attn,
            16, method=LlamaModel.prefill_with_cache,
        )
        v_embed = model.init(
            jax.random.PRNGKey(1), ids, method=LlamaModel.embed_tokens
        )
        variables = {"params": {**v_embed["params"], **v_body["params"]}}
        e = model.apply(variables, ids, method=LlamaModel.embed_tokens)
        logits, _, prompt_kv, _, next_pos = model.apply(
            variables, e, attn, 9, method=LlamaModel.prefill_with_cache
        )
        # (with flash_decode, prefill captures the prompt cache head-major)
        gen_kv = _make_cache(cfg, 2, 8)

        def decode_shared(token_ids, positions, gkv, gidx, gmask):
            te = model.apply(variables, token_ids, method=LlamaModel.embed_tokens)
            return model.apply(
                variables, te, positions, prompt_kv, attn, gkv,
                gidx, gmask, method=LlamaModel.decode_step_shared,
            )

        tokens = greedy_decode_shared(
            decode_shared, next_pos, logits[:, -1], gen_kv,
            max_new_tokens=8, eos_id=2, pad_id=2,
        )
        return np.asarray(tokens)

    t_off = run(base)
    t_on = run(dataclasses.replace(base, flash_decode=True))
    np.testing.assert_array_equal(t_off, t_on)
