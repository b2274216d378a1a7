"""JAX Llama parity vs HuggingFace transformers (tiny random model, CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from msr3d_tpu.models.llm.convert import (
    config_from_hf,
    init_lora_params,
    params_from_hf_state_dict,
)
from msr3d_tpu.models.llm.llama import LlamaConfig, LlamaModel
from msr3d_tpu.models.llm.sampling import beam_search_decode, greedy_decode

TINY_HF = dict(
    vocab_size=128,
    hidden_size=64,
    intermediate_size=128,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_key_value_heads=4,
    max_position_embeddings=128,
    rms_norm_eps=1e-6,
    tie_word_embeddings=False,
)


@pytest.fixture(scope="module")
def hf_model():
    import torch
    from transformers import LlamaConfig as HFConfig, LlamaForCausalLM

    torch.manual_seed(0)
    model = LlamaForCausalLM(HFConfig(**TINY_HF)).eval()
    return model


@pytest.fixture(scope="module")
def jax_setup(hf_model):
    cfg = config_from_hf(TINY_HF, dtype=jnp.float32)
    params = params_from_hf_state_dict(hf_model.state_dict(), cfg)
    model = LlamaModel(cfg)
    return cfg, model, {"params": jax.tree_util.tree_map(jnp.asarray, params)}


def make_inputs(rng, hf_model, b=2, t=10, left_pad=3):
    import torch

    ids = rng.integers(5, 120, size=(b, t)).astype(np.int32)
    mask = np.ones((b, t), np.int32)
    mask[0, :left_pad] = 0  # row 0 left-padded
    with torch.no_grad():
        embeds = hf_model.get_input_embeddings()(torch.from_numpy(ids).long()).numpy()
    return ids, mask, embeds


class TestForwardParity:
    def test_logits_match_hf(self, rng, hf_model, jax_setup):
        import torch

        cfg, model, variables = jax_setup
        ids, mask, embeds = make_inputs(rng, hf_model)

        with torch.no_grad():
            want = hf_model(
                inputs_embeds=torch.from_numpy(embeds),
                attention_mask=torch.from_numpy(mask),
            ).logits.numpy()

        logits, _, _ = model.apply(
            variables, jnp.asarray(embeds), jnp.asarray(mask)
        )
        got = np.asarray(logits)
        # compare only non-pad positions (HF emits garbage on pads too, but
        # padded rows' positions differ in HF internals)
        valid = mask.astype(bool)
        np.testing.assert_allclose(got[valid], want[valid], atol=2e-4)

    def test_embed_tokens_matches_hf(self, rng, hf_model, jax_setup):
        cfg, model, variables = jax_setup
        ids = rng.integers(0, 128, size=(2, 5)).astype(np.int32)
        got = model.apply(variables, jnp.asarray(ids), method=model.embed_tokens)
        import torch

        with torch.no_grad():
            want = hf_model.get_input_embeddings()(torch.from_numpy(ids).long()).numpy()
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)

    def test_prefill_cache_consistency(self, rng, hf_model, jax_setup):
        """Prefill-with-cache must produce the same logits as plain forward."""
        cfg, model, variables = jax_setup
        ids, mask, embeds = make_inputs(rng, hf_model)

        plain_logits, _, _ = model.apply(
            variables, jnp.asarray(embeds), jnp.asarray(mask)
        )
        cached_logits, _, caches, cache_mask, next_pos = model.apply(
            variables, jnp.asarray(embeds), jnp.asarray(mask), 32,
            method=model.prefill_with_cache,
        )
        # left-pad query rows are fully masked → garbage in both paths
        # (uniform softmax over different denominators); only valid
        # positions are ever read downstream
        valid = mask.astype(bool)
        np.testing.assert_allclose(
            np.asarray(cached_logits)[valid], np.asarray(plain_logits)[valid],
            atol=1e-5,
        )
        assert caches["k"].shape == (2, 2, 32, 4, 16)  # (L, B, S, h, d)
        np.testing.assert_array_equal(
            np.asarray(cache_mask[:, :10]), mask.astype(bool)
        )

    def test_decode_step_matches_full_forward(self, rng, hf_model, jax_setup):
        """One cached decode step == recomputing the full sequence."""
        cfg, model, variables = jax_setup
        ids, mask, embeds = make_inputs(rng, hf_model, left_pad=0)
        b, t = ids.shape

        _, _, caches, cache_mask, next_pos = model.apply(
            variables, jnp.asarray(embeds), jnp.asarray(mask), 32,
            method=model.prefill_with_cache,
        )
        new_ids = rng.integers(5, 120, size=(b, 1)).astype(np.int32)
        new_embeds = model.apply(
            variables, jnp.asarray(new_ids), method=model.embed_tokens
        )
        cache_mask = cache_mask.at[:, t].set(True)
        step_logits, _, _ = model.apply(
            variables, new_embeds, jnp.ones((b, 1), jnp.int32),
            positions=next_pos[:, None], kv_caches=caches, cache_index=t,
            cache_mask=cache_mask,
        )

        full_embeds = np.concatenate([embeds, np.asarray(new_embeds)], axis=1)
        full_mask = np.concatenate([mask, np.ones((b, 1), np.int32)], axis=1)
        full_logits, _, _ = model.apply(
            variables, jnp.asarray(full_embeds), jnp.asarray(full_mask)
        )
        np.testing.assert_allclose(
            np.asarray(step_logits[:, 0]), np.asarray(full_logits[:, -1]), atol=1e-4
        )


def _decode_fixture(model, variables):
    def decode_step(token_ids, positions, caches, cache_index, cache_mask):
        embeds = model.apply(variables, token_ids, method=model.embed_tokens)
        logits, _, new_caches = model.apply(
            variables, embeds, jnp.ones_like(token_ids),
            positions=positions, kv_caches=caches, cache_index=cache_index,
            cache_mask=cache_mask,
        )
        return logits, new_caches

    return decode_step


class TestGeneration:
    MAXLEN = 48

    def _hf_generate(self, hf_model, embeds, mask, **kw):
        import torch

        with torch.no_grad():
            out = hf_model.generate(
                inputs_embeds=torch.from_numpy(embeds),
                attention_mask=torch.from_numpy(mask),
                max_new_tokens=12,
                pad_token_id=0,
                eos_token_id=2,
                **kw,
            )
        return out.numpy()

    def _ours_prefill(self, model, variables, embeds, mask):
        logits, _, caches, cache_mask, next_pos = model.apply(
            variables, jnp.asarray(embeds), jnp.asarray(mask), self.MAXLEN,
            method=model.prefill_with_cache,
        )
        first = np.asarray(logits)[np.arange(embeds.shape[0]), -1]
        return jnp.asarray(first), caches, cache_mask, next_pos

    def test_greedy_matches_hf(self, rng, hf_model, jax_setup):
        cfg, model, variables = jax_setup
        ids, mask, embeds = make_inputs(rng, hf_model, b=2, t=8, left_pad=2)
        want = self._hf_generate(hf_model, embeds, mask, do_sample=False, num_beams=1)

        first, caches, cache_mask, next_pos = self._ours_prefill(
            model, variables, embeds, mask
        )
        got = greedy_decode(
            _decode_fixture(model, variables), caches, cache_mask, next_pos,
            first, max_new_tokens=12, eos_id=2, pad_id=0, prompt_len=8,
        )
        got = np.asarray(got)
        for b in range(2):
            w = want[b]
            g = got[b]
            # compare up to and including first EOS
            for i in range(min(len(w), len(g))):
                assert g[i] == w[i], (b, i, g, w)
                if w[i] == 2:
                    break

    def test_greedy_with_repetition_penalty_matches_hf(self, rng, hf_model, jax_setup):
        cfg, model, variables = jax_setup
        ids, mask, embeds = make_inputs(rng, hf_model, b=2, t=8, left_pad=0)
        want = self._hf_generate(
            hf_model, embeds, mask, do_sample=False, num_beams=1,
            repetition_penalty=2.0,
        )
        first, caches, cache_mask, next_pos = self._ours_prefill(
            model, variables, embeds, mask
        )
        got = np.asarray(
            greedy_decode(
                _decode_fixture(model, variables), caches, cache_mask, next_pos,
                first, max_new_tokens=12, eos_id=2, pad_id=0, prompt_len=8,
                repetition_penalty=2.0,
            )
        )
        for b in range(2):
            w = want[b]
            g = got[b]
            for i in range(min(len(w), len(g))):
                assert g[i] == w[i], (b, i, g, w)
                if w[i] == 2:
                    break

    def test_beam_matches_hf(self, rng, hf_model, jax_setup):
        cfg, model, variables = jax_setup
        ids, mask, embeds = make_inputs(rng, hf_model, b=2, t=8, left_pad=0)
        want = self._hf_generate(
            hf_model, embeds, mask, do_sample=False, num_beams=3,
            repetition_penalty=2.0, length_penalty=1.0,
        )
        first, caches, cache_mask, next_pos = self._ours_prefill(
            model, variables, embeds, mask
        )
        got = np.asarray(
            beam_search_decode(
                _decode_fixture(model, variables), caches, cache_mask, next_pos,
                first, num_beams=3, max_new_tokens=12, eos_id=2, pad_id=0,
                prompt_len=8, repetition_penalty=2.0, length_penalty=1.0,
            )
        )
        for b in range(2):
            w = want[b]
            g = got[b]
            for i in range(min(len(w), len(g))):
                assert g[i] == w[i], (b, i, g.tolist(), w.tolist())
                if w[i] == 2:
                    break


    def test_beam_shared_prompt_cache_matches_monolithic(
        self, rng, hf_model, jax_setup
    ):
        """The split-cache beam path (shared prompt KV, per-beam generated
        KV) must be token-exact vs the monolithic-cache beam search — and
        transitively vs HF."""
        from msr3d_tpu.models.llm.sampling import beam_search_decode_shared

        cfg, model, variables = jax_setup
        ids, mask, embeds = make_inputs(rng, hf_model, b=2, t=8, left_pad=2)
        first, caches, cache_mask, next_pos = self._ours_prefill(
            model, variables, embeds, mask
        )
        want = np.asarray(
            beam_search_decode(
                _decode_fixture(model, variables), caches, cache_mask, next_pos,
                first, num_beams=3, max_new_tokens=12, eos_id=2, pad_id=0,
                prompt_len=8, repetition_penalty=2.0, length_penalty=1.0,
            )
        )

        # split cache: prefill only the prompt segment
        logits, _, prompt_kv, prompt_mask, next_pos2 = model.apply(
            variables, jnp.asarray(embeds), jnp.asarray(mask), embeds.shape[1],
            method=model.prefill_with_cache,
        )
        first2 = jnp.asarray(
            np.asarray(logits)[np.arange(embeds.shape[0]), -1]
        )
        beams, max_new = 3, 12
        bk = embeds.shape[0] * beams
        gen_kv = {
            "k": jnp.zeros((cfg.num_hidden_layers, bk, max_new, cfg.kv_heads,
                            cfg.head_dim), cfg.dtype),
            "v": jnp.zeros((cfg.num_hidden_layers, bk, max_new, cfg.kv_heads,
                            cfg.head_dim), cfg.dtype),
        }

        def decode_shared(tok, pos, gkv, gidx, gmask):
            emb = model.apply(variables, tok, method=model.embed_tokens)
            return model.apply(
                variables, emb, pos, prompt_kv, prompt_mask, gkv, gidx, gmask,
                method=model.decode_step_shared,
            )

        got = np.asarray(
            beam_search_decode_shared(
                decode_shared, next_pos2, first2, gen_kv,
                num_beams=beams, max_new_tokens=max_new, eos_id=2, pad_id=0,
                repetition_penalty=2.0, length_penalty=1.0,
            )
        )
        np.testing.assert_array_equal(got, want)


class TestLoRA:
    def test_lora_zero_delta_at_init(self, rng, hf_model):
        cfg = config_from_hf(TINY_HF, dtype=jnp.float32, lora_rank=4)
        params = params_from_hf_state_dict(hf_model.state_dict(), cfg)
        params = init_lora_params(params, cfg)
        model = LlamaModel(cfg)
        variables = {"params": jax.tree_util.tree_map(jnp.asarray, params)}

        base_cfg = config_from_hf(TINY_HF, dtype=jnp.float32)
        base_params = params_from_hf_state_dict(hf_model.state_dict(), base_cfg)
        base_model = LlamaModel(base_cfg)
        base_vars = {"params": jax.tree_util.tree_map(jnp.asarray, base_params)}

        ids = rng.integers(0, 128, size=(1, 6)).astype(np.int32)
        embeds = model.apply(variables, jnp.asarray(ids), method=model.embed_tokens)
        mask = jnp.ones((1, 6), jnp.int32)
        lora_logits, _, _ = model.apply(variables, embeds, mask)
        base_logits, _, _ = base_model.apply(base_vars, embeds, mask)
        np.testing.assert_allclose(
            np.asarray(lora_logits), np.asarray(base_logits), atol=1e-6
        )

    def test_only_lora_params_receive_grads(self, rng, hf_model):
        cfg = config_from_hf(TINY_HF, dtype=jnp.float32, lora_rank=4)
        params = params_from_hf_state_dict(hf_model.state_dict(), cfg)
        params = init_lora_params(params, cfg)
        model = LlamaModel(cfg)
        params = jax.tree_util.tree_map(jnp.asarray, params)
        # B=0 at init makes ∂L/∂A exactly 0 (true in PEFT too); perturb B so
        # both halves see gradient
        params = jax.tree_util.tree_map_with_path(
            lambda path, leaf: leaf + 0.01
            if "lora_b" in jax.tree_util.keystr(path)
            else leaf,
            params,
        )

        ids = jnp.asarray(rng.integers(0, 128, size=(1, 6)).astype(np.int32))
        mask = jnp.ones((1, 6), jnp.int32)

        def loss(p):
            embeds = model.apply({"params": p}, ids, method=model.embed_tokens)
            logits, _, _ = model.apply({"params": p}, embeds, mask)
            return jnp.sum(logits.astype(jnp.float32) ** 2)

        grads = jax.grad(loss)(params)
        flat = jax.tree_util.tree_flatten_with_path(grads)[0]
        for path, leaf in flat:
            name = jax.tree_util.keystr(path)
            total = float(jnp.abs(leaf).sum())
            if "lora" in name:
                assert total > 0, f"LoRA grad unexpectedly zero: {name}"
            else:
                assert total == 0, f"frozen param got grad: {name}"


class TestQuantized:
    def test_int8_logits_close_to_fp(self, rng, hf_model):
        """Weight-only int8 quantization must stay close to the fp model
        (random tiny weights; tolerance loose but meaningful)."""
        from msr3d_tpu.models.llm.convert import quantize_llm_params

        cfg_fp = config_from_hf(TINY_HF, dtype=jnp.float32)
        params_fp = params_from_hf_state_dict(hf_model.state_dict(), cfg_fp)
        model_fp = LlamaModel(cfg_fp)

        cfg_q = config_from_hf(TINY_HF, dtype=jnp.float32, quantize=True)
        params_q = quantize_llm_params(params_fp, cfg_q)
        model_q = LlamaModel(cfg_q)

        ids = rng.integers(5, 120, size=(2, 8)).astype(np.int32)
        mask = np.ones((2, 8), np.int32)
        vars_fp = {"params": jax.tree_util.tree_map(jnp.asarray, params_fp)}
        vars_q = {"params": jax.tree_util.tree_map(jnp.asarray, params_q)}
        embeds = model_fp.apply(vars_fp, jnp.asarray(ids), method=model_fp.embed_tokens)

        logits_fp, _, _ = model_fp.apply(vars_fp, embeds, jnp.asarray(mask))
        logits_q, _, _ = model_q.apply(vars_q, embeds, jnp.asarray(mask))
        lf, lq = np.asarray(logits_fp), np.asarray(logits_q)
        # top-1 agreement on most positions + bounded logit drift
        top_match = (lf.argmax(-1) == lq.argmax(-1)).mean()
        assert top_match > 0.8, top_match
        assert np.abs(lf - lq).mean() < 0.15 * np.abs(lf).mean()


class TestActQuant:
    def test_s8s8_logits_close_to_weight_only(self, rng, hf_model):
        """s8xs8 activation quantization perturbs logits only mildly vs
        weight-only int8 (same quantized weights, per-token absmax acts)."""
        import dataclasses

        from msr3d_tpu.models.llm.llama import LlamaConfig, LlamaModel

        cfg_wo = LlamaConfig.tiny(vocab_size=128, dtype=jnp.float32,
                                  quantize=True)
        cfg_aq = dataclasses.replace(cfg_wo, act_quantize=True)
        b, t = 2, 6
        embeds = rng.normal(size=(b, t, cfg_wo.hidden_size)).astype(np.float32)
        mask = np.ones((b, t), np.int32)

        model_wo = LlamaModel(cfg_wo)
        v = jax.jit(lambda: model_wo.init(
            jax.random.key(0), jnp.asarray(embeds), jnp.asarray(mask)
        ))()
        # fill quantized kernels with real values (init is zeros)
        import flax

        params = flax.core.unfreeze(v["params"]) if hasattr(v, "unfreeze") else dict(v["params"])

        def fill(tree, key):
            for k, sub in tree.items():
                if isinstance(sub, dict):
                    fill(sub, key)
                elif k == "kernel_q":
                    tree[k] = jnp.asarray(
                        np.random.default_rng(7).integers(
                            -80, 80, size=sub.shape
                        ), jnp.int8,
                    )
                elif k == "kernel_scale":
                    tree[k] = jnp.full(sub.shape, 0.02, jnp.bfloat16)

        fill(params, None)
        v = {"params": params}

        model_aq = LlamaModel(cfg_aq)
        lo_wo, _, _ = jax.jit(lambda vv: model_wo.apply(
            vv, jnp.asarray(embeds), jnp.asarray(mask)))(v)
        lo_aq, _, _ = jax.jit(lambda vv: model_aq.apply(
            vv, jnp.asarray(embeds), jnp.asarray(mask)))(v)
        a = np.asarray(lo_wo, np.float32).reshape(-1)
        q = np.asarray(lo_aq, np.float32).reshape(-1)
        cos = float(a @ q / (np.linalg.norm(a) * np.linalg.norm(q) + 1e-9))
        assert cos > 0.99, cos


class TestKVQuant:
    def test_quantize_roundtrip_error_bound(self, rng):
        from msr3d_tpu.models.llm.llama import _quantize_kv, _split_kv

        arr = jnp.asarray(rng.normal(size=(2, 5, 4, 16)).astype(np.float32) * 3)
        q, scale = _quantize_kv(arr)
        vals, s = _split_kv({"k": q, "k_scale": scale}, "k", jnp.float32)
        deq = np.asarray(vals) * np.asarray(s)[..., None]
        amax = np.max(np.abs(np.asarray(arr)), axis=-1, keepdims=True)
        assert np.all(np.abs(deq - np.asarray(arr)) <= amax / 127.0 + 1e-5)

    def test_greedy_with_kv_quant_close_to_exact(self, rng, hf_model, jax_setup):
        """int8 KV decode stays close to the exact decode on a short
        horizon (identical first token; >=75% of 12 tokens)."""
        import dataclasses

        from msr3d_tpu.models.llm.llama import LlamaModel, quantize_kv_cache

        cfg, model, variables = jax_setup
        ids, mask, embeds = make_inputs(rng, hf_model, b=2, t=8, left_pad=0)
        logits, _, caches, cache_mask, next_pos = model.apply(
            variables, jnp.asarray(embeds), jnp.asarray(mask), 24,
            method=model.prefill_with_cache,
        )
        first = jnp.asarray(np.asarray(logits)[np.arange(2), -1])
        exact = np.asarray(greedy_decode(
            _decode_fixture(model, variables), caches, cache_mask, next_pos,
            first, max_new_tokens=12, eos_id=2, pad_id=0, prompt_len=8,
        ))
        qcaches = quantize_kv_cache(caches)
        quant = np.asarray(greedy_decode(
            _decode_fixture(model, variables), qcaches, cache_mask, next_pos,
            first, max_new_tokens=12, eos_id=2, pad_id=0, prompt_len=8,
        ))
        assert np.all(exact[:, 0] == quant[:, 0])
        assert np.mean(exact == quant) >= 0.75, (exact, quant)


class TestGreedySharedCache:
    def test_greedy_shared_prompt_matches_monolithic(self, rng, hf_model, jax_setup):
        from msr3d_tpu.models.llm.sampling import greedy_decode_shared

        cfg, model, variables = jax_setup
        ids, mask, embeds = make_inputs(rng, hf_model, b=2, t=8, left_pad=2)

        logits, _, caches, cache_mask, next_pos = model.apply(
            variables, jnp.asarray(embeds), jnp.asarray(mask), 24,
            method=model.prefill_with_cache,
        )
        first = jnp.asarray(np.asarray(logits)[np.arange(2), -1])
        want = np.asarray(greedy_decode(
            _decode_fixture(model, variables), caches, cache_mask, next_pos,
            first, max_new_tokens=12, eos_id=2, pad_id=0, prompt_len=8,
            repetition_penalty=2.0,
        ))

        logits2, _, prompt_kv, prompt_mask, next_pos2 = model.apply(
            variables, jnp.asarray(embeds), jnp.asarray(mask), 8,
            method=model.prefill_with_cache,
        )
        first2 = jnp.asarray(np.asarray(logits2)[np.arange(2), -1])
        gen_kv = {
            "k": jnp.zeros((cfg.num_hidden_layers, 2, 12, cfg.kv_heads,
                            cfg.head_dim), cfg.dtype),
            "v": jnp.zeros((cfg.num_hidden_layers, 2, 12, cfg.kv_heads,
                            cfg.head_dim), cfg.dtype),
        }

        def decode_shared(tok, pos, gkv, gidx, gmask):
            emb = model.apply(variables, tok, method=model.embed_tokens)
            return model.apply(
                variables, emb, pos, prompt_kv, prompt_mask, gkv, gidx, gmask,
                method=model.decode_step_shared,
            )

        got = np.asarray(greedy_decode_shared(
            decode_shared, next_pos2, first2, gen_kv,
            max_new_tokens=12, eos_id=2, pad_id=0, repetition_penalty=2.0,
        ))
        np.testing.assert_array_equal(got, want)


class TestInt4:
    """int4 split-nibble weight-only quantization (LoraDense bits=4)."""

    def test_pack_unpack_roundtrip(self, rng):
        from msr3d_tpu.models.llm.convert import pack_int4, unpack_int4

        q = rng.integers(-8, 8, size=(64, 24)).astype(np.int8)
        packed = pack_int4(q)
        assert packed.shape == (32, 24) and packed.dtype == np.int8
        np.testing.assert_array_equal(unpack_int4(packed), q)

    def test_device_unpack_matches_host(self, rng):
        """The sign-extending shift unpack inside LoraDense must equal the
        host-side oracle."""
        from msr3d_tpu.models.llm.convert import pack_int4

        q = rng.integers(-8, 8, size=(16, 8)).astype(np.int8)
        p = jnp.asarray(pack_int4(q))
        lo = jnp.right_shift(jnp.left_shift(p, 4), 4)
        hi = jnp.right_shift(p, 4)
        np.testing.assert_array_equal(
            np.concatenate([np.asarray(lo), np.asarray(hi)], axis=0), q
        )

    @pytest.mark.parametrize("group", [None, 32])
    def test_int4_dense_matches_oracle(self, rng, group):
        """LoraDense(bits=4) == host dequant matmul, per-channel and group
        scale layouts."""
        from msr3d_tpu.models.llm.convert import pack_int4
        from msr3d_tpu.models.llm.llama import LoraDense

        d_in, d_out, b = 64, 24, 3
        q = rng.integers(-8, 8, size=(d_in, d_out)).astype(np.int8)
        x = rng.normal(size=(b, d_in)).astype(np.float32)
        if group:
            scale = (rng.random((d_in // group, d_out)).astype(np.float32)
                     * 0.05 + 0.01)
            scale = scale.astype(np.float32)
            kernel = (q.reshape(d_in // group, group, d_out).astype(np.float32)
                      * scale[:, None, :]).reshape(d_in, d_out)
        else:
            scale = rng.random(d_out).astype(np.float32) * 0.05 + 0.01
            kernel = q.astype(np.float32) * scale
        # bf16 storage rounding of the scale, as the param layout stores it
        import ml_dtypes
        scale_bf = scale.astype(ml_dtypes.bfloat16)
        want = x @ (
            (q.reshape(d_in // group, group, d_out).astype(np.float32)
             * scale_bf.astype(np.float32)[:, None, :]).reshape(d_in, d_out)
            if group else q.astype(np.float32) * scale_bf.astype(np.float32)
        )

        dense = LoraDense(d_out, quantized=True, bits=4, quant_group=group,
                          dtype=jnp.float32)
        params = {
            "kernel_q": jnp.asarray(pack_int4(q)),
            "kernel_scale": jnp.asarray(scale_bf),
        }
        got = np.asarray(dense.apply({"params": params}, jnp.asarray(x)))
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

    @pytest.mark.parametrize("group", [None, 32])
    def test_int4_logits_close_to_fp(self, rng, hf_model, group):
        """int4 weight-only logits track the fp model (loose but meaningful;
        group scales must be at least as tight as per-channel)."""
        from msr3d_tpu.models.llm.convert import quantize_llm_params

        cfg_fp = config_from_hf(TINY_HF, dtype=jnp.float32)
        params_fp = params_from_hf_state_dict(hf_model.state_dict(), cfg_fp)
        model_fp = LlamaModel(cfg_fp)

        cfg_q = config_from_hf(
            TINY_HF, dtype=jnp.float32, quantize=True, quantize_bits=4,
            quantize_group=group,
        )
        params_q = quantize_llm_params(params_fp, cfg_q)
        # packed shape sanity: half the input dim
        l0 = params_q["layer_0"]["attn"]["q_proj"]
        assert l0["kernel_q"].shape[0] == cfg_fp.hidden_size // 2
        model_q = LlamaModel(cfg_q)

        ids = rng.integers(5, 120, size=(2, 8)).astype(np.int32)
        mask = np.ones((2, 8), np.int32)
        vars_fp = {"params": jax.tree_util.tree_map(jnp.asarray, params_fp)}
        vars_q = {"params": jax.tree_util.tree_map(jnp.asarray, params_q)}
        embeds = model_fp.apply(vars_fp, jnp.asarray(ids), method=model_fp.embed_tokens)

        logits_fp, _, _ = model_fp.apply(vars_fp, embeds, jnp.asarray(mask))
        logits_q, _, _ = model_q.apply(vars_q, embeds, jnp.asarray(mask))
        lf, lq = np.asarray(logits_fp), np.asarray(logits_q)
        top_match = (lf.argmax(-1) == lq.argmax(-1)).mean()
        drift = np.abs(lf - lq).mean() / np.abs(lf).mean()
        if group:
            assert top_match > 0.6, top_match
            assert drift < 0.35, drift
        else:
            assert top_match > 0.4, top_match
            assert drift < 0.6, drift

    def test_int4_greedy_decode_runs(self, rng, hf_model):
        """Prefill + KV-cache greedy decode runs under int4 weights and
        matches the teacher-forced argmax of the same quantized model."""
        from msr3d_tpu.models.llm.convert import quantize_llm_params

        cfg_fp = config_from_hf(TINY_HF, dtype=jnp.float32)
        params_fp = params_from_hf_state_dict(hf_model.state_dict(), cfg_fp)
        cfg_q = config_from_hf(
            TINY_HF, dtype=jnp.float32, quantize=True, quantize_bits=4,
        )
        params_q = quantize_llm_params(params_fp, cfg_q)
        model_q = LlamaModel(cfg_q)
        vars_q = {"params": jax.tree_util.tree_map(jnp.asarray, params_q)}

        ids = rng.integers(5, 120, size=(2, 6)).astype(np.int32)
        mask = np.ones((2, 6), np.int32)
        embeds = model_q.apply(vars_q, jnp.asarray(ids), method=model_q.embed_tokens)
        logits, _, caches, cache_mask, next_pos = model_q.apply(
            vars_q, jnp.asarray(embeds), jnp.asarray(mask), 16,
            method=model_q.prefill_with_cache,
        )
        first = jnp.asarray(np.asarray(logits)[np.arange(2), -1])
        toks = np.asarray(greedy_decode(
            _decode_fixture(model_q, vars_q), caches, cache_mask, next_pos,
            first, max_new_tokens=5, eos_id=2, pad_id=0, prompt_len=6,
        ))
        assert toks.shape == (2, 5)
        # step 1 must equal the prefill's last-position argmax
        np.testing.assert_array_equal(
            toks[:, 0], np.asarray(first).argmax(-1)
        )

    def test_config_validation(self):
        with pytest.raises(ValueError):
            LlamaConfig.tiny(quantize=True, quantize_bits=3)
        with pytest.raises(ValueError):
            LlamaConfig.tiny(quantize=True, quantize_group=32)  # bits=8
        with pytest.raises(ValueError):
            LlamaConfig.tiny(quantize=True, quantize_bits=4,
                             quantize_group=32, act_quantize=True)

    def test_int4_qlora_grads_flow_to_lora_only(self, rng, hf_model):
        """QLoRA-4bit: training through the int4 frozen base — LoRA params
        get nonzero grads, quantized base params get zero grads."""
        from msr3d_tpu.models.llm.convert import (
            init_lora_params, quantize_llm_params,
        )

        cfg_fp = config_from_hf(TINY_HF, dtype=jnp.float32)
        params_fp = params_from_hf_state_dict(hf_model.state_dict(), cfg_fp)
        cfg_q = config_from_hf(
            TINY_HF, dtype=jnp.float32, quantize=True, quantize_bits=4,
            lora_rank=4,
        )
        params_q = quantize_llm_params(params_fp, cfg_q)
        params_q = init_lora_params(params_q, cfg_q, seed=0)
        model = LlamaModel(cfg_q)
        params_q = jax.tree_util.tree_map(jnp.asarray, params_q)

        embeds = jnp.asarray(
            rng.normal(size=(2, 6, cfg_q.hidden_size)).astype(np.float32)
        )
        mask = jnp.ones((2, 6), jnp.int32)

        # grad only over the trainable (LoRA) leaves — the int8-packed base
        # is not differentiable (the trainer partitions the same way)
        from flax.traverse_util import flatten_dict, unflatten_dict

        flat = flatten_dict(params_q)
        lora = {k: v for k, v in flat.items() if k[-1].startswith("lora")}
        rest = {k: v for k, v in flat.items() if not k[-1].startswith("lora")}

        def loss(lora_leaves):
            p = unflatten_dict({**rest, **lora_leaves})
            logits, _, _ = model.apply({"params": p}, embeds, mask)
            return jnp.mean(logits.astype(jnp.float32) ** 2)

        val, grads = jax.value_and_grad(loss)(lora)
        assert np.isfinite(float(val)) and float(val) > 0
        # B starts at zero → dL/dA = 0 but dL/dB ≠ 0 (PEFT init)
        b_total = sum(
            float(jnp.abs(g).sum()) for k, g in grads.items()
            if k[-1] == "lora_b"
        )
        assert b_total > 0


class TestDeviceQuantize:
    def test_device_quantizer_matches_host(self, rng, hf_model):
        """quantize_llm_params_on_device is the device twin of the host
        numpy path (same fp32 absmax/round/clip math) — added round 5
        because pulling the 13.5 GB bf16 tree to host cost 3380 s over
        the axon tunnel. Must produce identical int8 kernels + scales
        and must CONSUME the source kernels (destructive free)."""
        from msr3d_tpu.models.llm.convert import (
            quantize_llm_params,
            quantize_llm_params_on_device,
        )

        cfg_q = config_from_hf(TINY_HF, dtype=jnp.float32, quantize=True)
        params_fp = params_from_hf_state_dict(hf_model.state_dict(), cfg_q)
        host_q = quantize_llm_params(
            jax.tree_util.tree_map(np.asarray, params_fp), cfg_q)

        src = jax.tree_util.tree_map(jnp.asarray, params_fp)
        dev_q = quantize_llm_params_on_device(src, cfg_q)

        flat_h = dict(jax.tree_util.tree_flatten_with_path(host_q)[0])
        flat_d = dict(jax.tree_util.tree_flatten_with_path(dev_q)[0])
        assert flat_h.keys() == flat_d.keys()
        for k, vh in flat_h.items():
            vd = np.asarray(flat_d[k])
            name = jax.tree_util.keystr(k)
            if "kernel_q" in name:
                assert vd.dtype == np.int8
                assert np.array_equal(vd, np.asarray(vh)), name
            elif "kernel_scale" in name:
                np.testing.assert_allclose(vd, np.asarray(vh), rtol=1e-6)
        # destructive contract: the source tree's base kernels are gone
        for i in range(cfg_q.num_hidden_layers):
            for block in ("attn", "mlp"):
                for proj, p in src[f"layer_{i}"][block].items():
                    if isinstance(p, dict):
                        assert "kernel" not in p, (i, block, proj)

    def test_device_quantizer_rejects_int4(self, hf_model):
        from msr3d_tpu.models.llm.convert import quantize_llm_params_on_device

        cfg4 = config_from_hf(TINY_HF, dtype=jnp.float32, quantize=True,
                              quantize_bits=4)
        params = params_from_hf_state_dict(hf_model.state_dict(), cfg4)
        with pytest.raises(ValueError):
            quantize_llm_params_on_device(
                jax.tree_util.tree_map(jnp.asarray, params), cfg4)
