"""n-gram (prompt-lookup) speculative decoding: token-identical to
greedy_decode by construction — acceptance only changes speed. Covered:
a deterministic Markov "model" (forces high acceptance and pins the
multi-token-per-iteration bookkeeping), the real tiny-Llama model
(cache/mask correctness incl. left padding and int8 KV), and the
T>1 per-row cache-write extension."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from msr3d_tpu.models.llm.sampling import greedy_decode, ngram_speculative_decode

from tests.test_llama import (  # noqa: F401 (fixtures)
    TINY_HF, _decode_fixture, hf_model, jax_setup, make_inputs,
)


def _markov_decode_step(v, shift=3, mult=7):
    """Deterministic cache-free fake model: next(tok) = (tok*mult+shift)%v.
    Eventually periodic → n-gram lookup predicts perfectly once the cycle
    recurs, exercising full-window acceptance."""

    def step(tokens, positions, caches, cache_index, cache_mask):
        nxt = (tokens * mult + shift) % v
        logits = jax.nn.one_hot(nxt, v) * 10.0  # (B, T, V)
        return logits, caches

    return step


class TestMarkovOracle:
    @pytest.mark.parametrize("spec_k,ngram_n", [(4, 2), (3, 3), (1, 2)])
    def test_matches_greedy_exactly(self, spec_k, ngram_n):
        v, b, p, max_new = 13, 3, 6, 24
        rng = np.random.default_rng(0)
        prompt = rng.integers(0, v, size=(b, p)).astype(np.int32)
        caches = {"k": jnp.zeros((1, b, 64, 1, 1)), "v": jnp.zeros((1, b, 64, 1, 1))}
        cmask = jnp.zeros((b, 64), bool).at[:, :p].set(True)
        next_pos = jnp.full((b,), p, jnp.int32)
        first = jax.nn.one_hot((prompt[:, -1] * 7 + 3) % v, v) * 10.0

        step = _markov_decode_step(v)
        want = np.asarray(greedy_decode(
            lambda t, po, c, ci, cm: step(t, po, c, ci, cm),
            caches, cmask, next_pos, jnp.asarray(first),
            max_new_tokens=max_new, eos_id=v + 5, pad_id=0, prompt_len=p,
        ))
        got = np.asarray(ngram_speculative_decode(
            step, caches, cmask, next_pos, jnp.asarray(first),
            jnp.asarray(prompt), max_new_tokens=max_new, eos_id=v + 5,
            pad_id=0, prompt_len=p, spec_k=spec_k, ngram_n=ngram_n,
        ))
        np.testing.assert_array_equal(got, want)

    def test_eos_and_budget(self):
        """EOS mid-window truncates; rows finish independently."""
        v, b, p, max_new = 11, 2, 5, 16
        eos = 4  # reachable state of the Markov cycle
        rng = np.random.default_rng(1)
        prompt = rng.integers(0, v, size=(b, p)).astype(np.int32)
        caches = {"k": jnp.zeros((1, b, 48, 1, 1)), "v": jnp.zeros((1, b, 48, 1, 1))}
        cmask = jnp.zeros((b, 48), bool).at[:, :p].set(True)
        next_pos = jnp.full((b,), p, jnp.int32)
        first = jax.nn.one_hot((prompt[:, -1] * 7 + 3) % v, v) * 10.0
        step = _markov_decode_step(v)
        want = np.asarray(greedy_decode(
            lambda t, po, c, ci, cm: step(t, po, c, ci, cm),
            caches, cmask, next_pos, jnp.asarray(first),
            max_new_tokens=max_new, eos_id=eos, pad_id=0, prompt_len=p,
        ))
        got = np.asarray(ngram_speculative_decode(
            step, caches, cmask, next_pos, jnp.asarray(first),
            jnp.asarray(prompt), max_new_tokens=max_new, eos_id=eos,
            pad_id=0, prompt_len=p, spec_k=4, ngram_n=2,
        ))
        np.testing.assert_array_equal(got, want)


class TestRealModel:
    def _setup(self, rng, hf_model, jax_setup, quantize_kv=False, t=8, left_pad=0):
        cfg, model, variables = jax_setup
        ids, mask, embeds = make_inputs(rng, hf_model, b=2, t=t, left_pad=left_pad)
        logits, _, caches, cache_mask, next_pos = model.apply(
            variables, jnp.asarray(embeds), jnp.asarray(mask), 48,
            method=model.prefill_with_cache,
        )
        if quantize_kv:
            from msr3d_tpu.models.llm.llama import quantize_kv_cache

            caches = quantize_kv_cache(caches)
        first = jnp.asarray(np.asarray(logits)[np.arange(2), -1])
        return model, variables, ids, caches, cache_mask, next_pos, first, t

    @pytest.mark.parametrize("left_pad", [0, 2])
    def test_matches_greedy(self, rng, hf_model, jax_setup, left_pad):
        (model, variables, ids, caches, cmask, next_pos, first, t) = self._setup(
            rng, hf_model, jax_setup, left_pad=left_pad
        )
        want = np.asarray(greedy_decode(
            _decode_fixture(model, variables), caches, cmask, next_pos,
            first, max_new_tokens=16, eos_id=2, pad_id=0, prompt_len=t,
        ))
        got = np.asarray(ngram_speculative_decode(
            _decode_fixture(model, variables), caches, cmask, next_pos,
            first, jnp.asarray(ids), max_new_tokens=16, eos_id=2, pad_id=0,
            prompt_len=t, spec_k=4, ngram_n=2,
        ))
        np.testing.assert_array_equal(got, want)

    def test_matches_greedy_int8_kv(self, rng, hf_model, jax_setup):
        (model, variables, ids, caches, cmask, next_pos, first, t) = self._setup(
            rng, hf_model, jax_setup, quantize_kv=True
        )
        want = np.asarray(greedy_decode(
            _decode_fixture(model, variables), caches, cmask, next_pos,
            first, max_new_tokens=12, eos_id=2, pad_id=0, prompt_len=t,
        ))
        got = np.asarray(ngram_speculative_decode(
            _decode_fixture(model, variables), caches, cmask, next_pos,
            first, jnp.asarray(ids), max_new_tokens=12, eos_id=2, pad_id=0,
            prompt_len=t, spec_k=3, ngram_n=3,
        ))
        np.testing.assert_array_equal(got, want)

    def test_eos_bias_and_min_length(self, rng, hf_model, jax_setup):
        (model, variables, ids, caches, cmask, next_pos, first, t) = self._setup(
            rng, hf_model, jax_setup
        )
        kw = dict(max_new_tokens=12, eos_id=2, pad_id=0, prompt_len=t,
                  min_length=3, eos_logit_bias=2.0)
        want = np.asarray(greedy_decode(
            _decode_fixture(model, variables), caches, cmask, next_pos,
            first, **kw,
        ))
        got = np.asarray(ngram_speculative_decode(
            _decode_fixture(model, variables), caches, cmask, next_pos,
            first, jnp.asarray(ids), spec_k=4, ngram_n=2, **kw,
        ))
        np.testing.assert_array_equal(got, want)


class TestMultiTokenCacheWrite:
    def test_vector_window_write_matches_scalar(self):
        """T>1 per-row window write == per-row sequence of scalar writes,
        bf16 and int8 layouts, incl. drop semantics at the boundary."""
        from msr3d_tpu.models.llm.llama import _cache_write, quantize_kv_cache

        rng = np.random.default_rng(0)
        b, s, h, d, t = 3, 10, 2, 4, 3
        k = jnp.asarray(rng.normal(size=(b, t, h, d)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(b, t, h, d)).astype(np.float32))
        starts = np.array([0, 4, 8], np.int32)  # row 2 window clips at S
        for quant in (False, True):
            cache = {
                "k": jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32)),
                "v": jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32)),
            }
            if quant:
                cache = quantize_kv_cache(cache)
            got = _cache_write(cache, k, v, jnp.asarray(starts))
            # oracle: per-row scalar writes of each token in sequence
            want = {key: np.asarray(val).copy() for key, val in cache.items()}
            for i in range(b):
                for step in range(t):
                    if starts[i] + step >= s:
                        continue
                    one = _cache_write(
                        {key: jnp.asarray(want[key][i : i + 1]) for key in want},
                        k[i : i + 1, step : step + 1],
                        v[i : i + 1, step : step + 1],
                        int(starts[i] + step),
                    )
                    for key in want:
                        want[key][i] = np.asarray(one[key][0])
            for key in want:
                np.testing.assert_array_equal(np.asarray(got[key]), want[key])

    def test_negative_start_drops_whole_window(self):
        from msr3d_tpu.models.llm.llama import _cache_write

        rng = np.random.default_rng(0)
        b, s, h, d, t = 2, 6, 1, 2, 3
        cache = {
            "k": jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32)),
            "v": jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32)),
        }
        k = jnp.ones((b, t, h, d))
        out = _cache_write(cache, k, k, jnp.asarray(np.array([-1, 2], np.int32)))
        np.testing.assert_array_equal(np.asarray(out["k"][0]), np.asarray(cache["k"][0]))
        assert (np.asarray(out["k"][1, 2:5]) == 1).all()


class TestSharedCachePath:
    def test_matches_greedy_shared(self, rng, hf_model, jax_setup):
        """Speculative loop over the SPLIT cache (prompt segment shared,
        gen segment per row, prompt_len=0 slot base) == greedy_decode_shared
        — the production MSR3D greedy layout."""
        from msr3d_tpu.models.llm.sampling import greedy_decode_shared

        cfg, model, variables = jax_setup
        ids, mask, embeds = make_inputs(rng, hf_model, b=2, t=8, left_pad=2)
        max_new = 14

        logits, _, prompt_kv, prompt_mask, next_pos = model.apply(
            variables, jnp.asarray(embeds), jnp.asarray(mask), 8,
            method=model.prefill_with_cache,
        )
        first = jnp.asarray(np.asarray(logits)[np.arange(2), -1])
        gen_kv = {
            "k": jnp.zeros((cfg.num_hidden_layers, 2, max_new, cfg.kv_heads,
                            cfg.head_dim), cfg.dtype),
            "v": jnp.zeros((cfg.num_hidden_layers, 2, max_new, cfg.kv_heads,
                            cfg.head_dim), cfg.dtype),
        }

        def decode_shared(tok, pos, gkv, gidx, gmask):
            emb = model.apply(variables, tok, method=model.embed_tokens)
            return model.apply(
                variables, emb, pos, prompt_kv, prompt_mask, gkv, gidx, gmask,
                method=model.decode_step_shared,
            )

        want = np.asarray(greedy_decode_shared(
            decode_shared, next_pos, first, gen_kv,
            max_new_tokens=max_new, eos_id=2, pad_id=0,
        ))
        got = np.asarray(ngram_speculative_decode(
            decode_shared, gen_kv, jnp.zeros((2, max_new), bool), next_pos,
            first, jnp.asarray(ids), max_new_tokens=max_new, eos_id=2,
            pad_id=0, prompt_len=0, spec_k=4, ngram_n=2,
        ))
        np.testing.assert_array_equal(got, want)


@pytest.mark.slow  # two tiny-model generate compiles
def test_msr3d_generate_spec_matches_plain(tiny_msr3d, rng):
    """End-to-end: MSR3D.generate with spec_k > 0 is token-identical to
    the plain greedy split-cache path (repetition_penalty forced to 1.0
    for both arms — spec requires it)."""
    from tests.test_msr3d import tiny_data_dict

    model = tiny_msr3d
    saved_penalty = model.repetition_penalty
    model.repetition_penalty = 1.0
    try:
        data = tiny_data_dict(rng)
        base = model.generate(dict(data), use_beam=False, max_new_tokens=8)
        model.spec_k, model.spec_ngram = 4, 2
        spec = model.generate(dict(data), use_beam=False, max_new_tokens=8)
    finally:
        model.spec_k = 0
        model.repetition_penalty = saved_penalty
    np.testing.assert_array_equal(
        base["output_tokens"], spec["output_tokens"]
    )
    assert base["output_text"] == spec["output_text"]
