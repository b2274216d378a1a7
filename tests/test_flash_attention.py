"""Flash attention kernel: parity vs the dense oracle and vs the dense
LlamaModel paths (training forward + prefill), forward AND gradients.

The kernel runs in Pallas interpret mode on the CPU test backend; the
same code compiles via Mosaic on TPU (exercised by bench_train/bench_qa).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from msr3d_tpu.ops.flash_attention import (
    dense_attention_reference,
    flash_attention,
)


def _rand(rng, shape):
    return jnp.asarray(rng.normal(size=shape), jnp.float32)


class TestKernel:
    @pytest.mark.parametrize(
        "b,t,s,hq,hkv,d,causal,block_q,block_k",
        [
            (2, 64, 64, 4, 4, 32, True, 64, 64),  # single block
            (2, 100, 100, 4, 2, 32, True, 32, 48),  # ragged + GQA
            (1, 17, 17, 2, 1, 16, True, 16, 16),  # tiny, below min tile
            (2, 96, 96, 4, 4, 32, False, 32, 32),  # non-causal
            (1, 224, 224, 8, 8, 64, True, 128, 128),  # train-like ratio
        ],
    )
    def test_forward_matches_dense(
        self, b, t, s, hq, hkv, d, causal, block_q, block_k
    ):
        rng = np.random.default_rng(0)
        q = _rand(rng, (b, t, hq, d))
        k = _rand(rng, (b, s, hkv, d))
        v = _rand(rng, (b, s, hkv, d))
        valid = jnp.asarray(rng.random((b, s)) > 0.25)
        out = flash_attention(
            q, k, v, causal=causal, key_valid=valid,
            block_q=block_q, block_k=block_k,
        )
        ref = dense_attention_reference(
            q, k, v, causal=causal, key_valid=valid
        )
        np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)

    def test_gradients_match_dense(self):
        rng = np.random.default_rng(1)
        b, t, hq, hkv, d = 2, 72, 4, 2, 32
        q = _rand(rng, (b, t, hq, d))
        k = _rand(rng, (b, t, hkv, d))
        v = _rand(rng, (b, t, hkv, d))
        valid = jnp.asarray(rng.random((b, t)) > 0.3)
        w = _rand(rng, (b, t, hq, d))

        def loss(fn):
            def f(q, k, v):
                return jnp.sum(fn(q, k, v, causal=True, key_valid=valid) * w)

            return f

        gf = jax.grad(
            loss(lambda *a, **kw: flash_attention(*a, block_q=32, block_k=32, **kw)),
            argnums=(0, 1, 2),
        )(q, k, v)
        gd = jax.grad(loss(dense_attention_reference), argnums=(0, 1, 2))(
            q, k, v
        )
        for name, a, bb in zip("qkv", gf, gd):
            np.testing.assert_allclose(
                a, bb, atol=5e-5, rtol=5e-5, err_msg=f"grad d{name}"
            )

    def test_left_padding_fully_masked_rows_are_zero_and_finite(self):
        # left-padded batch: the first rows see only invalid keys
        rng = np.random.default_rng(2)
        b, t, h, d = 1, 32, 2, 16
        q = _rand(rng, (b, t, h, d))
        k = _rand(rng, (b, t, h, d))
        v = _rand(rng, (b, t, h, d))
        valid = jnp.arange(t)[None, :] >= 8  # first 8 keys padding
        out = flash_attention(q, k, v, causal=True, key_valid=valid,
                              block_q=16, block_k=16)
        assert bool(jnp.all(jnp.isfinite(out)))
        np.testing.assert_allclose(out[0, :8], 0.0, atol=0)
        # grads stay finite through the masked rows
        g = jax.grad(
            lambda q: jnp.sum(
                flash_attention(q, k, v, causal=True, key_valid=valid,
                                block_q=16, block_k=16)[:, 8:]
            )
        )(q)
        assert bool(jnp.all(jnp.isfinite(g)))

    def test_bf16_inputs(self):
        rng = np.random.default_rng(3)
        b, t, h, d = 2, 64, 4, 32
        q = _rand(rng, (b, t, h, d)).astype(jnp.bfloat16)
        k = _rand(rng, (b, t, h, d)).astype(jnp.bfloat16)
        v = _rand(rng, (b, t, h, d)).astype(jnp.bfloat16)
        out = flash_attention(q, k, v, causal=True, block_q=32, block_k=32)
        ref = dense_attention_reference(q, k, v, causal=True)
        assert out.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            out.astype(np.float32), ref.astype(np.float32), atol=3e-2
        )


def _build_llama(flash: bool, **kw):
    from msr3d_tpu.models.llm.llama import LlamaConfig, LlamaModel

    cfg = LlamaConfig.tiny(
        lora_rank=4, dtype=jnp.float32, param_dtype=jnp.float32,
        flash_attention=flash, **kw,
    )
    return LlamaModel(cfg), cfg


class TestLlamaIntegration:
    @pytest.mark.parametrize("kv_heads", [None, 2])
    def test_training_forward_and_grads_match_dense(self, kv_heads):
        rng = np.random.default_rng(0)
        model_d, cfg = _build_llama(False, num_key_value_heads=kv_heads)
        model_f, _ = _build_llama(True, num_key_value_heads=kv_heads)
        b, t = 2, 21
        embeds = _rand(rng, (b, t, cfg.hidden_size))
        # left padding like the real collate
        mask = jnp.asarray(
            np.stack([np.r_[np.zeros(5), np.ones(t - 5)],
                      np.ones(t)]).astype(np.int32)
        )
        params = model_d.init(jax.random.PRNGKey(0), embeds, mask)
        logits_d, _, _ = model_d.apply(params, embeds, mask)
        logits_f, _, _ = model_f.apply(params, embeds, mask)
        valid = np.asarray(mask, bool)
        np.testing.assert_allclose(
            np.asarray(logits_f)[valid], np.asarray(logits_d)[valid],
            atol=1e-4, rtol=1e-4,
        )

        targets = jnp.asarray(rng.integers(0, cfg.vocab_size, (b, t)))

        def loss(model):
            def f(params):
                logits, _, _ = model.apply(params, embeds, mask)
                lp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
                nll = -jnp.take_along_axis(lp, targets[..., None], -1)[..., 0]
                return jnp.sum(nll * mask)  # padded positions masked

            return f

        gd = jax.grad(loss(model_d))(params)
        gf = jax.grad(loss(model_f))(params)
        flat_d = jax.tree_util.tree_leaves_with_path(gd)
        flat_f = dict(
            (jax.tree_util.keystr(kp), x)
            for kp, x in jax.tree_util.tree_leaves_with_path(gf)
        )
        checked = 0
        for kp, x in flat_d:
            name = jax.tree_util.keystr(kp)
            if "lora" not in name:
                continue  # base is frozen in training; LoRA grads are live
            np.testing.assert_allclose(
                flat_f[name], x, atol=2e-4, rtol=2e-3, err_msg=name
            )
            checked += 1
        assert checked > 0

    def test_prefill_with_cache_matches_dense(self):
        rng = np.random.default_rng(1)
        model_d, cfg = _build_llama(False)
        model_f, _ = _build_llama(True)
        b, t, max_len = 2, 13, 20
        embeds = _rand(rng, (b, t, cfg.hidden_size))
        mask = jnp.asarray(
            np.stack([np.r_[np.zeros(4), np.ones(t - 4)],
                      np.ones(t)]).astype(np.int32)
        )
        params = model_d.init(jax.random.PRNGKey(0), embeds, mask)
        outs_d = model_d.apply(
            params, embeds, mask, max_len, method="prefill_with_cache"
        )
        outs_f = model_f.apply(
            params, embeds, mask, max_len, method="prefill_with_cache"
        )
        valid = np.asarray(mask, bool)
        np.testing.assert_allclose(  # logits at valid positions
            np.asarray(outs_f[0])[valid], np.asarray(outs_d[0])[valid],
            atol=1e-4, rtol=1e-4,
        )
        cm_d, cm_f = np.asarray(outs_d[3]), np.asarray(outs_f[3])
        np.testing.assert_array_equal(cm_d, cm_f)
        for key in ("k", "v"):  # caches equal at valid slots
            cd = np.asarray(outs_d[2][key])  # (L, B, S, h, D)
            cf = np.asarray(outs_f[2][key])
            sel = np.broadcast_to(
                cm_d[None, :, :, None, None], cd.shape
            )
            np.testing.assert_allclose(
                cf[sel], cd[sel], atol=1e-4, rtol=1e-4
            )
        # one decode step on top of each cache: identical next-token logits
        step = _rand(rng, (b, 1, cfg.hidden_size))
        cache_mask = outs_d[3] | (jnp.arange(max_len)[None] == t)
        for model, outs in ((model_d, outs_d), (model_f, outs_f)):
            logits, _, _ = model.apply(
                params, step, jnp.ones((b, 1), jnp.int32),
                positions=outs[4][:, None], kv_caches=outs[2],
                cache_index=jnp.full((), t), cache_mask=cache_mask,
            )
            if model is model_d:
                ref_logits = logits
        np.testing.assert_allclose(
            np.asarray(logits), np.asarray(ref_logits), atol=1e-4, rtol=1e-4
        )
