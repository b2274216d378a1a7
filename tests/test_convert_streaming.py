"""Real-checkpoint readiness (VERDICT round-2 #3b/#3c):

- streaming, memory-bounded HF→flax conversion over the REAL 7B on-disk
  layouts: index-json'd safetensors shards and sharded torch .bin —
  tensors visited one at a time, never a whole state dict
- mid-scale GQA + fp16-stored-weights parity vs HF transformers,
  logits AND greedy generation token-exact
"""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from msr3d_tpu.models.llm.convert import (
    config_from_hf,
    load_hf_checkpoint,
    iter_hf_checkpoint_tensors,
    params_from_hf_state_dict,
    params_from_hf_stream,
)
from msr3d_tpu.models.llm.llama import LlamaConfig, LlamaModel

TINY_HF = dict(
    vocab_size=96,
    hidden_size=32,
    intermediate_size=64,
    num_hidden_layers=3,
    num_attention_heads=4,
    num_key_value_heads=4,
    max_position_embeddings=64,
    rms_norm_eps=1e-6,
    tie_word_embeddings=False,
)


@pytest.fixture(scope="module")
def hf_tiny():
    import torch
    from transformers import LlamaConfig as HFConfig, LlamaForCausalLM

    torch.manual_seed(1)
    return LlamaForCausalLM(HFConfig(**TINY_HF)).eval()


def _tree_equal(a, b):
    jax.tree_util.tree_map(
        lambda x, y: np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), rtol=1e-6, atol=1e-7
        ),
        a,
        b,
    )


@pytest.mark.parametrize("safe", [True, False])
def test_sharded_checkpoint_streams_and_matches_dense(hf_tiny, tmp_path, safe):
    """save_pretrained with a tiny max_shard_size reproduces the real 7B
    multi-shard + index-json layout; the streaming loader must assemble
    the identical tree the in-memory path builds."""
    ckpt = tmp_path / ("st" if safe else "bin")
    hf_tiny.save_pretrained(
        str(ckpt), max_shard_size="50KB", safe_serialization=safe
    )
    shards = list(ckpt.glob("*.safetensors" if safe else "*.bin"))
    index = list(ckpt.glob("*.index.json"))
    assert len(shards) >= 2, "expected a sharded layout"
    assert index, "expected an index json (the 7B layout)"

    cfg, params = load_hf_checkpoint(ckpt)
    want = params_from_hf_state_dict(hf_tiny.state_dict(), cfg)
    _tree_equal(params, want)

    # the stream really is incremental: tensors arrive one at a time and
    # every mapped name appears exactly once
    names = [n for n, _ in iter_hf_checkpoint_tensors(ckpt)]
    mapped = [n for n in names if not n.endswith("inv_freq")]
    assert len(set(mapped)) == len(mapped)
    assert "model.embed_tokens.weight" in names


def test_stream_stacked_layout_matches_restack(hf_tiny, tmp_path):
    """stack_layers=True emits the pipeline/scan layout directly — equal
    to stacking the dense tree after the fact."""
    import jax.numpy as jnp

    from msr3d_tpu.parallel.llm_pp import stack_llm_blocks

    cfg = config_from_hf(TINY_HF)
    sd = hf_tiny.state_dict()
    dense = params_from_hf_stream(((k, v.numpy()) for k, v in sd.items()), cfg)
    stacked = params_from_hf_stream(
        ((k, v.numpy()) for k, v in sd.items()), cfg, stack_layers=True
    )
    want = stack_llm_blocks({"params": {"llm": dense}})["params"]["llm"]
    _tree_equal(stacked, jax.tree_util.tree_map(np.asarray, want))
    assert stacked["blocks"]["attn"]["q_proj"]["kernel"].shape[0] == (
        TINY_HF["num_hidden_layers"]
    )


def test_stream_supports_bf16_target(hf_tiny, tmp_path):
    import ml_dtypes

    ckpt = tmp_path / "bf16"
    hf_tiny.save_pretrained(str(ckpt), safe_serialization=True)
    cfg, params = load_hf_checkpoint(ckpt, dtype=ml_dtypes.bfloat16)
    leaf = params["layer_0"]["attn"]["q_proj"]["kernel"]
    assert leaf.dtype == ml_dtypes.bfloat16
    # values round-trip within bf16 resolution
    want = hf_tiny.state_dict()["model.layers.0.self_attn.q_proj.weight"].numpy().T
    np.testing.assert_allclose(
        leaf.astype(np.float32), want, rtol=1e-2, atol=1e-2
    )


def test_stream_rejects_incomplete_checkpoint(tmp_path):
    (tmp_path / "config.json").write_text(json.dumps(TINY_HF))
    with pytest.raises(FileNotFoundError):
        load_hf_checkpoint(tmp_path)


# ---------------------------------------------------------------------------
# mid-scale GQA + fp16 parity (VERDICT #3c)
# ---------------------------------------------------------------------------

MID_GQA = dict(
    vocab_size=512,
    hidden_size=256,
    intermediate_size=512,
    num_hidden_layers=4,
    num_attention_heads=8,
    num_key_value_heads=2,  # GQA 4:1 — the Llama-2/3 70B-family layout
    max_position_embeddings=128,
    rms_norm_eps=1e-5,
    tie_word_embeddings=False,
)


@pytest.mark.slow
class TestMidScaleGQAFp16Parity:
    @pytest.fixture(scope="class")
    def setup(self):
        import torch
        from transformers import LlamaConfig as HFConfig, LlamaForCausalLM

        torch.manual_seed(3)
        hf = LlamaForCausalLM(HFConfig(**MID_GQA)).eval()
        # fp16 weight storage exactly as the reference loads Vicuna
        # (torch_dtype=float16, msr3d.py:75-81); HF computes in fp32 from
        # the fp16-rounded values, our side stores fp16 + computes fp32
        sd16 = {k: v.half() for k, v in hf.state_dict().items()}
        hf.load_state_dict({k: v.float() for k, v in sd16.items()})
        cfg = config_from_hf(
            MID_GQA, dtype=jnp.float32, param_dtype=jnp.float16
        )
        params = params_from_hf_stream(
            ((k, v.numpy()) for k, v in sd16.items()), cfg, np.float16
        )
        model = LlamaModel(cfg)
        variables = {"params": jax.tree_util.tree_map(jnp.asarray, params)}
        assert variables["params"]["layer_0"]["attn"]["q_proj"]["kernel"].dtype == jnp.float16
        return hf, cfg, model, variables

    def test_logits_match(self, setup, rng):
        import torch

        hf, cfg, model, variables = setup
        ids = rng.integers(5, 500, size=(2, 12)).astype(np.int32)
        mask = np.ones((2, 12), np.int32)
        mask[0, :4] = 0
        with torch.no_grad():
            embeds = hf.get_input_embeddings()(torch.from_numpy(ids).long())
            want = hf(
                inputs_embeds=embeds, attention_mask=torch.from_numpy(mask)
            ).logits.numpy()
        logits, _, _ = model.apply(
            variables, jnp.asarray(embeds.numpy()), jnp.asarray(mask)
        )
        valid = mask.astype(bool)
        np.testing.assert_allclose(
            np.asarray(logits)[valid], want[valid], atol=3e-3
        )

    def test_greedy_generation_token_exact(self, setup, rng):
        import torch

        from msr3d_tpu.models.llm.sampling import greedy_decode

        hf, cfg, model, variables = setup
        ids = rng.integers(5, 500, size=(2, 8)).astype(np.int32)
        mask = np.ones_like(ids)
        max_new = 8

        with torch.no_grad():
            want = hf.generate(
                torch.from_numpy(ids).long(),
                attention_mask=torch.from_numpy(mask).long(),
                max_new_tokens=max_new,
                do_sample=False,
                num_beams=1,
                pad_token_id=0,
            )[:, ids.shape[1]:].numpy()

        embeds = model.apply(variables, jnp.asarray(ids), method=model.embed_tokens)
        first, _, caches, cache_mask, next_pos = model.apply(
            variables, embeds, jnp.asarray(mask), ids.shape[1] + max_new,
            method=model.prefill_with_cache, logits_last_only=True,
        )

        def decode_step(token_ids, positions, kv, idx, cm):
            e = model.apply(variables, token_ids, method=model.embed_tokens)
            logits, _, new = model.apply(
                variables, e, jnp.ones_like(token_ids), positions=positions,
                kv_caches=kv, cache_index=idx, cache_mask=cm,
            )
            return logits, new

        tokens = greedy_decode(
            decode_step, caches, cache_mask, next_pos,
            first[:, -1].astype(jnp.float32),
            max_new_tokens=max_new, eos_id=-1, pad_id=0,
            prompt_len=ids.shape[1],
        )
        np.testing.assert_array_equal(np.asarray(tokens), want)
