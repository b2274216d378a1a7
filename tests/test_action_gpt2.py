"""Parity tests for the GPT-2+RoPE action transformer (nn/action_gpt2.py)
against (a) HF transformers GPT2Model (non-RoPE path, token-exact) and
(b) the reference's vendored RoPE GPT-2
(/root/reference/modules/layers/transformers.py:333-1052)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from msr3d_tpu.nn.action_gpt2 import (
    ActionGPT2Config,
    GPT2Model,
    load_hf_gpt2_weights,
    rope_cos_sin,
)
from tests.ref_loader import load_ref_file

pytestmark = pytest.mark.parity

TINY = dict(
    vocab_size=97,
    hidden_size=32,
    num_hidden_layers=2,
    num_attention_heads=4,
    max_position_embeddings=64,
    embd_pdrop=0.0,
    attn_pdrop=0.0,
    resid_pdrop=0.0,
)


def _hf_config(**over):
    from transformers import GPT2Config

    kw = dict(
        vocab_size=TINY["vocab_size"],
        n_embd=TINY["hidden_size"],
        n_layer=TINY["num_hidden_layers"],
        n_head=TINY["num_attention_heads"],
        n_positions=TINY["max_position_embeddings"],
        embd_pdrop=0.0,
        attn_pdrop=0.0,
        resid_pdrop=0.0,
    )
    kw.update(over)
    return GPT2Config(**kw)


class TestHFParity:
    def test_non_rope_matches_hf_token_exact(self, rng):
        import torch
        from transformers import GPT2Model as HFGPT2

        torch.manual_seed(0)
        hf = HFGPT2(_hf_config()).eval()
        ids = rng.integers(0, TINY["vocab_size"], size=(2, 11))
        with torch.no_grad():
            want = hf(torch.as_tensor(ids)).last_hidden_state.numpy()

        cfg = ActionGPT2Config(use_rope=False, **TINY)
        model = GPT2Model(cfg)
        params = load_hf_gpt2_weights(hf.state_dict())
        got = np.asarray(model.apply(params, input_ids=jnp.asarray(ids)))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)

    def test_attention_mask_matches_hf(self, rng):
        import torch
        from transformers import GPT2Model as HFGPT2

        torch.manual_seed(1)
        hf = HFGPT2(_hf_config()).eval()
        ids = rng.integers(0, TINY["vocab_size"], size=(2, 9))
        mask = np.ones((2, 9), np.int64)
        mask[0, 5:] = 0  # right-padding
        with torch.no_grad():
            want = hf(
                torch.as_tensor(ids), attention_mask=torch.as_tensor(mask)
            ).last_hidden_state.numpy()

        cfg = ActionGPT2Config(use_rope=False, **TINY)
        params = load_hf_gpt2_weights(hf.state_dict())
        got = np.asarray(
            GPT2Model(cfg).apply(
                params, input_ids=jnp.asarray(ids), attention_mask=jnp.asarray(mask)
            )
        )
        # compare only non-pad positions (pad rows differ by definition)
        np.testing.assert_allclose(got[1], want[1], rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(got[0, :5], want[0, :5], rtol=2e-4, atol=2e-5)


class TestReferenceRoPEParity:
    @pytest.fixture(scope="class")
    def ref_mod(self):
        return load_ref_file("modules/layers/transformers.py", "ref_transformers")

    @pytest.mark.parametrize(
        "scaling",
        [None, {"type": "linear", "factor": 2.0}, {"type": "dynamic", "factor": 2.0}],
    )
    def test_rope_cos_sin_matches_reference(self, ref_mod, scaling):
        import torch

        head_dim, seq_len, max_pos = 16, 80, 32  # seq > max_pos exercises NTK
        if scaling is None:
            remb = ref_mod.LlamaRotaryEmbedding(head_dim, max_position_embeddings=max_pos)
        elif scaling["type"] == "linear":
            remb = ref_mod.LlamaLinearScalingRotaryEmbedding(
                head_dim, max_position_embeddings=max_pos, scaling_factor=scaling["factor"]
            )
        else:
            remb = ref_mod.LlamaDynamicNTKScalingRotaryEmbedding(
                head_dim, max_position_embeddings=max_pos, scaling_factor=scaling["factor"]
            )
        x = torch.zeros(1, 1, seq_len, head_dim)
        want_cos, want_sin = remb(x, seq_len=seq_len)
        got_cos, got_sin = rope_cos_sin(
            head_dim,
            jnp.arange(seq_len),
            seq_len,
            max_position_embeddings=max_pos,
            scaling=scaling,
        )
        np.testing.assert_allclose(
            np.asarray(got_cos), want_cos.squeeze().numpy(), rtol=1e-5, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(got_sin), want_sin.squeeze().numpy(), rtol=1e-5, atol=1e-5
        )

    def test_rope_gpt2_block_matches_reference(self, ref_mod, rng):
        """Our RoPE GPT2Block vs the vendored torch one.

        Block-level because the vendored GPT2Model/GPT2Attention are
        unconstructible dead code in the reference: GPT2Model.__init__
        calls ``super().__init__(config)`` on a plain ``nn.Module``
        (transformers.py:791-793) and ``_init_rope`` reads
        ``self.config``/``self.max_position_embeddings`` that are never
        assigned (:484-486). We inject the two attributes at class level
        to make the reference block constructible for the comparison.
        """
        import torch

        hf_cfg = _hf_config()
        hf_cfg.use_rope = True
        hf_cfg.rope_scaling = None
        ref_mod.GPT2Attention.config = hf_cfg
        ref_mod.GPT2Attention.max_position_embeddings = hf_cfg.n_positions
        try:
            torch.manual_seed(2)
            ref_block = ref_mod.GPT2Block(hf_cfg, layer_idx=0).eval()
            h = rng.normal(size=(2, 13, TINY["hidden_size"])).astype(np.float32)
            pos = np.broadcast_to(np.arange(13), (2, 13)).copy()
            with torch.no_grad():
                want = ref_block(
                    torch.as_tensor(h), position_ids=torch.as_tensor(pos)
                )[0].numpy()

            cfg = ActionGPT2Config(use_rope=True, **TINY)
            sd = {f"h.0.{k}": v for k, v in ref_block.state_dict().items()}
            sd["wte.weight"] = np.zeros((TINY["vocab_size"], TINY["hidden_size"]), np.float32)
            sd["ln_f.weight"] = np.ones(TINY["hidden_size"], np.float32)
            sd["ln_f.bias"] = np.zeros(TINY["hidden_size"], np.float32)
            params = load_hf_gpt2_weights(sd)

            from msr3d_tpu.nn.action_gpt2 import GPT2Block as JaxBlock

            got = np.asarray(
                JaxBlock(cfg, layer_idx=0).apply(
                    {"params": params["params"]["h_0"]},
                    jnp.asarray(h),
                    position_ids=jnp.asarray(pos),
                )
            )
            np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-5)
        finally:
            del ref_mod.GPT2Attention.config
            del ref_mod.GPT2Attention.max_position_embeddings


class TestBehavior:
    def test_causality(self, rng):
        cfg = ActionGPT2Config(use_rope=True, **TINY)
        model = GPT2Model(cfg)
        ids = jnp.asarray(rng.integers(0, TINY["vocab_size"], size=(1, 10)))
        params = model.init(jax.random.PRNGKey(0), input_ids=ids)
        base = model.apply(params, input_ids=ids)
        ids2 = ids.at[0, 7].set((ids[0, 7] + 1) % TINY["vocab_size"])
        pert = model.apply(params, input_ids=ids2)
        diff = np.abs(np.asarray(base - pert)).max(axis=-1)[0]
        assert diff[:7].max() < 1e-6  # earlier positions untouched
        assert diff[7:].max() > 1e-6

    def test_cross_attention_path(self, rng):
        cfg = ActionGPT2Config(use_rope=True, add_cross_attention=True, **TINY)
        model = GPT2Model(cfg)
        ids = jnp.asarray(rng.integers(0, TINY["vocab_size"], size=(2, 6)))
        enc = jnp.asarray(rng.normal(size=(2, 4, TINY["hidden_size"])).astype(np.float32))
        params = model.init(jax.random.PRNGKey(0), input_ids=ids, encoder_hidden_states=enc)
        out1 = model.apply(params, input_ids=ids, encoder_hidden_states=enc)
        out2 = model.apply(params, input_ids=ids, encoder_hidden_states=enc * 2.0)
        assert np.abs(np.asarray(out1 - out2)).max() > 1e-6
        assert "crossattention" in params["params"]["h_0"]

    def test_inputs_embeds_entry(self, rng):
        cfg = ActionGPT2Config(use_rope=True, **TINY)
        model = GPT2Model(cfg)
        emb = jnp.asarray(rng.normal(size=(1, 5, TINY["hidden_size"])).astype(np.float32))
        params = model.init(jax.random.PRNGKey(0), inputs_embeds=emb)
        out = model.apply(params, inputs_embeds=emb)
        assert out.shape == (1, 5, TINY["hidden_size"])
