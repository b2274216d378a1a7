"""Weight-assembly tests: torch checkpoints (created on the fly in the
reference formats) loaded into the full model, verified by forward parity
where feasible."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture()
def model_and_batch(rng):
    from tests.test_msr3d import tiny_data_dict, tiny_model

    model = tiny_model()
    data = tiny_data_dict(rng)
    prompts = model.build_text_prompt(data)
    ii, am = model._encode_prompts(prompts)
    oi, om = model._encode_answers(data["text_output"])
    batch = model._scene_batch(data)
    batch.update(input_ids=ii, attention_mask=am, output_ids=oi, output_mask=om)
    model.init_params(batch)
    return model, data, batch


class TestLoadWeights:
    def test_hf_llm_overlay(self, tmp_path, model_and_batch):
        """Write a tiny HF-format checkpoint whose config matches the model's
        LLM; loading must change the logits."""
        import json

        import torch
        from transformers import LlamaConfig as HFConfig, LlamaForCausalLM

        model, data, batch = model_and_batch
        llm = model.cfg.llm
        hf_cfg = dict(
            vocab_size=llm.vocab_size, hidden_size=llm.hidden_size,
            intermediate_size=llm.intermediate_size,
            num_hidden_layers=llm.num_hidden_layers,
            num_attention_heads=llm.num_attention_heads,
            num_key_value_heads=llm.kv_heads,
            max_position_embeddings=llm.max_position_embeddings,
            tie_word_embeddings=False,
        )
        torch.manual_seed(1)
        hf_model = LlamaForCausalLM(HFConfig(**hf_cfg))
        ckpt = tmp_path / "vicuna"
        ckpt.mkdir()
        json.dump(hf_cfg, open(ckpt / "config.json", "w"))
        torch.save(hf_model.state_dict(), ckpt / "pytorch_model.bin")

        from msr3d_tpu.models.load_weights import load_all

        before = model.forward(dict(data))["loss"]
        model._loss_fn = None
        load_all(model, llm_path=str(ckpt))
        after = model.forward(dict(data))["loss"]
        assert not np.allclose(np.asarray(before), np.asarray(after))

        # loaded embedding matches the HF table exactly
        got = np.asarray(model.params["params"]["llm"]["embed_tokens"]["embedding"])
        want = hf_model.get_input_embeddings().weight.detach().numpy()
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_peft_lora_overlay(self, tmp_path, model_and_batch):
        import torch

        model, data, batch = model_and_batch
        llm = model.cfg.llm
        r = llm.lora_rank
        sd = {}
        for i in range(llm.num_hidden_layers):
            for proj, in_dim, out_dim in (
                ("q_proj", llm.hidden_size, llm.hidden_size),
                ("v_proj", llm.hidden_size, llm.kv_heads * llm.head_dim),
            ):
                if proj not in llm.lora_targets:
                    continue
                sd[f"base_model.model.model.layers.{i}.self_attn.{proj}.lora_A.default.weight"] = torch.randn(r, in_dim)
                sd[f"base_model.model.model.layers.{i}.self_attn.{proj}.lora_B.default.weight"] = torch.randn(out_dim, r)
        path = tmp_path / "adapter_model.bin"
        torch.save(sd, path)

        from msr3d_tpu.models.load_weights import load_peft_lora

        variables = {k: v for k, v in model.params.items()}
        load_peft_lora(variables, path)
        got = np.asarray(
            variables["params"]["llm"]["layer_0"]["attn"]["q_proj"]["lora_a"]
        )
        want = sd["base_model.model.model.layers.0.self_attn.q_proj.lora_A.default.weight"].numpy().T
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_scene_encoder_best_pth(self, tmp_path, model_and_batch):
        """A reference-style learnable-only best.pth (visual_prompter.* +
        llm_proj) overlays into the prompter subtree."""
        import torch

        model, data, batch = model_and_batch
        H = model.cfg.prompter.hidden_size
        llm_h = model.cfg.llm.hidden_size
        sd = {
            "visual_prompter.obj_linear_projection.weight": torch.randn(H, 64),
            "visual_prompter.obj_linear_projection.bias": torch.randn(H),
            "visual_prompter.object_type_embedding.weight": torch.randn(2, H),
            "visual_prompter.orientation_encoder.weight": torch.randn(H, 84),
            "visual_prompter.orientation_encoder.bias": torch.randn(H),
            "visual_prompter.object_orientation_feat": torch.randn(1, 1, H),
            "llm_proj.weight": torch.randn(llm_h, H),
            "llm_proj.bias": torch.randn(llm_h),
        }
        path = tmp_path / "best.pth"
        torch.save(sd, path)

        from msr3d_tpu.models.load_weights import load_scene_encoder_weights

        variables = {k: v for k, v in model.params.items()}
        load_scene_encoder_weights(variables, path)
        got = np.asarray(
            variables["params"]["visual_prompter"]["obj_linear_projection"]["kernel"]
        )
        np.testing.assert_allclose(
            got, sd["visual_prompter.obj_linear_projection.weight"].numpy().T, atol=1e-6
        )
        got_proj = np.asarray(variables["params"]["llm_proj"]["kernel"])
        np.testing.assert_allclose(got_proj, sd["llm_proj.weight"].numpy().T, atol=1e-6)

    def test_shape_mismatch_raises(self, tmp_path, model_and_batch):
        import torch

        model, data, batch = model_and_batch
        sd = {"visual_prompter.obj_linear_projection.weight": torch.randn(7, 7),
              "visual_prompter.obj_linear_projection.bias": torch.randn(7)}
        path = tmp_path / "bad.pth"
        torch.save(sd, path)
        from msr3d_tpu.models.load_weights import load_scene_encoder_weights

        variables = {k: v for k, v in model.params.items()}
        with pytest.raises(AssertionError, match="shape mismatch"):
            load_scene_encoder_weights(variables, path)
