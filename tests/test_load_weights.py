"""Weight-assembly tests: torch checkpoints (created on the fly in the
reference formats) loaded into the full model, verified by forward parity
where feasible."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def _pristine_model_and_batch():
    """Build + init once per module (~25 s); tests get restored params."""
    from tests.test_msr3d import tiny_data_dict, tiny_model

    rng = np.random.default_rng(42)
    model = tiny_model()
    data = tiny_data_dict(rng)
    prompts = model.build_text_prompt(data)
    ii, am = model._encode_prompts(prompts)
    oi, om = model._encode_answers(data["text_output"])
    batch = model._scene_batch(data)
    batch.update(input_ids=ii, attention_mask=am, output_ids=oi, output_mask=om)
    model.init_params(batch)
    pristine = jax.tree_util.tree_map(lambda x: x, model.params)
    return model, data, batch, pristine


@pytest.fixture()
def model_and_batch(_pristine_model_and_batch):
    model, data, batch, pristine = _pristine_model_and_batch
    # restore pristine params + force recompile so weight-loading tests
    # start from the same state the old per-test fixture produced
    model.params = jax.tree_util.tree_map(lambda x: x, pristine)
    model._loss_fn = None
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

    def test_hf_llm_overlay_quantized_config(self, tmp_path):
        """A quantized serving config stores kernel_q/kernel_scale; the
        loader must quantize the checkpoint's fp kernels to that layout
        instead of silently skipping every projection."""
        import json

        import torch
        from transformers import LlamaConfig as HFConfig, LlamaForCausalLM

        hf_cfg = dict(
            vocab_size=311, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=4, max_position_embeddings=128,
            tie_word_embeddings=False,
        )
        torch.manual_seed(3)
        hf_model = LlamaForCausalLM(HFConfig(**hf_cfg))
        ckpt = tmp_path / "vicuna_q"
        ckpt.mkdir()
        json.dump(hf_cfg, open(ckpt / "config.json", "w"))
        torch.save(hf_model.state_dict(), ckpt / "pytorch_model.bin")

        from msr3d_tpu.models.llm.convert import (
            config_from_hf, load_hf_checkpoint, quantize_llm_params,
        )
        from msr3d_tpu.models.load_weights import load_llm_weights

        cfg_q = config_from_hf(hf_cfg, quantize=True, quantize_bits=8)
        _, fp_params = load_hf_checkpoint(ckpt)
        expected = quantize_llm_params(fp_params, cfg_q)

        def zeroed(tree):
            if isinstance(tree, dict):
                return {k: zeroed(v) for k, v in tree.items()}
            return np.zeros_like(np.asarray(tree))

        variables = {"params": {"llm": zeroed(expected)}}
        load_llm_weights(variables, ckpt, cfg_q)
        got = variables["params"]["llm"]
        q = np.asarray(got["layer_0"]["attn"]["q_proj"]["kernel_q"])
        s = np.asarray(got["layer_0"]["attn"]["q_proj"]["kernel_scale"])
        np.testing.assert_array_equal(
            q, expected["layer_0"]["attn"]["q_proj"]["kernel_q"]
        )
        np.testing.assert_allclose(
            s, expected["layer_0"]["attn"]["q_proj"]["kernel_scale"]
        )
        assert np.abs(q).max() > 0, "quantized kernels must be non-zero"
        mlp = np.asarray(got["layer_1"]["mlp"]["gate_proj"]["kernel_q"])
        np.testing.assert_array_equal(
            mlp, expected["layer_1"]["mlp"]["gate_proj"]["kernel_q"]
        )

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


class TestOSE3DORIGCheckpointPath:
    """Pins the OSE3DORIG registry path + pretrained-PointNet load/freeze
    semantics (reference model/ose3d_orig.py:518,571-585)."""

    def _prompter_cfg_dict(self, pn_path=""):
        return {
            "hidden_size": 32,
            "use_spatial_attn": True,
            "use_anchor": True,
            "use_orientation": True,
            "fourier_size": 84,
            "vision": {
                "name": "PcdObjEncoder",
                "args": {
                    "sa_n_points": [8, 4, None],
                    "sa_n_samples": [8, 8, None],
                    "sa_radii": [0.4, 0.8, None],
                    "sa_mlps": [[3, 8, 8, 16], [16, 16, 16, 32], [32, 32, 32, 64]],
                    "dropout": 0.1,
                    "freeze": True,
                    "path": pn_path,
                },
            },
            "spatial_encoder": {
                "dim_loc": 6, "num_attention_heads": 4,
                "dim_feedforward": 64, "dropout": 0.0, "activation": "gelu",
                "spatial_multihead": True, "spatial_dim": 5,
                "spatial_dist_norm": True, "spatial_attn_fusion": "cond",
                "num_layers": 1, "obj_loc_encoding": "same_all",
                "pairwise_rel_type": "center",
            },
            "attn_flat": {
                "use_attn_flat": False, "mcan_flat_mlp_size": 512,
                "mcan_flat_glimpses": 1, "mcan_flat_out_size": 1024,
            },
        }

    def test_registry_builds_as_object(self):
        import msr3d_tpu.models.build  # noqa: F401  registry side effects
        from msr3d_tpu.config import config_from_dict
        from msr3d_tpu.registry import MODEL_REGISTRY

        cfg = config_from_dict({"model": self._prompter_cfg_dict()})
        prompter = MODEL_REGISTRY.get("OSE3DORIG")(cfg)
        assert prompter.cfg.situation_type == "as_object"
        assert prompter.cfg.vision_freeze is True

    def _make_pointnet_ckpt(self, tmp_path, sa_mlps, fc_out):
        """Reference pointnetpp.pt format: SharedMLP Conv2d+BN stacks + fc
        (modules/layers/pointnet.py:22-63 naming)."""
        import torch

        torch.manual_seed(0)
        sd = {}
        for i, mlp in enumerate(sa_mlps):
            in_dim = mlp[0] + 3  # QueryAndGroup concats centered xyz
            for j in range(len(mlp) - 1):
                out_dim = mlp[j + 1]
                p = f"encoder.{i}.mlps.0.layer{j}"
                sd[f"{p}.conv.weight"] = torch.randn(out_dim, in_dim, 1, 1)
                sd[f"{p}.bn.bn.weight"] = torch.rand(out_dim) + 0.5
                sd[f"{p}.bn.bn.bias"] = torch.randn(out_dim)
                sd[f"{p}.bn.bn.running_mean"] = torch.randn(out_dim)
                sd[f"{p}.bn.bn.running_var"] = torch.rand(out_dim) + 0.5
                in_dim = out_dim
        flat = sa_mlps[-1][-1]
        sd["fc.weight"] = torch.randn(fc_out, flat)
        sd["fc.bias"] = torch.randn(fc_out)
        path = tmp_path / "pointnetpp.pt"
        torch.save(sd, path)
        return sd, path

    def test_vision_path_loads_and_freezes(self, tmp_path, model_and_batch):
        """vision.args.path flows through load_pretrained_from_config into
        the obj_encoder subtree; the frozen encoder stays out of the
        optimizer mask."""
        from msr3d_tpu.config import config_from_dict
        from msr3d_tpu.models.load_weights import load_pretrained_from_config

        model, data, batch = model_and_batch
        sa_mlps = model.cfg.prompter.sa_mlps
        fc_out = model.params["params"]["visual_prompter"]["obj_encoder"][
            "pcd_net"]["fc"]["kernel"].shape[1]
        sd, path = self._make_pointnet_ckpt(tmp_path, sa_mlps, fc_out)

        # fc kernel differs before the load (random init)
        def fc_kernel():
            return np.asarray(
                model.params["params"]["visual_prompter"]["obj_encoder"]
                ["pcd_net"]["fc"]["kernel"]
            )

        want = sd["fc.weight"].numpy().T
        assert not np.allclose(fc_kernel(), want)

        cfg = config_from_dict(
            {
                "pretrain_ckpt_path": "",
                "model": {
                    "llm": {"cfg_path": ""},
                    "prompter": {"model": self._prompter_cfg_dict(str(path))},
                },
            }
        )
        loaded = load_pretrained_from_config(model, cfg)
        assert any("pointnet" in s for s in loaded)
        np.testing.assert_allclose(fc_kernel(), want, atol=1e-6)
        # BN running stats landed in batch_stats
        got_mean = np.asarray(
            model.params["batch_stats"]["visual_prompter"]["obj_encoder"]
            ["pcd_net"]["sa_0"]["mlp"]["bn_0"]["mean"]
        )
        np.testing.assert_allclose(
            got_mean, sd["encoder.0.mlps.0.layer0.bn.bn.running_mean"].numpy(),
            atol=1e-6,
        )
        # freeze semantics (ose3d_orig.py:583-585): obj_encoder excluded
        # from the trainable mask
        mask = model.get_opt_params_mask()["params"]
        enc_mask = mask["visual_prompter"]["obj_encoder"]
        assert not any(jax.tree_util.tree_leaves(enc_mask))
