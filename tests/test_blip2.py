"""BLIP2Backbone (flax ViT + Q-Former) shape/structure tests
(reference modules/vision/timm.py:121-149: output is B×32×768)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from msr3d_tpu.models.blip2 import (
    BLIP2Backbone,
    Blip2QFormerConfig,
    Blip2VisionConfig,
)
from msr3d_tpu.registry import VISION_REGISTRY


@pytest.fixture(scope="module")
def tiny_backbone():
    vcfg = Blip2VisionConfig.tiny()
    qcfg = Blip2QFormerConfig.tiny(encoder_hidden_size=vcfg.hidden_size)
    model = BLIP2Backbone(vision_cfg=vcfg, qformer_cfg=qcfg)
    imgs = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 28, 28, 3)).astype(np.float32)
    )
    variables = jax.jit(model.init)(jax.random.key(0), imgs)
    return model, variables, imgs


class TestBlip2:
    def test_registered(self):
        assert VISION_REGISTRY.get("BLIP2Backbone") is BLIP2Backbone

    def test_output_is_query_tokens(self, tiny_backbone):
        model, variables, imgs = tiny_backbone
        out = jax.jit(model.apply)(variables, imgs)
        assert out.shape == (2, model.qformer_cfg.num_query_tokens, model.out_channels)
        assert np.isfinite(np.asarray(out)).all()

    def test_frozen_blocks_gradients(self, tiny_backbone):
        model, variables, imgs = tiny_backbone

        def loss(v):
            return jnp.sum(model.apply(v, imgs) ** 2)

        grads = jax.grad(loss)(variables)
        flat = jax.tree_util.tree_leaves(grads)
        assert all(float(jnp.abs(g).max()) == 0.0 for g in flat)

    def test_cross_attention_frequency(self, tiny_backbone):
        """Layer 0 has cross-attn params, layer 1 (freq=2) does not."""
        _, variables, _ = tiny_backbone
        qf = variables["params"]["qformer"]
        assert "cross_attn" in qf["layer_0"]
        assert "cross_attn" not in qf["layer_1"]

    def test_default_configs_match_reference_contract(self):
        """32 query tokens × 768 channels (timm.py:121,142)."""
        model = BLIP2Backbone()
        assert model.qformer_cfg.num_query_tokens == 32
        assert model.out_channels == 768
        assert model.vision_cfg.hidden_size == 1408
        assert model.vision_cfg.num_layers == 39


class TestBlip2Conversion:
    def test_roundtrip_tiny_torch_state_dict(self):
        """Build a tiny HF-layout state dict with torch and convert; the
        converted tree must apply cleanly and hit every param."""
        torch = pytest.importorskip("torch")
        from msr3d_tpu.models.blip2 import convert_blip2_state_dict

        vcfg = Blip2VisionConfig.tiny()
        qcfg = Blip2QFormerConfig.tiny(encoder_hidden_size=vcfg.hidden_size)
        model = BLIP2Backbone(vision_cfg=vcfg, qformer_cfg=qcfg)
        imgs = jnp.zeros((1, 28, 28, 3), jnp.float32)
        ref = jax.jit(model.init)(jax.random.key(0), imgs)

        g = torch.Generator().manual_seed(0)

        def W(*shape):
            return torch.randn(*shape, generator=g)

        n_patches = (vcfg.image_size // vcfg.patch_size) ** 2
        sd = {
            "query_tokens": W(1, qcfg.num_query_tokens, qcfg.hidden_size),
            "vision_model.embeddings.patch_embedding.weight": W(
                vcfg.hidden_size, 3, vcfg.patch_size, vcfg.patch_size
            ),
            "vision_model.embeddings.patch_embedding.bias": W(vcfg.hidden_size),
            "vision_model.embeddings.class_embedding": W(1, 1, vcfg.hidden_size),
            "vision_model.embeddings.position_embedding": W(1, n_patches + 1, vcfg.hidden_size),
            "vision_model.post_layernorm.weight": W(vcfg.hidden_size),
            "vision_model.post_layernorm.bias": W(vcfg.hidden_size),
            "qformer.layernorm.weight": W(qcfg.hidden_size),
            "qformer.layernorm.bias": W(qcfg.hidden_size),
        }
        for i in range(vcfg.num_layers):
            p = f"vision_model.encoder.layers.{i}"
            sd.update({
                f"{p}.layer_norm1.weight": W(vcfg.hidden_size),
                f"{p}.layer_norm1.bias": W(vcfg.hidden_size),
                f"{p}.self_attn.qkv.weight": W(3 * vcfg.hidden_size, vcfg.hidden_size),
                f"{p}.self_attn.qkv.bias": W(3 * vcfg.hidden_size),
                f"{p}.self_attn.projection.weight": W(vcfg.hidden_size, vcfg.hidden_size),
                f"{p}.self_attn.projection.bias": W(vcfg.hidden_size),
                f"{p}.layer_norm2.weight": W(vcfg.hidden_size),
                f"{p}.layer_norm2.bias": W(vcfg.hidden_size),
                f"{p}.mlp.fc1.weight": W(vcfg.intermediate_size, vcfg.hidden_size),
                f"{p}.mlp.fc1.bias": W(vcfg.intermediate_size),
                f"{p}.mlp.fc2.weight": W(vcfg.hidden_size, vcfg.intermediate_size),
                f"{p}.mlp.fc2.bias": W(vcfg.hidden_size),
            })
        for i in range(qcfg.num_layers):
            p = f"qformer.encoder.layer.{i}"
            for blk in ("attention.attention", "crossattention.attention")[: 2 if i % qcfg.cross_attention_frequency == 0 else 1]:
                kv_dim = qcfg.encoder_hidden_size if "cross" in blk else qcfg.hidden_size
                sd.update({
                    f"{p}.{blk}.query.weight": W(qcfg.hidden_size, qcfg.hidden_size),
                    f"{p}.{blk}.query.bias": W(qcfg.hidden_size),
                    f"{p}.{blk}.key.weight": W(qcfg.hidden_size, kv_dim),
                    f"{p}.{blk}.key.bias": W(qcfg.hidden_size),
                    f"{p}.{blk}.value.weight": W(qcfg.hidden_size, kv_dim),
                    f"{p}.{blk}.value.bias": W(qcfg.hidden_size),
                })
                out_p = p + ("." + blk.split(".")[0] if True else "")
                sd.update({
                    f"{out_p}.output.dense.weight": W(qcfg.hidden_size, qcfg.hidden_size),
                    f"{out_p}.output.dense.bias": W(qcfg.hidden_size),
                    f"{out_p}.output.LayerNorm.weight": W(qcfg.hidden_size),
                    f"{out_p}.output.LayerNorm.bias": W(qcfg.hidden_size),
                })
            sd.update({
                f"{p}.intermediate_query.dense.weight": W(qcfg.intermediate_size, qcfg.hidden_size),
                f"{p}.intermediate_query.dense.bias": W(qcfg.intermediate_size),
                f"{p}.output_query.dense.weight": W(qcfg.hidden_size, qcfg.intermediate_size),
                f"{p}.output_query.dense.bias": W(qcfg.hidden_size),
                f"{p}.output_query.LayerNorm.weight": W(qcfg.hidden_size),
                f"{p}.output_query.LayerNorm.bias": W(qcfg.hidden_size),
            })

        converted = convert_blip2_state_dict(sd)
        # same tree structure as a fresh init
        ref_paths = {jax.tree_util.keystr(p) for p, _ in jax.tree_util.tree_flatten_with_path(ref)[0]}
        conv_paths = {jax.tree_util.keystr(p) for p, _ in jax.tree_util.tree_flatten_with_path(converted)[0]}
        assert ref_paths == conv_paths
        # shapes line up and the model runs
        for (pa, a), (pb, b) in zip(
            sorted(jax.tree_util.tree_flatten_with_path(ref)[0], key=lambda t: jax.tree_util.keystr(t[0])),
            sorted(jax.tree_util.tree_flatten_with_path(converted)[0], key=lambda t: jax.tree_util.keystr(t[0])),
        ):
            assert np.shape(a) == np.shape(b), jax.tree_util.keystr(pa)
        imgs2 = jnp.asarray(np.random.default_rng(1).normal(size=(2, 28, 28, 3)).astype(np.float32))
        out = jax.jit(model.apply)(converted, imgs2)
        assert out.shape == (2, qcfg.num_query_tokens, qcfg.hidden_size)
