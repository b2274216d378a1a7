"""Legacy grounding stack: BERT encoder, spatial cross encoders, heads —
shape contracts, registries, BERT weight conversion, end-to-end loss wiring
(reference modules/language/bert.py, modules/grounding/unified_encoder.py,
modules/heads/*)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from msr3d_tpu.nn.grounding import (
    UnifiedSpatialCrossEncoderV2,
    BERTLanguageEncoder,
    EntitySpatialCrossEncoder,
    GroundHeadV1,
    PretrainHeadV1,
    QAHeadV1,
    UnifiedSpatialCrossEncoderV1,
    convert_bert_state_dict,
)
from msr3d_tpu.registry import GROUNDING_REGISTRY, HEADS_REGISTRY, LANGUAGE_REGISTRY

B, T, O, H = 2, 12, 7, 64


@pytest.fixture(scope="module")
def streams():
    rng = np.random.default_rng(0)
    return {
        "txt_embeds": jnp.asarray(rng.normal(size=(B, T, H)), jnp.float32),
        "txt_masks": jnp.asarray(
            np.concatenate([np.ones((B, T - 2)), np.zeros((B, 2))], 1), jnp.int32
        ),
        "obj_embeds": jnp.asarray(rng.normal(size=(B, O, H)), jnp.float32),
        "obj_locs": jnp.asarray(rng.normal(size=(B, O, 6)), jnp.float32),
        "obj_masks": jnp.asarray(np.concatenate([np.ones((B, O - 1)), np.zeros((B, 1))], 1), jnp.int32),
    }


class TestRegistries:
    def test_names(self):
        assert LANGUAGE_REGISTRY.get("BERTLanguageEncoder") is BERTLanguageEncoder
        assert GROUNDING_REGISTRY.get("EntitySpatialCrossEncoder") is EntitySpatialCrossEncoder
        assert GROUNDING_REGISTRY.get("UnifiedSpatialCrossEncoderV1") is UnifiedSpatialCrossEncoderV1
        assert HEADS_REGISTRY.get("GroundHeadV1") is GroundHeadV1
        assert HEADS_REGISTRY.get("QAHeadV1") is QAHeadV1
        assert HEADS_REGISTRY.get("PretrainHeadV1") is PretrainHeadV1


class TestBert:
    def test_forward_shape(self):
        m = BERTLanguageEncoder(hidden_size=H, num_hidden_layers=2, num_attention_heads=4)
        ids = jnp.asarray(np.random.default_rng(0).integers(0, 30522, (B, T)))
        masks = jnp.ones((B, T), jnp.int32)
        v = m.init(jax.random.key(0), ids, masks)
        out = m.apply(v, ids, masks)
        assert out.shape == (B, T, H)

    def test_hf_conversion_matches_transformers(self):
        """Converted weights reproduce HF BertModel hidden states."""
        torch = pytest.importorskip("torch")
        from transformers import BertConfig, BertModel

        cfg = BertConfig(
            vocab_size=128, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=128,
            max_position_embeddings=64, type_vocab_size=2,
            hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        )
        hf = BertModel(cfg).eval()
        ids_np = np.random.default_rng(0).integers(0, 128, (B, T))
        with torch.no_grad():
            want = hf(torch.as_tensor(ids_np), torch.ones(B, T, dtype=torch.long))
        m = BERTLanguageEncoder(
            hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
            vocab_size=128, max_position_embeddings=64, dropout=0.0,
        )
        variables = convert_bert_state_dict(hf.state_dict(), num_layers=2)
        got = m.apply(variables, jnp.asarray(ids_np), jnp.ones((B, T), jnp.int32))
        np.testing.assert_allclose(
            np.asarray(got), want.last_hidden_state.numpy(), atol=2e-5
        )


class TestEncoders:
    @pytest.mark.parametrize(
        "cls",
        [EntitySpatialCrossEncoder, UnifiedSpatialCrossEncoderV1,
         UnifiedSpatialCrossEncoderV2],
    )
    def test_shapes(self, cls, streams):
        m = cls(hidden_size=H, num_attention_heads=4, num_layers=2)
        v = m.init(jax.random.key(0), **streams)
        txt, obj = m.apply(v, **streams)
        assert txt.shape == (B, T, H)
        assert obj.shape == (B, O, H)
        assert np.isfinite(np.asarray(obj)).all()


class TestUnifiedV2:
    def test_registered(self):
        assert (
            GROUNDING_REGISTRY.get("UnifiedSpatialCrossEncoderV2")
            is UnifiedSpatialCrossEncoderV2
        )

    def test_padding_invariance(self, streams):
        """Padded txt/obj rows never influence the valid rows' outputs
        (the joint-sequence mask, unified_encoder.py:168-176)."""
        m = UnifiedSpatialCrossEncoderV2(hidden_size=H, num_attention_heads=4, num_layers=2)
        v = m.init(jax.random.key(0), **streams)
        txt1, obj1 = m.apply(v, **streams)
        mutated = dict(streams)
        txt = np.asarray(streams["txt_embeds"]).copy()
        txt[:, -2:] += 37.0  # masked positions (last 2 txt are padding)
        obj = np.asarray(streams["obj_embeds"]).copy()
        obj[:, -1:] -= 11.0  # masked object
        mutated["txt_embeds"] = jnp.asarray(txt)
        mutated["obj_embeds"] = jnp.asarray(obj)
        txt2, obj2 = m.apply(v, **mutated)
        T_valid, O_valid = txt1.shape[1] - 2, obj1.shape[1] - 1
        np.testing.assert_allclose(
            np.asarray(txt1)[:, :T_valid], np.asarray(txt2)[:, :T_valid], atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(obj1)[:, :O_valid], np.asarray(obj2)[:, :O_valid], atol=1e-5
        )

    def test_token_type_embeddings_distinguish_streams(self, streams):
        """Zeroing the type table changes outputs (it is actually applied)."""
        m = UnifiedSpatialCrossEncoderV2(hidden_size=H, num_attention_heads=4, num_layers=1)
        v = m.init(jax.random.key(0), **streams)
        txt1, _ = m.apply(v, **streams)
        import jax as _jax

        v2 = _jax.tree_util.tree_map(lambda x: x, v)
        flat = v2["params"]["token_type_embeddings"]["embedding"]
        v2["params"]["token_type_embeddings"]["embedding"] = jnp.zeros_like(flat)
        txt2, _ = m.apply(v2, **streams)
        assert not np.allclose(np.asarray(txt1), np.asarray(txt2))


class TestHeads:
    def test_ground_head(self, streams):
        m = GroundHeadV1(input_size=H, hidden_size=H, sem_cls_size=20)
        v = m.init(
            jax.random.key(0),
            streams["txt_embeds"], streams["obj_embeds"],
            streams["obj_embeds"], streams["obj_masks"],
        )
        txt_cls, obj_cls, obj_cls_pre, og3d = m.apply(
            v, streams["txt_embeds"], streams["obj_embeds"],
            streams["obj_embeds"], streams["obj_masks"],
        )
        assert txt_cls.shape == (B, 20)
        assert obj_cls.shape == (B, O, 20)
        assert obj_cls_pre.shape == (B, O, 20)
        assert og3d.shape == (B, O)
        # padded object slot masked to -inf
        assert np.isneginf(np.asarray(og3d)[:, -1]).all()

    def test_qa_head(self, streams):
        m = QAHeadV1(hidden_size=H, num_answers=33, flat_out_size=48, mlp_size=24)
        v = m.init(
            jax.random.key(0),
            streams["obj_embeds"], streams["obj_masks"],
            streams["txt_embeds"], streams["txt_masks"],
        )
        scores = m.apply(
            v, streams["obj_embeds"], streams["obj_masks"],
            streams["txt_embeds"], streams["txt_masks"],
        )
        assert scores.shape == (B, 33)

    def test_pretrain_head(self, streams):
        m = PretrainHeadV1(hidden_size=H, vocab_size=100)
        v = m.init(jax.random.key(0), streams["txt_embeds"])
        logits = m.apply(v, streams["txt_embeds"])
        assert logits.shape == (B, T, 100)


class TestEndToEndLossWiring:
    def test_grounding_pipeline_losses(self, streams):
        """encoder → heads → get_losses with the reference key names."""
        from msr3d_tpu.optim.losses import get_losses

        enc = EntitySpatialCrossEncoder(hidden_size=H, num_attention_heads=4, num_layers=1)
        ve = enc.init(jax.random.key(0), **streams)
        txt, obj = enc.apply(ve, **streams)

        head = GroundHeadV1(input_size=H, hidden_size=H, sem_cls_size=20)
        vh = head.init(jax.random.key(1), txt, obj, streams["obj_embeds"], streams["obj_masks"])
        txt_cls, obj_cls, obj_cls_pre, og3d = head.apply(
            vh, txt, obj, streams["obj_embeds"], streams["obj_masks"]
        )

        rng = np.random.default_rng(0)
        data_dict = {
            "og3d_logits": og3d,
            "tgt_object_id": jnp.asarray(rng.integers(0, O - 1, (B, 1))),
            "txt_cls_logits": txt_cls,
            "tgt_object_label": jnp.asarray(rng.integers(0, 20, (B, 1))),
            "obj_cls_post_logits": obj_cls,
            "obj_cls_pre_logits": obj_cls_pre,
            "obj_labels": jnp.asarray(rng.integers(0, 20, (B, O))),
            "obj_masks": jnp.asarray(streams["obj_masks"], jnp.float32),
        }
        total, all_losses = get_losses(
            data_dict,
            ["og3d_loss", "txt_cls_loss", "obj_cls_pre_loss", "obj_cls_post_loss"],
            ["og3d_loss", "txt_cls_loss", "obj_cls_pre_loss", "obj_cls_post_loss"],
        )
        assert np.isfinite(float(total))
