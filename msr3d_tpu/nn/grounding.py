"""Legacy grounding stack: BERT text encoder, spatial cross encoders, and
the grounding/QA/pretrain heads (reference modules/language/bert.py:7-26,
modules/grounding/unified_encoder.py:12-119, modules/heads/
grounding_head.py:7-39, qa_head.py:72-96, pretrain_head.py:35-42).

This is the pre-LEO referring/QA pipeline: PcdObjEncoder object features +
BERT text features → spatial cross encoder → heads whose output keys feed
``optim/losses.py`` (og3d_logits, txt_cls_logits, obj_cls_*_logits,
answer_scores, txt_lm_cls_logits). Unused by the shipped MSR3D configs but
part of the reference's public surface; registered under the same names.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from msr3d_tpu.nn.layers import MLPHead, AttFlat
from msr3d_tpu.nn.transformers import (
    FeedForward,
    MultiHeadAttention,
    MultiHeadAttentionSpatial,
    TransformerEncoderLayer,
)
from msr3d_tpu.ops.geometry import calc_pairwise_locs
from msr3d_tpu.registry import GROUNDING_REGISTRY, HEADS_REGISTRY, LANGUAGE_REGISTRY


# ---------------------------------------------------------------------------
# BERT text encoder (modules/language/bert.py:7-26): a truncated BertModel
# (3 layers by default) over the wrapper's txt_ids/txt_masks.


class BertLayer(nn.Module):
    hidden_size: int
    num_heads: int
    intermediate_size: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, key_padding_mask=None, *, deterministic: bool = True):
        attn_out, _ = MultiHeadAttention(
            self.hidden_size, self.num_heads, self.dropout, name="attention"
        )(x, x, x, key_padding_mask=key_padding_mask, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=1e-12, name="attn_norm")(
            x + nn.Dropout(self.dropout)(attn_out, deterministic=deterministic)
        )
        h = nn.Dense(self.intermediate_size, name="intermediate")(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.hidden_size, name="output")(h)
        return nn.LayerNorm(epsilon=1e-12, name="ffn_norm")(
            x + nn.Dropout(self.dropout)(h, deterministic=deterministic)
        )


@LANGUAGE_REGISTRY.register(name="BERTLanguageEncoder")
class BERTLanguageEncoder(nn.Module):
    """Truncated BERT (bert.py:7-26): word+pos+type embeddings, post-LN
    layers. Pretrained weights convert from a local HF BERT checkpoint via
    ``convert_bert_state_dict``; random init otherwise (zero-egress)."""

    hidden_size: int = 768
    num_hidden_layers: int = 3
    num_attention_heads: int = 12
    vocab_size: int = 30522
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    dropout: float = 0.1

    @nn.compact
    def __call__(self, txt_ids, txt_masks, *, deterministic: bool = True):
        b, t = txt_ids.shape
        word = nn.Embed(self.vocab_size, self.hidden_size, name="word_embeddings")(
            txt_ids
        )
        pos = nn.Embed(
            self.max_position_embeddings, self.hidden_size, name="position_embeddings"
        )(jnp.arange(t)[None, :])
        typ = nn.Embed(self.type_vocab_size, self.hidden_size, name="token_type_embeddings")(
            jnp.zeros((b, t), jnp.int32)
        )
        x = nn.LayerNorm(epsilon=1e-12, name="embeddings_norm")(word + pos + typ)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        pad = ~txt_masks.astype(bool)
        for i in range(self.num_hidden_layers):
            x = BertLayer(
                self.hidden_size,
                self.num_attention_heads,
                4 * self.hidden_size,
                self.dropout,
                name=f"layer_{i}",
            )(x, key_padding_mask=pad, deterministic=deterministic)
        return x


def convert_bert_state_dict(sd, num_layers: int):
    """HF BertModel state dict → flax params for ``BERTLanguageEncoder``."""
    import numpy as np

    def _np(t):
        return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)

    def dense(p):
        return {"kernel": _np(sd[f"{p}.weight"]).T, "bias": _np(sd[f"{p}.bias"])}

    def ln(p):
        return {"scale": _np(sd[f"{p}.weight"]), "bias": _np(sd[f"{p}.bias"])}

    pre = "bert." if any(k.startswith("bert.") for k in sd) else ""
    params = {
        "word_embeddings": {"embedding": _np(sd[f"{pre}embeddings.word_embeddings.weight"])},
        "position_embeddings": {"embedding": _np(sd[f"{pre}embeddings.position_embeddings.weight"])},
        "token_type_embeddings": {"embedding": _np(sd[f"{pre}embeddings.token_type_embeddings.weight"])},
        "embeddings_norm": ln(f"{pre}embeddings.LayerNorm"),
    }
    for i in range(num_layers):
        p = f"{pre}encoder.layer.{i}"
        params[f"layer_{i}"] = {
            "attention": {
                "q_proj": dense(f"{p}.attention.self.query"),
                "k_proj": dense(f"{p}.attention.self.key"),
                "v_proj": dense(f"{p}.attention.self.value"),
                "out_proj": dense(f"{p}.attention.output.dense"),
            },
            "attn_norm": ln(f"{p}.attention.output.LayerNorm"),
            "intermediate": dense(f"{p}.intermediate.dense"),
            "output": dense(f"{p}.output.dense"),
            "ffn_norm": ln(f"{p}.output.LayerNorm"),
        }
    return {"params": params}


# ---------------------------------------------------------------------------
# decoder layers (modules/layers/transformers.py:76-122, 255-295): PRE-norm,
# externally-managed residuals (unlike the post-norm encoder layers).


class TransformerDecoderLayer(nn.Module):
    d_model: int
    nhead: int
    dim_feedforward: int = 2048
    dropout: float = 0.1
    activation: str = "relu"

    @nn.compact
    def __call__(
        self,
        tgt,
        memory,
        tgt_key_padding_mask=None,
        memory_key_padding_mask=None,
        *,
        deterministic: bool = True,
    ):
        drop = nn.Dropout(self.dropout)
        tgt2 = nn.LayerNorm(epsilon=1e-5, name="norm1")(tgt)
        tgt2, self_w = MultiHeadAttention(
            self.d_model, self.nhead, self.dropout, name="self_attn"
        )(tgt2, tgt2, tgt2, key_padding_mask=tgt_key_padding_mask, deterministic=deterministic)
        tgt = tgt + drop(tgt2, deterministic=deterministic)
        tgt2 = nn.LayerNorm(epsilon=1e-5, name="norm2")(tgt)
        tgt2, cross_w = MultiHeadAttention(
            self.d_model, self.nhead, self.dropout, name="multihead_attn"
        )(tgt2, memory, memory, key_padding_mask=memory_key_padding_mask, deterministic=deterministic)
        tgt = tgt + drop(tgt2, deterministic=deterministic)
        tgt2 = nn.LayerNorm(epsilon=1e-5, name="norm3")(tgt)
        tgt2 = FeedForward(
            self.d_model, self.dim_feedforward, self.dropout, self.activation, name="ffn"
        )(tgt2, deterministic=deterministic)
        tgt = tgt + drop(tgt2, deterministic=deterministic)
        return tgt, self_w, cross_w


class TransformerSpatialDecoderLayer(nn.Module):
    """Pre-norm decoder whose self-attention is the spatial fusion attention
    (transformers.py:255-295). The spatial attention applies its own inner
    residual+LN (as in the reference), then the outer residual adds on top."""

    d_model: int
    nhead: int
    dim_feedforward: int = 2048
    dropout: float = 0.1
    activation: str = "gelu"
    spatial_multihead: bool = True
    spatial_dim: int = 5
    spatial_attn_fusion: str = "cond"

    @nn.compact
    def __call__(
        self,
        tgt,
        memory,
        tgt_pairwise_locs,
        tgt_key_padding_mask=None,
        memory_key_padding_mask=None,
        *,
        deterministic: bool = True,
    ):
        drop = nn.Dropout(self.dropout)
        tgt2 = nn.LayerNorm(epsilon=1e-5, name="norm1")(tgt)
        tgt2, self_w = MultiHeadAttentionSpatial(
            self.d_model,
            self.nhead,
            dropout=self.dropout,
            spatial_multihead=self.spatial_multihead,
            spatial_dim=self.spatial_dim,
            spatial_attn_fusion=self.spatial_attn_fusion,
            name="self_attn",
        )(
            tgt2, tgt2, tgt2, tgt_pairwise_locs,
            key_padding_mask=tgt_key_padding_mask, deterministic=deterministic,
        )
        tgt = tgt + drop(tgt2, deterministic=deterministic)
        tgt2 = nn.LayerNorm(epsilon=1e-5, name="norm2")(tgt)
        tgt2, cross_w = MultiHeadAttention(
            self.d_model, self.nhead, self.dropout, name="multihead_attn"
        )(tgt2, memory, memory, key_padding_mask=memory_key_padding_mask, deterministic=deterministic)
        tgt = tgt + drop(tgt2, deterministic=deterministic)
        tgt2 = nn.LayerNorm(epsilon=1e-5, name="norm3")(tgt)
        tgt2 = FeedForward(
            self.d_model, self.dim_feedforward, self.dropout, self.activation, name="ffn"
        )(tgt2, deterministic=deterministic)
        tgt = tgt + drop(tgt2, deterministic=deterministic)
        return tgt, self_w, cross_w


class _LocLayer(nn.Module):
    hidden_size: int

    @nn.compact
    def __call__(self, obj_locs):
        h = nn.Dense(self.hidden_size, name="dense")(obj_locs)
        return nn.LayerNorm(epsilon=1e-5, name="norm")(h)


@GROUNDING_REGISTRY.register(name="EntitySpatialCrossEncoder")
class EntitySpatialCrossEncoder(nn.Module):
    """Objects attend spatially among themselves and cross-attend to frozen
    text features (unified_encoder.py:12-58)."""

    hidden_size: int = 768
    num_attention_heads: int = 12
    spatial_dim: int = 5
    num_layers: int = 4
    dim_loc: int = 6
    pairwise_rel_type: str = "center"

    @nn.compact
    def __call__(
        self, txt_embeds, txt_masks, obj_embeds, obj_locs, obj_masks,
        *, deterministic: bool = True,
    ):
        pairwise_locs = calc_pairwise_locs(
            obj_locs[:, :, :3], obj_locs[:, :, 3:],
            pairwise_rel_type=self.pairwise_rel_type,
        )
        loc_layer = _LocLayer(self.hidden_size, name="loc_layer")
        out = obj_embeds
        for i in range(self.num_layers):
            out = out + loc_layer(obj_locs)
            out, _, _ = TransformerSpatialDecoderLayer(
                self.hidden_size, self.num_attention_heads,
                spatial_dim=self.spatial_dim, name=f"layer_{i}",
            )(
                out, txt_embeds, pairwise_locs,
                tgt_key_padding_mask=~obj_masks.astype(bool),
                memory_key_padding_mask=~txt_masks.astype(bool),
                deterministic=deterministic,
            )
        return txt_embeds, out


@GROUNDING_REGISTRY.register(name="UnifiedSpatialCrossEncoderV1")
class UnifiedSpatialCrossEncoderV1(nn.Module):
    """Interleaved object/text streams: each block runs a spatial decoder
    over objects (cross to text) and a plain decoder over text (cross to
    objects) (unified_encoder.py:60-119)."""

    hidden_size: int = 768
    num_attention_heads: int = 12
    spatial_dim: int = 5
    num_layers: int = 4
    dim_loc: int = 6
    pairwise_rel_type: str = "center"

    @nn.compact
    def __call__(
        self, txt_embeds, txt_masks, obj_embeds, obj_locs, obj_masks,
        *, deterministic: bool = True,
    ):
        pairwise_locs = calc_pairwise_locs(
            obj_locs[:, :, :3], obj_locs[:, :, 3:],
            pairwise_rel_type=self.pairwise_rel_type,
        )
        obj_pad = ~obj_masks.astype(bool)
        txt_pad = ~txt_masks.astype(bool)
        loc_layer = _LocLayer(self.hidden_size, name="loc_layer")
        for i in range(self.num_layers):
            obj_in = obj_embeds + loc_layer(obj_locs)
            obj_out, _, _ = TransformerSpatialDecoderLayer(
                self.hidden_size, self.num_attention_heads,
                spatial_dim=self.spatial_dim, name=f"pc_layer_{i}",
            )(
                obj_in, txt_embeds, pairwise_locs,
                tgt_key_padding_mask=obj_pad, memory_key_padding_mask=txt_pad,
                deterministic=deterministic,
            )
            txt_out, _, _ = TransformerDecoderLayer(
                self.hidden_size, self.num_attention_heads, name=f"lang_layer_{i}"
            )(
                txt_embeds, obj_in,
                tgt_key_padding_mask=txt_pad, memory_key_padding_mask=obj_pad,
                deterministic=deterministic,
            )
            obj_embeds, txt_embeds = obj_out, txt_out
        return txt_embeds, obj_embeds


@GROUNDING_REGISTRY.register(name="UnifiedSpatialCrossEncoderV2")
class UnifiedSpatialCrossEncoderV2(nn.Module):
    """Word-token-fused variant (unified_encoder.py:121-186): per block,
    objects gain loc + token-type(1) embeddings and text gains the
    token-type(0) embedding, then both streams concatenate into ONE joint
    sequence through a plain encoder layer and split back.  Unlike V1 there
    is no spatial-geometry attention — fusion is pure self-attention over
    the joint sequence."""

    hidden_size: int = 768
    num_attention_heads: int = 12
    num_layers: int = 4
    dim_loc: int = 6

    @nn.compact
    def __call__(
        self, txt_embeds, txt_masks, obj_embeds, obj_locs, obj_masks,
        *, deterministic: bool = True,
    ):
        txt_len = txt_embeds.shape[1]
        loc_layer = _LocLayer(self.hidden_size, name="loc_layer")
        type_emb = nn.Embed(2, self.hidden_size, name="token_type_embeddings")
        joint_pad = ~jnp.concatenate(
            [txt_masks.astype(bool), obj_masks.astype(bool)], axis=1
        )
        obj_type = type_emb(jnp.ones(obj_embeds.shape[:2], jnp.int32))
        txt_type = type_emb(jnp.zeros(txt_embeds.shape[:2], jnp.int32))
        for i in range(self.num_layers):
            obj_in = obj_embeds + loc_layer(obj_locs) + obj_type
            txt_in = txt_embeds + txt_type
            joint = jnp.concatenate([txt_in, obj_in], axis=1)
            joint, _ = TransformerEncoderLayer(
                self.hidden_size, self.num_attention_heads, name=f"layer_{i}"
            )(joint, tgt_key_padding_mask=joint_pad, deterministic=deterministic)
            txt_embeds = joint[:, :txt_len]
            obj_embeds = joint[:, txt_len:]
        return txt_embeds, obj_embeds


# ---------------------------------------------------------------------------
# heads


@HEADS_REGISTRY.register(name="GroundHeadV1")
class GroundHeadV1(nn.Module):
    """og3d + txt-cls + obj-cls(pre/post) heads (grounding_head.py:7-39)."""

    input_size: int = 768
    hidden_size: int = 768
    sem_cls_size: int = 607
    dropout: float = 0.3
    detach_all_aux_loss: bool = False

    @nn.compact
    def __call__(
        self, txt_embeds, obj_embeds, obj_pre_embeds, obj_masks,
        *, deterministic: bool = True,
    ):
        og3d = MLPHead(self.hidden_size, 1, dropout=self.dropout, name="og3d_head")(
            obj_embeds, deterministic=deterministic
        )[..., 0]
        og3d = jnp.where(obj_masks.astype(bool), og3d, -jnp.inf)
        if self.detach_all_aux_loss:
            txt_embeds = jax.lax.stop_gradient(txt_embeds)
            obj_embeds = jax.lax.stop_gradient(obj_embeds)
            obj_pre_embeds = jax.lax.stop_gradient(obj_pre_embeds)
        txt_cls = MLPHead(
            self.hidden_size, self.sem_cls_size, dropout=self.dropout, name="txt_clf_head"
        )(txt_embeds[:, 0], deterministic=deterministic)
        obj_cls = MLPHead(
            self.hidden_size, self.sem_cls_size, dropout=self.dropout, name="obj3d_clf_head"
        )(obj_embeds, deterministic=deterministic)
        obj_cls_pre = MLPHead(
            self.hidden_size, self.sem_cls_size, dropout=self.dropout,
            name="obj3d_clf_pre_head",
        )(obj_pre_embeds, deterministic=deterministic)
        return txt_cls, obj_cls, obj_cls_pre, og3d


@HEADS_REGISTRY.register(name="QAHeadV1")
class QAHeadV1(nn.Module):
    """AttFlat fusion over both streams → answer-vocab scores
    (qa_head.py:72-96)."""

    hidden_size: int = 768
    mlp_size: int = 256
    glimpse: int = 1
    flat_out_size: int = 512
    num_answers: int = 8864
    dropout: float = 0.3

    @nn.compact
    def __call__(self, obj_embeds, obj_masks, txt_embeds, txt_masks, *, deterministic=True):
        vis, _ = AttFlat(
            flat_mlp_size=self.mlp_size, flat_glimpses=self.glimpse,
            flat_out_size=self.flat_out_size, pdrop=0.1, name="attflat_visual",
        )(obj_embeds, ~obj_masks.astype(bool), deterministic=deterministic)
        lang, _ = AttFlat(
            flat_mlp_size=self.mlp_size, flat_glimpses=self.glimpse,
            flat_out_size=self.flat_out_size, pdrop=0.1, name="attflat_lang",
        )(txt_embeds, ~txt_masks.astype(bool), deterministic=deterministic)
        fused = nn.LayerNorm(epsilon=1e-5, name="fusion_norm")(vis + lang)
        h = nn.Dense(self.hidden_size, name="answer_fc1")(fused)
        h = nn.gelu(h, approximate=False)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return nn.Dense(self.num_answers, name="answer_fc2")(h)


@HEADS_REGISTRY.register(name="PretrainHeadV1")
class PretrainHeadV1(nn.Module):
    """BERT LM prediction head over text features (pretrain_head.py:8-42)."""

    hidden_size: int = 768
    vocab_size: int = 30522

    @nn.compact
    def __call__(self, txt_embeds, **_):
        h = nn.Dense(self.hidden_size, name="transform_dense")(txt_embeds)
        h = nn.gelu(h, approximate=False)
        h = nn.LayerNorm(epsilon=1e-5, name="transform_norm")(h)
        logits = nn.Dense(self.vocab_size, use_bias=False, name="decoder")(h)
        bias = self.param("bias", nn.initializers.zeros, (self.vocab_size,))
        return logits + bias
