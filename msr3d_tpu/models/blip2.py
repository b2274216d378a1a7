"""BLIP-2 image backbone in flax (reference modules/vision/timm.py:121-149).

The reference wraps HF ``Blip2Model``: an EVA-CLIP ViT vision tower plus a
Q-Former whose 32 learnable query tokens cross-attend to the frozen patch
features, yielding (B, 32, 768) image tokens. Here both towers are native
flax modules (NHWC patch embed; fused QKV projections keep the matmuls MXU-
sized) with configs mirroring HF ``Blip2VisionConfig`` / ``Blip2QFormerConfig``
defaults; pretrained weights convert from a local HF checkpoint via
``convert_blip2_state_dict`` (no network fetch — zero-egress).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from msr3d_tpu.registry import VISION_REGISTRY


@dataclasses.dataclass(frozen=True)
class Blip2VisionConfig:
    """EVA-CLIP-g tower (HF Blip2VisionConfig defaults)."""

    image_size: int = 224
    patch_size: int = 14
    hidden_size: int = 1408
    intermediate_size: int = 6144
    num_layers: int = 39
    num_heads: int = 16
    layer_norm_eps: float = 1e-6
    qkv_bias: bool = True

    @staticmethod
    def tiny():
        return Blip2VisionConfig(
            image_size=28, patch_size=14, hidden_size=32,
            intermediate_size=64, num_layers=2, num_heads=4,
        )


@dataclasses.dataclass(frozen=True)
class Blip2QFormerConfig:
    """BERT-style Q-Former (HF Blip2QFormerConfig defaults)."""

    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    cross_attention_frequency: int = 2
    encoder_hidden_size: int = 1408
    num_query_tokens: int = 32
    layer_norm_eps: float = 1e-12

    @staticmethod
    def tiny(encoder_hidden_size: int = 32):
        return Blip2QFormerConfig(
            hidden_size=16, num_layers=2, num_heads=4, intermediate_size=32,
            encoder_hidden_size=encoder_hidden_size, num_query_tokens=8,
        )


class _ViTBlock(nn.Module):
    cfg: Blip2VisionConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, name="norm1")(x)
        qkv = nn.Dense(3 * c.hidden_size, use_bias=c.qkv_bias, name="qkv")(h)
        b, n, _ = h.shape
        q, k, v = jnp.split(qkv.reshape(b, n, 3, c.num_heads, -1), 3, axis=2)
        q, k, v = (t[:, :, 0].transpose(0, 2, 1, 3) for t in (q, k, v))
        attn = jax.nn.softmax(
            jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(q.shape[-1]), axis=-1
        )
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v).transpose(0, 2, 1, 3).reshape(b, n, -1)
        x = x + nn.Dense(c.hidden_size, name="proj")(out)
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, name="norm2")(x)
        h = nn.Dense(c.intermediate_size, name="fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(c.hidden_size, name="fc2")(h)
        return x + h


class Blip2VisionModel(nn.Module):
    """Patch embed + cls token + learned positions + pre-LN ViT stack
    (HF Blip2VisionModel structure)."""

    cfg: Blip2VisionConfig

    @nn.compact
    def __call__(self, images):  # (B, H, W, 3) NHWC
        c = self.cfg
        x = nn.Conv(
            c.hidden_size, (c.patch_size, c.patch_size),
            strides=c.patch_size, padding="VALID", name="patch_embed",
        )(images)
        b, h, w, _ = x.shape
        x = x.reshape(b, h * w, c.hidden_size)
        cls = self.param("class_embedding", nn.initializers.normal(0.02), (c.hidden_size,))
        x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, c.hidden_size)), x], axis=1)
        pos = self.param(
            "position_embedding", nn.initializers.normal(0.02),
            ((c.image_size // c.patch_size) ** 2 + 1, c.hidden_size),
        )
        x = x + pos[None, : x.shape[1]]
        for i in range(c.num_layers):
            x = _ViTBlock(c, name=f"layer_{i}")(x)
        return nn.LayerNorm(epsilon=c.layer_norm_eps, name="post_layernorm")(x)


class _QFormerAttention(nn.Module):
    """BERT-style post-LN (cross-)attention: dense + residual + LN."""

    cfg: Blip2QFormerConfig
    cross: bool = False

    @nn.compact
    def __call__(self, x, kv):
        c = self.cfg
        d_head = c.hidden_size // c.num_heads
        q = nn.Dense(c.hidden_size, name="query")(x)
        k = nn.Dense(c.hidden_size, name="key")(kv)
        v = nn.Dense(c.hidden_size, name="value")(kv)
        b, nq, _ = q.shape
        nk = k.shape[1]
        q = q.reshape(b, nq, c.num_heads, d_head).transpose(0, 2, 1, 3)
        k = k.reshape(b, nk, c.num_heads, d_head).transpose(0, 2, 1, 3)
        v = v.reshape(b, nk, c.num_heads, d_head).transpose(0, 2, 1, 3)
        attn = jax.nn.softmax(
            jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(d_head), axis=-1
        )
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v).transpose(0, 2, 1, 3).reshape(b, nq, -1)
        out = nn.Dense(c.hidden_size, name="output")(out)
        return nn.LayerNorm(epsilon=c.layer_norm_eps, name="output_norm")(x + out)


class _QFormerLayer(nn.Module):
    cfg: Blip2QFormerConfig
    has_cross: bool

    @nn.compact
    def __call__(self, x, encoder_states):
        c = self.cfg
        x = _QFormerAttention(c, name="self_attn")(x, x)
        if self.has_cross:
            # encoder states are wider (vision hidden) — key/value project down
            x = _QFormerAttention(c, cross=True, name="cross_attn")(x, encoder_states)
        h = nn.Dense(c.intermediate_size, name="intermediate")(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(c.hidden_size, name="ffn_output")(h)
        return nn.LayerNorm(epsilon=c.layer_norm_eps, name="ffn_norm")(x + h)


class Blip2QFormerModel(nn.Module):
    """Query tokens cross-attend to encoder states every
    ``cross_attention_frequency`` layers (HF Blip2QFormerModel)."""

    cfg: Blip2QFormerConfig

    @nn.compact
    def __call__(self, query_embeds, encoder_hidden_states):
        c = self.cfg
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="input_norm")(query_embeds)
        for i in range(c.num_layers):
            x = _QFormerLayer(
                c, has_cross=(i % c.cross_attention_frequency == 0), name=f"layer_{i}"
            )(x, encoder_hidden_states)
        return x


@VISION_REGISTRY.register(name="BLIP2Backbone")
class BLIP2Backbone(nn.Module):
    """Frozen BLIP-2 vision tower + Q-Former → (B, 32, 768) image tokens
    (reference timm.py:121-149; out_channels 768)."""

    vision_cfg: Blip2VisionConfig = Blip2VisionConfig()
    qformer_cfg: Blip2QFormerConfig = Blip2QFormerConfig()
    freeze: bool = True

    @property
    def out_channels(self) -> int:
        return self.qformer_cfg.hidden_size

    @nn.compact
    def __call__(self, images):  # (B, H, W, 3) → (B, num_query_tokens, hidden)
        image_embs = Blip2VisionModel(self.vision_cfg, name="vision_model")(images)
        queries = self.param(
            "query_tokens",
            nn.initializers.uniform(scale=1.0),  # HF inits U(-.5,.5); scale irrelevant for converted weights
            (1, self.qformer_cfg.num_query_tokens, self.qformer_cfg.hidden_size),
        )
        out = Blip2QFormerModel(self.qformer_cfg, name="qformer")(
            jnp.broadcast_to(queries, (images.shape[0],) + queries.shape[1:]),
            image_embs,
        )
        if self.freeze:
            out = jax.lax.stop_gradient(out)
        return out


def convert_blip2_state_dict(sd: Dict[str, Any]) -> Dict[str, Any]:
    """HF Blip2Model state dict (vision_model + qformer + query_tokens) →
    flax params for ``BLIP2Backbone``. Torch Linear kernels transpose;
    the fused ViT qkv keeps HF's (q,k,v) row order."""
    import numpy as np

    def _np(t):
        return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)

    def dense(prefix):
        out = {"kernel": _np(sd[f"{prefix}.weight"]).T}
        if f"{prefix}.bias" in sd:
            out["bias"] = _np(sd[f"{prefix}.bias"])
        return out

    def ln(prefix):
        return {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}

    params: Dict[str, Any] = {"query_tokens": _np(sd["query_tokens"])}

    vis: Dict[str, Any] = {
        "patch_embed": {
            # torch conv OIHW → flax HWIO
            "kernel": _np(sd["vision_model.embeddings.patch_embedding.weight"]).transpose(2, 3, 1, 0),
            "bias": _np(sd["vision_model.embeddings.patch_embedding.bias"]),
        },
        "class_embedding": _np(sd["vision_model.embeddings.class_embedding"]).reshape(-1),
        "position_embedding": _np(sd["vision_model.embeddings.position_embedding"]).reshape(
            -1, _np(sd["vision_model.embeddings.class_embedding"]).reshape(-1).shape[0]
        ),
        "post_layernorm": ln("vision_model.post_layernorm"),
    }
    i = 0
    while f"vision_model.encoder.layers.{i}.self_attn.qkv.weight" in sd:
        p = f"vision_model.encoder.layers.{i}"
        vis[f"layer_{i}"] = {
            "norm1": ln(f"{p}.layer_norm1"),
            "qkv": dense(f"{p}.self_attn.qkv"),
            "proj": dense(f"{p}.self_attn.projection"),
            "norm2": ln(f"{p}.layer_norm2"),
            "fc1": dense(f"{p}.mlp.fc1"),
            "fc2": dense(f"{p}.mlp.fc2"),
        }
        i += 1
    params["vision_model"] = vis

    qf: Dict[str, Any] = {"input_norm": ln("qformer.layernorm")}

    def qattn(p):
        return {
            "query": dense(f"{p}.attention.query"),
            "key": dense(f"{p}.attention.key"),
            "value": dense(f"{p}.attention.value"),
            "output": dense(f"{p}.output.dense"),
            "output_norm": ln(f"{p}.output.LayerNorm"),
        }

    i = 0
    while f"qformer.encoder.layer.{i}.attention.attention.query.weight" in sd:
        p = f"qformer.encoder.layer.{i}"
        layer = {
            "self_attn": {
                "query": dense(f"{p}.attention.attention.query"),
                "key": dense(f"{p}.attention.attention.key"),
                "value": dense(f"{p}.attention.attention.value"),
                "output": dense(f"{p}.attention.output.dense"),
                "output_norm": ln(f"{p}.attention.output.LayerNorm"),
            },
            "intermediate": dense(f"{p}.intermediate_query.dense"),
            "ffn_output": dense(f"{p}.output_query.dense"),
            "ffn_norm": ln(f"{p}.output_query.LayerNorm"),
        }
        if f"{p}.crossattention.attention.query.weight" in sd:
            layer["cross_attn"] = {
                "query": dense(f"{p}.crossattention.attention.query"),
                "key": dense(f"{p}.crossattention.attention.key"),
                "value": dense(f"{p}.crossattention.attention.value"),
                "output": dense(f"{p}.crossattention.output.dense"),
                "output_norm": ln(f"{p}.crossattention.output.LayerNorm"),
            }
        qf[f"layer_{i}"] = layer
        i += 1
    params["qformer"] = qf
    return {"params": params}
