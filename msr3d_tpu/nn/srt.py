"""Scene Representation Transformer decoder (reference modules/layers/
srt.py:10-110 + modules/heads/srt_head.py:9-40): octave positional ray
encoding, cross-attention ray predictor, and the sigmoid RGB render MLP.

An unused-by-shipped-configs experiment in the reference (no config
references SRTDecoder); kept for surface completeness. 180 = 3 coords ×
15 octaves × 2 (sin/cos) × 2 (pos + ray)."""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp

from msr3d_tpu.nn.transformers import CrossAttentionLayer, TransformerEncoderLayer
from msr3d_tpu.registry import HEADS_REGISTRY, VISION_REGISTRY


def positional_encoding(coords: jax.Array, num_octaves: int = 8, start_octave: int = 0):
    """(B, N, D) → (B, N, 2·D·octaves): sines then cosines (srt.py:16-32)."""
    b, n, d = coords.shape
    octaves = jnp.arange(start_octave, start_octave + num_octaves, dtype=coords.dtype)
    scaled = coords[..., None] * (2.0**octaves * math.pi)
    sines = jnp.sin(scaled).reshape(b, n, d * num_octaves)
    cosines = jnp.cos(scaled).reshape(b, n, d * num_octaves)
    return jnp.concatenate([sines, cosines], axis=-1)


def ray_encoding(pos, rays, pos_octaves=15, pos_start_octave=0, ray_octaves=15):
    """Concatenated position + direction encodings (srt.py:41-58, flat rays)."""
    return jnp.concatenate(
        [
            positional_encoding(pos, pos_octaves, pos_start_octave),
            positional_encoding(rays, ray_octaves, 0),
        ],
        axis=-1,
    )


class RayPredictor(nn.Module):
    """Queries = encoded rays cross-attending into the scene encoding
    (srt.py:61-110)."""

    num_att_blocks: int = 2
    pos_start_octave: int = 0
    out_dims: int = 3
    z_dim: int = 768
    input_mlp: bool = False
    output_mlp: bool = True

    @nn.compact
    def __call__(self, z, x, rays, *, deterministic: bool = True):
        queries = ray_encoding(x, rays, pos_start_octave=self.pos_start_octave)
        if self.input_mlp:
            h = nn.Dense(360, name="input_fc1")(queries)
            h = nn.relu(h)
            queries = nn.Dense(180, name="input_fc2")(h)
        for i in range(self.num_att_blocks):
            queries, _ = CrossAttentionLayer(
                d_model=180, nhead=12, dim_feedforward=self.z_dim * 2,
                activation="gelu", prenorm=True, name=f"layer_{i}",
            )(queries, z, deterministic=deterministic)
        if self.output_mlp:
            h = nn.Dense(128, name="output_fc1")(queries)
            h = nn.relu(h)
            queries = nn.Dense(self.out_dims, name="output_fc2")(h)
        return queries


@HEADS_REGISTRY.register(name="SRTDecoder")
class SRTDecoder(nn.Module):
    """Novel-view pixel decoder (srt_head.py:9-40): ray predictor + 5-layer
    render MLP → sigmoid RGB."""

    num_att_blocks: int = 2
    hidden_dim: int = 768
    pos_start_octave: int = 0

    @nn.compact
    def __call__(self, features, query_points, rays, *, deterministic: bool = True):
        x = RayPredictor(
            num_att_blocks=self.num_att_blocks,
            pos_start_octave=self.pos_start_octave,
            z_dim=self.hidden_dim,
            input_mlp=True,
            output_mlp=False,
            name="allocation_transformer",
        )(features, query_points, rays, deterministic=deterministic)
        h = x
        for i, w in enumerate([2 * self.hidden_dim] * 4):
            h = nn.Dense(w, name=f"render_fc{i}")(h)
            h = nn.relu(h)
        pixels = nn.Dense(3, name="render_out")(h)
        return jax.nn.sigmoid(pixels)


def ray_image_encoding(pos, rays, pos_octaves=15, pos_start_octave=0,
                       ray_octaves=15):
    """Image-shaped ray encoding (reference modules/layers/srt.py:42-53):
    camera position encoding broadcast over the image, per-pixel ray
    direction encoding, concatenated channels-last.

    Args: ``pos`` (B, 3), ``rays`` (B, H, W, 3) → (B, H, W, 2·3·(po+ro)).
    """
    b, h, w, _ = rays.shape
    pos_enc = positional_encoding(pos[:, None, :], pos_octaves, pos_start_octave)
    pos_enc = jnp.broadcast_to(pos_enc[:, :, None, :], (b, h, w, pos_enc.shape[-1]))
    ray_enc = positional_encoding(rays.reshape(b, h * w, 3), ray_octaves, 0)
    ray_enc = ray_enc.reshape(b, h, w, ray_enc.shape[-1])
    return jnp.concatenate([pos_enc, ray_enc], axis=-1)


class SRTConvBlock(nn.Module):
    """Two 3×3 convs, the second stride-2 (mv_srt_encoder.py:12-29); NHWC."""

    hdim: int
    odim: int

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.hdim, (3, 3), strides=1, padding=1, use_bias=False,
                    name="conv1")(x)
        x = nn.relu(x)
        x = nn.Conv(self.odim, (3, 3), strides=2, padding=1, use_bias=False,
                    name="conv2")(x)
        return nn.relu(x)


@VISION_REGISTRY.register(name="SRTEncoder")
class SRTEncoder(nn.Module):
    """SRT multi-view image encoder (mv_srt_encoder.py:32-81): per view,
    pixels ‖ 183-dim ray encoding → strided conv pyramid → per-patch linear
    → prenorm transformer over all views' patches jointly.

    Channels-last throughout (TPU conv layout); the reference's NCHW
    per-patch 1×1 conv becomes a Dense over the channel axis.
    """

    num_conv_blocks: int = 3
    num_att_blocks: int = 5
    pos_start_octave: int = 0
    hidden_dim: int = 768
    num_heads: int = 12
    mlp_dim: int = 1536

    @nn.compact
    def __call__(self, images, camera_pos, rays, *, deterministic: bool = True):
        """images (B, Nv, H, W, 3), camera_pos (B, Nv, 3),
        rays (B, Nv, H, W, 3) → (B, Nv·Np, hidden_dim)."""
        b, n_v = images.shape[:2]
        x = images.reshape((b * n_v,) + images.shape[2:])
        pos = camera_pos.reshape(b * n_v, 3)
        ray = rays.reshape((b * n_v,) + rays.shape[2:])

        ray_enc = ray_image_encoding(pos, ray, pos_octaves=15,
                                     pos_start_octave=self.pos_start_octave,
                                     ray_octaves=15)
        x = jnp.concatenate([x, ray_enc], axis=-1)  # 3 + 180 = 183 channels

        cur = 96
        x = SRTConvBlock(hdim=cur, odim=2 * cur, name="conv_block_0")(x)
        cur *= 2
        for i in range(self.num_conv_blocks):
            x = SRTConvBlock(hdim=cur, odim=2 * cur, name=f"conv_block_{i + 1}")(x)
            cur *= 2
        x = nn.Dense(self.hidden_dim, name="per_patch_linear")(x)

        n_p = x.shape[1] * x.shape[2]
        x = x.reshape(b, n_v * n_p, self.hidden_dim)
        for i in range(self.num_att_blocks):
            x, _ = TransformerEncoderLayer(
                self.hidden_dim, self.num_heads, dim_feedforward=self.mlp_dim,
                activation="gelu", prenorm=True, name=f"layer_{i}",
            )(x, deterministic=deterministic)
        return x
