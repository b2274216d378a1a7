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

from msr3d_tpu.nn.transformers import CrossAttentionLayer
from msr3d_tpu.registry import HEADS_REGISTRY


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
