"""Shared NN building blocks (flax.linen).

Functional equivalents of the reference's small helpers:
  - ``MLPHead``   — modules/utils.py:25-32 (Linear→ReLU→LN(eps 1e-12)→Dropout→Linear)
  - ``FC``/``MLP``/``AttFlat`` — model/ose3d_situation.py:62-135
  - ``bert_init`` — modules/weights.py:3-20 (normal(0.02) weights, zero bias)
"""

from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

bert_kernel_init = nn.initializers.normal(stddev=0.02)


def get_activation(name: str) -> Callable:
    # gelu: exact erf form to match torch F.gelu (flax defaults to tanh-approx)
    return {
        "relu": nn.relu,
        "gelu": lambda x: nn.gelu(x, approximate=False),
        # HF "gelu_new": the tanh-approximate form (flax approximate=True)
        "gelu_new": lambda x: nn.gelu(x, approximate=True),
        "glu": nn.glu,
        "silu": nn.silu,
    }[name]


class MLPHead(nn.Module):
    """Linear → ReLU → LayerNorm(eps 1e-12) → Dropout → Linear."""

    hidden_size: int
    output_size: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        x = nn.Dense(self.hidden_size, name="fc1")(x)
        x = nn.relu(x)
        x = nn.LayerNorm(epsilon=1e-12, name="norm")(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return nn.Dense(self.output_size, name="fc2")(x)


class FC(nn.Module):
    """Linear (+GELU) (+Dropout)."""

    out_size: int
    pdrop: float = 0.0
    use_gelu: bool = True

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        x = nn.Dense(self.out_size, name="linear")(x)
        if self.use_gelu:
            x = nn.gelu(x, approximate=False)
        if self.pdrop > 0:
            x = nn.Dropout(self.pdrop)(x, deterministic=deterministic)
        return x


class MLP(nn.Module):
    mid_size: int
    out_size: int
    pdrop: float = 0.0
    use_gelu: bool = True

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        x = FC(self.mid_size, pdrop=self.pdrop, use_gelu=self.use_gelu, name="fc")(
            x, deterministic=deterministic
        )
        return nn.Dense(self.out_size, name="linear")(x)


class AttFlat(nn.Module):
    """Attention-flatten pooling (MCAN-style): softmax glimpse over tokens.

    x (B, N, H), mask True=PAD → (pooled (B, flat_out_size), att (B, N, G)).
    """

    flat_mlp_size: int = 512
    flat_glimpses: int = 1
    flat_out_size: int = 1024
    pdrop: float = 0.1

    @nn.compact
    def __call__(self, x, x_mask: Optional[jax.Array] = None, *, deterministic: bool = True):
        att = MLP(self.flat_mlp_size, self.flat_glimpses, pdrop=self.pdrop, name="mlp")(
            x, deterministic=deterministic
        )  # (B, N, G)
        if x_mask is not None:
            att = jnp.where(x_mask[..., None], -1e9, att)
        att = jax.nn.softmax(att, axis=1)
        glimpses = [
            jnp.sum(att[:, :, i : i + 1] * x, axis=1) for i in range(self.flat_glimpses)
        ]
        pooled = jnp.concatenate(glimpses, axis=1)
        pooled = nn.Dense(self.flat_out_size, name="linear_merge")(pooled)
        return pooled, att


class ObjColorEncoder(nn.Module):
    """GMM color embedding (model/ose3d_situation.py:138-154)."""

    hidden_size: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, obj_colors, *, deterministic: bool = True):
        # obj_colors: (B, N, 3, 4) = per-object 3-component GMM (weight ‖ mean RGB)
        weights = obj_colors[..., :1]
        means = obj_colors[..., 1:]
        h = nn.Dense(self.hidden_size, name="fc")(means)
        h = nn.relu(h)
        h = nn.LayerNorm(epsilon=1e-12, name="norm")(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return jnp.sum(h * weights, axis=2)
