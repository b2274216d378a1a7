"""Spatial-attention transformer layers (flax.linen).

Behavioral parity with the reference
(modules/layers/transformers.py:167-329):

  - ``MultiHeadAttentionSpatial``: QK attention fused with pairwise-geometry
    attention; fusion modes mul | bias | add | ctx | cond. Default ``cond``
    (configs/msr3d.yaml:214): a per-query language-conditioned linear over
    the 5-d pairwise geometry + sigmoid gate, fused as
    ``log(clamp(loc_attn, 1e-6)) + attn`` then softmax (:240-244).
    Note the residual + LayerNorm live INSIDE the attention block (:250-251),
    and the encoder layer adds a second residual around it (:319-328) —
    reproduced exactly.
  - ``TransformerSpatialEncoderLayer``: post-norm; attn→drop→+res→LN,
    FFN→drop→+res→LN.
  - ``CrossAttentionLayer`` (:22-73, prenorm default) for the
    ``as_cross_attention`` situation mode.
  - ``DiTBlock`` (modules/layers/DiT.py:10-31) adaLN-Zero conditioning for
    the ``as_dit_attention`` mode.

Masks use the torch ``key_padding_mask`` convention throughout this file:
True = PAD (masked out).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from msr3d_tpu.nn.layers import get_activation

_NEG_INF = -1e30  # used instead of -inf so fully-masked rows stay finite


def _split_heads(x: jax.Array, n_head: int) -> jax.Array:
    """(B, L, H) → (B, n_head, L, H/n_head)."""
    b, l, h = x.shape
    return x.reshape(b, l, n_head, h // n_head).transpose(0, 2, 1, 3)


def _merge_heads(x: jax.Array) -> jax.Array:
    """(B, n_head, L, D) → (B, L, n_head*D)."""
    b, nh, l, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, l, nh * d)


class MultiHeadAttention(nn.Module):
    """Standard MHA matching torch.nn.MultiheadAttention layout
    (packed qkv when dims match, separate kdim/vdim otherwise)."""

    d_model: int
    n_head: int
    dropout: float = 0.1

    @nn.compact
    def __call__(
        self,
        query: jax.Array,
        key: jax.Array,
        value: jax.Array,
        key_padding_mask: Optional[jax.Array] = None,
        attn_mask: Optional[jax.Array] = None,
        *,
        deterministic: bool = True,
    ) -> Tuple[jax.Array, jax.Array]:
        d_head = self.d_model // self.n_head
        q = _split_heads(nn.Dense(self.d_model, name="q_proj")(query), self.n_head)
        k = _split_heads(nn.Dense(self.d_model, name="k_proj")(key), self.n_head)
        v = _split_heads(nn.Dense(self.d_model, name="v_proj")(value), self.n_head)

        attn = jnp.einsum("bhld,bhtd->bhlt", q, k) / np.sqrt(d_head)
        if attn_mask is not None:
            attn = jnp.where(attn_mask, _NEG_INF, attn)
        if key_padding_mask is not None:
            attn = jnp.where(key_padding_mask[:, None, None, :], _NEG_INF, attn)
        weights = jax.nn.softmax(attn, axis=-1)
        weights = nn.Dropout(self.dropout)(weights, deterministic=deterministic)
        out = jnp.einsum("bhlt,bhtd->bhld", weights, v)
        out = nn.Dense(self.d_model, name="out_proj")(_merge_heads(out))
        return out, weights


class MultiHeadAttentionSpatial(nn.Module):
    d_model: int
    n_head: int
    dropout: float = 0.1
    spatial_multihead: bool = True
    spatial_dim: int = 5
    spatial_attn_fusion: str = "cond"

    @nn.compact
    def __call__(
        self,
        q_in: jax.Array,
        k_in: jax.Array,
        v_in: jax.Array,
        pairwise_locs: jax.Array,
        key_padding_mask: Optional[jax.Array] = None,
        *,
        deterministic: bool = True,
    ) -> Tuple[jax.Array, jax.Array]:
        assert self.d_model % self.n_head == 0
        d_head = self.d_model // self.n_head
        spatial_n_head = self.n_head if self.spatial_multihead else 1
        residual = q_in

        q = _split_heads(nn.Dense(self.d_model, name="w_qs")(q_in), self.n_head)
        k = _split_heads(nn.Dense(self.d_model, name="w_ks")(k_in), self.n_head)
        v = _split_heads(nn.Dense(self.d_model, name="w_vs")(v_in), self.n_head)
        attn = jnp.einsum("bhld,bhtd->bhlt", q, k) / np.sqrt(d_head)

        fusion = self.spatial_attn_fusion
        if fusion in ("mul", "bias", "add"):
            loc_attn = nn.Dense(spatial_n_head, name="pairwise_loc_fc")(pairwise_locs)
            loc_attn = loc_attn.transpose(0, 3, 1, 2)  # (B, h, L, T)
            if fusion == "mul":
                loc_attn = nn.relu(loc_attn)
            if not self.spatial_multihead:
                loc_attn = jnp.repeat(loc_attn, self.n_head, axis=1)
        elif fusion == "ctx":
            loc = nn.Dense(self.d_model, name="pairwise_loc_fc")(pairwise_locs)
            b, l, t, _ = loc.shape
            loc = loc.reshape(b, l, t, self.n_head, d_head).transpose(0, 3, 1, 2, 4)
            loc_attn = jnp.einsum("bhld,bhltd->bhlt", q, loc) / np.sqrt(d_head)
        elif fusion == "cond":
            w = nn.Dense(spatial_n_head * (self.spatial_dim + 1), name="lang_cond_fc")(
                residual
            )  # (B, L, h*(S+1))
            b, l, _ = w.shape
            w = w.reshape(b, l, spatial_n_head, self.spatial_dim + 1).transpose(0, 2, 1, 3)
            if spatial_n_head == 1:
                w = jnp.repeat(w, self.n_head, axis=1)
            spatial_bias = w[..., :1]  # (B, h, L, 1)
            spatial_weights = w[..., 1:]  # (B, h, L, S)
            loc_attn = (
                jnp.einsum("bhld,bltd->bhlt", spatial_weights, pairwise_locs)
                + spatial_bias
            )
            loc_attn = jax.nn.sigmoid(loc_attn)
        else:
            raise NotImplementedError(f"unsupported spatial_attn_fusion {fusion}")

        if key_padding_mask is not None:
            kmask = key_padding_mask[:, None, None, :]  # (B,1,1,T)
            attn = jnp.where(kmask, _NEG_INF, attn)
            if fusion in ("mul", "cond"):
                loc_attn = jnp.where(kmask, 0.0, loc_attn)
            else:
                loc_attn = jnp.where(kmask, _NEG_INF, loc_attn)

        if fusion == "add":
            fused_attn = (
                jax.nn.softmax(attn, axis=3) + jax.nn.softmax(loc_attn, axis=3)
            ) / 2
        else:
            if fusion in ("mul", "cond"):
                fused_attn = jnp.log(jnp.clip(loc_attn, min=1e-6)) + attn
            else:
                fused_attn = loc_attn + attn
            fused_attn = jax.nn.softmax(fused_attn, axis=3)

        # opt-in NaN guard, the reference's fused-attention assert analog
        # (transformers.py:246) — identity unless MSR3D_NAN_CHECKS=1
        from msr3d_tpu.utils.debug import assert_finite

        fused_attn = assert_finite(fused_attn, "spatial fused_attn")
        out = jnp.einsum("bhlt,bhtv->bhlv", fused_attn, v)
        out = nn.Dense(self.d_model, name="fc")(_merge_heads(out))
        out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        # reference puts residual + LN inside the attention block (:250-251)
        out = nn.LayerNorm(epsilon=1e-5, name="layer_norm")(out + residual)
        return out, fused_attn


class FeedForward(nn.Module):
    d_model: int
    dim_feedforward: int
    dropout: float = 0.1
    activation: str = "relu"

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        h = nn.Dense(self.dim_feedforward, name="linear1")(x)
        h = get_activation(self.activation)(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return nn.Dense(self.d_model, name="linear2")(h)


class TransformerEncoderLayer(nn.Module):
    """Plain encoder layer (modules/layers/transformers.py:125-164)."""

    d_model: int
    nhead: int
    dim_feedforward: int = 2048
    dropout: float = 0.1
    activation: str = "relu"
    prenorm: bool = False

    @nn.compact
    def __call__(
        self,
        tgt: jax.Array,
        tgt_key_padding_mask: Optional[jax.Array] = None,
        *,
        deterministic: bool = True,
    ):
        norm1 = nn.LayerNorm(epsilon=1e-5, name="norm1")
        norm2 = nn.LayerNorm(epsilon=1e-5, name="norm2")
        attn = MultiHeadAttention(self.d_model, self.nhead, self.dropout, name="self_attn")
        ffn = FeedForward(
            self.d_model, self.dim_feedforward, self.dropout, self.activation, name="ffn"
        )
        drop = nn.Dropout(self.dropout)

        tgt2 = norm1(tgt) if self.prenorm else tgt
        tgt2, attn_w = attn(
            tgt2, tgt2, tgt2, key_padding_mask=tgt_key_padding_mask,
            deterministic=deterministic,
        )
        tgt = tgt + drop(tgt2, deterministic=deterministic)
        if not self.prenorm:
            tgt = norm1(tgt)
        if self.prenorm:
            tgt = norm2(tgt)
        tgt2 = ffn(tgt, deterministic=deterministic)
        tgt = tgt + drop(tgt2, deterministic=deterministic)
        if not self.prenorm:
            tgt = norm2(tgt)
        return tgt, attn_w


class TransformerSpatialEncoderLayer(nn.Module):
    """Spatial encoder layer (modules/layers/transformers.py:298-329):
    post-norm around the (already residual+LN'd) spatial attention."""

    d_model: int
    nhead: int
    dim_feedforward: int = 2048
    dropout: float = 0.1
    activation: str = "relu"
    spatial_multihead: bool = True
    spatial_dim: int = 5
    spatial_attn_fusion: str = "cond"

    @nn.compact
    def __call__(
        self,
        tgt: jax.Array,
        tgt_pairwise_locs: jax.Array,
        tgt_key_padding_mask: Optional[jax.Array] = None,
        *,
        deterministic: bool = True,
    ):
        attn = MultiHeadAttentionSpatial(
            self.d_model,
            self.nhead,
            dropout=self.dropout,
            spatial_multihead=self.spatial_multihead,
            spatial_dim=self.spatial_dim,
            spatial_attn_fusion=self.spatial_attn_fusion,
            name="self_attn",
        )
        ffn = FeedForward(
            self.d_model, self.dim_feedforward, self.dropout, self.activation, name="ffn"
        )
        drop = nn.Dropout(self.dropout)

        tgt2, attn_w = attn(
            tgt, tgt, tgt, tgt_pairwise_locs,
            key_padding_mask=tgt_key_padding_mask, deterministic=deterministic,
        )
        tgt = tgt + drop(tgt2, deterministic=deterministic)
        tgt = nn.LayerNorm(epsilon=1e-5, name="norm1")(tgt)
        tgt2 = ffn(tgt, deterministic=deterministic)
        tgt = tgt + drop(tgt2, deterministic=deterministic)
        tgt = nn.LayerNorm(epsilon=1e-5, name="norm2")(tgt)
        return tgt, attn_w


class CrossAttentionLayer(nn.Module):
    """Cross-attention layer (modules/layers/transformers.py:22-73),
    prenorm by default. Note the reference's FFN reads the post-attn
    pre-norm stream exactly as written there (:67-70)."""

    d_model: int
    nhead: int
    dim_feedforward: int = 2048
    dropout: float = 0.1
    activation: str = "relu"
    prenorm: bool = True

    @nn.compact
    def __call__(
        self,
        tgt: jax.Array,
        memory: jax.Array,
        memory_key_padding_mask: Optional[jax.Array] = None,
        tgt_key_padding_mask: Optional[jax.Array] = None,
        *,
        deterministic: bool = True,
    ):
        norm1 = nn.LayerNorm(epsilon=1e-5, name="norm1")
        norm3 = nn.LayerNorm(epsilon=1e-5, name="norm3")
        attn = MultiHeadAttention(self.d_model, self.nhead, self.dropout, name="multihead_attn")
        ffn = FeedForward(
            self.d_model, self.dim_feedforward, self.dropout, self.activation, name="ffn"
        )
        drop = nn.Dropout(self.dropout)

        tgt2 = norm1(tgt) if self.prenorm else tgt
        tgt2, attn_w = attn(
            tgt2, memory, memory, key_padding_mask=memory_key_padding_mask,
            deterministic=deterministic,
        )
        tgt = tgt + drop(tgt2, deterministic=deterministic)
        if not self.prenorm:
            tgt = norm1(tgt)
        if self.prenorm:
            tgt2 = norm3(tgt)
        tgt2 = ffn(tgt2, deterministic=deterministic)
        tgt = tgt + drop(tgt2, deterministic=deterministic)
        if not self.prenorm:
            tgt = norm3(tgt)
        return tgt, attn_w


class DiTBlock(nn.Module):
    """adaLN-Zero conditioning block (modules/layers/DiT.py:10-31)."""

    hidden_size: int
    num_heads: int
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x: jax.Array, c: jax.Array, *, deterministic: bool = True):
        mod = nn.Dense(6 * self.hidden_size, name="adaLN_modulation")(nn.silu(c))
        shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = jnp.split(
            mod, 6, axis=-1
        )

        def modulate(h, shift, scale):
            # c is per-token here (B, N, H) — the reference passes a per-token
            # situation feature; per-sample c (B, H) broadcasts the same way
            return h * (1 + scale) + shift

        norm1 = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6, name="norm1")
        norm2 = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6, name="norm2")
        attn = MultiHeadAttention(self.hidden_size, self.num_heads, dropout=0.0, name="attn")
        h, _ = attn(
            modulate(norm1(x), shift_msa, scale_msa),
            modulate(norm1(x), shift_msa, scale_msa),
            modulate(norm1(x), shift_msa, scale_msa),
            deterministic=deterministic,
        )
        x = x + gate_msa * h
        m = nn.Dense(int(self.hidden_size * self.mlp_ratio), name="mlp_fc1")(
            modulate(norm2(x), shift_mlp, scale_mlp)
        )
        m = nn.gelu(m, approximate=True)
        m = nn.Dense(self.hidden_size, name="mlp_fc2")(m)
        return x + gate_mlp * m
