"""GPT-2 action transformer with optional Llama-style RoPE (flax).

TPU-native rebuild of the reference's vendored HF-GPT-2-with-RoPE stack
(``/root/reference/modules/layers/transformers.py:333-1052``): the
rotary embedding family (plain / linear-scaled / dynamic-NTK,
:333-413), ``apply_rotary_pos_emb`` (:416-432), ``GPT2Attention`` with
``config.use_rope`` (:436-686), ``GPT2MLP`` (:689-706), ``GPT2Block``
(:709-788), and ``GPT2Model`` which drops the learned ``wpe`` when RoPE
is on (:791-1052, wpe switch at :797-801).

The reference uses this as the ``action_transformer`` head of the LEO
lineage; MSR3D instantiates it as ``None`` (``model/msr3d/msr3d.py:88``)
so it is dormant there — rebuilt here for component parity and as a
generic small causal transformer.

Differences from the torch original, by design:
  * pure functional flax modules, static shapes, jit-friendly — no
    `past_key_values` tuple plumbing; incremental decoding is served by
    passing ``position_offset`` + a caller-held KV cache via
    ``return_kv``/``past_kv`` (the dense-cache pattern used by our
    Llama), instead of HF's ragged python lists.
  * RoPE cos/sin are computed on the fly from positions — no cached
    buffers to resize (the torch version's `_set_cos_sin_cache` dance
    exists only to appease `torch.jit.trace`).
  * weight layout matches HF Conv1D (in, out) so `load_hf_gpt2_weights`
    is a rename-only conversion (tested token-exact vs HF GPT2Model).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class ActionGPT2Config:
    vocab_size: int = 50257
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    n_inner: Optional[int] = None  # defaults to 4*hidden (transformers.py:713)
    activation_function: str = "gelu_new"
    max_position_embeddings: int = 1024
    layer_norm_epsilon: float = 1e-5
    scale_attn_weights: bool = True
    scale_attn_by_inverse_layer_idx: bool = False
    use_rope: bool = True
    # None | {"type": "linear"|"dynamic", "factor": float}  (:484-499)
    rope_scaling: Optional[Dict[str, Any]] = None
    rope_base: float = 10000.0
    add_cross_attention: bool = False
    embd_pdrop: float = 0.1
    attn_pdrop: float = 0.1
    resid_pdrop: float = 0.1
    initializer_range: float = 0.02


# ---------------------------------------------------------------------------
# RoPE (LlamaRotaryEmbedding family, transformers.py:333-432)
# ---------------------------------------------------------------------------


def rope_cos_sin(
    head_dim: int,
    positions: jax.Array,
    kv_seq_len: int,
    *,
    base: float = 10000.0,
    max_position_embeddings: int = 2048,
    scaling: Optional[Dict[str, Any]] = None,
    dtype=jnp.float32,
) -> Tuple[jax.Array, jax.Array]:
    """cos/sin tables for the given integer positions.

    ``kv_seq_len`` (static) stands in for the torch version's cache
    length: dynamic-NTK rescales the base from the *total* sequence
    length, not the per-token position (:391-406).
    """
    t = positions.astype(jnp.float32)
    if scaling is not None:
        factor = float(scaling["factor"])
        if scaling["type"] == "linear":  # :368-386
            t = t / factor
        elif scaling["type"] == "dynamic":  # :389-413
            if kv_seq_len > max_position_embeddings:
                base = base * (
                    (factor * kv_seq_len / max_position_embeddings) - (factor - 1)
                ) ** (head_dim / (head_dim - 2))
        else:
            raise ValueError(f"unknown rope scaling type {scaling['type']}")
    inv_freq = 1.0 / (base ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))
    freqs = t[..., None] * inv_freq[None, :]  # (..., head_dim/2)
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb).astype(dtype), jnp.sin(emb).astype(dtype)


def _rotate_half(x: jax.Array) -> jax.Array:
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rotary_pos_emb(q, k, cos, sin):
    """q,k: (B, H, T, hd); cos/sin: (B, T, hd) or (T, hd)."""
    if cos.ndim == 2:
        cos, sin = cos[None], sin[None]
    cos, sin = cos[:, None], sin[:, None]  # (B, 1, T, hd)
    return q * cos + _rotate_half(q) * sin, k * cos + _rotate_half(k) * sin


# ---------------------------------------------------------------------------
# Modules
# ---------------------------------------------------------------------------


class GPT2Attention(nn.Module):
    """Self- or cross-attention with optional RoPE (transformers.py:436-686)."""

    cfg: ActionGPT2Config
    layer_idx: int = 0
    is_cross_attention: bool = False

    @nn.compact
    def __call__(
        self,
        hidden_states: jax.Array,  # (B, T, D)
        attention_mask: Optional[jax.Array] = None,  # additive (B,1,T,S) or bool (B,S)
        encoder_hidden_states: Optional[jax.Array] = None,
        position_ids: Optional[jax.Array] = None,
        *,
        kv_seq_len: Optional[int] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        cfg = self.cfg
        d = cfg.hidden_size
        n_head = cfg.num_attention_heads
        head_dim = d // n_head
        B, T, _ = hidden_states.shape

        if self.is_cross_attention:
            assert encoder_hidden_states is not None
            q = nn.Dense(d, name="q_attn")(hidden_states)
            kv = nn.Dense(2 * d, name="c_attn")(encoder_hidden_states)
            k, v = jnp.split(kv, 2, axis=-1)
        else:
            qkv = nn.Dense(3 * d, name="c_attn")(hidden_states)
            q, k, v = jnp.split(qkv, 3, axis=-1)

        def split(x):
            return x.reshape(x.shape[0], x.shape[1], n_head, head_dim).transpose(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)  # (B, H, T/S, hd)

        if encoder_hidden_states is None and cfg.use_rope:  # :656-661
            if position_ids is None:
                position_ids = jnp.broadcast_to(jnp.arange(T), (B, T))
            cos, sin = rope_cos_sin(
                head_dim,
                position_ids,
                kv_seq_len if kv_seq_len is not None else T,
                base=cfg.rope_base,
                max_position_embeddings=cfg.max_position_embeddings,
                scaling=cfg.rope_scaling,
                dtype=q.dtype,
            )
            q, k = apply_rotary_pos_emb(q, k, cos, sin)

        attn = jnp.einsum("bhtd,bhsd->bhts", q, k)
        if cfg.scale_attn_weights:  # :570-571
            attn = attn / jnp.asarray(head_dim, attn.dtype) ** 0.5
        if cfg.scale_attn_by_inverse_layer_idx:  # :574-575
            attn = attn / float(self.layer_idx + 1)

        mask_value = jnp.finfo(attn.dtype).min
        if not self.is_cross_attention:
            S = k.shape[2]
            causal = jnp.tril(jnp.ones((T, S), bool), k=S - T)  # :441-447
            attn = jnp.where(causal[None, None], attn, mask_value)
        if attention_mask is not None:
            if attention_mask.ndim == 2:  # bool/0-1 key mask → additive
                attention_mask = jnp.where(
                    attention_mask[:, None, None, :].astype(bool), 0.0, mask_value
                ).astype(attn.dtype)
            attn = attn + attention_mask

        attn = jax.nn.softmax(attn, axis=-1)
        attn = nn.Dropout(cfg.attn_pdrop)(attn, deterministic=deterministic)
        out = jnp.einsum("bhts,bhsd->bhtd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, T, d)
        out = nn.Dense(d, name="c_proj")(out)
        return nn.Dropout(cfg.resid_pdrop)(out, deterministic=deterministic)


class GPT2MLP(nn.Module):
    """c_fc → act → c_proj (transformers.py:689-706)."""

    cfg: ActionGPT2Config

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        from msr3d_tpu.nn.layers import get_activation

        cfg = self.cfg
        inner = cfg.n_inner if cfg.n_inner is not None else 4 * cfg.hidden_size
        x = nn.Dense(inner, name="c_fc")(x)
        x = get_activation(cfg.activation_function)(x)
        x = nn.Dense(cfg.hidden_size, name="c_proj")(x)
        return nn.Dropout(cfg.resid_pdrop)(x, deterministic=deterministic)


class GPT2Block(nn.Module):
    """Pre-LN block, optional cross-attention (transformers.py:709-788)."""

    cfg: ActionGPT2Config
    layer_idx: int = 0

    @nn.compact
    def __call__(
        self,
        hidden_states,
        attention_mask=None,
        encoder_hidden_states=None,
        encoder_attention_mask=None,
        position_ids=None,
        *,
        deterministic: bool = True,
    ):
        cfg = self.cfg
        h = nn.LayerNorm(epsilon=cfg.layer_norm_epsilon, name="ln_1")(hidden_states)
        h = GPT2Attention(cfg, self.layer_idx, name="attn")(
            h,
            attention_mask,
            position_ids=position_ids,
            deterministic=deterministic,
        )
        hidden_states = hidden_states + h

        if cfg.add_cross_attention and encoder_hidden_states is not None:  # :747-768
            h = nn.LayerNorm(epsilon=cfg.layer_norm_epsilon, name="ln_cross_attn")(
                hidden_states
            )
            h = GPT2Attention(cfg, self.layer_idx, is_cross_attention=True, name="crossattention")(
                h,
                encoder_attention_mask,
                encoder_hidden_states=encoder_hidden_states,
                deterministic=deterministic,
            )
            hidden_states = hidden_states + h

        h = nn.LayerNorm(epsilon=cfg.layer_norm_epsilon, name="ln_2")(hidden_states)
        h = GPT2MLP(cfg, name="mlp")(h, deterministic=deterministic)
        return hidden_states + h


class GPT2Model(nn.Module):
    """Embedding trunk + blocks + final LN (transformers.py:791-1052).

    With ``use_rope=True`` the learned absolute ``wpe`` table is dropped
    and positions enter through the rotary embedding instead (:797-801).
    Returns the final hidden states (B, T, D).
    """

    cfg: ActionGPT2Config

    @nn.compact
    def __call__(
        self,
        input_ids: Optional[jax.Array] = None,
        attention_mask: Optional[jax.Array] = None,
        position_ids: Optional[jax.Array] = None,
        inputs_embeds: Optional[jax.Array] = None,
        encoder_hidden_states: Optional[jax.Array] = None,
        encoder_attention_mask: Optional[jax.Array] = None,
        *,
        deterministic: bool = True,
    ) -> jax.Array:
        cfg = self.cfg
        if inputs_embeds is None:
            assert input_ids is not None
            inputs_embeds = nn.Embed(
                cfg.vocab_size, cfg.hidden_size, name="wte"
            )(input_ids)
        else:
            # materialize wte anyway so the param tree is stable (:797)
            nn.Embed(cfg.vocab_size, cfg.hidden_size, name="wte")
        B, T, _ = inputs_embeds.shape
        if position_ids is None:
            position_ids = jnp.broadcast_to(jnp.arange(T), (B, T))

        h = inputs_embeds
        if not cfg.use_rope:  # learned absolute positions (:945-947)
            wpe = nn.Embed(cfg.max_position_embeddings, cfg.hidden_size, name="wpe")
            h = h + wpe(position_ids)
        h = nn.Dropout(cfg.embd_pdrop)(h, deterministic=deterministic)

        for i in range(cfg.num_hidden_layers):
            h = GPT2Block(cfg, layer_idx=i, name=f"h_{i}")(
                h,
                attention_mask,
                encoder_hidden_states=encoder_hidden_states,
                encoder_attention_mask=encoder_attention_mask,
                position_ids=position_ids,
                deterministic=deterministic,
            )
        return nn.LayerNorm(epsilon=cfg.layer_norm_epsilon, name="ln_f")(h)


# ---------------------------------------------------------------------------
# HF GPT-2 weight conversion (rename-only: Conv1D already stores (in, out))
# ---------------------------------------------------------------------------


def load_hf_gpt2_weights(state_dict: Dict[str, "np.ndarray"]) -> Dict[str, Any]:
    """Torch GPT2Model state_dict → flax params for :class:`GPT2Model`.

    HF ``Conv1D`` keeps weights as (in_features, out_features) — the same
    orientation as a flax ``Dense`` kernel — so attention/MLP weights copy
    through without transpose; only LayerNorm/Embedding names change.
    """
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    sd = {k[len("transformer."):] if k.startswith("transformer.") else k: v
          for k, v in sd.items()}

    params: Dict[str, Any] = {"wte": {"embedding": sd["wte.weight"]}}
    if "wpe.weight" in sd:
        params["wpe"] = {"embedding": sd["wpe.weight"]}

    def dense(prefix):
        return {"kernel": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}

    def ln(prefix):
        return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}

    i = 0
    while f"h.{i}.ln_1.weight" in sd:
        blk: Dict[str, Any] = {
            "ln_1": ln(f"h.{i}.ln_1"),
            "attn": {
                "c_attn": dense(f"h.{i}.attn.c_attn"),
                "c_proj": dense(f"h.{i}.attn.c_proj"),
            },
            "ln_2": ln(f"h.{i}.ln_2"),
            "mlp": {
                "c_fc": dense(f"h.{i}.mlp.c_fc"),
                "c_proj": dense(f"h.{i}.mlp.c_proj"),
            },
        }
        if f"h.{i}.crossattention.q_attn.weight" in sd:
            blk["crossattention"] = {
                "q_attn": dense(f"h.{i}.crossattention.q_attn"),
                "c_attn": dense(f"h.{i}.crossattention.c_attn"),
                "c_proj": dense(f"h.{i}.crossattention.c_proj"),
            }
            blk["ln_cross_attn"] = ln(f"h.{i}.ln_cross_attn")
        params[f"h_{i}"] = blk
        i += 1

    params["ln_f"] = ln("ln_f")
    return {"params": params}
