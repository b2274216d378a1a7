"""JAX Llama (Vicuna-7B family) with LoRA adapters — TPU-native.

Replaces the reference's HF ``LlamaForCausalLM`` + PEFT stack
(model/msr3d/msr3d.py:75-112) with a from-scratch flax implementation:

  - RMSNorm / rotary embeddings / SwiGLU MLP / (G)MHA with optional GQA
  - LoRA (r, α, dropout) on any of q/k/v/o/gate/up/down projections —
    the base weight stays frozen (stop_gradient); only A/B train,
    matching PEFT's ``lora_B @ lora_A * (α/r)`` parametrization
  - ``inputs_embeds`` path as the primary interface (the reference always
    calls the LLM with spliced embeddings, msr3d.py:409-415)
  - static-shape prefill + KV-cache decode designed for jit (the decode
    loop itself lives in ``sampling.py``)

Weights convert from HF checkpoints via ``utils/hf_llama.py``. Param
dtype is configurable; compute dtype defaults to bfloat16 on TPU (the
reference runs fp16 weights + bf16 autocast; bf16 is the TPU-native
choice, SURVEY.md §2.8).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 32000
    hidden_size: int = 4096
    intermediate_size: int = 11008
    num_hidden_layers: int = 32
    num_attention_heads: int = 32
    num_key_value_heads: Optional[int] = None  # None → MHA (Vicuna-7B)
    max_position_embeddings: int = 2048
    rms_norm_eps: float = 1e-6
    rope_theta: float = 10000.0
    tie_word_embeddings: bool = False
    # LoRA
    lora_rank: int = 0  # 0 → disabled
    lora_alpha: float = 16.0
    lora_dropout: float = 0.0
    lora_targets: Tuple[str, ...] = (
        "q_proj", "k_proj", "v_proj", "o_proj", "gate_proj", "up_proj", "down_proj",
    )
    dtype: Any = jnp.bfloat16  # compute dtype
    param_dtype: Any = jnp.float32  # storage dtype for the frozen base
    # (bf16 halves HBM for 7B-scale single-chip runs; LoRA stays fp32)
    remat: bool = False  # rematerialize blocks (trade recompute for HBM in training)
    remat_policy: str = "full"  # "full" (nothing saved) | "dots" (matmul
    # outputs saved — ~25% less recompute, more activation memory) |
    # "residuals" (only the two per-layer branch outputs saved — ~5×
    # less memory than dots; backward recomputes the projections)
    quantize: bool = False  # int8 weight-only base kernels (inference)
    quantize_bits: int = 8  # 8 (one byte/weight) or 4 (two weights/byte,
    # split-nibble packing). int4 halves the frozen-base HBM footprint
    # again (7B: ~6.8 → ~3.4 GB) at a measured ~20% per-matmul dequant
    # cost (the decode matmuls are VPU-dequant-bound, not HBM-bound, on
    # v5e) — a CAPACITY knob: it buys decode batch at the 256-token
    # budget where int8 hits the OOM walls recorded in ROUND3_NOTES.md
    quantize_group: Optional[int] = None  # int4 only: group size along
    # the input dim for the quantization scales (GPTQ/AWQ-style, e.g.
    # 128). None = per-output-channel scales (faster dequant, coarser)
    # sequence parallelism: name of the mesh axis to shard the sequence
    # over in the training/teacher-forcing forward — attention runs as an
    # exact ring schedule (parallel/ring_attention.py) and every other op
    # is position-independent, so GSPMD shards it over the same axis from
    # the input sharding alone. Requires an active `with mesh:` context.
    sp_axis: Optional[str] = None
    sp_data_axis: Optional[str] = None  # batch axis for composing dp × sp
    flash_attention: bool = False  # training/prefill dense attention via
    # the Pallas fused kernel (ops/flash_attention.py): the fp32 (B,H,T,S)
    # logits/probs never leave VMEM — they are the allocation that walls
    # the train micro-batch (ROUND3_NOTES.md). Decode (kv_cache) and
    # split-cache beam paths are unaffected (S there is the cache, T=1..k)
    act_quantize: bool = False  # s8×s8: also quantize activations per-token
    kv_quantize: bool = False  # int8 KV cache (decode): halves KV HBM traffic
    # and footprint; prefill stays bf16 and the caller quantizes the cache
    # once before the decode loop (quantize_kv_cache)
    # (native int8 MXU dot, skips the int8→bf16 weight dequant on the VPU;
    # requires quantize=True; accuracy-affecting — deployment knob, off by
    # default; round-1 microbench measured ~1.7×/dot, gate on end-to-end)

    def __post_init__(self):
        if self.act_quantize and not self.quantize:
            raise ValueError(
                "act_quantize (s8×s8) requires quantize=True — without the "
                "int8 base it would silently run the plain bf16 path"
            )
        if self.quantize_bits not in (4, 8):
            raise ValueError("quantize_bits must be 4 or 8")
        if self.quantize_group is not None:
            if self.quantize_bits != 4:
                raise ValueError("quantize_group is an int4-only knob")
            if self.act_quantize:
                raise ValueError(
                    "quantize_group + act_quantize unsupported: group "
                    "scales do not commute out of the s8×s8 dot"
                )

    @property
    def kv_heads(self) -> int:
        return self.num_key_value_heads or self.num_attention_heads

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @staticmethod
    def tiny(**kw) -> "LlamaConfig":
        """Small config for tests."""
        base = dict(
            vocab_size=256, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4,
            max_position_embeddings=128,
        )
        base.update(kw)
        return LlamaConfig(**base)


def resolve_remat_policy(name: str):
    """Map a remat-policy name (LlamaConfig.remat_policy) to the XLA
    saveable-set policy for ``nn.remat``/``jax.checkpoint``."""
    if name == "dots":
        return jax.checkpoint_policies.dots_with_no_batch_dims_saveable
    if name == "residuals":
        return jax.checkpoint_policies.save_only_these_names(
            "attn_out", "mlp_out"
        )
    if name in (None, "full"):
        return None
    raise ValueError(f"unknown remat_policy: {name!r}")


class RMSNorm(nn.Module):
    eps: float = 1e-6
    dtype: Any = jnp.bfloat16
    frozen: bool = True  # the whole base LLM is frozen (msr3d.py:79-81)

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        if self.frozen:
            scale = jax.lax.stop_gradient(scale)
        x32 = x.astype(jnp.float32)
        var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
        normed = x32 * jax.lax.rsqrt(var + self.eps)
        return (normed * scale).astype(self.dtype)


def rope_freqs(head_dim: int, theta: float) -> jax.Array:
    return 1.0 / (theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))


def apply_rope(x: jax.Array, positions: jax.Array, theta: float) -> jax.Array:
    """x (B, T, H, D), positions (B, T) → rotated x (HF half-split layout)."""
    freqs = rope_freqs(x.shape[-1], theta)  # (D/2,)
    angles = positions[..., None].astype(jnp.float32) * freqs  # (B, T, D/2)
    cos = jnp.cos(angles)[:, :, None, :]  # (B, T, 1, D/2)
    sin = jnp.sin(angles)[:, :, None, :]
    x1, x2 = jnp.split(x.astype(jnp.float32), 2, axis=-1)
    out = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
    return out.astype(x.dtype)


class LoraDense(nn.Module):
    """Frozen base Dense + optional trainable LoRA delta.

    y = stop_grad(W) x + (α/r) · B(A(dropout(x)))  — PEFT semantics.

    ``quantized``: store the base kernel as int8 with a per-output-channel
    bf16 scale (weight-only quantization). Decode at 7B is HBM-bandwidth
    bound on the weight read; int8 halves it. XLA fuses the
    dequant (convert×scale) into the dot's operand load.

    ``bits=4``: split-nibble packing — ``kernel_q`` is int8 of shape
    (in/2, features) whose low nibbles hold input rows [0, in/2) and high
    nibbles rows [in/2, in). The matmul runs as two half-contraction dots
    (no interleave/concat materializes — measured fastest layout on v5e),
    with either per-output-channel scales or GPTQ-style group scales
    (``quant_group`` along the input dim).
    """

    features: int
    use_lora: bool = False
    lora_rank: int = 16
    lora_alpha: float = 16.0
    lora_dropout: float = 0.0
    base_frozen: bool = True
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    quantized: bool = False
    act_quant: bool = False  # s8×s8 dot (needs quantized=True)
    bits: int = 8  # 8 or 4 (split-nibble packed; see class docstring)
    quant_group: Optional[int] = None  # int4 group-scale size (None = per-channel)

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        in_features = x.shape[-1]
        if self.quantized and self.bits == 4:
            assert in_features % 2 == 0, "int4 packing needs even in_features"
            half = in_features // 2
            kernel_q = self.param(
                "kernel_q", nn.initializers.zeros, (half, self.features), jnp.int8
            )
            if self.quant_group:
                g = self.quant_group
                assert half % g == 0, (
                    f"quant_group {g} must divide half the input dim {half}"
                )
                kernel_scale = self.param(
                    "kernel_scale", nn.initializers.ones,
                    (in_features // g, self.features), jnp.bfloat16,
                )
            else:
                kernel_scale = self.param(
                    "kernel_scale", nn.initializers.ones,
                    (self.features,), jnp.bfloat16,
                )
            kernel_q = jax.lax.stop_gradient(kernel_q)
            kernel_scale = jax.lax.stop_gradient(kernel_scale)
            # sign-extending nibble unpack (int8 arithmetic shifts)
            lo = jnp.right_shift(jnp.left_shift(kernel_q, 4), 4)
            hi = jnp.right_shift(kernel_q, 4)
            x_lo, x_hi = x[..., :half], x[..., half:]
            if self.act_quant:
                # per-channel scales only (enforced by LlamaConfig): the
                # output rescale commutes out of both half-dots
                lead = x.shape[:-1]
                x2 = x.reshape(-1, in_features)
                amax = jnp.max(jnp.abs(x2), axis=-1, keepdims=True)
                x_scale = jnp.maximum(amax, 1e-6).astype(jnp.float32) / 127.0
                xq = jnp.clip(
                    jnp.round(x2.astype(jnp.float32) / x_scale), -127, 127
                ).astype(jnp.int8)
                y32 = jax.lax.dot_general(
                    xq[:, :half], lo, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                ) + jax.lax.dot_general(
                    xq[:, half:], hi, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                y = (
                    y32.astype(jnp.float32)
                    * x_scale
                    * kernel_scale.astype(jnp.float32)[None, :]
                ).astype(self.dtype)
                y = y.reshape(*lead, self.features)
            elif self.quant_group:
                g = self.quant_group
                gs = kernel_scale.astype(self.dtype)
                k_lo = (
                    lo.astype(self.dtype).reshape(half // g, g, self.features)
                    * gs[: half // g, None, :]
                ).reshape(half, self.features)
                k_hi = (
                    hi.astype(self.dtype).reshape(half // g, g, self.features)
                    * gs[half // g :, None, :]
                ).reshape(half, self.features)
                y = x_lo @ k_lo + x_hi @ k_hi
            else:
                y = (
                    x_lo @ lo.astype(self.dtype) + x_hi @ hi.astype(self.dtype)
                ) * kernel_scale.astype(self.dtype)
        elif self.quantized:
            kernel_q = self.param(
                "kernel_q",
                nn.initializers.zeros,
                (in_features, self.features),
                jnp.int8,
            )
            kernel_scale = self.param(
                "kernel_scale",
                nn.initializers.ones,
                (self.features,),
                jnp.bfloat16,
            )
            kernel_q = jax.lax.stop_gradient(kernel_q)
            kernel_scale = jax.lax.stop_gradient(kernel_scale)
            if self.act_quant:
                # s8×s8: per-token absmax activation quantization feeds the
                # MXU a native int8×int8 dot — the int8→bf16 weight dequant
                # (a VPU pass over every weight element, the decode-path
                # bottleneck behind the round-1 3×-off-roofline gap) is
                # replaced by one output-side rescale
                lead = x.shape[:-1]
                x2 = x.reshape(-1, in_features)
                amax = jnp.max(jnp.abs(x2), axis=-1, keepdims=True)
                x_scale = jnp.maximum(amax, 1e-6).astype(jnp.float32) / 127.0
                xq = jnp.clip(
                    jnp.round(x2.astype(jnp.float32) / x_scale), -127, 127
                ).astype(jnp.int8)
                y32 = jax.lax.dot_general(
                    xq, kernel_q, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                y = (
                    y32.astype(jnp.float32)
                    * x_scale
                    * kernel_scale.astype(jnp.float32)[None, :]
                ).astype(self.dtype)
                y = y.reshape(*lead, self.features)
            else:
                kernel = kernel_q.astype(self.dtype) * kernel_scale.astype(
                    self.dtype
                )
                y = x @ kernel
        else:
            kernel = self.param(
                "kernel", nn.initializers.normal(0.02),
                (in_features, self.features), self.param_dtype,
            )
            if self.base_frozen:
                kernel = jax.lax.stop_gradient(kernel)
            kernel = kernel.astype(self.dtype)
            y = x @ kernel
        if self.use_lora and self.lora_rank > 0:
            a = self.param(
                "lora_a",
                nn.initializers.he_uniform(),
                (in_features, self.lora_rank),
            )
            b = self.param(
                "lora_b", nn.initializers.zeros, (self.lora_rank, self.features)
            )
            h = x
            if self.lora_dropout > 0:
                h = nn.Dropout(self.lora_dropout)(h, deterministic=deterministic)
            scale = self.lora_alpha / self.lora_rank
            y = y + (h @ a.astype(self.dtype)) @ b.astype(self.dtype) * scale
        return y


def _make_cache(cfg: LlamaConfig, batch: int, max_len: int, dtype=None):
    dtype = dtype or cfg.dtype
    shape = (cfg.num_hidden_layers, batch, max_len, cfg.kv_heads, cfg.head_dim)
    cache = {
        "k": jnp.zeros(shape, dtype),
        "v": jnp.zeros(shape, dtype),
    }
    if cfg.kv_quantize:
        return quantize_kv_cache(cache)
    return cache




def _quantize_kv(arr: jax.Array):
    """(..., h, d) bf16 → (int8 values, per-(...,h) bf16 scale).

    Per-head-per-position absmax quantization: decode reads the whole KV
    cache every step, so int8 halves that HBM traffic and the cache
    footprint; the dequant (convert × scale) fuses into the attention
    dot's operand load like the int8 weight path."""
    amax = jnp.max(jnp.abs(arr.astype(jnp.float32)), axis=-1)
    # round the scale to its bf16 storage precision BEFORE quantizing so
    # quantization and dequantization use the identical value (otherwise
    # every reconstructed element carries an extra ~2^-9 gain error on
    # top of the int8 rounding)
    scale = (jnp.maximum(amax, 1e-6) / 127.0).astype(jnp.bfloat16)
    q = jnp.clip(
        jnp.round(arr.astype(jnp.float32) / scale.astype(jnp.float32)[..., None]),
        -127, 127,
    ).astype(jnp.int8)
    return q, scale


def quantize_kv_cache(cache: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
    """bf16 {"k","v"} cache → int8 {"k","v","k_scale","v_scale"} layout."""
    kq, ks = _quantize_kv(cache["k"])
    vq, vs = _quantize_kv(cache["v"])
    return {"k": kq, "v": vq, "k_scale": ks, "v_scale": vs}


def _split_kv(cache: Dict[str, jax.Array], key: str, dtype):
    """One cache side as (values, per-(…,h) scale or None) WITHOUT
    dequantizing. The per-position-per-head scale commutes out of the
    head-dim contraction exactly — ``q·(kq·ks) == (q·kq)·ks`` and
    ``Σ_s w·(vq·vs) == Σ_s (w·vs)·vq`` — so attention can apply it to the
    (tiny) logits/weights instead of materializing a full-width bf16
    dequant of the multi-GB cache (the round-2 decode roofline gap:
    50 ms/step measured at b80 vs a ~15 ms HBM floor)."""
    scale = cache.get(f"{key}_scale")
    if scale is None:
        return cache[key], None
    return cache[key].astype(dtype), scale.astype(jnp.float32)


def _stack_layer_caches(layers):
    """[{key: (B, S, ...)}] per layer → {key: (L, B, S, ...)} or None."""
    if not layers:
        return None
    return {key: jnp.stack([l[key] for l in layers]) for key in layers[0]}


def _cache_write(cache, k, v, cache_index):
    """Write new k/v (B, T, h, d) into a (possibly int8) cache at
    ``cache_index`` along the sequence axis.

    ``cache_index`` is a scalar (every row writes the same slot — the
    uniform decode loops) or a (B,) vector of per-row slots (continuous
    batching: slots sit at different decode depths, so each row writes
    its own next position; requires T == 1)."""
    if jnp.ndim(cache_index) == 1:
        return _cache_write_rows(cache, k, v, cache_index)
    out = dict(cache)
    if "k_scale" in cache:
        kq, ks = _quantize_kv(k)
        vq, vs = _quantize_kv(v)
        out["k"] = jax.lax.dynamic_update_slice(
            cache["k"], kq, (0, cache_index, 0, 0)
        )
        out["v"] = jax.lax.dynamic_update_slice(
            cache["v"], vq, (0, cache_index, 0, 0)
        )
        out["k_scale"] = jax.lax.dynamic_update_slice(
            cache["k_scale"], ks, (0, cache_index, 0)
        )
        out["v_scale"] = jax.lax.dynamic_update_slice(
            cache["v_scale"], vs, (0, cache_index, 0)
        )
    else:
        out["k"] = jax.lax.dynamic_update_slice(
            cache["k"], k.astype(cache["k"].dtype), (0, cache_index, 0, 0)
        )
        out["v"] = jax.lax.dynamic_update_slice(
            cache["v"], v.astype(cache["v"].dtype), (0, cache_index, 0, 0)
        )
    return out


def _cache_write_rows(cache, k, v, cache_index):
    """Per-row cache write: row b's T tokens land at consecutive slots
    ``cache_index[b] .. cache_index[b]+T-1``.

    Out-of-bounds rows (e.g. an idle continuous-batching slot carrying
    index -1, or a finished speculative row parked at index S) are
    dropped by JAX scatter semantics — their mask keeps them unread
    anyway. T == 1 is the continuous-batching decode step; T > 1 is the
    speculative-decoding verify window."""
    b, t = k.shape[:2]
    s = cache["k"].shape[1]
    rows = jnp.arange(b)[:, None]  # (B, 1)
    idx = cache_index[:, None] + jnp.arange(t)[None, :]  # (B, T)
    # a negative start must drop the whole window — scatter mode="drop"
    # only drops indices >= S; NEGATIVE indices wrap NumPy-style, so map
    # them explicitly past the end
    idx = jnp.where(cache_index[:, None] < 0, s, idx)
    out = dict(cache)
    if "k_scale" in cache:
        kq, ks = _quantize_kv(k)
        vq, vs = _quantize_kv(v)
        out["k"] = cache["k"].at[rows, idx].set(kq, mode="drop")
        out["v"] = cache["v"].at[rows, idx].set(vq, mode="drop")
        out["k_scale"] = cache["k_scale"].at[rows, idx].set(ks, mode="drop")
        out["v_scale"] = cache["v_scale"].at[rows, idx].set(vs, mode="drop")
    else:
        out["k"] = cache["k"].at[rows, idx].set(
            k.astype(cache["k"].dtype), mode="drop"
        )
        out["v"] = cache["v"].at[rows, idx].set(
            v.astype(cache["v"].dtype), mode="drop"
        )
    return out


class LlamaAttention(nn.Module):
    cfg: LlamaConfig

    @nn.compact
    def __call__(
        self,
        x: jax.Array,  # (B, T, H)
        positions: jax.Array,  # (B, T)
        attn_bias: Optional[jax.Array],  # (B, 1, T, S) additive mask; None
        # only on the sequence-parallel path (key_valid carries the mask)
        kv_cache: Optional[Dict[str, jax.Array]] = None,  # {"k","v"}: (B,S,hkv,D)
        cache_index: Optional[jax.Array] = None,  # scalar write offset
        shared_prompt_kv: Optional[Dict[str, jax.Array]] = None,  # (B,S_p,hkv,D)
        key_valid: Optional[jax.Array] = None,  # (B, T) for the sp ring path
        *,
        anc_pairs_k: Optional[int] = None,  # beam-ancestry decode (see below)
        return_kv: bool = False,  # prefill: also return this call's raw k/v
        deterministic: bool = True,
    ):
        cfg = self.cfg
        lora = dict(
            lora_rank=cfg.lora_rank, lora_alpha=cfg.lora_alpha,
            lora_dropout=cfg.lora_dropout, dtype=cfg.dtype,
            param_dtype=cfg.param_dtype, quantized=cfg.quantize,
            act_quant=cfg.act_quantize, bits=cfg.quantize_bits,
            quant_group=cfg.quantize_group,
        )

        def proj(name, features):
            return LoraDense(
                features,
                use_lora=cfg.lora_rank > 0 and name in cfg.lora_targets,
                name=name,
                **lora,
            )

        b, t, _ = x.shape
        q = proj("q_proj", cfg.num_attention_heads * cfg.head_dim)(x, deterministic=deterministic)
        k = proj("k_proj", cfg.kv_heads * cfg.head_dim)(x, deterministic=deterministic)
        v = proj("v_proj", cfg.kv_heads * cfg.head_dim)(x, deterministic=deterministic)
        q = q.reshape(b, t, cfg.num_attention_heads, cfg.head_dim)
        k = k.reshape(b, t, cfg.kv_heads, cfg.head_dim)
        v = v.reshape(b, t, cfg.kv_heads, cfg.head_dim)

        q = apply_rope(q, positions, cfg.rope_theta)
        k = apply_rope(k, positions, cfg.rope_theta)

        new_cache = None
        k_scale = v_scale = None
        if kv_cache is not None:
            # decode: write current k/v at cache_index, attend over full cache
            new_cache = _cache_write(kv_cache, k, v, cache_index)

            if anc_pairs_k is None:
                k, k_scale = _split_kv(new_cache, "k", cfg.dtype)
                v, v_scale = _split_kv(new_cache, "v", cfg.dtype)
        elif return_kv:
            # prefill capture: this call's rope'd k/v become the prompt
            # segment of the decode cache — attention itself runs plainly
            # over the prompt (no padded cache slots)
            new_cache = {"k": k, "v": v}

        if (
            cfg.flash_attention
            and kv_cache is None
            and shared_prompt_kv is None
            and cfg.sp_axis is None
        ):
            # fused streaming attention: no (B,H,T,S) fp32 temps, GQA
            # native (no repeated k/v), causality + key padding in-kernel
            from msr3d_tpu.ops.flash_attention import flash_attention

            if key_valid is None:
                key_valid = jnp.ones((b, t), bool)
            out = flash_attention(
                q, k, v, causal=True, key_valid=key_valid.astype(bool)
            )
            out = out.reshape(b, t, cfg.num_attention_heads * cfg.head_dim)
            out = proj("o_proj", cfg.hidden_size)(out, deterministic=deterministic)
            return out, new_cache

        # GQA: repeat kv heads
        n_rep = cfg.num_attention_heads // cfg.kv_heads

        def rep(arr):
            return jnp.repeat(arr, n_rep, axis=2) if n_rep > 1 else arr

        scale = 1.0 / jnp.sqrt(cfg.head_dim).astype(jnp.float32)

        def seg_logits(seg_kq, seg_ks):
            """Scores of the B queries against a (B', S', hkv, D) segment
            shared across blocks of B // B' consecutive query rows (the
            split-cache prompt machinery) → (B, H, T, S')."""
            k_seg = rep(seg_kq)
            bp = k_seg.shape[0]
            k_rep = b // bp
            qr = q.reshape(bp, k_rep * t, cfg.num_attention_heads, cfg.head_dim)
            lp = jnp.einsum("bkhd,bshd->bkhs", qr, k_seg).astype(jnp.float32) * scale
            if seg_ks is not None:  # scale-outside dequant (see _split_kv)
                ks = rep(seg_ks[..., None])[..., 0]
                lp = lp * ks.transpose(0, 2, 1)[:, None]
            return lp.reshape(b, t, cfg.num_attention_heads, -1).transpose(0, 2, 1, 3)

        def seg_out(weights_seg, seg_vq, seg_vs):
            """(B, H, T, S') softmax weights × segment values → (B, T, H, D)."""
            v_seg = rep(seg_vq)
            bp = v_seg.shape[0]
            k_rep = b // bp
            w = weights_seg.transpose(0, 2, 1, 3).reshape(
                bp, k_rep * t, cfg.num_attention_heads, -1
            )
            if seg_vs is not None:
                vs = rep(seg_vs[..., None])[..., 0]
                w = w * vs.transpose(0, 2, 1)[:, None]
            return jnp.einsum(
                "bkhs,bshd->bkhd", w.astype(cfg.dtype), v_seg
            ).reshape(b, t, cfg.num_attention_heads, cfg.head_dim)

        if anc_pairs_k is not None:
            # Beam-ancestry decode: generated-cache rows NEVER reorder on a
            # beam step (the multi-GB per-step gather and its double-buffer
            # — the measured 256-budget beam OOM wall — disappear). Instead
            # each query sees ALL K beam rows' slots of its question as a
            # (K·S) pair segment; the caller's attn_bias admits exactly the
            # (row, slot) pairs on the query's ancestry path. Identical
            # math to the physically-reordered cache — token-exact in
            # tests. Requires T == 1 (the beam decode loop).
            assert t == 1 and shared_prompt_kv is not None
            # ``shared_prompt_kv`` may be one segment dict or a tuple of
            # segment dicts (e.g. the prefix-pool beam engine's flattened
            # block pool + flattened per-slot suffix pool); each segment's
            # scores concatenate in order before the gen pairs
            segments = (
                shared_prompt_kv
                if isinstance(shared_prompt_kv, (list, tuple))
                else (shared_prompt_kv,)
            )
            seg_kv = [
                (
                    *_split_kv(seg, "k", cfg.dtype),
                    *_split_kv(seg, "v", cfg.dtype),
                )
                for seg in segments
            ]
            kq_g, ks_g = _split_kv(new_cache, "k", cfg.dtype)
            vq_g, vs_g = _split_kv(new_cache, "v", cfg.dtype)
            bq = b // anc_pairs_k

            def pairs(arr):
                return (
                    None if arr is None
                    else arr.reshape((bq, anc_pairs_k * arr.shape[1]) + arr.shape[2:])
                )

            widths = [kq_p.shape[1] for kq_p, _, _, _ in seg_kv]
            logits = jnp.concatenate(
                [seg_logits(kq_p, ks_p) for kq_p, ks_p, _, _ in seg_kv]
                + [seg_logits(pairs(kq_g), pairs(ks_g))],
                axis=-1,
            ) + attn_bias
            weights = jax.nn.softmax(logits, axis=-1)
            out = seg_out(weights[..., sum(widths):], pairs(vq_g), pairs(vs_g))
            off = 0
            for (_, _, vq_p, vs_p), w_p in zip(seg_kv, widths):
                out = out + seg_out(weights[..., off:off + w_p], vq_p, vs_p)
                off += w_p
            out = out.reshape(b, t, cfg.num_attention_heads * cfg.head_dim)
            out = proj("o_proj", cfg.hidden_size)(out, deterministic=deterministic)
            return out, new_cache

        k, v = rep(k), rep(v)
        if k_scale is not None:
            k_scale, v_scale = rep(k_scale[..., None])[..., 0], rep(v_scale[..., None])[..., 0]

        if (
            cfg.sp_axis is not None
            and kv_cache is None
            and shared_prompt_kv is None
            and not return_kv  # generation prefill stays dense (fits a chip)
        ):
            # sequence-parallel training forward: exact ring attention over
            # the sp mesh axis (sequence dim sharded; the dense T×T bias is
            # never materialized — key_valid carries the padding mask)
            from msr3d_tpu.parallel.mesh import ambient_mesh
            from msr3d_tpu.parallel.ring_attention import ring_attention

            if key_valid is None:
                key_valid = jnp.ones((b, t), bool)
            out = ring_attention(
                ambient_mesh(), q, k, v,
                axis=cfg.sp_axis, causal=True,
                key_valid=key_valid.astype(bool),
                batch_axis=cfg.sp_data_axis,
            )
            out = out.reshape(b, t, cfg.num_attention_heads * cfg.head_dim)
            out = proj("o_proj", cfg.hidden_size)(out, deterministic=deterministic)
            return out, None

        attn = jnp.einsum("bthd,bshd->bhts", q, k).astype(jnp.float32) * scale
        if k_scale is not None:  # (B,S,H) → (B,H,1,S), applied to the logits
            attn = attn * k_scale.transpose(0, 2, 1)[:, :, None, :]

        if shared_prompt_kv is not None:
            # split-cache decode: a prompt KV segment shared across beams
            # (batch B, queries batch B·K). Beam search with a monolithic
            # cache materializes the prompt ×K and gathers all of it on
            # every reorder; sharing keeps it at batch B, read-only. Same
            # math as the fused cache (softmax over the concatenated score
            # vector) — token-exact vs the monolithic path in tests.
            kq_p, ks_p = _split_kv(shared_prompt_kv, "k", cfg.dtype)
            vq_p, vs_p = _split_kv(shared_prompt_kv, "v", cfg.dtype)
            k_p, v_p = rep(kq_p), rep(vq_p)  # (B,S_p,H,D)
            if ks_p is not None:
                ks_p = rep(ks_p[..., None])[..., 0]  # (B,S_p,H)
                vs_p = rep(vs_p[..., None])[..., 0]
            bp = k_p.shape[0]
            k_rep = b // bp
            qr = q.reshape(bp, k_rep * t, cfg.num_attention_heads, cfg.head_dim)
            lp = jnp.einsum("bkhd,bshd->bkhs", qr, k_p).astype(jnp.float32) * scale
            if ks_p is not None:  # scale-outside dequant (see _split_kv)
                lp = lp * ks_p.transpose(0, 2, 1)[:, None]  # (B,1,H,S_p)
            lp = lp.reshape(b, t, cfg.num_attention_heads, -1).transpose(0, 2, 1, 3)
            s_p = k_p.shape[1]
            logits = jnp.concatenate([lp, attn], axis=-1) + attn_bias
            weights = jax.nn.softmax(logits, axis=-1)
            w_p = weights[..., :s_p].transpose(0, 2, 1, 3).reshape(
                bp, k_rep * t, cfg.num_attention_heads, s_p
            )
            if vs_p is not None:
                w_p = w_p * vs_p.transpose(0, 2, 1)[:, None]  # (B,1,H,S_p)
            w_g = weights[..., s_p:]
            if v_scale is not None:
                w_g = w_g * v_scale.transpose(0, 2, 1)[:, :, None, :]
            out_p = jnp.einsum(
                "bkhs,bshd->bkhd", w_p.astype(cfg.dtype), v_p
            ).reshape(b, t, cfg.num_attention_heads, cfg.head_dim)
            out = out_p + jnp.einsum("bhts,bshd->bthd", w_g.astype(cfg.dtype), v)
        else:
            attn = attn + attn_bias
            weights = jax.nn.softmax(attn, axis=-1)
            if v_scale is not None:
                weights = weights * v_scale.transpose(0, 2, 1)[:, :, None, :]
            out = jnp.einsum("bhts,bshd->bthd", weights.astype(cfg.dtype), v)
        out = out.reshape(b, t, cfg.num_attention_heads * cfg.head_dim)
        out = proj("o_proj", cfg.hidden_size)(out, deterministic=deterministic)
        return out, new_cache


class LlamaMLP(nn.Module):
    cfg: LlamaConfig

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        cfg = self.cfg
        lora = dict(
            lora_rank=cfg.lora_rank, lora_alpha=cfg.lora_alpha,
            lora_dropout=cfg.lora_dropout, dtype=cfg.dtype,
            param_dtype=cfg.param_dtype, quantized=cfg.quantize,
            act_quant=cfg.act_quantize, bits=cfg.quantize_bits,
            quant_group=cfg.quantize_group,
        )

        def proj(name, features):
            return LoraDense(
                features,
                use_lora=cfg.lora_rank > 0 and name in cfg.lora_targets,
                name=name,
                **lora,
            )

        gate = proj("gate_proj", cfg.intermediate_size)(x, deterministic=deterministic)
        up = proj("up_proj", cfg.intermediate_size)(x, deterministic=deterministic)
        return proj("down_proj", cfg.hidden_size)(
            nn.silu(gate) * up, deterministic=deterministic
        )


class LlamaBlock(nn.Module):
    cfg: LlamaConfig

    @nn.compact
    def __call__(
        self, x, positions, attn_bias, kv_cache=None, cache_index=None,
        shared_prompt_kv=None, key_valid=None, *, anc_pairs_k=None,
        return_kv: bool = False, deterministic: bool = True,
    ):
        cfg = self.cfg
        h = RMSNorm(cfg.rms_norm_eps, cfg.dtype, name="input_norm")(x)
        h, new_cache = LlamaAttention(cfg, name="attn")(
            h, positions, attn_bias, kv_cache, cache_index, shared_prompt_kv,
            key_valid, anc_pairs_k=anc_pairs_k, return_kv=return_kv,
            deterministic=deterministic,
        )
        # checkpoint_name tags are no-ops outside remat; under the
        # "residuals" policy only these two (T, hidden) branch outputs
        # are saved — ~5× less than "dots" (which also keeps the q/k/v
        # and gate/up projections), buying micro-batch headroom at the
        # cost of recomputing those projections in backward
        h = checkpoint_name(h, "attn_out")
        x = x + h
        h = RMSNorm(cfg.rms_norm_eps, cfg.dtype, name="post_attn_norm")(x)
        h = LlamaMLP(cfg, name="mlp")(h, deterministic=deterministic)
        h = checkpoint_name(h, "mlp_out")
        return x + h, new_cache


class FrozenHead(nn.Module):
    """LM head with a stop-gradiented kernel (the LLM head never trains)."""

    vocab_size: int
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, hidden):
        kernel = self.param(
            "kernel", nn.initializers.normal(0.02),
            (hidden.shape[-1], self.vocab_size), self.param_dtype,
        )
        return hidden @ jax.lax.stop_gradient(kernel).astype(self.dtype)


class LlamaModel(nn.Module):
    """Decoder-only Llama, driven by ``inputs_embeds``.

    The embedding table is exposed via ``embed_tokens`` (a method) so the
    MSR3D model can splice scene/image embeddings between token embeddings
    exactly as the reference does (msr3d.py:230-287).
    """

    cfg: LlamaConfig

    def setup(self):
        cfg = self.cfg
        self.embedding = nn.Embed(
            cfg.vocab_size, cfg.hidden_size,
            embedding_init=nn.initializers.normal(0.02),
            param_dtype=cfg.param_dtype,
            name="embed_tokens",
        )
        policy = resolve_remat_policy(cfg.remat_policy)
        # prevent_cse=True is REQUIRED here: these blocks are UNROLLED,
        # and without the optimization barrier XLA common-subexpression-
        # eliminates the backward recompute against the original forward,
        # silently undoing rematerialization (round-5 finding: compile-
        # only probes showed 10+ layers' MLP dot temps simultaneously
        # live under the "full" policy — ~8 GB of phantom residuals at
        # 4k tokens). prevent_cse=False is only safe under lax.scan,
        # where CSE cannot fire across iterations (parallel/llm_pp.py).
        block_cls = (
            nn.remat(
                LlamaBlock, prevent_cse=True, static_argnums=(5,),
                policy=policy,
            )
            if cfg.remat
            else LlamaBlock
        )
        self.blocks = [
            block_cls(cfg, name=f"layer_{i}") for i in range(cfg.num_hidden_layers)
        ]
        self.final_norm = RMSNorm(cfg.rms_norm_eps, cfg.dtype, name="final_norm")
        if not cfg.tie_word_embeddings:
            self.lm_head = FrozenHead(
                cfg.vocab_size, cfg.dtype, cfg.param_dtype, name="lm_head"
            )

    def embed_tokens(self, input_ids: jax.Array) -> jax.Array:
        # frozen LLM: embeddings never train (msr3d.py:79-81)
        return jax.lax.stop_gradient(
            self.embedding(input_ids).astype(self.cfg.dtype)
        )

    def logits(self, hidden: jax.Array) -> jax.Array:
        if self.cfg.tie_word_embeddings:
            kernel = self.embedding.embedding.T.astype(self.cfg.dtype)
            return hidden @ jax.lax.stop_gradient(kernel)
        return self.lm_head(hidden)

    def __call__(
        self,
        inputs_embeds: jax.Array,  # (B, T, H)
        attention_mask: jax.Array,  # (B, T) 1 = attend
        positions: Optional[jax.Array] = None,
        kv_caches: Optional[Dict[str, jax.Array]] = None,  # stacked (L, B, S, h, D)
        cache_index: Optional[jax.Array] = None,
        cache_mask: Optional[jax.Array] = None,  # (B, S) 1 = valid cache slot
        *,
        deterministic: bool = True,
        answer_start: Optional[int] = None,
    ):
        """Returns (logits (B,T,V), hidden (B,T,H), new kv_caches or None).

        ``answer_start``: compute logits only for positions
        ``answer_start-1 .. T-2`` — the answer-predicting window; the
        fp32 logits buffer is the training-memory cap and every target
        before the window is -100 (see sequence_ce_loss_windowed)."""
        cfg = self.cfg
        b, t, _ = inputs_embeds.shape
        if positions is None:
            # HF semantics with left padding: position = cumsum of mask - 1
            positions = jnp.maximum(jnp.cumsum(attention_mask, axis=1) - 1, 0)

        key_valid = None
        if kv_caches is None and (cfg.sp_axis is not None or cfg.flash_attention):
            # ring attention (sp) and the fused flash kernel both apply
            # causality + key padding themselves — the dense (B,1,T,S)
            # fp32 bias never materializes
            attn_bias = None
            key_valid = attention_mask.astype(bool)
        elif kv_caches is None:
            # prefill: causal mask ∧ key-padding mask
            causal = jnp.tril(jnp.ones((t, t), dtype=bool))
            mask = causal[None, None, :, :] & attention_mask[:, None, None, :].astype(bool)
            attn_bias = jnp.where(mask, 0.0, -1e30).astype(jnp.float32)
        else:
            # decode: attend over cache slots marked valid + current position
            s = kv_caches["k"].shape[2]
            assert cache_mask is not None
            valid = cache_mask[:, None, :].astype(bool)  # (B, 1, S)
            if t > 1:
                # multi-token verify window (speculative decoding): query t
                # additionally sees this call's own writes at slots
                # cache_index .. cache_index+t — causal WITHIN the window,
                # without the caller pre-marking slots whose tokens may be
                # rejected. T == 1 keeps the legacy contract (caller marks
                # the current slot in cache_mask).
                start = jnp.asarray(cache_index)
                start = (
                    start[:, None, None] if start.ndim == 1
                    else start.reshape(1, 1, 1)
                )
                s_idx = jnp.arange(s)[None, None, :]
                tq = jnp.arange(t)[None, :, None]
                win = (s_idx >= start) & (s_idx <= start + tq)
                valid = valid | win
            attn_bias = jnp.where(
                valid[:, None], 0.0, -1e30
            ).astype(jnp.float32)

        x = inputs_embeds.astype(cfg.dtype)
        updated_layers = []
        for i, block in enumerate(self.blocks):
            layer_cache = (
                None
                if kv_caches is None
                else {key: val[i] for key, val in kv_caches.items()}
            )
            x, updated = block(
                x, positions, attn_bias, layer_cache, cache_index,
                key_valid=key_valid, deterministic=deterministic,
            )
            if updated is not None:
                updated_layers.append(updated)

        x = self.final_norm(x)
        logits = self.logits(
            x if answer_start is None else x[:, answer_start - 1 : -1]
        )
        new_caches = _stack_layer_caches(updated_layers)
        return logits, x, new_caches

    def decode_step_shared(
        self,
        inputs_embeds: jax.Array,  # (B·K, 1, H)
        positions: jax.Array,  # (B·K, 1)
        prompt_kv: Dict[str, jax.Array],  # k/v: (L, B, S_p, hkv, D) frozen
        prompt_mask: jax.Array,  # (B, S_p)
        gen_kv: Dict[str, jax.Array],  # k/v: (L, B·K, S_g, hkv, D)
        gen_index,  # scalar write offset into the generated segment
        gen_mask: jax.Array,  # (B·K, S_g)
        window_valid: Optional[jax.Array] = None,  # (B·K, T) bool
    ):
        """One decode step over a split cache: shared prompt segment
        (batch B, never copied per beam) + per-beam generated segment.
        Returns (logits (B·K, T, V), new gen_kv).

        T == 1 is the plain decode loops; T > 1 is the speculative verify
        window (``gen_index`` may then be a (B,) vector — rows at
        different depths — and query t additionally sees this call's own
        generated-segment writes causally from ``gen_index``).

        ``window_valid`` marks which window positions hold REAL tokens —
        the grouped-prefill path (a left-padded per-question suffix run as
        one T>1 window over a shared scene prefix) gates in-window key
        visibility with it, so pad slots written by this call are never
        attended. ``None`` keeps the speculative contract (every window
        slot ≤ the query position is visible).

        ``prompt_mask`` may alternatively carry batch B·K (one visibility
        row PER QUERY): the prefix-pool serving engines flatten a
        (G, S_pre) block pool into a batch-1 (1, G·S_pre) prompt segment
        shared by every slot, and the per-query mask admits exactly the
        rows of the slot's assigned block — arbitrary slot→block maps,
        where the contiguous ``bk // b`` repeat cannot express them."""
        cfg = self.cfg
        bk, t, _ = inputs_embeds.shape
        b = next(iter(prompt_kv.values())).shape[1]
        pm = (
            prompt_mask if prompt_mask.shape[0] == bk
            else jnp.repeat(prompt_mask, bk // b, axis=0)
        )
        bias_p = jnp.where(
            pm[:, None, None, :].astype(bool), 0.0, -1e30
        ).astype(jnp.float32)
        valid_g = gen_mask[:, None, :].astype(bool)  # (B·K, 1, S_g)
        if t > 1:
            s_g = gen_mask.shape[1]
            start = jnp.asarray(gen_index)
            start = (
                start[:, None, None] if start.ndim == 1
                else start.reshape(1, 1, 1)
            )
            s_idx = jnp.arange(s_g)[None, None, :]
            tq = jnp.arange(t)[None, :, None]
            win = (s_idx >= start) & (s_idx <= start + tq)
            if window_valid is not None:
                # key slot start+j carries window token j — pad tokens
                # (window_valid[b, j] == 0) stay invisible even in-window
                j = jnp.clip(s_idx - start, 0, t - 1)  # (B|1, 1, S_g)
                j = jnp.broadcast_to(j, (bk, 1, s_g))
                wv = jnp.take_along_axis(
                    window_valid.astype(bool)[:, None, :], j, axis=2
                )
                win = win & wv
            valid_g = valid_g | win
        bias_g = jnp.where(valid_g[:, None], 0.0, -1e30).astype(jnp.float32)
        attn_bias = jnp.concatenate(
            [jnp.broadcast_to(bias_p, bias_p.shape[:2] + (t, bias_p.shape[-1])),
             bias_g],
            axis=-1,
        )

        x = inputs_embeds.astype(cfg.dtype)
        layered = isinstance(gen_kv, (list, tuple))
        updated_layers = []
        for i, block in enumerate(self.blocks):
            x, updated = block(
                x, positions, attn_bias,
                gen_kv[i] if layered
                else {key: val[i] for key, val in gen_kv.items()},
                gen_index,
                {key: val[i] for key, val in prompt_kv.items()},
            )
            updated_layers.append(updated)
        x = self.final_norm(x)
        # per-layer (tuple) layout: each layer's write aliases its own
        # carry leaf — the stacked layout's slice/re-stack copies the
        # whole generated cache per step inside a while_loop carry
        new_caches = (
            tuple(updated_layers) if layered
            else _stack_layer_caches(updated_layers)
        )
        return self.logits(x), new_caches

    def decode_step_beam_anc(
        self,
        inputs_embeds: jax.Array,  # (B·K, 1, H)
        positions: jax.Array,  # (B·K, 1)
        prompt_kv: Dict[str, jax.Array],  # k/v: (L, B', S_p, hkv, D) frozen
        prompt_mask: jax.Array,  # (B', S_p)
        gen_kv: Dict[str, jax.Array],  # k/v: (L, B·K, S_g, hkv, D)
        gen_index,  # scalar write offset into the generated segment
        gen_mask: jax.Array,  # (B·K, S_g) valid generated slots
        anc: jax.Array,  # (B·K, S_g) int32 ancestor row WITHIN the K block
        num_beams: int,
    ):
        """One beam decode step with ANCESTRY-INDIRECTED generated KV.

        The standard beam step physically reorders the generated cache on
        every beam re-rank (``caches[:, gather]``) — at the 256-token eval
        budget that gather's un-aliasable output double-buffers the
        multi-GB generated segment, the measured beam batch-size wall.
        Here rows never move: ``anc[r, s]`` names which row of the
        question's K block wrote query row r's history at slot s, queries
        attend over all K rows' slots as a (K·S) pair segment, and the
        additive bias admits exactly the pairs on the ancestry path —
        identical math, token-exact in tests, only a (B·K, S) int32 map
        reorders per step.

        ``prompt_mask`` may carry batch B·K (per-query visibility rows)
        exactly as in :meth:`decode_step_shared` — the prefix-pool beam
        engine's flattened block pool. ``prompt_kv`` may be a TUPLE of
        segment dicts (their widths concatenate in order; ``prompt_mask``
        must then be per-query over the total width): the prefix-pool
        beam engine passes (flattened block pool, flattened per-slot
        suffix pool) so suffix KV is stored once per slot, never
        replicated across beam rows."""
        cfg = self.cfg
        bk = inputs_embeds.shape[0]
        segmented = isinstance(prompt_kv, (list, tuple))
        s_g = gen_mask.shape[1]
        if segmented:
            assert prompt_mask.shape[0] == bk, (
                "segmented prompt_kv requires a per-query prompt_mask"
            )
            pm = prompt_mask
        else:
            b = next(iter(prompt_kv.values())).shape[1]
            pm = (
                prompt_mask if prompt_mask.shape[0] == bk
                else jnp.repeat(prompt_mask, bk // b, axis=0)
            )
        bias_p = jnp.where(
            pm[:, None, None, :].astype(bool), 0.0, -1e30
        ).astype(jnp.float32)
        # pair (row, slot) visible to query row r iff the slot is live and
        # row is r's ancestor at that slot
        rowids = jnp.arange(num_beams)[None, :, None]  # (1, K, 1)
        vis = gen_mask[:, None, :].astype(bool) & (anc[:, None, :] == rowids)
        bias_g = jnp.where(
            vis.reshape(bk, 1, 1, num_beams * s_g), 0.0, -1e30
        ).astype(jnp.float32)
        attn_bias = jnp.concatenate([bias_p, bias_g], axis=-1)

        x = inputs_embeds.astype(cfg.dtype)
        layered = isinstance(gen_kv, (list, tuple))
        updated_layers = []
        for i, block in enumerate(self.blocks):
            if segmented:
                layer_prompt = tuple(
                    {key: val[i] for key, val in seg.items()}
                    for seg in prompt_kv
                )
            else:
                layer_prompt = {key: val[i] for key, val in prompt_kv.items()}
            x, updated = block(
                x, positions, attn_bias,
                gen_kv[i] if layered
                else {key: val[i] for key, val in gen_kv.items()},
                gen_index,
                layer_prompt,
                anc_pairs_k=num_beams,
            )
            updated_layers.append(updated)
        x = self.final_norm(x)
        # the per-layer (tuple) cache layout skips the slice/re-stack round
        # trip of the stacked (L, …) layout — inside a while_loop that
        # round trip is a full extra copy of the multi-GB generated cache
        # in the carry, the 256-token-budget beam memory wall
        new_caches = (
            tuple(updated_layers) if layered
            else _stack_layer_caches(updated_layers)
        )
        return self.logits(x), new_caches

    def prefill_with_cache(
        self,
        inputs_embeds: jax.Array,
        attention_mask: jax.Array,
        max_cache_len: int,
        *,
        deterministic: bool = True,
        logits_last_only: bool = False,
    ):
        """Run prefill AND populate a KV cache of length ``max_cache_len``.

        Returns (logits, hidden, kv_caches, cache_mask, positions_next).
        The prompt occupies cache slots [0, T); decode continues at T.
        ``logits_last_only`` computes logits only for the final position —
        (B, V, fp-size)-scale savings that matter at large batch (decode
        start needs just the last step).

        Attention runs plainly over the prompt (T×T causal) and each
        block's rope'd k/v are captured and padded into the cache after
        the fact — never a decode-style pass over padded cache slots, and
        with ``cfg.kv_quantize`` the padded cache materializes directly in
        int8 (the earlier full-length bf16 transient was the batch-64
        compile-OOM: two 4 GB cache copies inside the program).
        """
        cfg = self.cfg
        b, t, _ = inputs_embeds.shape
        assert t <= max_cache_len
        positions = jnp.maximum(jnp.cumsum(attention_mask, axis=1) - 1, 0)

        key_valid = None
        if cfg.flash_attention:
            attn_bias = None  # the kernel applies causality + key padding
            key_valid = attention_mask.astype(bool)
        else:
            causal = jnp.tril(jnp.ones((t, t), dtype=bool))
            mask = causal[None, None, :, :] & attention_mask[:, None, None, :].astype(bool)
            attn_bias = jnp.where(mask, 0.0, -1e30).astype(jnp.float32)

        x = inputs_embeds.astype(cfg.dtype)
        layers = []
        for block in self.blocks:
            # kv_cache/cache_index passed POSITIONALLY (as None): under
            # cfg.remat the block class is nn.remat-wrapped with
            # static_argnums indexing the full positional signature, and
            # a shorter call arity makes that index out of range (the
            # round-5 7B overfit crash — a remat=True config reaching
            # generate()). The train forward (``__call__``) passes the
            # same five positionals.
            x, captured = block(
                x, positions, attn_bias, None, None, return_kv=True,
                key_valid=key_valid, deterministic=deterministic,
            )
            layer = dict(captured)
            if cfg.kv_quantize:
                layer = quantize_kv_cache(layer)
            pad = max_cache_len - t
            layers.append(
                {
                    key: jnp.pad(
                        val, [(0, 0), (0, pad)] + [(0, 0)] * (val.ndim - 2)
                    )
                    for key, val in layer.items()
                }
            )

        x = self.final_norm(x)
        logits = self.logits(x[:, -1:]) if logits_last_only else self.logits(x)
        kv_caches = _stack_layer_caches(layers)
        slot = jnp.arange(max_cache_len)[None, :]
        cache_mask = (slot < t) & (
            jnp.pad(attention_mask, ((0, 0), (0, max_cache_len - t))).astype(bool)
        )
        next_positions = positions[:, -1] + 1  # (B,)
        return logits, x, kv_caches, cache_mask, next_positions
