"""HF Llama / PEFT-LoRA checkpoint → flax param tree conversion.

Supports:
  - in-memory torch state dicts (used by parity tests against a tiny
    random HF LlamaForCausalLM)
  - on-disk HF checkpoints (pytorch_model*.bin / model*.safetensors),
    loaded shard-by-shard to bound host memory for 7B weights
  - PEFT LoRA adapter state dicts (lora_A/lora_B per target module)

The reference loads Vicuna with ``LlamaForCausalLM.from_pretrained(...,
torch_dtype=float16)`` then wraps with PEFT (msr3d.py:75-112); here the
same weights land in a pure pytree consumed by ``LlamaModel``.
"""

from __future__ import annotations

import json
import re
from pathlib import Path
from typing import Any, Dict

import numpy as np

from msr3d_tpu.models.llm.llama import LlamaConfig


def _np(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    return t.detach().cpu().float().numpy()


def config_from_hf(hf_cfg: Dict[str, Any], **overrides) -> LlamaConfig:
    """Build LlamaConfig from an HF config.json dict."""
    kw = dict(
        vocab_size=hf_cfg["vocab_size"],
        hidden_size=hf_cfg["hidden_size"],
        intermediate_size=hf_cfg["intermediate_size"],
        num_hidden_layers=hf_cfg["num_hidden_layers"],
        num_attention_heads=hf_cfg["num_attention_heads"],
        num_key_value_heads=hf_cfg.get("num_key_value_heads"),
        max_position_embeddings=hf_cfg.get("max_position_embeddings", 2048),
        rms_norm_eps=hf_cfg.get("rms_norm_eps", 1e-6),
        rope_theta=hf_cfg.get("rope_theta", 10000.0),
        tie_word_embeddings=hf_cfg.get("tie_word_embeddings", False),
    )
    kw.update(overrides)
    return LlamaConfig(**kw)


def params_from_hf_state_dict(
    sd: Dict[str, Any], cfg: LlamaConfig, dtype=np.float32
) -> Dict[str, Any]:
    """HF LlamaForCausalLM state dict → our flax ``params`` tree."""

    def get(name):
        return _np(sd[name]).astype(dtype)

    params: Dict[str, Any] = {
        "embed_tokens": {"embedding": get("model.embed_tokens.weight")},
        "final_norm": {"scale": get("model.norm.weight")},
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = {"kernel": get("lm_head.weight").T}

    for i in range(cfg.num_hidden_layers):
        hf = f"model.layers.{i}"
        params[f"layer_{i}"] = {
            "attn": {
                proj: {"kernel": get(f"{hf}.self_attn.{proj}.weight").T}
                for proj in ("q_proj", "k_proj", "v_proj", "o_proj")
            },
            "mlp": {
                proj: {"kernel": get(f"{hf}.mlp.{proj}.weight").T}
                for proj in ("gate_proj", "up_proj", "down_proj")
            },
            "input_norm": {"scale": get(f"{hf}.input_layernorm.weight")},
            "post_attn_norm": {"scale": get(f"{hf}.post_attention_layernorm.weight")},
        }
    return params


_PEFT_RE = re.compile(
    r"(?:base_model\.model\.)?model\.layers\.(\d+)\."
    r"(self_attn|mlp)\.(\w+_proj)\.lora_(A|B)(?:\.\w+)?\.weight"
)


def merge_peft_lora(
    params: Dict[str, Any], lora_sd: Dict[str, Any], dtype=np.float32
) -> Dict[str, Any]:
    """Insert PEFT lora_A/lora_B weights into an existing param tree.

    PEFT stores lora_A (r, in) and lora_B (out, r); our LoraDense uses
    lora_a (in, r), lora_b (r, out).
    """
    for key, val in lora_sd.items():
        m = _PEFT_RE.match(key)
        if not m:
            continue
        layer, block, proj, ab = m.groups()
        block_name = "attn" if block == "self_attn" else "mlp"
        dst = params[f"layer_{layer}"][block_name][proj]
        w = _np(val).astype(dtype)
        if ab == "A":
            dst["lora_a"] = w.T
        else:
            dst["lora_b"] = w.T
    return params


def init_lora_params(params: Dict[str, Any], cfg: LlamaConfig, seed: int = 0):
    """Add freshly-initialized LoRA A/B to every target projection
    (A ~ he-uniform, B = 0 → delta starts at zero, PEFT default)."""
    rng = np.random.default_rng(seed)
    for i in range(cfg.num_hidden_layers):
        for block, projs in (
            ("attn", ("q_proj", "k_proj", "v_proj", "o_proj")),
            ("mlp", ("gate_proj", "up_proj", "down_proj")),
        ):
            for proj in projs:
                if proj not in cfg.lora_targets:
                    continue
                dst = params[f"layer_{i}"][block][proj]
                fan_in = dst["kernel"].shape[0]
                bound = np.sqrt(6.0 / fan_in)
                dst["lora_a"] = rng.uniform(
                    -bound, bound, size=(fan_in, cfg.lora_rank)
                ).astype(np.float32)
                dst["lora_b"] = np.zeros(
                    (cfg.lora_rank, dst["kernel"].shape[1]), np.float32
                )
    return params


def load_hf_checkpoint(path: str | Path, **config_overrides):
    """Load an on-disk HF Llama checkpoint directory → (cfg, params).

    Handles single/sharded .bin and .safetensors layouts.
    """
    path = Path(path)
    with open(path / "config.json") as f:
        hf_cfg = json.load(f)
    cfg = config_from_hf(hf_cfg, **config_overrides)

    sd: Dict[str, Any] = {}
    safetensor_files = sorted(path.glob("*.safetensors"))
    bin_files = sorted(path.glob("pytorch_model*.bin"))
    if safetensor_files:
        from safetensors.numpy import load_file

        for f in safetensor_files:
            sd.update(load_file(f))
    elif bin_files:
        import torch

        for f in bin_files:
            shard = torch.load(f, map_location="cpu", weights_only=True)
            sd.update({k: v.float().numpy() for k, v in shard.items()})
    else:
        raise FileNotFoundError(f"no weight files found under {path}")

    params = params_from_hf_state_dict(sd, cfg)
    return cfg, params


def quantize_llm_params(params: Dict[str, Any], cfg: LlamaConfig) -> Dict[str, Any]:
    """bf16/fp32 base kernels → int8 weight-only (per-output-channel absmax
    scales). Produces the param layout of ``LoraDense(quantized=True)``:
    each projection's ``kernel`` is replaced by ``kernel_q`` + ``kernel_scale``.
    Norms, embeddings, the LM head, and LoRA stay unquantized.
    """

    def quantize_leaf(kernel: np.ndarray):
        k = np.asarray(kernel, np.float32)
        scale = np.abs(k).max(axis=0) / 127.0  # per output channel
        scale = np.where(scale == 0, 1.0, scale)
        q = np.clip(np.round(k / scale), -127, 127).astype(np.int8)
        return q, scale.astype(np.float32)

    out = dict(params)
    for i in range(cfg.num_hidden_layers):
        layer = out[f"layer_{i}"] = {k: dict(v) for k, v in params[f"layer_{i}"].items()}
        for block in ("attn", "mlp"):
            for proj, p in list(layer[block].items()):
                if "kernel" not in p:
                    continue
                p = dict(p)
                q, scale = quantize_leaf(p.pop("kernel"))
                p["kernel_q"] = q
                p["kernel_scale"] = scale
                layer[block][proj] = p
    return out
