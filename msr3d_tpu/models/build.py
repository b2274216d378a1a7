"""Model builders: reference YAML config → model instances.

Mirrors model/build.py:6-19 (MODEL_REGISTRY + build_model(cfg)) with the
same registered names, so ``model.name: MSR3D`` in the shipped configs
resolves here.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Any, Optional

import jax.numpy as jnp

from msr3d_tpu.models.llm.llama import LlamaConfig
from msr3d_tpu.models.llm.tokenizer import build_tokenizer
from msr3d_tpu.models.msr3d import MSR3D, MSR3DNetworkConfig
from msr3d_tpu.models.ose3d_situation import OSE3DConfig
from msr3d_tpu.registry import MODEL_REGISTRY

# ensure registrations (import side effects)
from msr3d_tpu.models import msr3d as _msr3d  # noqa: F401


def build_llm_config(llm_cfg, tokenizer, dtype=jnp.bfloat16) -> LlamaConfig:
    """cfg.model.llm → LlamaConfig. Loads HF config.json when cfg_path is a
    real checkpoint dir; falls back to a tiny model for empty/debug paths."""
    lora = llm_cfg.get("lora")
    lora_kw: dict = {}
    if lora is not None and lora.get("flag", False):
        lora_kw = dict(
            lora_rank=lora.rank,
            lora_alpha=lora.alpha,
            lora_dropout=lora.get("dropout", 0.0),
            lora_targets=tuple(lora.target_modules),
        )

    # TPU deployment knobs (not in the reference's schema; default off)
    extra = dict(
        param_dtype=jnp.bfloat16 if llm_cfg.get("param_dtype", "bf16") == "bf16" else jnp.float32,
        quantize=bool(llm_cfg.get("quantize", False)),
        quantize_bits=int(llm_cfg.get("quantize_bits", 8)),
        quantize_group=llm_cfg.get("quantize_group", None),
        remat=bool(llm_cfg.get("remat", False)),
        remat_policy=str(llm_cfg.get("remat_policy", "full")),
        flash_attention=bool(llm_cfg.get("flash_attention", False)),
    )

    cfg_path = llm_cfg.get("cfg_path", "")
    if cfg_path and Path(cfg_path, "config.json").exists():
        import json

        with open(Path(cfg_path) / "config.json") as f:
            hf = json.load(f)
        from msr3d_tpu.models.llm.convert import config_from_hf

        return config_from_hf(hf, dtype=dtype, **lora_kw, **extra)
    # debug/test: tiny LLM sized to the tokenizer
    return LlamaConfig.tiny(
        vocab_size=max(tokenizer.vocab_size, 263), dtype=dtype, **lora_kw, **extra
    )


def build_msr3d_from_config(cfg) -> MSR3D:
    """Full-config (reference msr3d.yaml layout) → MSR3D instance."""
    model_cfg = cfg.model
    llm_cfg = model_cfg.llm
    tokenizer = build_tokenizer(
        llm_cfg.get("cfg_path", ""),
        truncation_side=llm_cfg.get("truncation_side", "right"),
    )
    prompter_cfg = OSE3DConfig.from_config(model_cfg.prompter.model)
    llama_cfg = build_llm_config(llm_cfg, tokenizer)
    # config-driven sequence parallelism: cfg.parallel.sp > 1 routes the
    # training-forward attention through ring attention over the sp axis
    if int(cfg.get("parallel", {}).get("sp", 1)) > 1:
        llama_cfg = dataclasses.replace(
            llama_cfg, sp_axis="sp", sp_data_axis="dp"
        )

    vision2d = model_cfg.get("vision_2d")
    backbone_name = "convnext_base"
    freeze_2d = True
    if vision2d is not None:
        backbone_name = vision2d.args.get("backbone_name", "convnext_base")
        freeze_2d = vision2d.get("freeze", True)

    net_cfg = MSR3DNetworkConfig(
        prompter=prompter_cfg,
        llm=llama_cfg,
        backbone_name=backbone_name,
        freeze_image_encoder=freeze_2d,
    )
    return MSR3D(
        net_cfg,
        tokenizer,
        scene_token_len=model_cfg.prompter.model.get("scene_token_len", 60),
        max_context_len=llm_cfg.get("max_context_len", 256),
        max_out_len=llm_cfg.get("max_out_len", 256),
        num_beams=cfg.get("eval_num_beams", 5),
        # serving/generation knobs (defaults = the reference's beam-5
        # eval settings, model/msr3d/msr3d.py:449-513)
        repetition_penalty=float(cfg.get("eval_repetition_penalty", 3.0)),
        length_penalty=float(cfg.get("eval_length_penalty", 1.0)),
        eos_logit_bias=float(cfg.get("eval_eos_logit_bias", 0.0)),
        spec_k=int(cfg.get("eval_spec_k", 0)),
        spec_ngram=int(cfg.get("eval_spec_ngram", 3)),
        do_sample=bool(cfg.get("eval_do_sample", False)),
        temperature=float(cfg.get("eval_temperature", 1.0)),
        top_k=int(cfg.get("eval_top_k", 0)),
        top_p=float(cfg.get("eval_top_p", 1.0)),
        sample_seed=int(cfg.get("eval_sample_seed", 0)),
        compact_transfer=bool(cfg.get("compact_transfer", False)),
    )


MSR3D.from_config = staticmethod(build_msr3d_from_config)


def _build_ose3d(cfg, situation_type: Optional[str] = None):
    """Prompter-node builder for the OSE3D family (cfg has .model)."""
    from msr3d_tpu.models.ose3d_situation import OSE3DSituation

    ose_cfg = OSE3DConfig.from_config(cfg.model)
    if situation_type is not None:
        ose_cfg = dataclasses.replace(ose_cfg, situation_type=situation_type)
    return OSE3DSituation(ose_cfg)


from msr3d_tpu.registry import MODEL_REGISTRY as _REG  # noqa: E402

_REG.register(lambda cfg: _build_ose3d(cfg), name="OSE3DSituation")
# LEO prompters: anchor-as-object only (model/ose3d.py:156, ose3d_orig.py:518)
_REG.register(lambda cfg: _build_ose3d(cfg, "as_object"), name="OSE3D")
_REG.register(lambda cfg: _build_ose3d(cfg, "as_object"), name="OSE3DORIG")


def build_model(cfg) -> Any:
    """Reference ``build_model(cfg)`` contract (model/build.py:17-19)."""
    name = cfg.model.name
    cls = MODEL_REGISTRY.get(name)
    if hasattr(cls, "from_config"):
        return cls.from_config(cfg)
    return cls(cfg)
