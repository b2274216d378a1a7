"""End-to-end parity: the reference torch MSR3D vs the TPU rebuild.

Runs the REFERENCE'S OWN code (model/msr3d/msr3d.py forward:328-443 and
generate:449-524, OSE3DSituation, PointnetSAModule on a CPU shim of the
CUDA kernels — see ref_harness.py) and our full stack on identical
synthetic scenes, identical weights (converted), and an identical
tokenizer, then diffs:

  1. tokenization        (must be exact — same ids, same masks)
  2. per-sequence loss   (max |Δ| / rel)
  3. greedy decode       (token match rate)
  4. beam-5 / rep-3.0    (token match rate, the reference eval decode)

Writes a JSON report (default PARITY_E2E.json at the repo root).

The CJK placeholder ids are pinned to the reference's hard-coded Vicuna
ids (图=30861, 景=31495 — msr3d.py:211-212), which the shared tokenizer
reproduces, so the reference's splice-by-token-id logic runs unmodified.
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

IMG_ID, OBJ_ID, SCENE_ID = 30861, 30862, 31495  # msr3d.py:211-212 (物 unused)


def build_shared_tokenizer(out_dir: Path):
    """Character-level tokenizer whose vocabulary pins 图/物/景 to the
    reference's hard-coded Vicuna ids. Saved as a fast-tokenizer dir that
    both frameworks load."""
    from tokenizers import Tokenizer, pre_tokenizers, processors
    from tokenizers.models import WordLevel
    from transformers import PreTrainedTokenizerFast

    vocab = {"<unk>": 0, "<s>": 1, "</s>": 2}
    for c in range(32, 127):
        vocab[chr(c)] = len(vocab)
    vocab["\n"] = len(vocab)
    # filler ids up to the pinned CJK ids, then the placeholders
    nxt = len(vocab)
    pins = {"图": IMG_ID, "物": OBJ_ID, "景": SCENE_ID}
    top = max(pins.values())
    for i in range(nxt, top + 1):
        vocab.setdefault(f"<filler_{i}>", i)
    for tok, idx in pins.items():
        # replace the filler occupying the pinned id
        for k, v in list(vocab.items()):
            if v == idx and k != tok:
                del vocab[k]
        vocab[tok] = idx

    tk = Tokenizer(WordLevel(vocab, unk_token="<unk>"))
    tk.pre_tokenizer = pre_tokenizers.Split("", "isolated")
    tk.post_processor = processors.TemplateProcessing(
        single="<s> $A", pair="<s> $A $B", special_tokens=[("<s>", 1)]
    )
    fast = PreTrainedTokenizerFast(
        tokenizer_object=tk, bos_token="<s>", eos_token="</s>", unk_token="<unk>",
    )
    out_dir.mkdir(parents=True, exist_ok=True)
    fast.save_pretrained(str(out_dir))
    return fast


def make_checkpoint(out: Path, vocab_size: int):
    """Tiny HF Llama checkpoint saved in fp16 so both frameworks read
    bit-identical weights (the reference loads torch_dtype=float16)."""
    import torch
    from transformers import LlamaConfig as HFConfig, LlamaForCausalLM

    cfg = dict(
        vocab_size=vocab_size, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=512, tie_word_embeddings=False,
    )
    torch.manual_seed(7)
    model = LlamaForCausalLM(HFConfig(**cfg))
    out.mkdir(parents=True, exist_ok=True)
    json.dump(cfg, open(out / "config.json", "w"))
    torch.save(model.half().state_dict(), out / "pytorch_model.bin")
    return cfg


def make_data(b=2, n_obj=5, n_pts=64, seed=3):
    r = np.random.default_rng(seed)
    quat = r.normal(size=(b, 4))
    quat /= np.linalg.norm(quat, axis=-1, keepdims=True)
    return {
        "msr3d_prompt": [
            "You are an AI assistant in a 3D scene. Objects in the scene: 景 "
            f"USER: What is near the chair {i}? ASSISTANT:"
            for i in range(b)
        ],
        "text_output": [
            "a wooden table", "two red chairs", "yes", "behind the sofa",
            "three", "on your left",
        ][:b],
        "obj_fts": (r.normal(size=(b, n_obj, n_pts, 6)) * 0.3).astype(np.float32),
        "obj_masks": np.ones((b, n_obj), bool),
        "obj_locs": r.normal(size=(b, n_obj, 6)).astype(np.float32),
        "anchor_locs": r.normal(size=(b, 3)).astype(np.float32),
        "anchor_orientation": quat.astype(np.float32),
        "img_fts": r.normal(size=(b, 3, 8, 8)).astype(np.float32),
        "msr3d_imgs": np.zeros((b, 1, 8, 8, 3), np.float32),
        "msr3d_img_masks": np.zeros((b, 1), bool),
    }


def run_reference(ckpt_dir: Path, data, max_new: int):
    import torch

    from ref_harness import build_ref_msr3d, make_ref_cfg

    cfg = make_ref_cfg(str(ckpt_dir), hidden_size=32, scene_token_len=data["obj_fts"].shape[1])
    model = build_ref_msr3d(cfg, str(ckpt_dir))

    def to_torch(d):
        out = {}
        for k, v in d.items():
            if isinstance(v, np.ndarray):
                t = torch.from_numpy(v.copy())
                out[k] = t
            else:
                out[k] = list(v) if isinstance(v, list) else v
        return out

    # tokenization snapshot for the exactness check (also sets prompt_len:
    # this transformers version counts the inputs_embeds length in
    # max_length, so generate needs prompt_len + 1 (bos) + max_new)
    prompts = model.build_text_prompt(to_torch(dict(data)))["prompt"]
    model.llm_tokenizer.padding_side = "left"
    enc = model.llm_tokenizer(prompts, return_tensors="np", padding="longest")
    max_length = enc["input_ids"].shape[1] + 1 + max_new

    with torch.no_grad():
        fwd = model.forward(to_torch({k: v for k, v in data.items()}))
        loss = fwd["loss"].float().numpy()
        gen_in = to_torch({k: v for k, v in data.items() if k != "text_output"})
        greedy = model.generate(dict(gen_in), num_beams=1, max_length=max_length,
                                repetition_penalty=3.0)["output_tokens"].numpy()
        gen_in2 = to_torch({k: v for k, v in data.items() if k != "text_output"})
        beam = model.generate(dict(gen_in2), num_beams=5, max_length=max_length,
                              repetition_penalty=3.0)["output_tokens"].numpy()

    return model, loss, greedy, beam, (enc["input_ids"], enc["attention_mask"])


def build_ours(ckpt_dir: Path, ref_model, data):
    import dataclasses

    import jax.numpy as jnp

    from msr3d_tpu.models.llm.llama import LlamaConfig
    from msr3d_tpu.models.llm.tokenizer import build_tokenizer
    from msr3d_tpu.models.load_weights import (
        load_all,
        load_pointnet_weights,
        load_scene_encoder_weights,
        _tree_to_mutable,
    )
    from msr3d_tpu.models.msr3d import MSR3D, MSR3DNetworkConfig
    from msr3d_tpu.models.ose3d_situation import OSE3DConfig, SpatialEncoderConfig

    tok = build_tokenizer(str(ckpt_dir))
    hf_cfg = json.load(open(ckpt_dir / "config.json"))
    llm = LlamaConfig(
        vocab_size=hf_cfg["vocab_size"], hidden_size=hf_cfg["hidden_size"],
        intermediate_size=hf_cfg["intermediate_size"],
        num_hidden_layers=hf_cfg["num_hidden_layers"],
        num_attention_heads=hf_cfg["num_attention_heads"],
        max_position_embeddings=hf_cfg["max_position_embeddings"],
        lora_rank=0, dtype=jnp.float32, param_dtype=jnp.float32,
    )
    prompter = OSE3DConfig(
        hidden_size=32,
        situation_type="as_transform_for_objects",
        spatial_encoder=SpatialEncoderConfig(
            num_attention_heads=4, dim_feedforward=64, dropout=0.0, num_layers=1
        ),
        sa_n_points=(8, 4, None),
        sa_n_samples=(8, 8, None),
        sa_radii=(0.4, 0.8, None),
        sa_mlps=((3, 8, 8, 16), (16, 16, 16, 32), (32, 32, 32, 64)),
        obj_encoder_dtype="float32",
    )
    n_obj = data["obj_fts"].shape[1]
    net_cfg = MSR3DNetworkConfig(
        prompter=prompter, llm=llm, backbone_name="convnext_test",
    )
    model = MSR3D(cfg := net_cfg, tok, scene_token_len=n_obj, max_out_len=64,
                  num_beams=5, repetition_penalty=3.0)
    assert tok.scene_token_id == SCENE_ID and tok.img_token_id == IMG_ID, (
        tok.scene_token_id, tok.img_token_id,
    )

    prompts = model.build_text_prompt(dict(data))
    ii, am = model._encode_prompts(prompts)
    oi, om = model._encode_answers(data["text_output"])
    batch = model._scene_batch(dict(data))
    batch.update(input_ids=ii, attention_mask=am, output_ids=oi, output_mask=om)
    model.init_params(batch)

    # ---- weights: reference state dict → our tree -----------------------
    load_all(model, llm_path=str(ckpt_dir))
    variables = {k: _tree_to_mutable(v) for k, v in model.params.items()}
    ref_sd = {
        k: v
        for k, v in ref_model.state_dict().items()
        # the image tower is a stub on the reference side and masked off in
        # the data — its projection shapes differ by design
        if not k.startswith(("llm_proj_img", "image_encoder"))
    }
    # prompter (spatial encoder, anchor, projections)
    load_scene_encoder_weights(variables, _save_sd(ckpt_dir, ref_sd))
    # obj encoder (PointNet++ + sem head)
    obj_sd = {
        k[len("visual_prompter.obj_encoder."):]: v
        for k, v in ref_sd.items()
        if k.startswith("visual_prompter.obj_encoder.")
    }
    load_pointnet_weights(
        variables, _save_sd(ckpt_dir, obj_sd, name="obj_sd.pt"),
        model.cfg.prompter.sa_mlps,
    )
    model.params = variables
    return model, (ii, am)


def _save_sd(tmp: Path, sd, name="ref_sd.pt"):
    import torch

    path = tmp / name
    torch.save(sd, path)
    return path


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="PARITY_E2E.json")
    p.add_argument("--max-new", type=int, default=12)
    p.add_argument("--batch", type=int, default=2)
    args = p.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    with tempfile.TemporaryDirectory() as td:
        ckpt = Path(td) / "tiny_vicuna"
        fast = build_shared_tokenizer(ckpt)
        # final vocab after the reference's add_special_tokens([PAD])
        vocab_size = len(fast) + 1
        make_checkpoint(ckpt, vocab_size)

        data = make_data(b=args.batch)
        ref_model, ref_loss, ref_greedy, ref_beam, ref_tok = run_reference(
            ckpt, dict(data), args.max_new
        )
        ours, (ii, am) = build_ours(ckpt, ref_model, data)

        report = {"vocab_size": vocab_size, "batch": args.batch,
                  "max_new": args.max_new}

        # 1. tokenization exactness
        tok_equal = (
            ii.shape == ref_tok[0].shape
            and bool(np.all(ii == ref_tok[0]))
            and bool(np.all(am == ref_tok[1]))
        )
        report["tokenization_exact"] = tok_equal

        # 2. loss parity
        out = ours.forward(dict(data))
        our_loss = np.asarray(out["loss"])
        report["loss_ref"] = [round(float(x), 6) for x in ref_loss]
        report["loss_ours"] = [round(float(x), 6) for x in our_loss]
        report["loss_max_abs_diff"] = float(np.max(np.abs(our_loss - ref_loss)))
        report["loss_max_rel_diff"] = float(
            np.max(np.abs(our_loss - ref_loss) / np.abs(ref_loss))
        )

        # 3/4. decode parity (reference remaps id 0 → 2, msr3d.py:515)
        gen = ours.generate(dict(data), use_beam=False, max_new_tokens=args.max_new)
        our_greedy = np.asarray(gen["output_tokens"])
        our_greedy = np.where(our_greedy == 0, 2, our_greedy)
        gen_b = ours.generate(dict(data), use_beam=True, max_new_tokens=args.max_new)
        our_beam = np.where(
            np.asarray(gen_b["output_tokens"]) == 0, 2, np.asarray(gen_b["output_tokens"])
        )

        def match(a, b):
            t = min(a.shape[1], b.shape[1])
            return float(np.mean(a[:, :t] == b[:, :t]))

        report["greedy_token_match"] = match(our_greedy, ref_greedy)
        report["beam5_token_match"] = match(our_beam, ref_beam)
        report["greedy_ref"] = ref_greedy[:, : args.max_new].tolist()
        report["greedy_ours"] = our_greedy.tolist()

        print(json.dumps(report, indent=2))
        if args.out:
            with open(args.out, "w") as f:
                json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
