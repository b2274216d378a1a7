"""EM/logit parity harness: our model vs an HF reference checkpoint.

The north-star requires generated answers to match the PyTorch reference
(BASELINE.json). This harness operationalizes the check once real weights
exist:

  1. logit-level: converted weights, identical spliced embeddings → max
     |Δlogit| and top-1 agreement per position
  2. generation-level: greedy + beam(5)/repetition(3.0) decode → exact token
     match rate vs HF ``generate``

Runs today against a tiny random HF checkpoint (written on the fly when no
--hf-path is given) so the harness itself stays verified; point --hf-path
at the real Vicuna dir + --out for the report.

Usage:
  python scripts/parity_check.py [--hf-path /path/vicuna-7b] [--out report.json]
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def make_tiny_checkpoint(tmpdir: Path) -> Path:
    import torch
    from transformers import LlamaConfig as HFConfig, LlamaForCausalLM

    cfg = dict(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=256, tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    model = LlamaForCausalLM(HFConfig(**cfg))
    out = tmpdir / "tiny_llama"
    out.mkdir(parents=True, exist_ok=True)
    json.dump(cfg, open(out / "config.json", "w"))
    torch.save(model.state_dict(), out / "pytorch_model.bin")
    return out


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--hf-path", default="")
    parser.add_argument("--out", default="")
    parser.add_argument("--batch", type=int, default=2)
    parser.add_argument("--prompt-len", type=int, default=16)
    parser.add_argument("--new-tokens", type=int, default=12)
    args = parser.parse_args()

    import torch
    from transformers import LlamaForCausalLM

    import jax
    import jax.numpy as jnp

    from msr3d_tpu.models.llm.convert import load_hf_checkpoint
    from msr3d_tpu.models.llm.llama import LlamaModel
    from msr3d_tpu.models.llm.sampling import beam_search_decode, greedy_decode

    if args.hf_path:
        hf_path = Path(args.hf_path)
    else:
        tmpdir = Path(tempfile.mkdtemp())
        hf_path = make_tiny_checkpoint(tmpdir)
        print(f"[parity] no --hf-path; using a tiny random checkpoint at {hf_path}")

    hf_model = LlamaForCausalLM.from_pretrained(hf_path, torch_dtype=torch.float32).eval()
    cfg, params = load_hf_checkpoint(hf_path, dtype=jnp.float32)
    model = LlamaModel(cfg)
    variables = {"params": jax.tree_util.tree_map(jnp.asarray, params)}

    rng = np.random.default_rng(0)
    b, t = args.batch, args.prompt_len
    ids = rng.integers(5, cfg.vocab_size - 2, size=(b, t)).astype(np.int32)
    mask = np.ones((b, t), np.int32)
    with torch.no_grad():
        embeds = hf_model.get_input_embeddings()(torch.from_numpy(ids).long()).numpy()

    report = {}

    # 1) logit parity
    with torch.no_grad():
        hf_logits = hf_model(
            inputs_embeds=torch.from_numpy(embeds),
            attention_mask=torch.from_numpy(mask),
        ).logits.numpy()
    ours, _, _ = model.apply(variables, jnp.asarray(embeds), jnp.asarray(mask))
    ours = np.asarray(ours)
    report["logit_max_abs_diff"] = float(np.abs(ours - hf_logits).max())
    report["logit_top1_agreement"] = float(
        (ours.argmax(-1) == hf_logits.argmax(-1)).mean()
    )

    # 2) generation parity
    def ours_generate(num_beams, repetition_penalty):
        maxlen = t + args.new_tokens
        logits, _, caches, cache_mask, next_pos = model.apply(
            variables, jnp.asarray(embeds), jnp.asarray(mask), maxlen,
            method=model.prefill_with_cache,
        )
        first = jnp.asarray(np.asarray(logits)[:, -1])

        def decode_step(token_ids, positions, kv, idx, cm):
            e = model.apply(variables, token_ids, method=model.embed_tokens)
            lg, _, new_kv = model.apply(
                variables, e, jnp.ones_like(token_ids), positions=positions,
                kv_caches=kv, cache_index=idx, cache_mask=cm,
            )
            return lg, new_kv

        common = dict(
            max_new_tokens=args.new_tokens, eos_id=2, pad_id=0, prompt_len=t,
            repetition_penalty=repetition_penalty,
        )
        if num_beams > 1:
            return np.asarray(
                beam_search_decode(
                    decode_step, caches, cache_mask, next_pos, first,
                    num_beams=num_beams, length_penalty=1.0, **common,
                )
            )
        return np.asarray(
            greedy_decode(decode_step, caches, cache_mask, next_pos, first, **common)
        )

    def hf_generate(num_beams, repetition_penalty):
        with torch.no_grad():
            return hf_model.generate(
                inputs_embeds=torch.from_numpy(embeds),
                attention_mask=torch.from_numpy(mask),
                max_new_tokens=args.new_tokens, do_sample=False,
                num_beams=num_beams, repetition_penalty=repetition_penalty,
                pad_token_id=0, eos_token_id=2,
            ).numpy()

    def match_rate(got, want):
        hits = total = 0
        for row_g, row_w in zip(got, want):
            for i in range(min(len(row_g), len(row_w))):
                total += 1
                hits += int(row_g[i] == row_w[i])
                if row_w[i] == 2:
                    break
        return hits / max(total, 1)

    report["greedy_token_match"] = match_rate(ours_generate(1, 1.0), hf_generate(1, 1.0))
    report["beam5_rep3_token_match"] = match_rate(
        ours_generate(5, 3.0), hf_generate(5, 3.0)
    )

    print(json.dumps(report, indent=2))
    if args.out:
        json.dump(report, open(args.out, "w"), indent=2)
    ok = (
        report["logit_top1_agreement"] > 0.999
        and report["greedy_token_match"] > 0.999
        and report["beam5_rep3_token_match"] > 0.99
    )
    print(f"[parity] {'PASS' if ok else 'FAIL'}")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
