"""North-star benchmark: situated-QA pairs/sec/chip, end-to-end on device.

Full MSR3D pipeline at flagship scale on one chip:
  scene encode (60 obj × 1024 pts, PointNet++ + 3 spatial layers, fp32)
  → splice into a 7B-class Llama (bf16, LoRA r16)
  → prefill (bucketed prompt) → greedy decode (fixed new-token budget)

The reference baseline (BASELINE.md): A100, batch 4/GPU, HF generate.
Emits one JSON line. ``--quick`` shrinks the LLM for CI smoke.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def _enable_cache():
    # persistent XLA compile cache (utils/compile_cache.py): the 7B
    # programs cost 80-550 s to compile; share one on-disk cache across
    # every entry point so reruns and retries skip it
    try:
        from msr3d_tpu.utils.compile_cache import enable_compile_cache
        enable_compile_cache()
    except Exception:
        pass


_enable_cache()


def parse_args(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--quick", action="store_true", help="small LLM")
    parser.add_argument("--int8", action="store_true", help="int8 weight-only base")
    parser.add_argument("--int4", action="store_true",
                        help="int4 split-nibble weight-only base (~3.4 GB at "
                        "7B): capacity knob for larger decode batch")
    parser.add_argument("--quant-group", type=int, default=0,
                        help="int4 group-scale size along the input dim "
                        "(0 = per-output-channel)")
    parser.add_argument("--act-quant", action="store_true",
                        help="s8xs8: also quantize activations (needs --int8)")
    parser.add_argument("--kv-quant", action="store_true",
                        help="int8 KV cache in the decode loop")
    parser.add_argument("--flash", action="store_true",
                        help="Pallas fused flash attention for the prefill "
                        "pass (decode loop is unaffected)")
    parser.add_argument("--beams", type=int, default=1)
    parser.add_argument("--batch", type=int, default=4)
    parser.add_argument("--prompt-len", type=int, default=160)
    parser.add_argument("--new-tokens", type=int, default=32)
    parser.add_argument("--iters", type=int, default=5)
    parser.add_argument(
        "--merged-lora", action="store_true",
        help="deployment mode: LoRA merged into the base (rank 0 at inference)",
    )
    parser.add_argument(
        "--compact-transfer", action="store_true",
        help="ship obj_fts as int16 xyz + int8 rgb (9 B/pt vs 24): cuts the "
        "4.7 GB/step (b80) host→device point transfer 2.7x",
    )
    parser.add_argument(
        "--eos-bias", type=float, default=0.0,
        help="additive EOS logit bias: induces realistic answer-length "
        "termination so the decode while_loop's early exit is exercised "
        "(expected-case eval throughput, not the never-EOS worst case)",
    )
    parser.add_argument(
        "--spec-k", type=int, default=0,
        help="n-gram speculative decoding: draft tokens per verify window "
        "(greedy only; forces repetition_penalty 1.0 — token-identical to "
        "penalty-free greedy)",
    )
    parser.add_argument(
        "--echo-weights", action="store_true",
        help="identity-block surgery after init: zero every block's "
        "o_proj/down_proj so the residual stream is the token embedding "
        "and greedy decode becomes a deterministic token map. Decode "
        "enters a cycle within ~sqrt(V) steps, after which generated "
        "text repeats and n-gram prompt-lookup proposals become near-"
        "perfect - the echo-structured acceptance regime speculative "
        "decoding claims, at UNCHANGED per-call cost (every matmul "
        "still executes at full shape; only the values are zero)",
    )
    parser.add_argument(
        "--spec-ngram", type=int, default=3,
        help="suffix n-gram length for the prompt-lookup proposal",
    )
    parser.add_argument(
        "--rep-penalty", type=float, default=3.0,
        help="repetition penalty (reference eval default 3.0; use 1.0 for "
        "penalty-free greedy serving / the spec-decode control arm)",
    )
    parser.add_argument(
        "--no-beam-ancestry", dest="beam_ancestry", action="store_false",
        default=True,
        help="disable ancestry-indirected beam KV (the default, as in the "
        "model): with it the generated cache never reorders (no per-step "
        "gather / double-buffered carry) — token-identical; +32%% at the "
        "beam record config and 4.4x the 256-budget batch ceiling",
    )
    parser.add_argument(
        "--layered", dest="layered_gen_cache", action="store_true",
        default=False,
        help="per-layer (tuple) generated-KV cache layout: removes the "
        "stacked layout's full-cache carry copy in the decode while_loop — "
        "the long-budget capacity knob (-7%% at nt32 b80 where the copy is "
        "cheap, so stacked stays the short-budget default)",
    )
    parser.add_argument(
        "--group", type=int, default=0,
        help="grouped serving: Q questions share ONE scene's prefix "
        "prefill (generate_scene_group). --batch must be divisible by Q; "
        "each iter runs batch/Q scene groups. 0 = plain per-question path",
    )
    parser.add_argument(
        "--pipeline-depth", type=int, default=1,
        help="outstanding requests before fetching (0 = fully serial); "
        "deeper pipelines hide the tunnel dispatch+fetch latency",
    )
    return parser.parse_args(argv)


def build_model(args):
    """Flagship-scale MSR3D for benching (importable by bench_serve.py)."""
    import jax.numpy as jnp

    from msr3d_tpu.models.llm.llama import LlamaConfig
    from msr3d_tpu.models.msr3d import MSR3D, MSR3DNetworkConfig
    from msr3d_tpu.models.llm.tokenizer import ByteTokenizer
    from msr3d_tpu.models.ose3d_situation import OSE3DConfig

    if args.quick:
        llm = LlamaConfig(
            vocab_size=32000, hidden_size=512, intermediate_size=1376,
            num_hidden_layers=4, num_attention_heads=8,
            max_position_embeddings=2048, lora_rank=16, dtype=jnp.bfloat16,
        )
    else:
        # Vicuna-7B geometry
        llm = LlamaConfig(
            vocab_size=32000, hidden_size=4096, intermediate_size=11008,
            num_hidden_layers=32, num_attention_heads=32,
            max_position_embeddings=2048,
            lora_rank=0 if args.merged_lora else 16,
            dtype=jnp.bfloat16,
            param_dtype=jnp.bfloat16,  # frozen base stored bf16: 13.5 GB
            quantize=args.int8 or getattr(args, "int4", False),
            quantize_bits=4 if getattr(args, "int4", False) else 8,
            quantize_group=getattr(args, "quant_group", 0) or None,
            act_quantize=getattr(args, "act_quant", False),
            kv_quantize=getattr(args, "kv_quant", False),
            flash_attention=getattr(args, "flash", False),
        )

    tok = ByteTokenizer()
    cfg = MSR3DNetworkConfig(
        prompter=OSE3DConfig(),  # reference scale
        llm=llm,
        backbone_name="convnext_test",
    )
    spec_k = getattr(args, "spec_k", 0)
    penalty = getattr(args, "rep_penalty", 3.0)
    if spec_k > 0:
        penalty = 1.0  # speculative verification requires penalty-free greedy
    model = MSR3D(
        cfg, tok, scene_token_len=60, max_out_len=args.new_tokens,
        num_beams=args.beams, repetition_penalty=penalty,
        compact_transfer=getattr(args, "compact_transfer", False),
        eos_logit_bias=getattr(args, "eos_bias", 0.0),
        spec_k=spec_k, spec_ngram=getattr(args, "spec_ngram", 3),
        beam_ancestry=getattr(args, "beam_ancestry", True),
        layered_gen_cache=getattr(args, "layered_gen_cache", False),
    )
    return model, llm


def make_data(args, B, seed):
    r = np.random.default_rng(seed)
    N_OBJ, N_PTS = 60, 1024
    scene = "景" * 1  # expanded by build_text_prompt
    # honor --prompt-len: pad the dialogue with filler context (byte
    # tokenizer: ~1 token/char). The base prompt lands at ~207 tokens;
    # longer settings probe the long-context decode regime.
    base_len = 145  # prompt chars before filler + 60 scene tokens
    filler = ""
    if args.prompt_len > base_len + 62:
        filler = (
            " The room also contains assorted furniture and clutter."
            * (1 + (args.prompt_len - base_len - 62) // 56)
        )[: args.prompt_len - base_len - 62]
    return {
        "msr3d_prompt": [
            f"You are an AI visual assistant situated in a 3D scene. "
            f"Objects (including you) in the scene: {scene} {filler}"
            f"USER: What is behind the chair number {i}? ASSISTANT:"
            for i in range(B)
        ],
        "obj_fts": (r.normal(size=(B, N_OBJ, N_PTS, 6)) * 0.3).astype(np.float32),
        "obj_masks": np.ones((B, N_OBJ), bool),
        "obj_locs": r.normal(size=(B, N_OBJ, 6)).astype(np.float32),
        "anchor_locs": r.normal(size=(B, 3)).astype(np.float32),
        "anchor_orientation": np.tile(np.array([0, 0, 0, 1], np.float32), (B, 1)),
    }


def make_group_data(args, B, Q, seed):
    """B//Q scenes × Q questions each, sharing per-scene preamble+scene
    prefixes (the generate_scene_group contract: MSQA-style
    many-questions-per-scene). Total decode batch stays B."""
    g = B // Q
    d = make_data(args, g, seed)
    prompt0 = d["msr3d_prompt"][0]
    head = prompt0[: prompt0.index("USER:")]
    d["msr3d_prompt"] = [
        [
            f"{head}USER: What is behind the chair number {i}? ASSISTANT:"
            for i in range(Q)
        ]
        for _ in range(g)
    ]
    return d


def _apply_echo_weights(model, alphabet=64):
    """See --echo-weights: zero o_proj/down_proj in every LLM block (all
    quantized layouts: kernel, kernel_q, kernel_scale, lora_a/b), and
    restrict the (never-quantized) lm_head to token columns
    [3, 3+alphabet) — pad/bos/eos zeroed out. The greedy token map then
    lives on ≤ alphabet+zero-tie states, so decode enters its cycle
    within ~sqrt(alphabet) steps instead of ~sqrt(V)≈112, and most of
    the budget runs in the repeated-text regime prompt-lookup exploits.
    (Ties on the zeroed columns resolve to a fixed argmax index —
    still deterministic.)"""
    import jax.numpy as jnp
    import jax.tree_util as jtu

    def zero(path, leaf):
        keys = jtu.keystr(path)
        if "'llm'" in keys and ("o_proj" in keys or "down_proj" in keys):
            return jnp.zeros_like(leaf)
        if "'llm'" in keys and "lm_head" in keys and "kernel" in keys:
            v = leaf.shape[-1]
            keep = (jnp.arange(v) >= 3) & (jnp.arange(v) < 3 + alphabet)
            return jnp.where(keep[None, :], leaf, 0)
        return leaf

    model.params = jtu.tree_map_with_path(zero, model.params)


def run(args) -> dict:
    """Run the benchmark, returning the record dict (importable by bench.py)."""

    import jax

    # --layered only takes effect on the greedy non-speculative decode path
    # (msr3d.py: spec_k>0 ignores it; beam decode's per-layer layout is
    # governed by beam_ancestry instead) — warn so a run's config label
    # never claims a layout it did not exercise.
    layered_effective = (
        getattr(args, "layered_gen_cache", False)
        and args.beams == 1
        and getattr(args, "spec_k", 0) == 0
    )
    if getattr(args, "layered_gen_cache", False) and not layered_effective:
        import sys

        print(
            "bench_qa: --layered has no effect with --spec-k>0 or --beams>1 "
            "(beam layout follows beam_ancestry); label omits -lyr",
            file=sys.stderr,
        )

    model, llm = build_model(args)
    tok = model.tokenizer

    B = args.batch
    if args.group:
        assert B % args.group == 0, "--batch must be divisible by --group"

    data = make_data(args, B, 0)
    prompts = model.build_text_prompt(data)
    ii, am = model._encode_prompts(prompts)
    oi, om = model._encode_answers(["an answer"] * B)
    init_batch = model._scene_batch(data)
    init_batch.update(input_ids=ii, attention_mask=am, output_ids=oi, output_mask=om)

    t0 = time.time()
    model.init_params(init_batch)
    if getattr(args, "echo_weights", False):
        _apply_echo_weights(model)
    init_s = time.time() - t0

    # compile + warm
    t0 = time.time()
    use_beam = args.beams > 1
    if args.group:
        warm = model.generate_scene_group(
            make_group_data(args, B, args.group, 0),
            max_new_tokens=args.new_tokens,
        )
    else:
        warm = model.generate(
            dict(data), use_beam=use_beam, max_new_tokens=args.new_tokens
        )
    compile_s = time.time() - t0
    # answer-length census (meaningful when --eos-bias induces EOS)
    toks = np.asarray(warm["output_tokens"])
    eos_pos = np.where(
        (toks == tok.eos_id).any(axis=1),
        (toks == tok.eos_id).argmax(axis=1) + 1,
        toks.shape[1],
    )
    answer_lens = (int(eos_pos.mean()), int(eos_pos.max()))
    spec_stats = warm.get("spec_stats")

    # steady state with varying data. Host-side data generation happens
    # OUTSIDE the timed region: in production the DataLoader prefetches
    # batches on a thread, overlapping with device compute; the serving
    # path being measured is H2D + scene encode + prefill + decode + D2H,
    # with depth-1 request pipelining (dispatch request i+1 before
    # fetching request i's tokens — the standard serving pattern; the
    # tunnel's per-fetch flush otherwise serializes into the step time).
    if args.group:
        # each iter = ONE program: B/Q scene groups × Q questions,
        # full-batch decode with per-scene shared prefixes
        datas = [
            make_group_data(args, B, args.group, i + 1)
            for i in range(args.iters)
        ]
        dispatch = lambda d: model.generate_scene_group_async(
            d, max_new_tokens=args.new_tokens
        )
    else:
        datas = [dict(make_data(args, B, i + 1)) for i in range(args.iters)]
        dispatch = lambda d: model.generate_async(
            d, use_beam=use_beam, max_new_tokens=args.new_tokens
        )
    depth = max(0, args.pipeline_depth)
    t0 = time.perf_counter()
    if depth == 0:
        for d in datas:
            dispatch(d)()
    else:
        from collections import deque

        pending = deque()
        for d in datas:
            pending.append(dispatch(d))
            if len(pending) > depth:
                pending.popleft()()
        while pending:
            pending.popleft()()
    dt = (time.perf_counter() - t0) / args.iters
    qa_per_sec = B / dt

    return {
                "metric": "qa_pairs_per_sec_per_chip",
                "value": round(qa_per_sec, 3),
                "unit": "QA pairs/s/chip",
                "vs_baseline": 1.0,
                "batch": B,
                "prompt_tokens": int(ii.shape[1]),
                "new_tokens": args.new_tokens,
                "beams": args.beams,
                "llm": f"{llm.num_hidden_layers}L-{llm.hidden_size}h"
                + ("-int8" if args.int8 else "")
                + ("-int4" if getattr(args, "int4", False) else "")
                + (f"-g{args.quant_group}" if getattr(args, "quant_group", 0) else "")
                + ("-s8s8" if getattr(args, "act_quant", False) else "")
                + ("-kv8" if getattr(args, "kv_quant", False) else "")
                + ("-cpk" if getattr(args, "compact_transfer", False) else "")
                + ("-flash" if getattr(args, "flash", False) else "")
                + ("-anc" if getattr(args, "beam_ancestry", True) and args.beams > 1 else "")
                + ("-lyr" if layered_effective else "")
                + ("-echo" if getattr(args, "echo_weights", False) else ""),
                "step_ms": round(dt * 1000, 1),
                "pipeline_depth": depth,
                "group": args.group,
                "eos_bias": getattr(args, "eos_bias", 0.0),
                "spec_k": getattr(args, "spec_k", 0),
                # per-row emitted tokens per verify forward (>1 = spec
                # pays; rows finishing early dilute the mean) + raw census
                **({"spec_tokens_per_row_call": round(
                    spec_stats["emitted"]
                    / max(1, spec_stats["verify_calls"] * B), 2
                ), "spec_verify_calls": spec_stats["verify_calls"]}
                   if spec_stats else {}),
                "mean_answer_len": answer_lens[0],
                "max_answer_len": answer_lens[1],
                "init_s": round(init_s, 1),
                "compile_s": round(compile_s, 1),
                "device": str(jax.devices()[0]),
            }


def main() -> None:
    print(json.dumps(run(parse_args())))


if __name__ == "__main__":
    main()
