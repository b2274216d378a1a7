"""Non-echo speculative-decoding acceptance (VERDICT r4 #5).

Round 4 measured prompt-lookup speculation in an ECHO regime: identity-
block surgery (zeroed o_proj/down_proj) forced repetitive output at
unchanged per-call cost. The open question was acceptance on weights
that ATTEND NORMALLY. This script closes it:

  1. Overfit a mid-scale GQA checkpoint (24L-2048h-5504f, kv-heads 4,
     ~1B params, bf16, LoRA r16 — normally-attending transformer blocks,
     no surgery) on EXTRACTIVE QA: each answer is a span copied verbatim
     from its prompt ("I see that {span}. Tell me exactly what you see."
     -> answer = the span). This is the published prompt-lookup regime —
     generated text echoes prompt spans — produced by LEARNING, not by
     weight surgery.
  2. Serve the learned checkpoint through ContinuousBatchingServer with
     spec_k=4 vs the T=1 control (same engine, same scheduling), assert
     token identity, and report n-gram acceptance (tokens/verify-call)
     and the end-to-end speedup.

Composition boundary (stated for BASELINE.md): speculation is GREEDY-
ONLY (serving.py rejects rep_penalty != 1.0 with spec_k) — it
accelerates the production greedy path; it CANNOT compose with the
reference-exact beam-5/rep-3.0 eval decode.

Writes SPEC_r05.json. --quick = tiny-LLM CPU smoke.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

SPANS = [
    "the brown wooden table stands near the tall window",
    "a red leather chair sits beside the open door",
    "the small green lamp rests on the corner desk",
    "two blue pillows lie across the long grey sofa",
    "the round silver clock hangs above the stone fireplace",
    "a large potted plant grows next to the bookshelf",
    "the white ceramic vase stands on the kitchen counter",
    "an old painted cabinet leans against the north wall",
    "the soft yellow rug covers the center of the floor",
    "a tall black speaker stands left of the television",
    "the glass coffee cup rests near the silver laptop",
    "three framed photos hang along the bright hallway",
    "the striped orange cat sleeps under the dining table",
    "a folded wool blanket lies at the foot of the bed",
    "the copper kettle sits on the back of the stove",
    "a narrow mirror hangs beside the closet entrance",
]


def make_items(prompts, answers, n_obj, n_pts):
    items = []
    for i, (p, a) in enumerate(zip(prompts, answers)):
        r = np.random.default_rng(2000 + i)
        q = r.normal(size=(4,))
        items.append({
            "msr3d_prompt": p,
            "text_output": a,
            "obj_fts": (r.normal(size=(n_obj, n_pts, 6)) * 0.3).astype(
                np.float32),
            "obj_masks": np.ones((n_obj,), bool),
            "obj_locs": r.normal(size=(n_obj, 6)).astype(np.float32),
            "anchor_locs": r.normal(size=(3,)).astype(np.float32),
            "anchor_orientation": (q / np.linalg.norm(q)).astype(np.float32),
        })
    return items


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


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true")
    p.add_argument("--items", type=int, default=16)
    p.add_argument("--repeats", type=int, default=4,
                   help="serving stream = items x repeats requests")
    p.add_argument("--spec-k", type=int, default=4)
    p.add_argument("--spec-ngram", type=int, default=3)
    p.add_argument("--slots", type=int, default=8)
    p.add_argument("--max-steps", type=int, default=500)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--tol", type=float, default=0.05)
    p.add_argument("--lm-head-gain", type=float, default=20.0)
    p.add_argument("--out", default="SPEC_r05.json")
    args = p.parse_args()

    import jax

    if args.quick:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from msr3d_tpu.config import config_from_dict
    from msr3d_tpu.models.llm.llama import LlamaConfig
    from msr3d_tpu.models.llm.tokenizer import ByteTokenizer, SCENE_PLACEHOLDER
    from msr3d_tpu.models.msr3d import MSR3D, MSR3DNetworkConfig
    from msr3d_tpu.serving import ContinuousBatchingServer
    from scripts.overfit_7b import FixedLoader, boost_lm_head, collate

    t_start = time.time()
    tok = ByteTokenizer()
    if args.quick:
        llm = LlamaConfig.tiny(vocab_size=tok.vocab_size, dtype=jnp.float32,
                               lora_rank=8)
        from tests.test_msr3d import TINY_PROMPTER as prompter

        n_obj, n_pts, scene_len = 6, 32, 5
        args.items = min(args.items, 4)
        args.max_steps = min(args.max_steps, 150)
        args.repeats = 2
        args.slots = 2
        args.lr = 5e-3
    else:
        # mid-scale GQA: normally-attending blocks at ~1B params
        llm = LlamaConfig(
            vocab_size=tok.vocab_size, hidden_size=2048,
            intermediate_size=5504, num_hidden_layers=24,
            num_attention_heads=16, num_key_value_heads=4,
            max_position_embeddings=1024, lora_rank=16,
            dtype=jnp.bfloat16, param_dtype=jnp.bfloat16,
        )
        from tests.test_msr3d import TINY_PROMPTER as prompter

        n_obj, n_pts, scene_len = 6, 32, 5

    cfg_net = MSR3DNetworkConfig(
        prompter=prompter, llm=llm, backbone_name="convnext_test",
        answer_window_loss=True,
    )
    max_out = 72  # the longest span (55 chars) + eos, token = byte
    model = MSR3D(cfg_net, tok, scene_token_len=scene_len,
                  max_out_len=max_out, num_beams=1, repetition_penalty=1.0)

    n = args.items
    spans = SPANS[:n]
    prompts = [
        f"Scene: {SCENE_PLACEHOLDER}. USER: I can see that {s}. "
        f"Tell me exactly what you see. ASSISTANT:"
        for s in spans
    ]
    items = make_items(prompts, spans, n_obj, n_pts)

    import tempfile

    exp_dir = tempfile.mkdtemp(prefix="spec_nonecho_")
    cfg = config_from_dict({
        "exp_dir": exp_dir, "mode": "train", "rng_seed": 0,
        "solver": {
            "gradient_accumulation_steps": 1,
            "grad_norm": 5.0, "epochs": args.max_steps,
            "eval_interval": 10 ** 9,
            "optim": {"name": "AdamW",
                      "args": {"lr": args.lr, "betas": [0.9, 0.999],
                               "weight_decay": 0.0}},
            "sched": {"name": "warmup_cosine",
                      "args": {"warmup_steps": 10}},
        },
    })

    from msr3d_tpu.trainer.leo_trainer import LeoTrainer

    loaders = {"msr3d_train": {"train": FixedLoader(items, n)}}
    trainer = LeoTrainer(cfg, loaders=loaders, evaluators={}, model=model)
    boost_lm_head(trainer, args.lm_head_gain)

    ce = []
    t0 = time.time()
    for epoch in range(args.max_steps):
        stats = trainer.train_one_epoch(epoch)
        trainer.tracker.step_epoch()
        ce.append(float(stats["loss"]))
        if epoch % 50 == 49:
            print(f"step {epoch+1}: CE {ce[-1]:.4f}", flush=True)
        if ce[-1] < args.tol:
            break
    train_s = time.time() - t0
    print(f"trained {len(ce)} steps, CE {ce[-1]:.4f} ({train_s:.0f}s)",
          flush=True)
    assert ce[-1] < max(args.tol, 0.3), f"did not overfit: CE {ce[-1]}"
    trainer.state = None  # free moments

    # the learned outputs really are the echoed spans (greedy, blocking)
    texts = model.generate(collate(items, 0, n))["output_text"]
    echo_ok = [t.strip() == s for t, s in zip(texts, spans)]
    print(f"echo check: {sum(echo_ok)}/{n} exact", flush=True)

    # --- serving arms: spec_k vs T=1 control -----------------------------
    reqs = [dict(items[i % n]) for i in range(n * args.repeats)]
    # budget = answer tokens + eos + slack (the engine also stops on eos)
    budgets = [len(spans[i % n]) + 4 for i in range(len(reqs))]

    wi, _ = model._encode_prompts(
        model.build_text_prompt({"msr3d_prompt": [r["msr3d_prompt"]
                                                  for r in reqs]})
    )
    prompt_len = max(32, -(-wi.shape[1] // 32) * 32) + 1

    eng_kw = dict(refill_group=2, chunk_steps=4,
                  max_new_tokens=max_out, prompt_len=prompt_len,
                  lookahead=1)
    spec = ContinuousBatchingServer(
        model, args.slots, spec_k=args.spec_k,
        spec_ngram=args.spec_ngram, **eng_kw)
    plain = ContinuousBatchingServer(model, args.slots, **eng_kw)
    spec._build_fns()
    plain._build_fns()

    warm = reqs[:2]
    spec.run(warm, budgets=[2, 2])
    plain.run(warm, budgets=[2, 2])

    t0 = time.perf_counter()
    res_s = spec.run(reqs, budgets=budgets)
    spec_s = time.perf_counter() - t0
    spec_calls = spec.steps_run

    t0 = time.perf_counter()
    res_p = plain.run(reqs, budgets=budgets)
    plain_s = time.perf_counter() - t0
    plain_calls = plain.steps_run

    mismatch = sum(
        0 if np.array_equal(a.output_tokens, b.output_tokens) else 1
        for a, b in zip(res_s, res_p)
    )
    total_tokens = sum(
        int(np.asarray(r.output_tokens).shape[-1]) for r in res_p
    )
    # tokens emitted per verify call, averaged over occupied slot-rows:
    # the engine runs one (k+1)-token verify per slot per call, so the
    # per-row acceptance is total_tokens / (calls x mean-occupancy). The
    # conservative per-call figure below divides by ALL slot-rows.
    accept_per_call = total_tokens / max(1, spec_calls)
    plain_per_call = total_tokens / max(1, plain_calls)

    record = {
        "metric": "spec_nonecho_acceptance",
        "value": round(plain_s / spec_s, 3),
        "unit": "x speedup (e2e, spec vs T=1 control, same engine)",
        "spec_qa_per_sec": round(len(reqs) / spec_s, 3),
        "plain_qa_per_sec": round(len(reqs) / plain_s, 3),
        "verify_calls_spec": spec_calls,
        "decode_calls_plain": plain_calls,
        "tokens_emitted": total_tokens,
        "tokens_per_call_spec": round(accept_per_call, 2),
        "tokens_per_call_plain": round(plain_per_call, 2),
        "call_ratio": round(plain_calls / max(1, spec_calls), 2),
        "token_mismatch_rows": mismatch,
        "echo_exact": f"{sum(echo_ok)}/{n}",
        "final_ce": round(ce[-1], 4),
        "train_steps": len(ce),
        "spec_k": args.spec_k,
        "spec_ngram": args.spec_ngram,
        "requests": len(reqs),
        "slots": args.slots,
        "llm": f"{llm.num_hidden_layers}L-{llm.hidden_size}h-"
               f"gqa{llm.kv_heads}",
        "note": (
            "normally-attending learned checkpoint (no identity surgery): "
            "extractive-QA answers echo prompt spans, the published "
            "prompt-lookup regime. Speculation is GREEDY-ONLY and cannot "
            "compose with the reference beam-5/rep-3.0 eval decode."
        ),
        "timings_s": {"train": round(train_s, 1),
                      "total": round(time.time() - t_start, 1)},
        "quick": bool(args.quick),
        "device": str(jax.devices()[0]),
    }
    with open(args.out, "w") as f:
        json.dump(record, f, indent=1)
    print(json.dumps(record), flush=True)
    assert mismatch == 0, f"{mismatch} rows diverged between spec and T=1"


if __name__ == "__main__":
    main()
