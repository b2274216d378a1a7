"""Driver benchmark — prints ONE JSON line with the north-star headline.

Headline (BASELINE.json): **QA-pairs/sec/chip**, greedy decode, full MSR3D
pipeline at flagship scale on one chip (scene encode 60 obj × 1024 pts →
splice → 7B-geometry Llama int8 weight-only, merged LoRA → bucketed
prefill → 32-token decode, depth-3 request pipelining — the round-1 record
serving configuration). Extra fields carry the beam-5 eval-decode
throughput (the reference's accuracy-eval settings: 5 beams, repetition
penalty 3.0) and the scene-encode latency.

``vs_baseline`` compares headline QA/s against the FIXED round-1 record
(11.62 QA/s) so its meaning is stable across rounds — a cumulative
speedup, not a tunnel-noise delta vs last round. The best prior round is
reported separately as ``prior_round_qa``.
The reference repo publishes no numbers (SURVEY.md §6); its A100 config
remains unmeasured until real weights/data are mounted.
"""

from __future__ import annotations

import argparse
import glob
import json
import time
from types import SimpleNamespace

import numpy as np

ROUND1_RECORD_QA = 11.62  # BASELINE.md round-1 greedy record


def bench_scene_encode() -> dict:
    import jax
    import jax.numpy as jnp

    from msr3d_tpu.models.ose3d_situation import OSE3DConfig, OSE3DSituation

    B, N_OBJ, N_PTS = 16, 60, 1024
    model = OSE3DSituation(OSE3DConfig())  # reference msr3d.yaml scale
    rng = np.random.default_rng(0)
    batch = dict(
        obj_fts=jnp.asarray(
            (rng.normal(size=(B, N_OBJ, N_PTS, 6)) * 0.3).astype(np.float32)
        ),
        obj_masks=jnp.asarray(np.ones((B, N_OBJ), bool)),
        obj_locs=jnp.asarray(rng.normal(size=(B, N_OBJ, 6)).astype(np.float32)),
        anchor_locs=jnp.asarray(rng.normal(size=(B, 3)).astype(np.float32)),
        anchor_orientation=jnp.asarray(
            np.tile(np.array([0, 0, 0, 1], np.float32), (B, 1))
        ),
    )
    variables = jax.jit(lambda k, b: model.init(k, **b))(jax.random.key(0), batch)

    # iterations chain on-device (each feeds a perturbation of its output
    # into the next input) so result caching / async dispatch can't fake the
    # timing; sync is a VALUE fetch (block_until_ready can return early
    # through the axon tunnel)
    iters = 10

    @jax.jit
    def run_loop(v, b):
        import jax.lax as lax

        def body(i, carry):
            fts, acc = carry
            out = model.apply(
                v, obj_fts=fts, obj_masks=b["obj_masks"], obj_locs=b["obj_locs"],
                anchor_locs=b["anchor_locs"],
                anchor_orientation=b["anchor_orientation"],
            )["obj_tokens"]
            bump = jnp.mean(out).astype(fts.dtype) * jnp.float32(1e-6)
            return fts + bump, acc + jnp.sum(out.astype(jnp.float32))

        _, acc = lax.fori_loop(0, iters, body, (b["obj_fts"], jnp.float32(0)))
        return acc

    float(run_loop(variables, batch))  # compile + sync
    batch2 = dict(batch, obj_fts=batch["obj_fts"] + 0.01)
    t0 = time.perf_counter()
    float(run_loop(variables, batch2))
    dt = time.perf_counter() - t0
    return {
        "scene_encode_ms_per_scene": round(dt / (iters * B) * 1000.0, 4),
        "scenes_per_sec": round(iters * B / dt, 1),
    }


def prior_round_qa() -> float:
    best = ROUND1_RECORD_QA
    for path in sorted(glob.glob("BENCH_r*.json")):
        try:
            with open(path) as f:
                rec = json.load(f)
            parsed = rec.get("parsed", rec)
            if parsed.get("metric") == "qa_pairs_per_sec_per_chip":
                best = max(best, float(parsed.get("value", 0)))
        except Exception:
            pass
    return best


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
    parser = argparse.ArgumentParser()
    parser.add_argument("--quick", action="store_true",
                        help="small LLM smoke (CI)")
    args = parser.parse_args()

    import bench_qa

    scene = bench_scene_encode()

    common = dict(
        quick=args.quick, int8=not args.quick, merged_lora=True,
        kv_quant=not args.quick, compact_transfer=not args.quick,
        prompt_len=160,
        new_tokens=8 if args.quick else 32, iters=2 if args.quick else 10,
        pipeline_depth=3,
    )
    # record configs (BASELINE.md round 2): int8 KV + scale-outside dequant
    # restore monotone batch scaling — greedy peaks at b80 (b96 OOMs),
    # beam-5 at b48; compact int16/int8 point transfer adds ~6% at b80
    greedy = bench_qa.run(
        SimpleNamespace(**common, beams=1, batch=2 if args.quick else 80,
                        group=0)
    )
    beam = bench_qa.run(
        SimpleNamespace(**common, beams=5, batch=2 if args.quick else 48,
                        group=0)
    )
    # scene-grouped serving (generate_scene_group): questions sharing a
    # (scene, situation) prefill the preamble+scene ONCE — decode stays
    # at full batch, and the G-row prompt KV frees enough HBM for b160
    # (plain OOMs at b96). Record: b160 x group16 = 4.27x the plain path
    # (round 3). Applies when the workload presents repeated situations
    # (MSQA generates several QA per sampled situation)
    grouped = bench_qa.run(
        SimpleNamespace(**common, beams=1, batch=2 if args.quick else 160,
                        group=2 if args.quick else 16)
    )

    # the REFERENCE-EXACT eval decode (VERDICT r3 #8): beam-5,
    # repetition_penalty 3.0, 256-token budget, MSQA-like answer-length
    # mix on the MSQA workload SHAPE (scene-major question runs, 12
    # scenes × 8 questions), served by the prefix-pool BEAM engine at
    # the round-4 record config (8 slots, refill 2, chunk 8,
    # ancestry+layered state, 6 prefix blocks). This is the number the
    # ≥3×-A100 north star is audited against (BASELINE.md derives the
    # A100 at 1.9–2.4 QA/s in this setting — and the A100 estimate does
    # NOT charge the reference for its per-question scene re-encode, so
    # the comparison stays conservative).
    import bench_serve

    ref_eval = bench_serve.run_serve(bench_serve.parse_args(
        ["--beams", "5", "--skip-gang", "--prompt-len", "160",
         "--prefix-pool", "--suffix-len", "64"]
        + (["--quick", "--slots", "2", "--refill-group", "1",
            "--chunk-steps", "4", "--max-new", "16", "--requests", "6",
            "--scenes", "2", "--num-prefixes", "2"]
           if args.quick else
           ["--int8", "--kv-quant", "--merged-lora", "--compact-transfer",
            "--slots", "8", "--refill-group", "2", "--chunk-steps", "8",
            "--max-new", "256", "--requests", "96",
            "--scenes", "12", "--num-prefixes", "6"])
    ))

    # the PRODUCTION serving record (round 4): prefix-pool continuous
    # engine at the nt=32 shape, scene-run workload, 96 slots — the
    # streamed counterpart of the fixed-batch grouped number above
    pool = bench_serve.run_serve(bench_serve.parse_args(
        ["--skip-gang", "--prompt-len", "160", "--prefix-pool",
         "--suffix-len", "64"]
        + (["--quick", "--slots", "4", "--refill-group", "2",
            "--chunk-steps", "4", "--max-new", "8", "--requests", "8",
            "--scenes", "2", "--num-prefixes", "2"]
           if args.quick else
           ["--int8", "--kv-quant", "--merged-lora", "--compact-transfer",
            "--slots", "96", "--refill-group", "8", "--chunk-steps", "8",
            "--max-new", "32", "--requests", "288",
            "--scenes", "18", "--num-prefixes", "10"])
    ))

    # training throughput (VERDICT r4 #3: driver-captured every round).
    # Record config: micro-batch 2 × accum 10 (global 20 ≈ the
    # reference's per-GPU 4×5), NO remat, answer-window CE. Round 5
    # made remat real (prevent_cse=True — the historical 17.6 "dots"
    # number was CSE'd into an effective no-remat program); at the
    # short production shape the activations fit without remat, so
    # no-remat is the honest fast arm (measured uncontended: no-remat
    # 16.5 / flash 16.1 / real-dots 15.7 samples/s — remat is the
    # capacity knob for ≥2k-token contexts, not a speed knob here).
    # Run LAST so its long compile can't contend with the serving arms'
    # timed loops.
    import bench_train

    train = bench_train.run_train(bench_train.parse_args(
        ["--batch", "2", "--accum", "2", "--prompt-len", "32",
         "--answer-len", "8", "--iters", "1", "--quick"]
        if args.quick else
        ["--batch", "2", "--accum", "10", "--no-remat", "--iters", "3"]
    ))

    # the 7B learning-closure artifact (scripts/overfit_7b.py, VERDICT r4
    # #1): echoed here so the driver record carries the EMs every round
    # without re-running the ~30-min training
    learning = {}
    try:
        with open("LEARNING_r05.json") as f:
            lr = json.load(f)
        if not lr.get("quick"):
            learning = {
                "overfit_7b_em_greedy": lr["em_greedy_bf16"],
                "overfit_7b_em_pool_int8kv8": lr["em_pool_int8kv8"],
                "overfit_7b_phase_a_ce": (
                    f"{lr['phase_a']['ce_first_mean']}->"
                    f"{lr['phase_a']['ce_last_mean']} over "
                    f"{lr['phase_a']['steps']} steps at the production "
                    "hyperparams (lr 3e-5, warmup 400, bf16, dots remat, "
                    "accum 10)"
                ),
            }
    except (OSError, KeyError, ValueError):
        pass

    prior = prior_round_qa()
    record = {
        "metric": "qa_pairs_per_sec_per_chip",
        "value": greedy["value"],
        "unit": "QA pairs/s/chip",
        "vs_baseline": round(greedy["value"] / ROUND1_RECORD_QA, 4),
        "beam5_qa_per_sec": beam["value"],
        "beam5_256budget_qa_per_sec": ref_eval["value"],
        "beam5_256budget_note": (
            "prefix-pool beam engine at the reference's exact eval decode "
            "(beam-5, rep-3.0, 256-token budget, MSQA answer mix "
            f"mean {ref_eval['budget_mean']}/max {ref_eval['budget_max']}, "
            "12 scenes x 8 questions); the >=3x-A100 audit number (A100 "
            "derived 1.9-2.4 QA/s, BASELINE.md). NUMBER DEPENDS on the "
            "scene-major run shape (each scene's prefix reused 8x, MSQA "
            "eval's ordering); the scene-unique hard draw measured 7.19 "
            "= 3.0-3.8x the derived A100 (conservative bound, round 4)"
        ),
        "pool_serving_qa_per_sec": pool["value"],
        "pool_serving_note": (
            "prefix-pool continuous engine, nt=32 MSQA mix, 18 scenes x "
            "16 questions, 96 slots — the streamed production record "
            "(scene prefixes prefill once per scene; plain continuous "
            "measured 25.3 same-day at 32 slots, round 4)"
        ),
        # decode-floor accounting (VERDICT r4 #2): wall/steps at the
        # 256-budget arm — an UPPER bound on the decode step (the wall
        # includes the interleaved chunked prefills), so the GB/s is a
        # LOWER bound on the achieved weight-stream rate
        "decode_step_ms": round(
            (ref_eval["requests"] / ref_eval["value"])
            / max(1, ref_eval["decode_steps_continuous"]) * 1e3, 2),
        "decode_effective_gbps": round(
            6.74 / ((ref_eval["requests"] / ref_eval["value"])
                    / max(1, ref_eval["decode_steps_continuous"])), 0),
        "decode_floor_note": (
            "6.74 GB = int8 7B weight set + bf16 lm_head read per decode "
            "step (KV/attention traffic excluded -> GB/s is a lower "
            "bound; wall/steps includes interleaved prefills -> ms is an "
            "upper bound). Floor closure (BASELINE.md round 5): the "
            "weight pass is byte-bound at ~465-536 GB/s effective "
            "(profile_decode_floor.py); the int8->bf16 convert costs ~3% "
            "(the round-4 'VPU convert floor' claim was WRONG); int4 "
            "matmul = int8 parity on this target (LLO rejects the bf16 "
            "Pallas unpack, f32 unpack 1.5x slower than XLA) -> no "
            "recoverable dequant lever; int4 is a capacity knob only"
        ),
        "grouped8_qa_per_sec": grouped["value"],
        "grouped8_note": (
            "shared-prefix grouped serving; applies when the workload "
            "presents repeated (scene, situation) pairs (MSQA's shape) — "
            "a situation-unique stream degrades toward the plain path, "
            "never to wrong answers"
        ),
        "train_samples_per_sec": train["value"],
        "train_step_ms": train["step_ms"],
        "train_mfu_est": train["mfu_est"],
        "train_note": (
            f"full 7B-geometry train step ({train['llm']}), micro-batch "
            f"{train['batch']} x accum {train['accum']}, "
            f"{train['prompt_tokens']}+{train['answer_tokens']} tokens; "
            "MFU counts useful FLOPs only (4*N_llm*tokens; frozen base = "
            "no weight-grad term) against the v5e 197 TFLOP/s bf16 peak"
        ),
        "scene_encode_ms_per_scene": scene["scene_encode_ms_per_scene"],
        "batch": greedy["batch"],
        "prompt_tokens": greedy["prompt_tokens"],
        "new_tokens": greedy["new_tokens"],
        "llm": greedy["llm"],
        "greedy_step_ms": greedy["step_ms"],
        "beam5_step_ms": beam["step_ms"],
        "pipeline_depth": greedy["pipeline_depth"],
        "prior_round_qa": prior,
        "device": greedy["device"],
        **learning,
    }
    print(json.dumps(record))


if __name__ == "__main__":
    main()
