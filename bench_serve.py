"""Expected-case serving benchmark: continuous batching vs gang scheduling.

The north-star bench (bench_qa.py) measures a fixed token budget — the
worst case. Real MSQA serving sees short, highly variable answers
(typically <=25 tokens with a long tail), where a fixed batch decodes
until its SLOWEST row finishes: cost per request ~ max(len) over the
batch. ContinuousBatchingServer refills each slot the moment its request
finishes, so cost per request ~ mean(len) + refill overhead.

Both arms run byte-identical compiled kernels (the gang arm is the same
engine with refill disabled until the batch drains — shared jitted fns),
so the measured gap is purely the scheduling policy.

Workload: per-request token budgets drawn from an MSQA-like answer-length
mixture (45% 1-4 tokens: counting/existence; 35% 5-24: attributes;
15% 25-64: descriptions; 5% 65-max: long tail). A budget models the
request's natural EOS point (greedy rows are independent, so stopping a
row at token n is exactly what EOS at n does).

Emits one JSON line.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

import bench_qa


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
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true", help="small LLM smoke")
    p.add_argument("--int8", action="store_true")
    p.add_argument("--int4", action="store_true")
    p.add_argument("--quant-group", type=int, default=0)
    p.add_argument("--kv-quant", action="store_true")
    p.add_argument("--merged-lora", action="store_true")
    p.add_argument("--compact-transfer", action="store_true")
    p.add_argument("--slots", type=int, default=32, help="decode slots (batch)")
    p.add_argument("--refill-group", type=int, default=8)
    p.add_argument("--chunk-steps", type=int, default=16)
    p.add_argument("--max-new", type=int, default=256,
                   help="compiled budget (the reference eval setting)")
    p.add_argument("--requests", type=int, default=96)
    p.add_argument("--prompt-len", type=int, default=160)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--skip-gang", action="store_true",
                   help="only measure the continuous arm")
    p.add_argument("--lookahead", type=int, default=1,
                   help="decode chunks dispatched before fetching flags "
                        "(both arms; 0 = synchronous host loop)")
    # bench_qa.build_model compatibility
    p.add_argument("--beams", type=int, default=1)
    p.add_argument("--eos-bias", type=float, default=0.0)
    p.add_argument("--act-quant", action="store_true")
    p.add_argument("--spec-k", type=int, default=0,
                   help="n-gram speculative decoding inside the engine "
                   "(forces penalty-free greedy; the control arm becomes "
                   "the plain continuous engine instead of gang)")
    p.add_argument("--spec-ngram", type=int, default=3)
    p.add_argument("--rep-penalty", type=float, default=3.0)
    p.add_argument("--prefix-pool", action="store_true",
                   help="serve through the prefix-pool engine (scene "
                        "prefixes prefilled once per scene into a shared "
                        "KV block pool); the control arm is the PLAIN "
                        "continuous engine on the same workload")
    p.add_argument("--num-prefixes", type=int, default=8,
                   help="prefix-pool blocks (G)")
    p.add_argument("--suffix-len", type=int, default=64,
                   help="prefix-pool question bucket (W)")
    p.add_argument("--echo-weights", action="store_true",
                   help="identity-block surgery after init (see bench_qa "
                        "--echo-weights): the echo-structured acceptance "
                        "regime for measuring spec_k inside the engines")
    p.add_argument("--scenes", type=int, default=0,
                   help="distinct scenes in the workload (scene-major "
                        "question runs, MSQA-shaped); 0 = one scene per "
                        "request (the plain workload)")
    p.add_argument("--open-loop", action="store_true",
                   help="Poisson-arrival latency mode: measure closed-"
                        "loop capacity, then TTFT/e2e/TPOT percentiles "
                        "at --load-fractions of it (VERDICT r4 #4)")
    p.add_argument("--load-fractions", type=float, nargs="+",
                   default=[0.5, 0.8])
    args = p.parse_args(argv)
    args.new_tokens = args.max_new  # model.max_out_len
    return args


def sample_budgets(n: int, max_new: int, seed: int) -> np.ndarray:
    """MSQA-like answer-length mixture (see module docstring)."""
    r = np.random.default_rng(seed)
    kind = r.choice(4, size=n, p=[0.45, 0.35, 0.15, 0.05])
    lens = np.where(
        kind == 0, r.integers(1, 5, n),
        np.where(
            kind == 1, r.integers(5, 25, n),
            np.where(kind == 2, r.integers(25, 65, n),
                     r.integers(65, max(66, max_new + 1), n)),
        ),
    )
    return np.clip(lens, 1, max_new).astype(np.int64)


def split_rows(data: dict, n: int):
    keys = [k for k in data if k != "msr3d_prompt"]
    return [
        {"msr3d_prompt": data["msr3d_prompt"][i],
         **{k: data[k][i] for k in keys}}
        for i in range(n)
    ]


def make_scene_runs(args, n: int, n_scenes: int, seed: int):
    """MSQA-shaped stream: n requests over n_scenes scenes, scene-major
    question runs (the eval-split ordering). Each scene's requests share
    the scene arrays AND the pre-question prompt text."""
    q = -(-n // n_scenes)
    reqs = []
    for s in range(n_scenes):
        d = bench_qa.make_data(args, 1, seed + 1000 * s)
        prompt0 = d["msr3d_prompt"][0]
        head = prompt0[: prompt0.index("USER:")]
        for j in range(q):
            if len(reqs) >= n:
                break
            reqs.append({
                "msr3d_prompt": (
                    f"{head}USER: What is behind the chair number {j}? "
                    f"ASSISTANT:"
                ),
                **{k: d[k][0] for k in d if k != "msr3d_prompt"},
            })
    return reqs


def prefix_bucket(model, reqs) -> int:
    """The pool engine's prefix bucket: the MAX over the workload's
    prompts of tokens-up-to-last-placeholder, rounded to 32 — sizing
    from one request alone would raise the engine's 'exceeds prefix
    bucket' error mid-benchmark if a later scene tokenizes longer."""
    tok = model.tokenizer
    enc = tok.encode_batch(
        model.build_text_prompt(
            {"msr3d_prompt": [r["msr3d_prompt"] for r in reqs]}
        ),
        padding_side="left", add_bos=True, pad_to=None,
    )
    ph = {tok.scene_token_id, tok.img_token_id}
    longest = 0
    for ids, mask in zip(enc.input_ids, enc.attention_mask):
        row = ids[mask.astype(bool)]
        last = max(i for i, t in enumerate(row) if int(t) in ph)
        longest = max(longest, last + 1)
    return max(32, -(-longest // 32) * 32)


def build_workload(args):
    """(model, llm, requests, budgets, prompt_len, init_s) — the shared
    setup for the closed-loop and open-loop benchmarks."""
    model, llm = bench_qa.build_model(args)

    n = args.requests
    if args.scenes > 0:
        requests = make_scene_runs(args, n, args.scenes, args.seed)
    else:
        data = bench_qa.make_data(args, n, args.seed)
        requests = split_rows(data, n)
    budgets = sample_budgets(n, args.max_new, args.seed + 1)

    # init params on a small batch
    b0 = bench_qa.make_data(args, 2, 123)
    prompts = model.build_text_prompt(b0)
    ii, am = model._encode_prompts(prompts)
    oi, om = model._encode_answers(["an answer"] * 2)
    init_batch = model._scene_batch(b0)
    init_batch.update(input_ids=ii, attention_mask=am, output_ids=oi,
                      output_mask=om)
    t0 = time.time()
    model.init_params(init_batch)
    if getattr(args, "echo_weights", False):
        bench_qa._apply_echo_weights(model)
    init_s = time.time() - t0

    # engine prompt bucket from the actual workload
    wi, _ = model._encode_prompts(
        model.build_text_prompt(
            {"msr3d_prompt": [r["msr3d_prompt"] for r in requests]}
        )
    )
    prompt_len = max(32, -(-wi.shape[1] // 32) * 32) + 1
    return model, llm, requests, budgets, prompt_len, init_s


def make_engines(args, model, requests, prompt_len):
    """(cont, gang) engine pair per the arg flags; compiled-program
    sharing where shapes allow."""
    from msr3d_tpu.serving import (
        ContinuousBatchingServer,
        ContinuousBeamBatchingServer,
    )

    spec_k = getattr(args, "spec_k", 0)
    if args.prefix_pool:
        from msr3d_tpu.serving import (
            PrefixPoolContinuousBatchingServer,
            PrefixPoolContinuousBeamBatchingServer,
        )

        pool_kw = dict(
            num_prefixes=args.num_prefixes,
            prefix_len=prefix_bucket(model, requests),
            suffix_len=args.suffix_len,
            refill_group=args.refill_group, chunk_steps=args.chunk_steps,
            max_new_tokens=args.max_new, lookahead=args.lookahead,
        )
        plain_kw = dict(
            refill_group=args.refill_group, chunk_steps=args.chunk_steps,
            max_new_tokens=args.max_new, prompt_len=prompt_len,
            lookahead=args.lookahead,
        )
        if args.beams > 1:
            assert not spec_k, "speculative decoding is greedy-only"
            cont = PrefixPoolContinuousBeamBatchingServer(
                model, args.slots, num_beams=args.beams, **pool_kw
            )
            gang = ContinuousBeamBatchingServer(
                model, args.slots, num_beams=args.beams, **plain_kw
            )
        elif spec_k:
            # pool+spec vs the T=1 pool engine: isolates the speculative
            # delta on top of prefix sharing
            cont = PrefixPoolContinuousBatchingServer(
                model, args.slots, spec_k=spec_k,
                spec_ngram=getattr(args, "spec_ngram", 3), **pool_kw
            )
            gang = PrefixPoolContinuousBatchingServer(
                model, args.slots, **pool_kw
            )
        else:
            cont = PrefixPoolContinuousBatchingServer(
                model, args.slots, **pool_kw
            )
            gang = ContinuousBatchingServer(model, args.slots, **plain_kw)
        # control arm = the PLAIN continuous engine on the same workload
        # (isolates the prefix-pool delta from the scheduling win)
        cont._build_fns()
        gang._build_fns()
    elif args.beams > 1:
        # beam slot-refill engine vs its own gang-scheduled control (the
        # fixed-batch beam eval policy): each slot runs a full HF beam
        # search at its own depth (the reference's beam-5/rep-3.0 eval
        # decode), budgets model per-request termination lengths
        assert not spec_k, "speculative decoding is greedy-only"
        cont = ContinuousBeamBatchingServer(
            model, args.slots, num_beams=args.beams,
            refill_group=args.refill_group, chunk_steps=args.chunk_steps,
            max_new_tokens=args.max_new, prompt_len=prompt_len,
            lookahead=args.lookahead,
        )
        gang = ContinuousBeamBatchingServer(
            model, args.slots, num_beams=args.beams,
            refill_group=args.refill_group, chunk_steps=args.chunk_steps,
            max_new_tokens=args.max_new, prompt_len=prompt_len,
            drain_between_batches=True, lookahead=args.lookahead,
        )
        cont._build_fns()
        gang._fns = cont._fns  # same shapes: share the compiled programs
    elif spec_k:
        cont = ContinuousBatchingServer(
            model, args.slots, refill_group=args.refill_group,
            chunk_steps=args.chunk_steps, max_new_tokens=args.max_new,
            prompt_len=prompt_len, lookahead=args.lookahead,
            spec_k=spec_k, spec_ngram=getattr(args, "spec_ngram", 3),
        )
        # control arm: the PLAIN continuous engine (same scheduling,
        # T=1 decode) — isolates the speculative-decoding delta
        gang = ContinuousBatchingServer(
            model, args.slots, refill_group=args.refill_group,
            chunk_steps=args.chunk_steps, max_new_tokens=args.max_new,
            prompt_len=prompt_len, lookahead=args.lookahead,
        )
        cont._build_fns()
        gang._build_fns()  # different decode program; no sharing
    else:
        cont = ContinuousBatchingServer(
            model, args.slots, refill_group=args.refill_group,
            chunk_steps=args.chunk_steps, max_new_tokens=args.max_new,
            prompt_len=prompt_len, lookahead=args.lookahead,
        )
        # gang arm: same refill group (identical compiled prefill program —
        # the measured gap must be the scheduling policy, nothing else), but
        # refills only once every slot has drained
        gang = ContinuousBatchingServer(
            model, args.slots, refill_group=args.refill_group,
            chunk_steps=args.chunk_steps, max_new_tokens=args.max_new,
            prompt_len=prompt_len, drain_between_batches=True,
            lookahead=args.lookahead,
        )
        cont._build_fns()
        gang._fns = cont._fns  # same shapes: share the compiled programs
    return cont, gang


def run_serve(args) -> dict:
    """Run the serving benchmark, returning the record dict (importable
    by bench.py for the driver-captured reference-exact eval number)."""

    import jax

    model, llm, requests, budgets, prompt_len, init_s = build_workload(args)
    n = args.requests
    spec_k = getattr(args, "spec_k", 0)
    cont, gang = make_engines(args, model, requests, prompt_len)

    # warm/compile: a small prefix of the workload at tiny budgets
    warm_reqs = requests[: args.refill_group]
    t0 = time.time()
    cont.run(warm_reqs, budgets=[2] * len(warm_reqs))
    if (spec_k or args.prefix_pool) and not args.skip_gang:
        # the control arm runs DIFFERENT compiled programs (plain T=1
        # chunk) — warm it too so the timed run is compile-free
        gang.run(warm_reqs, budgets=[2] * len(warm_reqs))
    compile_s = time.time() - t0

    t0 = time.perf_counter()
    res_c = cont.run(requests, budgets=budgets)
    cont_s = time.perf_counter() - t0
    assert len(res_c) == n
    cont_steps = cont.steps_run

    mismatch_rows = 0
    if args.skip_gang:
        gang_s = float("nan")
        gang_steps = 0
    else:
        t0 = time.perf_counter()
        res_g = gang.run(requests, budgets=budgets)
        gang_s = time.perf_counter() - t0
        assert len(res_g) == n
        gang_steps = gang.steps_run
        # scheduling must not change tokens (exactness proven on CPU in
        # tests/test_serving_continuous.py); report any residual rows —
        # on TPU bf16 RANDOM weights, near-tied argmax can flip
        mismatch_rows = sum(
            0 if np.array_equal(rc.output_tokens, rg.output_tokens) else 1
            for rc, rg in zip(res_c, res_g)
        )

    record = {
        "metric": "serving_qa_pairs_per_sec_continuous",
        "value": round(n / cont_s, 3),
        "unit": "QA pairs/s/chip",
        "vs_baseline": round(gang_s / cont_s, 3) if gang_s == gang_s else 1.0,
        "gang_qa_per_sec": round(n / gang_s, 3) if gang_s == gang_s else None,
        "requests": n,
        "slots": args.slots,
        "refill_group": args.refill_group,
        "chunk_steps": args.chunk_steps,
        "max_new": args.max_new,
        "prompt_len": prompt_len,
        "budget_mean": round(float(budgets.mean()), 1),
        "budget_max": int(budgets.max()),
        "decode_steps_continuous": cont_steps,
        "decode_steps_gang": gang_steps,
        "useful_tokens": int(budgets.sum()),
        "slot_utilization_continuous": round(
            float(budgets.sum()) / max(1, cont_steps * args.slots), 3
        ),
        "slot_utilization_gang": round(
            float(budgets.sum()) / max(1, gang_steps * args.slots), 3
        ) if gang_steps else None,
        "beams": args.beams,
        "llm": f"{llm.num_hidden_layers}L-{llm.hidden_size}h"
        + ("-int8" if args.int8 else "")
        + ("-int4" if getattr(args, "int4", False) else "")
        + ("-kv8" if args.kv_quant else "")
        + ("-cpk" if args.compact_transfer else ""),
        "spec_k": spec_k,
        "echo_weights": bool(getattr(args, "echo_weights", False)),
        "prefix_pool": bool(args.prefix_pool),
        "num_prefixes": args.num_prefixes if args.prefix_pool else None,
        "scenes": args.scenes or None,
        "prefix_prefills": getattr(cont, "prefix_prefills", None),
        "token_mismatch_rows": mismatch_rows,
        "init_s": round(init_s, 1),
        "compile_s": round(compile_s, 1),
        "device": str(jax.devices()[0]),
    }
    return record


def _pct(xs, q):
    return round(float(np.percentile(np.asarray(xs, np.float64), q)), 4)


def run_open_loop(args) -> dict:
    """Open-loop (Poisson-arrival) latency benchmark (VERDICT r4 #4).

    Closed-loop throughput hides queueing: a pre-built request list keeps
    every slot saturated, so TTFT under REAL load — requests arriving at
    their own times while earlier ones still decode — is never measured.
    This mode first measures closed-loop capacity on the workload, then
    replays the same requests with exponential inter-arrival gaps at
    ``--load-fractions`` of that capacity through the engine's online
    stream, recording per-request:

      TTFT  — submit → first streamed chunk (the SSE first-chunk time;
              granularity = chunk_steps decode steps, exactly what an
              SSE client observes). Beam engines finalize at the end, so
              TTFT == e2e there.
      e2e   — submit → Result delivery.
      TPOT  — decode pace after the first chunk,
              (t_done − t_first) / tokens_after_first.
    """
    import jax

    from msr3d_tpu.serving import OnlineRequestStream

    model, llm, requests, budgets, prompt_len, init_s = build_workload(args)
    n = args.requests
    cont, _gang = make_engines(args, model, requests, prompt_len)

    warm_reqs = requests[: args.refill_group]
    t0 = time.time()
    cont.run(warm_reqs, budgets=[2] * len(warm_reqs))
    compile_s = time.time() - t0

    # closed-loop capacity on this workload (same-day control by
    # construction: measured seconds before the open-loop arms)
    t0 = time.perf_counter()
    res = cont.run(requests, budgets=budgets)
    closed_s = time.perf_counter() - t0
    assert len(res) == n
    capacity = n / closed_s

    streaming = bool(getattr(cont, "supports_progress", False))
    arms = []
    for frac in args.load_fractions:
        rate = capacity * frac
        r = np.random.default_rng(args.seed + 7)
        gaps = r.exponential(1.0 / rate, size=n)
        t_arrive, t_first, t_done = {}, {}, {}
        tok_first, tok_done = {}, {}

        def on_progress(rid, tokens):
            if rid not in t_first and len(tokens) > 0:
                t_first[rid] = time.perf_counter()
                tok_first[rid] = int(len(tokens))

        def on_result(r_):
            now = time.perf_counter()
            t_done[r_.id] = now
            tok_done[r_.id] = int(np.asarray(r_.output_tokens).shape[-1])
            if r_.id not in t_first:  # finished inside its first chunk
                t_first[r_.id] = now
                tok_first[r_.id] = tok_done[r_.id]

        stream = OnlineRequestStream()

        def feeder():
            start = time.perf_counter()
            due = start
            for i in range(n):
                due += gaps[i]
                while True:
                    dt = due - time.perf_counter()
                    if dt <= 0:
                        break
                    time.sleep(min(dt, 0.05))
                rid = stream.submit(requests[i], int(budgets[i]))
                t_arrive[rid] = time.perf_counter()
            stream.close()

        import threading

        th = threading.Thread(target=feeder, daemon=True)
        t0 = time.perf_counter()
        th.start()
        cont.run(stream, on_result=on_result,
                 on_progress=on_progress if streaming else None)
        wall = time.perf_counter() - t0
        th.join()
        assert len(t_done) == n, f"{len(t_done)}/{n} completed"

        ttft = [t_first[i] - t_arrive[i] for i in range(n)]
        e2e = [t_done[i] - t_arrive[i] for i in range(n)]
        tpot_ms = [
            (t_done[i] - t_first[i]) / (tok_done[i] - tok_first[i]) * 1e3
            for i in range(n)
            if tok_done[i] > tok_first[i]
        ]
        arms.append({
            "load_fraction": frac,
            "offered_qa_per_sec": round(rate, 3),
            "achieved_qa_per_sec": round(n / wall, 3),
            "ttft_s_p50": _pct(ttft, 50),
            "ttft_s_p95": _pct(ttft, 95),
            "ttft_s_p99": _pct(ttft, 99),
            "e2e_s_p50": _pct(e2e, 50),
            "e2e_s_p95": _pct(e2e, 95),
            "e2e_s_p99": _pct(e2e, 99),
            "tpot_ms_p50": _pct(tpot_ms, 50) if tpot_ms else None,
            "tpot_ms_p95": _pct(tpot_ms, 95) if tpot_ms else None,
            "tpot_rows": len(tpot_ms),
        })

    return {
        "metric": "serving_open_loop_latency",
        "value": arms[-1]["ttft_s_p95"],
        "unit": "s (TTFT p95 at the highest load fraction)",
        "vs_baseline": 1.0,
        "capacity_qa_per_sec_closed_loop": round(capacity, 3),
        "streaming_ttft": streaming,
        "ttft_note": (
            "TTFT = submit -> first streamed chunk (SSE first-chunk; "
            f"granularity {args.chunk_steps} decode steps)"
            if streaming else
            "beam engine: hypotheses finalize at the end, TTFT == e2e"
        ),
        "arms": arms,
        "requests": n,
        "slots": args.slots,
        "refill_group": args.refill_group,
        "chunk_steps": args.chunk_steps,
        "max_new": args.max_new,
        "budget_mean": round(float(budgets.mean()), 1),
        "budget_max": int(budgets.max()),
        "beams": args.beams,
        "prefix_pool": bool(args.prefix_pool),
        "scenes": args.scenes or None,
        "llm": f"{llm.num_hidden_layers}L-{llm.hidden_size}h"
        + ("-int8" if args.int8 else "")
        + ("-kv8" if args.kv_quant else "")
        + ("-cpk" if args.compact_transfer else ""),
        "init_s": round(init_s, 1),
        "compile_s": round(compile_s, 1),
        "device": str(jax.devices()[0]),
    }


def main(argv=None) -> None:
    args = parse_args(argv)
    if args.open_loop:
        print(json.dumps(run_open_loop(args)))
    else:
        print(json.dumps(run_serve(args)))


if __name__ == "__main__":
    main()
