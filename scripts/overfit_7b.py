"""Production-scale learning closure (VERDICT r4 #1).

The toy learning-closure suite (tests/test_learning.py) proves the
trainer optimizes at hidden-32/64 fp32 on CPU. This script closes the
remaining correctness axis: the PRODUCTION training configuration — 7B
geometry (32L/4096h/11008f), bf16 params+activations, LoRA r16 with
partitioned grads, dots remat policy, grad-accum 10, the real
`LeoTrainer` epoch loop — observed to OPTIMIZE on the real chip, then
the learned checkpoint served int8+kv8 through the prefix-pool engine
at EM-R 1.0.

Two phases under ONE compiled train step (a piecewise schedule, so the
260 s train-step compile is paid once):

  Phase A — the first `--phase-a` steps run at EXACTLY the production
  hyperparameters: lr 3e-5, wd 0.05, betas (0.9, 0.999), grad-clip 5.0,
  warmup_cosine_instructblip with the production 400-step warmup
  (reference configs/msr3d.yaml:42-52). The assertion is that CE falls —
  a bf16-specific optimization failure (grad underflow at the production
  lr scale, a remat/accum interaction) shows up here and nowhere else
  in the suite.

  Phase B — the schedule factor steps up to `--boost`×3e-5 (an overfit
  scaffold, exactly like the toy tests' lr 5e-3: the production lr is
  sized for 31K steps over 251K items, not for overfitting 20 items in
  minutes) and training continues until CE < `--tol`.

Then: greedy generate (bf16) → MSQAEval EM-R must be 1.0; the SAME
learned weights quantized int8 base + int8 KV and served through
PrefixPoolContinuousBatchingServer → EM-R must be 1.0 (the quantized
serving gate at production scale).

Scaffolding note (same as tests/test_learning.py:boost_lm_head): the
FROZEN lm_head is rescaled ×`--lm-head-gain` at init. Production
freezes a TRAINED high-gain head; a random-init head's low gain caps
the achievable logit margin, which is a property of the random test
weights, not of the training stack under test.

Writes LEARNING_r05.json (CE curves, EMs, timings). bench.py echoes its
EM fields so the driver record carries them every round.

Usage:
  python scripts/overfit_7b.py                 # the real thing (~30-40 min)
  python scripts/overfit_7b.py --quick         # tiny-LLM CPU smoke
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

ANSWERS = [
    "chair", "yes", "red", "lamp", "window", "big", "south", "no",
    "table", "green", "two", "door", "small", "north", "sofa", "blue",
    "three", "open", "east", "closed",
]


def make_items(prompts, answers, n_obj, n_pts):
    items = []
    for i, (p, a) in enumerate(zip(prompts, answers)):
        r = np.random.default_rng(1000 + i)
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


class FixedLoader:
    ARRAY_KEYS = ("obj_fts", "obj_masks", "obj_locs", "anchor_locs",
                  "anchor_orientation")

    def __init__(self, items, batch_size):
        assert len(items) % batch_size == 0
        self.items, self.bs = items, batch_size

    def __len__(self):
        return len(self.items) // self.bs

    def __iter__(self):
        for b in range(len(self)):
            chunk = self.items[b * self.bs:(b + 1) * self.bs]
            dd = {
                "msr3d_prompt": [it["msr3d_prompt"] for it in chunk],
                "text_output": [it["text_output"] for it in chunk],
            }
            for k in self.ARRAY_KEYS:
                dd[k] = np.stack([it[k] for it in chunk])
            yield dd


def collate(items, lo, hi):
    return next(iter(FixedLoader(items[lo:hi], hi - lo)))


def boost_lm_head(trainer, gain):
    import jax
    import jax.tree_util as jtu
    from flax.core import unfreeze

    from msr3d_tpu.trainer.train_state import TrainState

    v = unfreeze(jtu.tree_map(lambda x: x, trainer.state.params))
    v["params"] = dict(v["params"])
    v["params"]["llm"] = dict(v["params"]["llm"])
    v["params"]["llm"]["lm_head"] = {
        "kernel": v["params"]["llm"]["lm_head"]["kernel"] * gain
    }
    trainer.state = TrainState.create(
        v, trainer.optimizer, trainable_mask=trainer.trainable_mask
    )
    trainer.model.params = v


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
    p.add_argument("--quick", action="store_true", help="tiny-LLM smoke")
    p.add_argument("--items", type=int, default=20)
    p.add_argument("--micro-batch", type=int, default=2)
    p.add_argument("--accum", type=int, default=10)
    p.add_argument("--phase-a", type=int, default=150,
                   help="steps at the EXACT production hyperparameters")
    p.add_argument("--max-steps", type=int, default=500)
    p.add_argument("--tol", type=float, default=0.05)
    p.add_argument("--boost", type=float, default=20.0,
                   help="phase-B schedule factor (lr = boost * 3e-5)")
    p.add_argument("--lm-head-gain", type=float, default=20.0)
    p.add_argument("--gen-chunk", type=int, default=4,
                   help="greedy-eval batch (7B bf16 + full-set KV would "
                        "crowd the 16 GB chip)")
    p.add_argument("--out", default="LEARNING_r05.json")
    args = p.parse_args()

    import jax

    if args.quick:
        # the smoke must not land on (and contend with) the real chip —
        # the axon sitecustomize forces the TPU platform unless overridden
        # programmatically after import (see .claude/skills/verify)
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from msr3d_tpu.config import config_from_dict
    from msr3d_tpu.models.llm.llama import LlamaConfig
    from msr3d_tpu.models.llm.tokenizer import ByteTokenizer, SCENE_PLACEHOLDER
    from msr3d_tpu.models.msr3d import MSR3D, MSR3DNetworkConfig
    from msr3d_tpu.models.ose3d_situation import OSE3DConfig
    from msr3d_tpu.evaluator.msqa_eval import MSQAEval
    import msr3d_tpu.optim.build as ob
    from msr3d_tpu.optim.build import warmup_cosine_instructblip

    t_start = time.time()
    tok = ByteTokenizer()
    if args.quick:
        # remat=True so the smoke covers the remat-config-through-
        # generate path (the round-5 crash: prefill_with_cache under a
        # remat-wrapped block class)
        llm = LlamaConfig.tiny(vocab_size=tok.vocab_size, dtype=jnp.float32,
                               lora_rank=8, remat=True, remat_policy="dots")
        from tests.test_msr3d import TINY_PROMPTER as prompter

        n_obj, n_pts, scene_len = 6, 32, 5
        args.items = min(args.items, 4)
        args.micro_batch, args.accum = 2, 2
        args.phase_a, args.max_steps = 5, 120
        args.tol = 0.08
        args.boost = 200.0  # tiny-model overfit lr ~ the toy tests' 5e-3
    else:
        llm = LlamaConfig(
            vocab_size=32000, hidden_size=4096, intermediate_size=11008,
            num_hidden_layers=32, num_attention_heads=32,
            max_position_embeddings=2048, lora_rank=16,
            dtype=jnp.bfloat16, param_dtype=jnp.bfloat16,
            remat=True, remat_policy="dots",
        )
        prompter = OSE3DConfig()  # reference production widths
        n_obj, n_pts, scene_len = 60, 1024, 60

    cfg_net = MSR3DNetworkConfig(
        prompter=prompter, llm=llm, backbone_name="convnext_test",
        answer_window_loss=True,
    )
    model = MSR3D(cfg_net, tok, scene_token_len=scene_len, max_out_len=16,
                  num_beams=1, repetition_penalty=1.0)

    n = args.items
    answers = ANSWERS[:n]
    prompts = [
        f"Scene: {SCENE_PLACEHOLDER}. USER: question number {i}, "
        f"what is the answer? ASSISTANT:"
        for i in range(n)
    ]
    items = make_items(prompts, answers, n_obj, n_pts)

    # piecewise schedule: production warmup for phase A, boosted after.
    # Registered from the script (SCHEDULES is the explicit extension
    # point) so ONE compiled train step covers both phases.
    def overfit_two_phase(step, warmup_step, total_step,
                          phase_a=150.0, boost=20.0, boost_warm=10.0,
                          decay_after=100.0, decay_factor=0.25):
        # production total = 10 epochs x 251K items / global-batch 80
        prod = warmup_cosine_instructblip(step, warmup_step, 31000)
        ramp = jnp.clip((step - phase_a) / boost_warm, 0.05, 1.0)
        # polish stage: the second full run showed constant boost-lr
        # BOUNCING near the optimum (CE 0.13 <-> 3.1 over the burst
        # steps) — after `decay_after` boosted steps the factor drops
        # so the last items actually settle
        b = jnp.where(step < phase_a + decay_after, boost * ramp,
                      boost * decay_factor)
        return jnp.where(step < phase_a, prod, b)

    ob.SCHEDULES["overfit_two_phase"] = overfit_two_phase

    import tempfile

    exp_dir = tempfile.mkdtemp(prefix="overfit7b_")
    cfg = config_from_dict({
        "exp_dir": exp_dir,
        "mode": "train",
        "rng_seed": 0,
        "solver": {
            "gradient_accumulation_steps": args.accum,
            "grad_norm": 5.0,             # production msr3d.yaml:49
            "epochs": args.max_steps,     # 1 optimizer step per epoch here
            "eval_interval": 10 ** 9,
            "optim": {"name": "AdamW",
                      "args": {"lr": 3e-5, "betas": [0.9, 0.999],
                               "weight_decay": 0.05}},  # msr3d.yaml:42-47
            "sched": {"name": "overfit_two_phase",
                      "args": {"warmup_steps": 400,  # production warmup
                               "phase_a": float(args.phase_a),
                               "boost": float(args.boost)}},
        },
    })

    from msr3d_tpu.trainer.leo_trainer import LeoTrainer

    loaders = {"msr3d_train": {"train": FixedLoader(items, args.micro_batch)}}
    t0 = time.time()
    trainer = LeoTrainer(cfg, loaders=loaders, evaluators={}, model=model)
    boost_lm_head(trainer, args.lm_head_gain)
    init_s = time.time() - t0
    print(f"init {init_s:.0f}s", flush=True)

    steps_per_epoch = trainer.steps_per_epoch
    assert steps_per_epoch == 1, steps_per_epoch

    ce = []
    t0 = time.time()
    for epoch in range(args.max_steps):
        stats = trainer.train_one_epoch(epoch)
        trainer.tracker.step_epoch()
        ce.append(float(stats["loss"]))
        if epoch == 0:
            print(f"step 1: CE {ce[0]:.4f} (compile "
                  f"{time.time()-t0:.0f}s)", flush=True)
        if epoch % 20 == 19:
            print(f"step {epoch+1}: CE {ce[-1]:.4f}", flush=True)
        if epoch + 1 >= args.phase_a and ce[-1] < args.tol:
            break
    train_s = time.time() - t0
    steps_run = len(ce)

    # phase-A verdict: CE falls at the PRODUCTION hyperparameters
    a = ce[: args.phase_a]
    k = max(3, min(10, len(a) // 4))
    a_first, a_last = float(np.mean(a[:k])), float(np.mean(a[-k:]))
    slope = float(np.polyfit(np.arange(len(a)), a, 1)[0])
    phase_a_ok = a_last < a_first and slope < 0
    print(f"phase A ({len(a)} steps @ production lr): CE "
          f"{a_first:.4f} -> {a_last:.4f}, slope {slope:.5f}/step "
          f"({'OK' if phase_a_ok else 'FAILED'})", flush=True)
    final_ce = ce[-1]
    print(f"phase B: CE {final_ce:.4f} after {steps_run} total steps",
          flush=True)

    # --- greedy EM (bf16, the learned weights as trained) ---------------
    # The MEAN-CE stop criterion can leave one item undertrained (the
    # first full run: mean CE 0.0017 but one answer decoded wrong, EM
    # 0.8) — so the greedy gate retrains in bursts until EM-R is 1.0 or
    # the step budget runs out. The trainer stays alive (optimizer
    # moments resident) until the gate passes.
    def greedy_eval():
        texts = []
        for lo in range(0, n, args.gen_chunk):
            out = model.generate(
                collate(items, lo, min(n, lo + args.gen_chunk)))
            texts.extend(out["output_text"])
        ev = MSQAEval(None, "msqa_scannet", save_dir=f"{exp_dir}/eval_bf16")
        ev.reset()
        ev.update({"output_text": texts, "answer_list": answers})
        _, res = ev.record("val")
        return float(res["ans1_acc_llm"]), texts

    t0 = time.time()
    em_bf16, texts = greedy_eval()
    print(f"greedy bf16 EM-R: {em_bf16} texts[:4]={texts[:4]}", flush=True)
    # gate on EM-R 1.0 AND mean CE < tol: the second full run stopped
    # at (EM 1.0, CE 0.39) and the thin logit margin flipped one item
    # under int8 quantization (pool EM 0.95) — CE convergence is the
    # margin that survives quantization
    while ((em_bf16 < 1.0 or final_ce >= args.tol)
           and steps_run + 25 <= args.max_steps):
        for _ in range(25):
            stats = trainer.train_one_epoch(steps_run)
            trainer.tracker.step_epoch()
            ce.append(float(stats["loss"]))
            steps_run += 1
        em_bf16, texts = greedy_eval()
        final_ce = ce[-1]
        print(f"retrained to step {steps_run} (CE {final_ce:.4f}): "
              f"greedy EM-R {em_bf16}", flush=True)
    gen_s = time.time() - t0

    # free the optimizer moments; keep params for the quantized arm
    trainer.state = None

    # --- int8 base + int8 KV through the prefix-pool engine -------------
    # Quantization happens ON DEVICE (convert.quantize_llm_params_on_
    # device): the first full run pulled the 13.5 GB bf16 tree to host
    # for the numpy path and spent 3380 s in the tunnel D2H. The device
    # twin computes the same fp32 absmax/round/clip math and frees each
    # bf16 layer as its int8 twin materializes.
    from flax.core import unfreeze

    from msr3d_tpu.models.llm.convert import quantize_llm_params_on_device
    from msr3d_tpu.serving import PrefixPoolContinuousBatchingServer

    t0 = time.time()
    vars_dev = unfreeze(jax.tree_util.tree_map(lambda x: x, model.params))
    # drop every other reference to the bf16 arrays so the destructive
    # per-layer frees actually release device memory
    model.params = None
    trainer.model = None
    import gc

    gc.collect()
    pull_s = time.time() - t0

    llm_q = dataclasses.replace(llm, quantize=True, quantize_bits=8,
                                kv_quantize=True)
    t0 = time.time()
    vars_dev["params"] = dict(vars_dev["params"])
    vars_dev["params"]["llm"] = quantize_llm_params_on_device(
        vars_dev["params"]["llm"], llm_q
    )
    model_q = MSR3D(
        dataclasses.replace(cfg_net, llm=llm_q), tok,
        scene_token_len=scene_len, max_out_len=16,
        num_beams=1, repetition_penalty=1.0,
    )
    model_q.params = vars_dev
    quant_s = time.time() - t0

    # prefix bucket: tokens up to the last scene placeholder, max over
    # the workload, rounded to 32
    enc = tok.encode_batch(
        model_q.build_text_prompt({"msr3d_prompt": prompts}),
        padding_side="left", add_bos=True, pad_to=None,
    )
    ph = {tok.scene_token_id, tok.img_token_id}
    longest = 0
    for ids, mask in zip(enc.input_ids, enc.attention_mask):
        row = ids[mask.astype(bool)]
        longest = max(longest, 1 + max(
            i for i, t in enumerate(row) if int(t) in ph))
    prefix_len = max(32, -(-longest // 32) * 32)

    t0 = time.time()
    pool = PrefixPoolContinuousBatchingServer(
        model_q, num_slots=4, num_prefixes=6, prefix_len=prefix_len,
        suffix_len=64, refill_group=2, chunk_steps=4,
        max_new_tokens=model_q.max_out_len,
    )
    pool_out = [r.output_text for r in pool.run([dict(it) for it in items])]
    ev2 = MSQAEval(None, "msqa_scannet", save_dir=f"{exp_dir}/eval_pool")
    ev2.reset()
    ev2.update({"output_text": pool_out, "answer_list": answers})
    _, res_pool = ev2.record("val")
    em_pool = float(res_pool["ans1_acc_llm"])
    pool_s = time.time() - t0
    print(f"prefix-pool int8+kv8 EM-R: {em_pool} ({pool_s:.0f}s)",
          flush=True)

    record = {
        "metric": "overfit_7b_learning_closure",
        "em_greedy_bf16": em_bf16,
        "em_pool_int8kv8": em_pool,
        "phase_a": {
            "steps": len(a),
            "hyperparams": "lr 3e-5, wd 0.05, betas (0.9,0.999), "
                           "grad-clip 5.0, warmup_cosine_instructblip "
                           "warmup 400 (reference configs/msr3d.yaml:42-52)",
            "ce_first_mean": round(a_first, 4),
            "ce_last_mean": round(a_last, 4),
            "slope_per_step": round(slope, 6),
            "monotone_decrease": phase_a_ok,
        },
        "phase_b": {
            "schedule_factor": args.boost,
            "lr": args.boost * 3e-5,
            "steps": steps_run - len(a),
            "final_ce": round(final_ce, 4),
            "converged": final_ce < args.tol,
        },
        "ce_curve": [round(c, 4) for c in ce],
        "config": {
            "llm": f"{llm.num_hidden_layers}L-{llm.hidden_size}h-"
                   f"{llm.intermediate_size}f",
            "dtype": str(llm.dtype.__name__ if hasattr(llm.dtype, '__name__')
                         else llm.dtype),
            "lora_rank": llm.lora_rank,
            "remat_policy": llm.remat_policy,
            "micro_batch": args.micro_batch,
            "accum": args.accum,
            "items": n,
            "lm_head_gain_scaffold": args.lm_head_gain,
        },
        "timings_s": {
            "init": round(init_s, 1), "train": round(train_s, 1),
            "greedy_eval": round(gen_s, 1),
            "params_pull": round(pull_s, 1),
            "quantize_put": round(quant_s, 1),
            "pool_eval": round(pool_s, 1),
            "total": round(time.time() - t_start, 1),
        },
        "quick": bool(args.quick),
        "device": str(jax.devices()[0]),
    }
    with open(args.out, "w") as f:
        json.dump(record, f, indent=1)
    print(json.dumps({k: record[k] for k in
                      ("em_greedy_bf16", "em_pool_int8kv8")}), flush=True)

    # quick mode runs 5 phase-A steps of a tiny model at the production
    # warmup's opening lr (~4e-7) — too little signal to gate on; the
    # real run gates
    assert phase_a_ok or args.quick, (
        "phase A: CE did not fall at production hyperparams")
    assert em_bf16 == 1.0, (texts, answers)
    assert em_pool == 1.0, (pool_out, answers)
    print("LEARNING CLOSURE OK", flush=True)


if __name__ == "__main__":
    main()
