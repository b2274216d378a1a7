"""Training-step benchmark: samples/sec/chip for the full MSR3D train step.

One jit: scene encode (fp32) + 7B-geometry Llama (bf16 frozen base, LoRA
r16) forward + backward through LoRA/projections/scene-encoder + masked
AdamW update, with lax.scan gradient accumulation. Mirrors the reference
training shape (batch 4 × accum 5, configs/msr3d.yaml:33,163).

Emits one JSON line. ``--quick`` shrinks the LLM.
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


def parse_args(argv=None) -> argparse.Namespace:
    parser = argparse.ArgumentParser()
    parser.add_argument("--quick", action="store_true")
    parser.add_argument(
        "--int4", action="store_true",
        help="QLoRA-4bit: int4 split-nibble frozen base (~3.4 GB at 7B) — "
        "frees HBM for larger micro-batch; dequant cost amortizes over "
        "batch")
    parser.add_argument(
        "--int8", action="store_true",
        help="QLoRA-style: int8 frozen base (stop-gradient, weight-only "
        "quant) under bf16 LoRA — halves the 13.5 GB weight footprint so "
        "the micro-batch can grow",
    )
    parser.add_argument("--batch", type=int, default=4)
    parser.add_argument("--accum", type=int, default=5)
    parser.add_argument("--prompt-len", type=int, default=192)
    parser.add_argument("--answer-len", type=int, default=32)
    parser.add_argument("--iters", type=int, default=3)
    parser.add_argument(
        "--scan-layers", action="store_true",
        help="run the LLM blocks via ONE scanned body (stacked params, "
        "parallel/llm_pp.py) instead of 32 inlined block copies",
    )
    parser.add_argument(
        "--remat-policy", choices=["full", "dots", "residuals"], default="full",
        help="rematerialization policy (scan body or unrolled blocks): "
        "full = nothing saved (min memory), dots = matmul outputs saved "
        "(less recompute, more memory)",
    )
    parser.add_argument(
        "--no-remat", action="store_true",
        help="disable rematerialization entirely. Round 5 made remat "
        "REAL for the unrolled layout (prevent_cse=True in llama.py — "
        "before that XLA CSE'd the recompute away, so the historical "
        "17.6 samples/s was effectively a no-remat number that happened "
        "to fit). At the short production shape (224 tokens) the "
        "activations fit without remat, so this is the fast honest arm; "
        "remat is the capacity knob for long context.",
    )
    parser.add_argument(
        "--flash", action="store_true",
        help="fused Pallas flash attention for the training forward "
        "(ops/flash_attention.py): removes the per-layer fp32 (B,H,T,S) "
        "logits/probs temps that wall the micro-batch",
    )
    parser.add_argument(
        "--full-width-loss", action="store_true",
        help="compute CE over full-width logits instead of the exactly-"
        "equal answer-window form (A/B for the memory saving)",
    )
    parser.add_argument(
        "--compile-only", action="store_true",
        help="lower+compile the train step from ABSTRACT shapes (no "
        "device allocation, no execution) and exit — probes whether the "
        "axon remote-compile helper accepts the program (>=1920-token 7B "
        "compiles HTTP-500 there, ROUND3_NOTES.md); safe alongside a "
        "chip-resident job",
    )
    return parser.parse_args(argv)


def run_train(args) -> dict:
    """Run the training benchmark, returning the record dict (importable
    by bench.py so the driver captures a train number every round)."""
    import jax
    import jax.numpy as jnp

    from msr3d_tpu.config import config_from_dict
    from msr3d_tpu.models.llm.llama import LlamaConfig
    from msr3d_tpu.models.msr3d import MSR3DNetwork, MSR3DNetworkConfig
    from msr3d_tpu.models.ose3d_situation import OSE3DConfig
    from msr3d_tpu.optim.build import build_optim
    from msr3d_tpu.trainer.train_state import TrainState, make_train_step

    if args.quick:
        llm = LlamaConfig(
            vocab_size=32000, hidden_size=512, intermediate_size=1376,
            num_hidden_layers=4, num_attention_heads=8,
            max_position_embeddings=2048, lora_rank=16, dtype=jnp.bfloat16,
            flash_attention=args.flash,
        )
    else:
        llm = LlamaConfig(
            vocab_size=32000, hidden_size=4096, intermediate_size=11008,
            num_hidden_layers=32, num_attention_heads=32,
            max_position_embeddings=2048, lora_rank=16, dtype=jnp.bfloat16,
            param_dtype=jnp.bfloat16, remat=not args.no_remat,
            quantize=args.int8 or getattr(args, "int4", False),
            quantize_bits=4 if getattr(args, "int4", False) else 8,
            remat_policy=args.remat_policy,
            flash_attention=args.flash,
        )
    cfg = MSR3DNetworkConfig(
        prompter=OSE3DConfig(), llm=llm, backbone_name="convnext_test",
        scene_token_id=6, img_token_id=4,
        answer_window_loss=not args.full_width_loss,
    )
    network = MSR3DNetwork(cfg)

    B, A = args.batch, args.accum
    N_OBJ, N_PTS = 60, 1024
    T_IN, T_OUT = args.prompt_len, args.answer_len

    def make_micro(seed):
        r = np.random.default_rng(seed)
        ids = r.integers(10, 31000, size=(B, T_IN)).astype(np.int32)
        ids[:, 4:64] = 6  # 60 scene placeholders
        return dict(
            input_ids=ids,
            attention_mask=np.ones((B, T_IN), np.int32),
            output_ids=r.integers(10, 31000, size=(B, T_OUT)).astype(np.int32),
            output_mask=np.ones((B, T_OUT), np.int32),
            obj_fts=(r.normal(size=(B, N_OBJ, N_PTS, 6)) * 0.3).astype(np.float32),
            obj_masks=np.ones((B, N_OBJ), bool),
            obj_locs=r.normal(size=(B, N_OBJ, 6)).astype(np.float32),
            anchor_locs=r.normal(size=(B, 3)).astype(np.float32),
            anchor_orientation=np.tile(np.array([0, 0, 0, 1], np.float32), (B, 1)),
        )

    def stack_accum(seed):
        micros = [make_micro(seed * 100 + a) for a in range(A)]
        return {
            k: jnp.asarray(np.stack([m[k] for m in micros])) for k in micros[0]
        }

    t0 = time.time()
    if args.compile_only:
        # ABSTRACT init: no device allocation, no execution — the whole
        # probe is host tracing + one remote-compile round trip
        if args.scan_layers:
            raise SystemExit("--compile-only supports the unrolled layout")
        micro0 = make_micro(0)
        abs_micro = {
            k: jax.ShapeDtypeStruct(np.asarray(v).shape, np.asarray(v).dtype)
            for k, v in micro0.items()
        }
        variables = jax.eval_shape(
            lambda k, b: network.init(k, **b), jax.random.key(0), abs_micro
        )
    elif not args.scan_layers:
        init_fn = jax.jit(lambda k, b: network.init(k, **b))
        variables = init_fn(
            jax.random.key(0), {k: jnp.asarray(v) for k, v in make_micro(0).items()}
        )
    else:
        # Build the STACKED layout without ever holding two 13.5 GB trees
        # (on-device stack_llm_blocks would peak at 27 GB): init a 1-layer
        # twin, then repeat its block L ways — identical per-layer weights
        # are irrelevant for throughput, and the non-block params carry
        # over unchanged. Real checkpoints stream into this layout on the
        # host instead (models/llm/convert.py).
        import dataclasses as _dc

        from msr3d_tpu.models.msr3d import MSR3DNetwork as _Net

        L = llm.num_hidden_layers
        net1 = _Net(_dc.replace(cfg, llm=_dc.replace(llm, num_hidden_layers=1)))
        variables = jax.jit(lambda k, b: net1.init(k, **b))(
            jax.random.key(0), {k: jnp.asarray(v) for k, v in make_micro(0).items()}
        )
        llm_tree = dict(variables["params"]["llm"])
        layer0 = llm_tree.pop("layer_0")
        llm_tree["blocks"] = jax.jit(
            lambda t: jax.tree_util.tree_map(
                lambda a: jnp.repeat(a[None], L, axis=0), t
            )
        )(layer0)
        new_params = dict(variables["params"])
        new_params["llm"] = llm_tree
        variables = dict(variables)
        variables["params"] = new_params
    init_s = time.time() - t0

    trainable = jax.tree_util.tree_map_with_path(
        lambda p, _: ("lora" in jax.tree_util.keystr(p))
        or ("llm_proj" in jax.tree_util.keystr(p))
        or ("visual_prompter" in jax.tree_util.keystr(p)
            and "obj_encoder" not in jax.tree_util.keystr(p)),
        variables["params"],
    )
    opt_cfg = config_from_dict(
        {
            "solver": {
                "grad_norm": 5.0,
                "optim": {"name": "AdamW", "args": {"lr": 3e-5, "betas": [0.9, 0.999], "weight_decay": 0.05}},
                "sched": {"name": "warmup_cosine_instructblip", "args": {"warmup_steps": 400}},
            }
        }
    )
    optimizer, _ = build_optim(opt_cfg, total_steps=10000)
    if args.compile_only:
        state = jax.eval_shape(
            lambda v: TrainState.create(v, optimizer, trainable_mask=trainable),
            variables,
        )
    else:
        state = TrainState.create(variables, optimizer, trainable_mask=trainable)

    if args.scan_layers:
        from msr3d_tpu.models.msr3d import sequence_ce_loss_windowed
        from msr3d_tpu.parallel.llm_pp import llm_logits_from_blocks

        def apply_fn(vars_, batch, rng_):
            embeds, attn, targets = network.apply(
                vars_, **batch, method=network.embeds_for_loss,
                deterministic=False, rngs={"dropout": rng_},
            )
            answer_start = int(batch["input_ids"].shape[-1])
            logits = llm_logits_from_blocks(
                llm, vars_["params"]["llm"], embeds, attn,
                remat=llm.remat, remat_policy=args.remat_policy,
                answer_start=answer_start,
            )
            return sequence_ce_loss_windowed(
                logits.astype(jnp.float32), targets, answer_start
            ).mean()
    else:
        def apply_fn(vars_, batch, rng_):
            out = network.apply(vars_, **batch, deterministic=False, rngs={"dropout": rng_})
            return out["loss"].mean()

    step = make_train_step(apply_fn, optimizer, accum_steps=A, trainable_mask=trainable)

    if args.compile_only:
        micro0 = make_micro(0)
        lead = (A,) if A > 1 else ()
        batch_abs = {
            k: jax.ShapeDtypeStruct(
                lead + np.asarray(v).shape, np.asarray(v).dtype)
            for k, v in micro0.items()
        }
        t0 = time.time()
        lowered = step.lower(state, batch_abs, jax.random.key(1))
        lower_s = time.time() - t0
        t0 = time.time()
        compiled = lowered.compile()
        mem = {}
        try:
            ma = compiled.memory_analysis()
            mem = {
                "hbm_args_gb": round(ma.argument_size_in_bytes / 2**30, 2),
                "hbm_temps_gb": round(ma.temp_size_in_bytes / 2**30, 2),
                "hbm_output_gb": round(ma.output_size_in_bytes / 2**30, 2),
                "hbm_total_gb": round(
                    (ma.argument_size_in_bytes + ma.temp_size_in_bytes
                     + ma.output_size_in_bytes) / 2**30, 2),
            }
        except Exception:
            pass
        rec = {
            "metric": "train_step_compile_probe",
            "value": round(time.time() - t0, 1),
            "unit": "s (remote AOT compile, no execution)",
            "lower_s": round(lower_s, 1),
            **mem,
            "prompt_tokens": T_IN,
            "answer_tokens": T_OUT,
            "batch": B,
            "accum": A,
            "llm": f"{llm.num_hidden_layers}L-{llm.hidden_size}h"
            + ("-int8base" if args.int8 else "")
            + ("-int4base" if getattr(args, "int4", False) else "")
            + ("-unroll/noremat" if args.no_remat
               else f"-unroll/{args.remat_policy}")
            + ("-flash" if args.flash else ""),
        }
        print(json.dumps(rec), flush=True)
        return rec

    t0 = time.time()
    state, metrics = step(state, stack_accum(0), jax.random.key(1))
    float(metrics["loss"])
    compile_s = time.time() - t0

    t0 = time.perf_counter()
    for i in range(args.iters):
        state, metrics = step(state, stack_accum(i + 1), jax.random.key(i + 2))
    float(metrics["loss"])
    dt = (time.perf_counter() - t0) / args.iters
    samples_per_sec = B * A / dt

    # MFU estimate, same accounting as the round-1 52% number: useful
    # FLOPs = 4·N_llm·tokens (2·N fwd + 2·N activation-grad bwd — the
    # base is frozen so there is no weight-grad term; remat recompute is
    # real work but not USEFUL work, so it lowers MFU by construction).
    # v5e bf16 peak = 197 TFLOP/s.
    n_llm = (
        2 * llm.vocab_size * llm.hidden_size  # embed + lm_head
        + llm.num_hidden_layers
        * (4 * llm.hidden_size * llm.hidden_size
           + 3 * llm.hidden_size * llm.intermediate_size)
    )
    tokens_per_step = B * A * (T_IN + T_OUT)
    peak = 197e12  # v5e bf16 peak; the only real chip this bench sees
    mfu = 4.0 * n_llm * tokens_per_step / dt / peak

    return {
        "metric": "train_samples_per_sec_per_chip",
        "value": round(samples_per_sec, 3),
        "unit": "samples/s/chip",
        "vs_baseline": 1.0,
        "batch": B,
        "accum": A,
        "prompt_tokens": T_IN,
        "answer_tokens": T_OUT,
        "mfu_est": round(mfu, 4),
        "llm": f"{llm.num_hidden_layers}L-{llm.hidden_size}h"
        + ("-int8base" if args.int8 else "")
        + ("-int4base" if getattr(args, "int4", False) else "")
        + (f"-scan/{args.remat_policy}" if args.scan_layers
           else ("-unroll/noremat" if args.no_remat
                 else f"-unroll/{args.remat_policy}"))
        + ("-flash" if args.flash else "")
        + ("-fullw" if args.full_width_loss else "-answin"),
        "step_ms": round(dt * 1000, 1),
        "loss": round(float(metrics["loss"]), 3),
        "init_s": round(init_s, 1),
        "compile_s": round(compile_s, 1),
        "device": str(jax.devices()[0]),
    }


def main() -> None:
    print(json.dumps(run_train(parse_args())))


if __name__ == "__main__":
    main()
