"""Deployment entry point: serve an MSR3D model over HTTP.

The reference repo stops at offline evaluation (its generate path runs
inside the training loop, `/root/reference/trainer/leo_trainer.py:385-418`);
this launcher stands up the production path this framework adds: the
continuous-batching engine (slot-refill scheduling, measured 1.49x over
gang scheduling at the 256-token budget) behind the stdlib HTTP front-end
(`msr3d_tpu/serving_http.py`).

    # real deployment (converted Vicuna dir in model.llm.cfg_path):
    python serve.py --config configs/msr3d.yaml --port 8080 --slots 32 \
        --learnable <exp_dir>/ckpt [key=value overrides...]

    # smoke-test on the tiny synthetic config, random weights:
    python serve.py --config configs/debug_synthetic.yaml --random-init

Config overrides use the same dotlist syntax as run.py/launch.py, e.g.
``model.llm.quantize=true eval_num_beams=1`` for int8 greedy serving.
Weights resolve in layers, mirroring the trainer: random init → any
checkpoints the config names (HF LLM dir, PointNet++, learnable-only
pytorch_model.bin) → ``--learnable`` (an orbax weights dir saved by the
trainer: ``best``/``latest``).
"""

from __future__ import annotations

import argparse
import signal
import sys
import threading


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--config", required=True, help="YAML config (reference schema)")
    p.add_argument("opts", nargs="*", help="dotlist config overrides (key=value)")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8080, help="0 = ephemeral")
    p.add_argument("--slots", type=int, default=32,
                   help="continuous-batching decode slots")
    p.add_argument("--refill-group", type=int, default=4,
                   help="requests per compiled prefill program")
    p.add_argument("--chunk-steps", type=int, default=8,
                   help="decode steps per dispatched chunk")
    p.add_argument("--lookahead", type=int, default=1,
                   help="decode chunks in flight before a flag fetch")
    p.add_argument("--engine",
                   choices=["continuous", "beam", "grouped", "pool",
                            "pool-beam"],
                   default="continuous",
                   help="greedy slot-refill engine, per-slot beam search, "
                   "scene-grouped shared-prefix serving (grouped), or the "
                   "prefix-pool engines (slot refill + scene prefixes "
                   "prefilled once per scene into a shared KV block pool)")
    p.add_argument("--num-prefixes", type=int, default=8,
                   help="pool engines: prefix KV blocks (G)")
    p.add_argument("--prefix-len", type=int, default=None,
                   help="pool engines: prefix bucket (default: model "
                   "prompt_pad_to)")
    p.add_argument("--suffix-len", type=int, default=48,
                   help="pool engines: question bucket incl. trailing bos")
    p.add_argument("--group-scenes", type=int, default=4,
                   help="grouped engine: scene groups per program")
    p.add_argument("--group-questions", type=int, default=8,
                   help="grouped engine: questions per scene group")
    p.add_argument("--max-new-tokens", type=int, default=None,
                   help="engine-wide decode budget (default: model max_out_len)")
    p.add_argument("--prompt-len", type=int, default=None,
                   help="compiled prompt bucket (default: model prompt_pad_to)")
    p.add_argument("--spec-k", type=int, default=0,
                   help="n-gram speculative drafts per step (greedy engine)")
    p.add_argument("--learnable", default=None,
                   help="orbax checkpoint dir from training; loads 'best' "
                   "then 'latest', or --learnable-name")
    p.add_argument("--learnable-name", default=None)
    p.add_argument("--random-init", action="store_true",
                   help="skip all checkpoint loading (smoke/bench)")
    p.add_argument("--num-obj", type=int, default=None,
                   help="objects per scene for param init (default: config "
                   "max_obj_len, else 60)")
    p.add_argument("--num-points", type=int, default=None,
                   help="points per object for param init (default: config "
                   "num_points, else 1024)")
    p.add_argument("--request-timeout", type=float, default=600.0)
    return p.parse_args(argv)


def _init_batch(model, n_obj: int, n_pts: int):
    """Shape-only dummy batch for parameter init (params are shape-
    independent of n_obj/n_pts; compiled serving fns specialize later)."""
    import numpy as np

    b = 2
    r = np.random.default_rng(0)
    data = {
        "msr3d_prompt": ["scene: 景 USER: hello ASSISTANT:"] * b,
        "obj_fts": (r.normal(size=(b, n_obj, n_pts, 6)) * 0.1).astype(np.float32),
        "obj_masks": np.ones((b, n_obj), bool),
        "obj_locs": r.normal(size=(b, n_obj, 6)).astype(np.float32),
        "anchor_locs": np.zeros((b, 3), np.float32),
        "anchor_orientation": np.tile(
            np.array([0, 0, 0, 1], np.float32), (b, 1)
        ),
    }
    ii, am = model._encode_prompts(model.build_text_prompt(data))
    oi, om = model._encode_answers(["ok"] * b)
    batch = model._scene_batch(data)
    batch.update(input_ids=ii, attention_mask=am, output_ids=oi, output_mask=om)
    return batch


def create_frontend(args, cfg=None):
    """Build model + engine + HTTP front-end (not yet started)."""
    from msr3d_tpu.config import load_config
    from msr3d_tpu.models.msr3d import MSR3D
    from msr3d_tpu.serving import (
        ContinuousBatchingServer,
        ContinuousBeamBatchingServer,
    )
    from msr3d_tpu.serving_http import ServingFrontend

    if cfg is None:
        cfg = load_config(args.config, overrides=list(args.opts))
    model = MSR3D.from_config(cfg)

    n_obj = args.num_obj or int(
        cfg.get("dataset_wrapper", {}).get("args", {}).get("max_obj_len", 60)
    )
    n_pts = args.num_points or int(
        cfg.get("data", {}).get("msr3dmix", {}).get("args", {})
        .get("num_points", 1024)
    )
    print(f"[serve] init params (objs={n_obj}, pts={n_pts}) ...", flush=True)
    model.init_params(_init_batch(model, n_obj, n_pts))

    if not args.random_init:
        from msr3d_tpu.models.load_weights import load_pretrained_from_config

        loaded = load_pretrained_from_config(model, cfg)
        for src in loaded:
            print(f"[serve] loaded {src}", flush=True)
    if args.learnable:
        from msr3d_tpu.trainer.checkpoint import CheckpointManager
        from msr3d_tpu.trainer.train_state import merge_learnable

        ckpt = CheckpointManager(args.learnable)
        names = [args.learnable_name] if args.learnable_name else ["best", "latest"]
        for name in names:
            if ckpt.has_weights(name):
                learnable = ckpt.load_weights(name)
                params = dict(model.params)
                params["params"] = merge_learnable(params["params"], learnable)
                model.params = params
                print(f"[serve] loaded learnable weights '{name}' from "
                      f"{args.learnable}", flush=True)
                break
        else:
            raise FileNotFoundError(
                f"no weights {names} under {args.learnable}"
            )

    if args.engine == "grouped":
        from msr3d_tpu.serving import SceneGroupBatchingServer

        engine = SceneGroupBatchingServer(
            model,
            scenes_per_batch=args.group_scenes,
            questions_per_scene=args.group_questions,
            max_new_tokens=args.max_new_tokens,
        )
    elif args.engine in ("pool", "pool-beam"):
        from msr3d_tpu.serving import (
            PrefixPoolContinuousBatchingServer,
            PrefixPoolContinuousBeamBatchingServer,
        )

        engine_cls = (
            PrefixPoolContinuousBeamBatchingServer
            if args.engine == "pool-beam"
            else PrefixPoolContinuousBatchingServer
        )
        kw = dict(
            num_slots=args.slots,
            num_prefixes=args.num_prefixes,
            prefix_len=args.prefix_len,
            suffix_len=args.suffix_len,
            refill_group=min(args.refill_group, args.slots),
            chunk_steps=args.chunk_steps,
            lookahead=args.lookahead,
            max_new_tokens=args.max_new_tokens,
        )
        if args.engine == "pool":
            kw["spec_k"] = args.spec_k
        engine = engine_cls(model, **kw)
    else:
        engine_cls = (
            ContinuousBeamBatchingServer if args.engine == "beam"
            else ContinuousBatchingServer
        )
        kw = dict(
            num_slots=args.slots,
            refill_group=min(args.refill_group, args.slots),
            chunk_steps=args.chunk_steps,
            lookahead=args.lookahead,
            max_new_tokens=args.max_new_tokens,
            prompt_len=args.prompt_len,
        )
        if args.engine == "continuous":
            kw["spec_k"] = args.spec_k
        engine = engine_cls(model, **kw)
    return ServingFrontend(
        engine, host=args.host, port=args.port,
        request_timeout=args.request_timeout,
    )


def main(argv=None) -> int:
    args = parse_args(argv)
    frontend = create_frontend(args)
    frontend.start()
    print(
        f"[serve] listening on http://{frontend.host}:{frontend.port} "
        f"(engine={args.engine}, slots={args.slots})",
        flush=True,
    )

    stop = threading.Event()

    def _signal(signum, frame):
        print(f"[serve] signal {signum}: draining and shutting down",
              flush=True)
        stop.set()

    signal.signal(signal.SIGINT, _signal)
    signal.signal(signal.SIGTERM, _signal)
    stop.wait()
    pending = frontend.stream.pending
    if pending:
        print(f"[serve] draining {pending} queued requests ...", flush=True)
    frontend.close(timeout=None)  # every accepted request gets an answer
    print("[serve] drained, bye", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
