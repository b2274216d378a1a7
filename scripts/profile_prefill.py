"""Decompose the generate-program prefill gap (round-1 finding: prefill
inside the generate program ~1194 ms vs 462 ms standalone at the same
shapes; VERDICT.md weak #1).

Programs timed (each fully jitted, synced by VALUE fetch — block_until_ready
can return early through the axon tunnel):

  A. build_embeds only            (scene encode + splice)
  B. prefill                      (build_embeds + prefill_with_cache)
  C. generate, max_new=1          (B + loop machinery + 0 decode steps)
  D. generate, max_new=32         (the served program)
  E. plain forward (loss path)    (same token count, no KV cache capture)

All at the round-1 record config: 7B geometry, int8 weight-only base,
merged LoRA (rank 0), batch 16. D-C ≈ 31 decode steps; C-B ≈ loop entry
cost; B-A ≈ LLM prefill proper; E ≈ what "standalone prefill" measured.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--bf16", action="store_true", help="bf16 base instead of int8")
    p.add_argument("--iters", type=int, default=3)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from msr3d_tpu.models.llm.llama import LlamaConfig
    from msr3d_tpu.models.llm.tokenizer import ByteTokenizer
    from msr3d_tpu.models.msr3d import MSR3D, MSR3DNetworkConfig
    from msr3d_tpu.models.ose3d_situation import OSE3DConfig

    llm = LlamaConfig(
        vocab_size=32000, hidden_size=4096, intermediate_size=11008,
        num_hidden_layers=32, num_attention_heads=32,
        max_position_embeddings=2048, lora_rank=0,
        dtype=jnp.bfloat16, param_dtype=jnp.bfloat16,
        quantize=not args.bf16,
    )
    tok = ByteTokenizer()
    cfg = MSR3DNetworkConfig(
        prompter=OSE3DConfig(), llm=llm, backbone_name="convnext_test"
    )
    model = MSR3D(cfg, tok, scene_token_len=60, max_out_len=32,
                  num_beams=1, repetition_penalty=3.0)
    network = model.network

    B, N_OBJ, N_PTS = args.batch, 60, 1024
    r = np.random.default_rng(0)
    data = {
        "msr3d_prompt": [
            "You are an AI visual assistant situated in a 3D scene. "
            "Objects (including you) in the scene: 景 "
            f"USER: What is behind the chair number {i}? ASSISTANT:"
            for i in range(B)
        ],
        "obj_fts": (r.normal(size=(B, N_OBJ, N_PTS, 6)) * 0.3).astype(np.float32),
        "obj_masks": np.ones((B, N_OBJ), bool),
        "obj_locs": r.normal(size=(B, N_OBJ, 6)).astype(np.float32),
        "anchor_locs": r.normal(size=(B, 3)).astype(np.float32),
        "anchor_orientation": np.tile(np.array([0, 0, 0, 1], np.float32), (B, 1)),
    }

    prompts = model.build_text_prompt(data)
    ii, am = model._encode_prompts(prompts)
    ii, am = model._pad_to_bucket(ii, am, side="left")
    oi, om = model._encode_answers(["an answer"] * B)
    scene = model._scene_batch(data)
    init_batch = dict(scene, input_ids=ii, attention_mask=am,
                      output_ids=oi, output_mask=om)

    t0 = time.time()
    model.init_params(init_batch)
    print(f"init: {time.time() - t0:.1f}s  prompt_tokens={ii.shape[1]}")
    params = model.params

    prompt_len = ii.shape[1] + 1
    cache_len = prompt_len + 32
    jb = {k: jnp.asarray(v) for k, v in dict(scene, input_ids=ii, attention_mask=am).items()}

    def timeit(name, fn, *fargs):
        # warm/compile
        t0 = time.time()
        float(jnp.sum(fn(*fargs).astype(jnp.float32)))
        compile_s = time.time() - t0
        best = float("inf")
        for _ in range(args.iters):
            t0 = time.perf_counter()
            float(jnp.sum(fn(*fargs).astype(jnp.float32)))
            best = min(best, time.perf_counter() - t0)
        print(f"{name:28s}: {best * 1e3:8.1f} ms   (compile {compile_s:.0f}s)")
        return best

    @jax.jit
    def prog_a(v, b):
        e, a = network.apply(v, **b, method=network.build_embeds)
        return jnp.sum(e.astype(jnp.float32)) + jnp.sum(a)

    @jax.jit
    def prog_b(v, b):
        first, caches, cmask, pos = network.apply(
            v, **b, bos_id=tok.bos_id, max_cache_len=cache_len,
            method=network.prefill,
        )
        # touch every output so nothing is DCE'd, but fetch only scalars
        return (jnp.sum(first) + jnp.sum(caches["k"][..., 0].astype(jnp.float32))
                + jnp.sum(cmask) + jnp.sum(pos))

    t_a = timeit("A build_embeds", prog_a, params, jb)
    t_b = timeit("B prefill(+cache)", prog_b, params, jb)

    def gen(max_new):
        d2 = dict(data)
        out = model.generate(d2, use_beam=False, max_new_tokens=max_new)
        return out["output_tokens"]

    # C/D go through model.generate (has its own jit cache); time manually
    for name, mn in (("C generate max_new=1", 1), ("D generate max_new=32", 32)):
        t0 = time.time()
        gen(mn)
        compile_s = time.time() - t0
        best = float("inf")
        for _ in range(args.iters):
            t0 = time.perf_counter()
            gen(mn)
            best = min(best, time.perf_counter() - t0)
        print(f"{name:28s}: {best * 1e3:8.1f} ms   (compile {compile_s:.0f}s)")
        if mn == 1:
            t_c = best
        else:
            t_d = best

    # E: loss-path forward at the same total token count (prompt + 1)
    jb_loss = dict(jb, output_ids=jnp.asarray(oi[:, :1]), output_mask=jnp.asarray(om[:, :1]))

    @jax.jit
    def prog_e(v, b):
        return jnp.sum(network.apply(v, **b)["loss"])

    t_e = timeit("E plain fwd (no cache)", prog_e, params, jb_loss)

    print("\n--- decomposition ---")
    print(f"scene+splice (A):            {t_a*1e3:8.1f} ms")
    print(f"LLM prefill proper (B-A):    {(t_b-t_a)*1e3:8.1f} ms")
    print(f"loop entry + argmax (C-B):   {(t_c-t_b)*1e3:8.1f} ms")
    print(f"31 decode steps (D-C):       {(t_d-t_c)*1e3:8.1f} ms  = {(t_d-t_c)/31*1e3:.1f} ms/step")
    print(f"no-cache fwd ref (E):        {t_e*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
