"""Prefill-side decomposition at serving scale (VERDICT round-2 #5).

Breaks the "prefill-side step" (964 ms b16 / 1554 ms b32, BASELINE.md
round 2) into its stages, each timed on the real chip with the
value-fetch/on-device-chaining discipline from bench.py:

  host      prompt build + tokenization (pure host, overlappable)
  h2d       device_put of the full request batch (obj_fts dominates)
  scene     OSE3DSituation encode (60 obj x 1024 pts)
  embeds    embed lookup + scene encode + placeholder splice
  llm       prefill_with_cache on precomputed embeds (the LLM alone)
  prefill   network.prefill = embeds + llm in one jit

Prints one JSON line with ms per stage and the implied fraction of the
measured full prefill. Run serialized (axon tunnel contention skews ~25%).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--quick", action="store_true")
    p.add_argument("--flash", action="store_true",
                   help="Pallas fused flash attention in the prefill pass")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

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
        llm = LlamaConfig(
            vocab_size=32000, hidden_size=4096, intermediate_size=11008,
            num_hidden_layers=32, num_attention_heads=32,
            max_position_embeddings=2048, lora_rank=0, dtype=jnp.bfloat16,
            param_dtype=jnp.bfloat16, quantize=True, kv_quantize=True,
            flash_attention=args.flash,
        )
    tok = ByteTokenizer()
    model = MSR3D(
        MSR3DNetworkConfig(
            prompter=OSE3DConfig(), llm=llm, backbone_name="convnext_test"
        ),
        tok, scene_token_len=60, max_out_len=1,
    )
    network = model.network

    B = args.batch

    def make_data(seed):  # bench_qa's base prompt shape (~207 tokens)
        r = np.random.default_rng(seed)
        return {
            "msr3d_prompt": [
                "You are an AI visual assistant situated in a 3D scene. "
                "Objects (including you) in the scene: 景 "
                f"USER: What is behind the chair number {i}? ASSISTANT:"
                for i in range(B)
            ],
            "obj_fts": (r.normal(size=(B, 60, 1024, 6)) * 0.3).astype(np.float32),
            "obj_masks": np.ones((B, 60), bool),
            "obj_locs": r.normal(size=(B, 60, 6)).astype(np.float32),
            "anchor_locs": r.normal(size=(B, 3)).astype(np.float32),
            "anchor_orientation": np.tile(np.array([0, 0, 0, 1], np.float32), (B, 1)),
        }

    data = make_data(0)
    prompts = model.build_text_prompt(data)
    ii, am = model._encode_prompts(prompts)
    ii, am = model._pad_to_bucket(ii, am, side="left")
    scene_batch = model._scene_batch(data)
    init_batch = dict(scene_batch)
    oi, om = model._encode_answers(["x"] * B)
    init_batch.update(input_ids=ii, attention_mask=am, output_ids=oi, output_mask=om)
    t0 = time.time()
    model.init_params(init_batch)
    init_s = time.time() - t0
    variables = model.params
    prompt_len = int(ii.shape[1]) + 1
    results: dict = {"batch": B, "prompt_tokens": int(ii.shape[1]), "init_s": round(init_s, 1)}

    iters = args.iters

    # ---- host: prompt build + tokenize --------------------------------
    t0 = time.perf_counter()
    for i in range(iters):
        pr = model.build_text_prompt(data)
        a, b = model._encode_prompts(pr)
        model._pad_to_bucket(a, b, side="left")
    results["host_ms"] = (time.perf_counter() - t0) / iters * 1000

    # ---- h2d: ship the full request batch -----------------------------
    datas = [make_data(i + 1) for i in range(iters)]
    batches = [
        {**model._scene_batch(d), "input_ids": ii, "attention_mask": am}
        for d in datas
    ]
    # warm one transfer
    dev = {k: jnp.asarray(v) for k, v in batches[0].items()}
    float(jnp.sum(dev["obj_fts"]))
    t0 = time.perf_counter()
    acc = 0.0
    for b_ in batches:
        dev = {k: jnp.asarray(v) for k, v in b_.items()}
        acc += float(jnp.sum(dev["obj_fts"]))  # value fetch = real sync
    results["h2d_ms"] = (time.perf_counter() - t0) / iters * 1000

    # ---- on-device chained loops for compute stages --------------------
    def chain_time(fn, feed, label):
        """fori-chained timing: fn(variables, feed)->scalar-ish output is
        looped on device with a data dependency; sync by value fetch."""
        @jax.jit
        def loop(v, f):
            def body(i, carry):
                fts, accv = carry
                out = fn(v, dict(f, obj_fts=fts))
                bump = (out * jnp.float32(1e-8)).astype(fts.dtype)
                return fts + bump, accv + out

            _, accv = lax.fori_loop(
                0, iters, body, (f["obj_fts"], jnp.float32(0))
            )
            return accv

        feed_dev = {k: jnp.asarray(v) for k, v in feed.items()}
        float(loop(variables, feed_dev))  # compile+warm
        feed2 = dict(feed_dev, obj_fts=feed_dev["obj_fts"] + 0.01)
        t0 = time.perf_counter()
        float(loop(variables, feed2))
        results[label] = (time.perf_counter() - t0) / iters * 1000

    scene_feed = dict(scene_batch)

    from msr3d_tpu.models.ose3d_situation import OSE3DSituation

    prompter = network.cfg.prompter

    def scene_only(v, f):
        sub = {"params": v["params"]["visual_prompter"]}
        for coll in ("batch_stats",):
            if coll in v and "visual_prompter" in v[coll]:
                sub[coll] = v[coll]["visual_prompter"]
        out = OSE3DSituation(prompter).apply(
            sub,
            f["obj_fts"], f["obj_masks"], f["obj_locs"], f["anchor_locs"],
            f["anchor_orientation"],
        )
        return jnp.sum(out["obj_tokens"].astype(jnp.float32))

    chain_time(scene_only, scene_feed, "scene_ms")

    embeds_feed = dict(scene_batch, input_ids=ii, attention_mask=am)

    def embeds_fn(v, f):
        e, a_ = network.apply(
            v, f["input_ids"], f["attention_mask"], f["obj_fts"],
            f["obj_masks"], f["obj_locs"], f["anchor_locs"],
            f["anchor_orientation"], method=network.build_embeds,
        )
        return jnp.sum(e.astype(jnp.float32))

    chain_time(embeds_fn, embeds_feed, "embeds_ms")

    # ---- llm-only prefill on precomputed embeds ------------------------
    e0, a0 = network.apply(
        variables, jnp.asarray(ii), jnp.asarray(am),
        *[jnp.asarray(scene_batch[k]) for k in
          ("obj_fts", "obj_masks", "obj_locs", "anchor_locs", "anchor_orientation")],
        method=network.build_embeds,
    )

    from msr3d_tpu.models.llm.llama import LlamaModel

    llm_model = LlamaModel(llm)

    @jax.jit
    def llm_loop(v, e, a_):
        def body(i, carry):
            ee, accv = carry
            logits, _, _, _, _ = llm_model.apply(
                {"params": v["params"]["llm"]}, ee, a_, prompt_len,
                logits_last_only=True,
                method=llm_model.prefill_with_cache,
            )
            s = jnp.sum(logits.astype(jnp.float32))
            return ee + (s * 1e-12).astype(ee.dtype), accv + s

        _, accv = lax.fori_loop(0, iters, body, (e, jnp.float32(0)))
        return accv

    float(llm_loop(variables, e0, a0))
    t0 = time.perf_counter()
    float(llm_loop(variables, e0 + jnp.bfloat16(0.01), a0))
    results["llm_ms"] = (time.perf_counter() - t0) / iters * 1000

    # ---- full fused prefill --------------------------------------------
    def prefill_fn(v, f):
        first, _, _, _ = network.apply(
            v, f["input_ids"], f["attention_mask"], f["obj_fts"],
            f["obj_masks"], f["obj_locs"], f["anchor_locs"],
            f["anchor_orientation"], bos_id=tok.bos_id,
            max_cache_len=prompt_len, method=network.prefill,
        )
        return jnp.sum(first)

    chain_time(prefill_fn, embeds_feed, "prefill_full_ms")

    for k in list(results):
        if k.endswith("_ms"):
            results[k] = round(results[k], 1)
    results["device"] = str(jax.devices()[0])
    print(json.dumps(results))


if __name__ == "__main__":
    main()
