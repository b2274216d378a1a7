"""Learning-closure tests (VERDICT round-3 #1/#9): prove the training
stack OPTIMIZES — not merely that it matches reference math at init.

Every other test in the suite is a parity / token-identity / state-
equality check on random or converted weights; a sign error in the LoRA
grad mask, an answer-window off-by-one, or an LR-schedule bug that
preserves parity-at-init would sail through all of them. These tests
close that axis: each case overfits a tiny model on a fixed handful of
QA items through the REAL LeoTrainer loop (train_one_epoch →
make_train_step), then runs the REAL eval path (trainer.eval_task →
generate / serving engine → the task's evaluator) and asserts
exact-match accuracy 1.0 on the training items.

This matches the reference trainer's entire purpose — train until EM
improves (reference trainer/leo_trainer.py:197-247,464-504) — which had
zero direct coverage before this file.

Cases:
  - MSQA overfit → EM-R 1.0 via blocking greedy eval, the continuous
    slot-refill engine, and the continuous beam engine
  - the quantized serving gate: the SAME learned weights served int8
    base + int8 KV still hit EM-R 1.0 (the round-3 silent weight-load
    failure class)
  - MSNN one-step navigation → exact reserved-action-token accuracy 1.0
  - SQA3D → EM@1 1.0 via BOTH generation (SQA3DInstructionEval) and
    retrieval scoring (predict_answers → SQA3DEval)
  - a LoRA-only LLM run: loss decreases, the frozen base is bit-frozen,
    LoRA B leaves zero, and greedy decode changes from init
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from msr3d_tpu.config import config_from_dict
from msr3d_tpu.models.llm.llama import LlamaConfig
from msr3d_tpu.models.llm.tokenizer import ByteTokenizer, SCENE_PLACEHOLDER
from msr3d_tpu.models.msr3d import MSR3D, MSR3DNetworkConfig
from tests.test_msr3d import TINY_PROMPTER

# distinct, clean_answer-stable, no repeated-first-letter collisions for
# the retrieval first-token filter
MSQA_ANSWERS = ["chair", "yes", "red", "lamp", "window", "big", "south", "no"]


def lora_tiny_model(num_beams=1, **kw):
    """tiny MSR3D with LoRA enabled so the LLM itself can learn (the base
    is frozen by get_opt_params_mask — exactly the production split)."""
    tok = ByteTokenizer()
    cfg = MSR3DNetworkConfig(
        prompter=TINY_PROMPTER,
        llm=LlamaConfig.tiny(vocab_size=tok.vocab_size, dtype=jnp.float32,
                             lora_rank=8),
        backbone_name="convnext_test",
    )
    return MSR3D(
        cfg, tok, scene_token_len=5, max_out_len=16,
        num_beams=num_beams, repetition_penalty=1.0, **kw,
    )


def make_items(prompts, answers, n_obj=6, n_pts=32):
    """Fixed per-item scene features (deterministic rng per item)."""
    items = []
    for i, (p, a) in enumerate(zip(prompts, answers)):
        r = np.random.default_rng(1000 + i)
        q = r.normal(size=(4,))
        items.append({
            "msr3d_prompt": p,
            "text_output": a,
            "obj_fts": (r.normal(size=(n_obj, n_pts, 6)) * 0.3).astype(np.float32),
            "obj_masks": np.ones((n_obj,), bool),
            "obj_locs": r.normal(size=(n_obj, 6)).astype(np.float32),
            "anchor_locs": r.normal(size=(3,)).astype(np.float32),
            "anchor_orientation": (q / np.linalg.norm(q)).astype(np.float32),
        })
    return items


class FixedLoader:
    """Deterministic loader over a fixed item list (collated batches)."""

    ARRAY_KEYS = ("obj_fts", "obj_masks", "obj_locs", "anchor_locs",
                  "anchor_orientation")

    def __init__(self, items, batch_size, extra=None):
        assert len(items) % batch_size == 0
        self.items = items
        self.bs = batch_size
        self.extra = extra or {}  # key -> per-item list (eval metadata)

    def __len__(self):
        return len(self.items) // self.bs

    def __iter__(self):
        for b in range(len(self)):
            chunk = self.items[b * self.bs:(b + 1) * self.bs]
            sl = slice(b * self.bs, (b + 1) * self.bs)
            dd = {
                "msr3d_prompt": [it["msr3d_prompt"] for it in chunk],
                "text_output": [it["text_output"] for it in chunk],
            }
            for k in self.ARRAY_KEYS:
                dd[k] = np.stack([it[k] for it in chunk])
            for k, v in self.extra.items():
                vv = v[sl]
                dd[k] = np.asarray(vv) if isinstance(v, np.ndarray) else list(vv)
            yield dd


def collate(items, extra=None):
    """One full-set batch (for direct model.generate calls)."""
    return next(iter(FixedLoader(items, len(items), extra=extra)))


def trainer_cfg(tmp_path, name, epochs, lr=5e-3, warmup=10):
    return config_from_dict({
        "exp_dir": str(tmp_path / name),
        "mode": "train",
        "rng_seed": 0,
        "solver": {
            "gradient_accumulation_steps": 1,
            "grad_norm": 5.0,
            "epochs": epochs,
            "eval_interval": 10 ** 9,
            "optim": {"name": "AdamW",
                      "args": {"lr": lr, "betas": [0.9, 0.999],
                               "weight_decay": 0.0}},
            "sched": {"name": "warmup_cosine",
                      "args": {"warmup_steps": warmup}},
        },
    })


def boost_lm_head(trainer, gain=20.0):
    """Rescale the FROZEN lm_head at init (test scaffolding only).

    The production trainable split freezes the whole LLM base including
    the lm_head (get_opt_params_mask — reference msr3d.py:165-172). With
    a real Vicuna base that head is a trained, high-gain matrix; with the
    tiny test model's random init its gain is so low that RMSNorm-pinned
    hidden states cap the achievable logit margin at CE ≈ 4.3 — argmax
    goes correct but confidence floors (measured: loss plateaus exactly
    there while greedy decode is already perfect). Scaling the frozen
    head ×20 restores a realistic ceiling: CE < 0.01 in ~15 epochs."""
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


def overfit(trainer, tol, max_epochs=None):
    """Run the REAL epoch loop until mean CE < tol; returns (loss, epochs)."""
    max_epochs = max_epochs or trainer.epochs
    loss = float("inf")
    for epoch in range(max_epochs):
        stats = trainer.train_one_epoch(epoch)
        trainer.tracker.step_epoch()
        loss = stats["loss"]
        if loss < tol:
            return loss, epoch + 1
    raise AssertionError(
        f"training failed to overfit: CE {loss:.4f} after {max_epochs} "
        f"epochs (tol {tol}) — the training loop is not optimizing"
    )


# ---------------------------------------------------------------------------
# MSQA: train → EM-R 1.0 through every serving route
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def msqa_overfit(tmp_path_factory):
    from msr3d_tpu.trainer.leo_trainer import LeoTrainer

    tmp_path = tmp_path_factory.mktemp("learning_msqa")
    n = len(MSQA_ANSWERS)
    prompts = [
        f"Scene: {SCENE_PLACEHOLDER}. USER: question number {i}, "
        f"what is the answer? ASSISTANT:"
        for i in range(n)
    ]
    items = make_items(prompts, MSQA_ANSWERS)
    extra = {
        "answer_list": list(MSQA_ANSWERS),
        "source": ["scannet"] * n,
        "scan_id": [f"scene{i:04d}_00" for i in range(n)],
        "index": list(range(n)),
        "type": ["attribute"] * n,
    }
    loaders = {
        "msr3d_train": {"train": FixedLoader(items, batch_size=n)},
        "msqa_scannet": {"val": FixedLoader(items, batch_size=n, extra=extra)},
    }
    model = lora_tiny_model()
    cfg = trainer_cfg(tmp_path, "msqa", epochs=300)
    trainer = LeoTrainer(cfg, loaders=loaders, evaluators={}, model=model)
    boost_lm_head(trainer)

    init_texts = model.generate(collate(items))["output_text"]
    final_loss, epochs = overfit(trainer, tol=0.02)
    return trainer, items, extra, init_texts, final_loss, tmp_path


def _msqa_eval(trainer, tmp_path, tag):
    from msr3d_tpu.evaluator.msqa_eval import MSQAEval

    trainer.evaluators["msqa_scannet"] = MSQAEval(
        None, "msqa_scannet", save_dir=tmp_path / f"eval_{tag}"
    )
    return trainer.eval_task("msqa_scannet", "val")


def test_msqa_overfit_em_blocking_greedy(msqa_overfit):
    """Train-to-convergence → blocking greedy eval path → EM-R 1.0."""
    trainer, items, extra, init_texts, final_loss, tmp_path = msqa_overfit
    assert final_loss < 0.02
    trainer.cfg.eval_engine = ""
    results = _msqa_eval(trainer, tmp_path, "greedy")
    assert results["ans1_acc_llm"] == 1.0, results
    assert results["target_metric"] == 1.0


def test_msqa_generation_changed_from_init(msqa_overfit):
    """The learned weights actually changed what the model SAYS (catches
    a loop that optimizes a constant/no-op objective)."""
    trainer, items, extra, init_texts, _, _ = msqa_overfit
    final_texts = trainer.model.generate(collate(items))["output_text"]
    assert final_texts != init_texts
    # and the learned outputs are the (distinct) training answers
    assert [t.strip() for t in final_texts] == MSQA_ANSWERS


def test_msqa_overfit_em_continuous_engine(msqa_overfit):
    """Same weights through the slot-refill continuous engine → EM-R 1.0
    (the production eval route, eval_engine: continuous)."""
    trainer, items, extra, init_texts, _, tmp_path = msqa_overfit
    trainer.cfg.eval_engine = "continuous"
    trainer.cfg.eval_engine_opts = {
        "num_slots": 4, "refill_group": 2, "chunk_steps": 4,
    }
    try:
        results = _msqa_eval(trainer, tmp_path, "continuous")
    finally:
        trainer.cfg.eval_engine = ""
    assert results["ans1_acc_llm"] == 1.0, results


def test_msqa_overfit_em_prefix_pool_engine(msqa_overfit):
    """Same learned weights through the PREFIX-POOL slot-refill engine
    via the trainer route (eval_engine: continuous + prefix_pool) →
    EM-R 1.0. Each training item carries its own scene, so this also
    exercises block allocation/eviction on learned weights."""
    trainer, items, extra, init_texts, _, tmp_path = msqa_overfit
    trainer.cfg.eval_engine = "continuous"
    trainer.cfg.eval_engine_opts = {
        "prefix_pool": True, "num_prefixes": 4,
        "prefix_len": 64, "suffix_len": 64,
        "num_slots": 4, "refill_group": 2, "chunk_steps": 4,
    }
    try:
        results = _msqa_eval(trainer, tmp_path, "pool")
    finally:
        trainer.cfg.eval_engine = ""
    assert results["ans1_acc_llm"] == 1.0, results


def test_msqa_overfit_em_continuous_beam_engine(msqa_overfit):
    """Beam-2 through the continuous BEAM engine (the reference's eval
    decode family) on the learned weights → EM-R 1.0."""
    trainer, items, extra, init_texts, _, tmp_path = msqa_overfit
    model = trainer.model
    trainer.cfg.eval_engine = "continuous"
    trainer.cfg.eval_engine_opts = {
        "num_slots": 4, "refill_group": 2, "chunk_steps": 4,
    }
    model.num_beams = 2
    try:
        results = _msqa_eval(trainer, tmp_path, "beam")
    finally:
        model.num_beams = 1
        trainer.cfg.eval_engine = ""
    assert results["ans1_acc_llm"] == 1.0, results


def test_msqa_overfit_em_quantized_serving(msqa_overfit):
    """Quantized serving gate (VERDICT #9): the SAME learned weights,
    base quantized to int8 + int8 KV cache, still decode to EM-R 1.0.
    Catches silent weight-load/layout failures in the quantized configs
    (the round-3 ``9dd0d67`` bug class) that logit-parity tests on random
    weights can miss."""
    from flax.core import unfreeze

    from msr3d_tpu.evaluator.msqa_eval import MSQAEval
    from msr3d_tpu.models.llm.convert import quantize_llm_params

    trainer, items, extra, init_texts, _, tmp_path = msqa_overfit
    model = trainer.model

    llm_q_cfg = dataclasses.replace(
        model.cfg.llm, quantize=True, quantize_bits=8, kv_quantize=True
    )
    net_q_cfg = dataclasses.replace(model.cfg, llm=llm_q_cfg)
    model_q = MSR3D(
        net_q_cfg, model.tokenizer, scene_token_len=5, max_out_len=16,
        num_beams=1, repetition_penalty=1.0,
    )
    host_vars = unfreeze(jax.tree_util.tree_map(np.asarray, model.params))
    host_vars["params"] = dict(host_vars["params"])
    host_vars["params"]["llm"] = quantize_llm_params(
        host_vars["params"]["llm"], llm_q_cfg
    )
    model_q.params = jax.tree_util.tree_map(jnp.asarray, host_vars)

    out = model_q.generate(collate(items))
    ev = MSQAEval(None, "msqa_scannet", save_dir=tmp_path / "eval_int8")
    ev.reset()
    ev.update({"output_text": out["output_text"],
               "answer_list": extra["answer_list"]})
    _, results = ev.record("val")
    assert results["ans1_acc_llm"] == 1.0, (results, out["output_text"])

    # and the same quantized learned weights through the PREFIX-POOL
    # engine (int8 base + int8 KV at once — the config whose pool parity
    # can't be pinned on random weights because random logit gaps sit
    # below the quantization noise; learned weights have real margins)
    from msr3d_tpu.serving import PrefixPoolContinuousBatchingServer

    samples = [dict(it) for it in items]
    pool = PrefixPoolContinuousBatchingServer(
        model_q, num_slots=4, num_prefixes=4, prefix_len=64,
        suffix_len=64, refill_group=2, chunk_steps=4,
        max_new_tokens=model_q.max_out_len,
    )
    pool_out = [r.output_text for r in pool.run(samples)]
    ev2 = MSQAEval(None, "msqa_scannet", save_dir=tmp_path / "eval_int8_pool")
    ev2.reset()
    ev2.update({"output_text": pool_out,
                "answer_list": extra["answer_list"]})
    _, results2 = ev2.record("val")
    assert results2["ans1_acc_llm"] == 1.0, (results2, pool_out)


# ---------------------------------------------------------------------------
# MSNN: exact reserved-action-token emission
# ---------------------------------------------------------------------------


def test_msnn_overfit_action_tokens(tmp_path):
    """One-step navigation: train until the model emits the EXACT reserved
    Vicuna action token for each instruction; OneStepNavInstructionEval
    scores accuracy 1.0 with invalid-token rate 0 (reference
    one_step_eval.py:65-85 semantics)."""
    from msr3d_tpu.data.constants import ONESTEPNAVI_ACTION_SPACE_TOKENIZE
    from msr3d_tpu.evaluator.one_step_eval import OneStepNavInstructionEval
    from msr3d_tpu.trainer.leo_trainer import LeoTrainer

    actions = list(ONESTEPNAVI_ACTION_SPACE_TOKENIZE.values())[:4]
    dirs = ["forward", "left", "right", "back"]
    prompts = [
        f"Scene: {SCENE_PLACEHOLDER}. USER: move {d}. ASSISTANT:"
        for d in dirs
    ]
    items = make_items(prompts, actions)
    loaders = {
        "msr3d_train": {"train": FixedLoader(items, batch_size=4)},
        "msnn": {"val": FixedLoader(items, batch_size=4)},
    }
    model = lora_tiny_model()
    cfg = trainer_cfg(tmp_path, "msnn", epochs=300)
    evaluators = {
        "msnn": OneStepNavInstructionEval(None, "msnn", save_dir=tmp_path / "e")
    }
    trainer = LeoTrainer(cfg, loaders=loaders, evaluators=evaluators,
                         model=model)
    boost_lm_head(trainer)
    overfit(trainer, tol=0.02)
    results = trainer.eval_task("msnn", "val")
    assert results["accuracy"] == 1.0, results
    assert results["invalid"] == 0.0, results


# ---------------------------------------------------------------------------
# SQA3D: EM@1 through BOTH generation and retrieval scoring
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def sqa3d_overfit(tmp_path_factory):
    from msr3d_tpu.trainer.leo_trainer import LeoTrainer

    tmp_path = tmp_path_factory.mktemp("learning_sqa3d")
    cands = ["yes", "no", "left", "right"]
    answers = ["yes", "no", "left", "right"]
    prompts = [
        f"Scene: {SCENE_PLACEHOLDER}. USER: situated question {i}? ASSISTANT:"
        for i in range(4)
    ]
    items = make_items(prompts, answers)
    answer_label = np.zeros((4, len(cands)), np.int32)
    for i, a in enumerate(answers):
        answer_label[i, cands.index(a)] = 1
    extra = {
        "answer_label": answer_label,
        "sqa_type": np.arange(4, dtype=np.int32),
        "data_idx": np.arange(4, dtype=np.int64),
    }
    val = FixedLoader(items, batch_size=4, extra=extra)
    val.answer_cands = cands  # what _find_answer_cands walks for
    loaders = {
        "msr3d_train": {"train": FixedLoader(items, batch_size=4)},
        "sqa3d": {"val": val},
    }
    model = lora_tiny_model()
    cfg = trainer_cfg(tmp_path, "sqa3d", epochs=300)
    trainer = LeoTrainer(cfg, loaders=loaders, evaluators={}, model=model)
    boost_lm_head(trainer)
    overfit(trainer, tol=0.02)
    return trainer, answers, cands, tmp_path


def test_sqa3d_overfit_em_generation(sqa3d_overfit):
    """Generation route: SQA3DInstructionEval strict EM@1 == 1.0."""
    from msr3d_tpu.evaluator.sqa3d_eval import SQA3DInstructionEval

    trainer, answers, cands, tmp_path = sqa3d_overfit
    qa_pool = {i: {"answers": [a]} for i, a in enumerate(answers)}
    trainer.evaluators["sqa3d"] = SQA3DInstructionEval(
        None, "sqa3d", save_dir=tmp_path / "gen", qa_pool=qa_pool
    )
    trainer.inference_mode = "generation"
    results = trainer.eval_task("sqa3d", "val")
    assert results["ans1_acc_llm"] == 1.0, results
    # each item carried a distinct sqa_type → per-type accuracy 1.0 too
    for t in range(4):
        assert results[f"type{t}_acc_llm"] == 1.0, results


def test_sqa3d_overfit_em_retrieval(sqa3d_overfit):
    """Retrieval route: predict_answers scores the learned answer argmax
    over the candidate vocabulary (SQA3DEval EM@1 == 1.0) — the
    reference's inference_mode != generation path (trainer/build.py:127-143)."""
    from msr3d_tpu.evaluator.sqa3d_eval import SQA3DEval

    trainer, answers, cands, tmp_path = sqa3d_overfit
    trainer.evaluators["sqa3d"] = SQA3DEval(
        None, "sqa3d", save_dir=tmp_path / "retr"
    )
    trainer.inference_mode = "retrieval"
    try:
        results = trainer.eval_task("sqa3d", "val")
    finally:
        trainer.inference_mode = "generation"
    assert results["ans1_acc"] == 1.0, results
    assert results["ans10_acc"] == 1.0, results


# ---------------------------------------------------------------------------
# LoRA-only learning: the adapter path itself optimizes
# ---------------------------------------------------------------------------


def test_lora_only_llm_learns(tmp_path):
    """GQA LLM, LoRA-only trainable mask (the production 7B split: every
    base leaf frozen): loss decreases, the base is BIT-frozen, LoRA B
    leaves zero, and greedy teacher-forced decode changes from init.
    Catches a LoRA grad-mask sign/routing error directly."""
    from msr3d_tpu.optim.build import build_optim
    from msr3d_tpu.trainer.train_state import TrainState, make_train_step
    from msr3d_tpu.models.llm.llama import LlamaModel

    cfg = LlamaConfig(
        vocab_size=263, hidden_size=256, intermediate_size=512,
        num_hidden_layers=4, num_attention_heads=8, num_key_value_heads=2,
        max_position_embeddings=64, lora_rank=8, dtype=jnp.float32,
    )
    model = LlamaModel(cfg)
    r = np.random.default_rng(0)
    ids = r.integers(7, cfg.vocab_size, size=(4, 24)).astype(np.int32)
    mask = np.ones_like(ids)
    # fixed host-side embedding table (the MSR3D path feeds spliced
    # embeddings, not token ids — same contract here)
    table = (r.normal(size=(cfg.vocab_size, cfg.hidden_size)) * 0.05).astype(
        np.float32
    )
    embeds = jnp.asarray(table[ids])
    mask_j = jnp.asarray(mask)

    variables = jax.jit(model.init)(jax.random.key(0), embeds, mask_j)

    def apply_fn(vars_, batch, rng_):
        logits, _, _ = model.apply(vars_, batch["embeds"], batch["mask"])
        logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), -1)
        tgt = batch["ids"][:, 1:]
        nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
        return nll.mean()

    import jax.tree_util as jtu

    trainable = jtu.tree_map_with_path(
        lambda p, _: "lora" in jtu.keystr(p), variables
    )["params"]
    solver = config_from_dict({
        "solver": {
            "gradient_accumulation_steps": 1, "grad_norm": 5.0, "epochs": 1,
            "eval_interval": 1,
            "optim": {"name": "AdamW",
                      "args": {"lr": 5e-3, "betas": [0.9, 0.999],
                               "weight_decay": 0.0}},
            "sched": {"name": "warmup_cosine", "args": {"warmup_steps": 5}},
        }
    })
    opt, _ = build_optim(solver, total_steps=80)
    step = make_train_step(apply_fn, opt, accum_steps=1,
                           trainable_mask=trainable, donate=False)
    state = TrainState.create(variables, opt, trainable_mask=trainable)

    batch = {"embeds": embeds, "mask": mask_j, "ids": jnp.asarray(ids)}

    def argmax_tokens(vars_):
        logits, _, _ = model.apply(vars_, embeds, mask_j)
        return np.asarray(logits.argmax(-1))

    base_kernel_before = np.asarray(
        variables["params"]["layer_0"]["attn"]["q_proj"]["kernel"]
    )
    toks_init = argmax_tokens(variables)

    losses = []
    for i in range(80):
        state, metrics = step(state, batch, jax.random.key(i))
        losses.append(float(metrics["loss"]))

    assert np.mean(losses[-5:]) < 0.5 * np.mean(losses[:5]), (
        f"LoRA-only loss did not decrease: {losses[:5]} → {losses[-5:]}"
    )
    trained = state.params
    base_kernel_after = np.asarray(
        trained["params"]["layer_0"]["attn"]["q_proj"]["kernel"]
    )
    np.testing.assert_array_equal(base_kernel_before, base_kernel_after)
    lora_b = np.asarray(
        trained["params"]["layer_0"]["attn"]["q_proj"]["lora_b"]
    )
    assert np.abs(lora_b).max() > 0, "LoRA B never moved off its zero init"
    toks_final = argmax_tokens(trained)
    assert not np.array_equal(toks_init, toks_final), (
        "greedy decode unchanged after LoRA training"
    )
