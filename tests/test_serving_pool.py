"""PrefixPoolContinuousBatchingServer: slot-refill serving over a shared
scene-prefix KV pool must be token-identical per request to the plain
generate path — block sharing, LRU reuse/eviction, head-of-line blocking,
empty-prefix prompts, and per-request budgets only change SCHEDULING and
the arithmetic decomposition (window pass over a pooled prefix), never
tokens."""

import numpy as np
import pytest

from msr3d_tpu.models.llm.tokenizer import IMAGE_PLACEHOLDER, SCENE_PLACEHOLDER
from msr3d_tpu.serving import PrefixPoolContinuousBatchingServer
from tests.test_msr3d import tiny_data_dict


QUESTIONS = [
    "What do you see?",
    "Is the chair red?",
    "How many lamps are there, roughly speaking?",
    "Go north?",
]


def scene_requests(rng, n_scenes, n_q, *, questions=QUESTIONS):
    """n_scenes scenes × n_q questions each; every request of a scene
    shares the scene arrays AND the pre-question prompt text (the
    placeholders all sit in the shared part), so the pool engine must
    give each scene ONE block. Returns scene-major request list."""
    scenes = [tiny_data_dict(rng, b=1) for _ in range(n_scenes)]
    reqs = []
    for s in range(n_scenes):
        for q in range(n_q):
            reqs.append(
                {
                    "msr3d_prompt": (
                        f"Scene number {s}: {SCENE_PLACEHOLDER}. Ego view: "
                        f"{IMAGE_PLACEHOLDER}. USER: {questions[q % len(questions)]}"
                    ),
                    **{
                        k: scenes[s][k][0]
                        for k in (
                            "obj_fts", "obj_masks", "obj_locs",
                            "anchor_locs", "anchor_orientation",
                            "msr3d_imgs", "msr3d_img_masks",
                        )
                    },
                }
            )
    return reqs


def direct_tokens(model, reqs, max_new):
    keys = (
        "obj_fts", "obj_masks", "obj_locs", "anchor_locs",
        "anchor_orientation", "msr3d_imgs", "msr3d_img_masks",
    )
    out = model.generate(
        {
            "msr3d_prompt": [r["msr3d_prompt"] for r in reqs],
            **{k: np.stack([r[k] for r in reqs]) for k in keys},
        },
        use_beam=False, max_new_tokens=max_new,
    )
    return np.asarray(out["output_tokens"])


def test_pool_matches_generate_interleaved(tiny_msr3d, rng):
    """3 scenes × 3 questions arriving round-robin (every refill touches
    a different scene; blocks stay concurrently referenced)."""
    reqs = scene_requests(rng, 3, 3)
    order = [s * 3 + q for q in range(3) for s in range(3)]  # round-robin
    stream = [reqs[i] for i in order]
    max_new = 6
    direct = direct_tokens(tiny_msr3d, stream, max_new)

    server = PrefixPoolContinuousBatchingServer(
        tiny_msr3d, num_slots=3, num_prefixes=3, prefix_len=64,
        suffix_len=64, refill_group=1, chunk_steps=3, max_new_tokens=max_new,
    )
    results = server.run(stream)
    assert [r.id for r in results] == list(range(9))
    for r in results:
        np.testing.assert_array_equal(r.output_tokens, direct[r.id])
    # 3 scenes → exactly 3 prefix-prefill batches under R=1
    assert server.prefix_prefills == 3
    assert server.steps_run > 0


def test_pool_group_refill_shares_within_group(tiny_msr3d, rng):
    """R=2 refill groups: two questions of the same scene arriving in one
    group must share the block allocated BY that group (dedup within the
    group, one prefix-prefill batch)."""
    reqs = scene_requests(rng, 2, 4)  # scene-major: s0 q0..q3, s1 q0..q3
    max_new = 6
    direct = direct_tokens(tiny_msr3d, reqs, max_new)

    server = PrefixPoolContinuousBatchingServer(
        tiny_msr3d, num_slots=4, num_prefixes=2, prefix_len=64,
        suffix_len=64, refill_group=2, chunk_steps=3, max_new_tokens=max_new,
    )
    results = server.run(reqs)
    for r in results:
        np.testing.assert_array_equal(r.output_tokens, direct[r.id])
    # scene-major arrival at R=2 → one prefill batch per scene
    assert server.prefix_prefills == 2


def test_pool_lru_eviction_and_return(tiny_msr3d, rng):
    """Pool smaller than the scene set: a scene returning after eviction
    re-prefills into a recycled block, token-identically."""
    reqs = scene_requests(rng, 3, 2)
    # s0, s0, s1, s1, s2, s2, then s0 again ×2 (s0 evicted by then at G=2)
    stream = reqs + reqs[:2]
    max_new = 5
    direct = direct_tokens(tiny_msr3d, stream, max_new)

    server = PrefixPoolContinuousBatchingServer(
        tiny_msr3d, num_slots=2, num_prefixes=2, prefix_len=64,
        suffix_len=64, refill_group=1, chunk_steps=4, max_new_tokens=max_new,
    )
    results = server.run(stream)
    assert len(results) == 8
    for r in results:
        np.testing.assert_array_equal(r.output_tokens, direct[r.id])
    # 3 distinct scenes + 1 re-prefill of the evicted s0
    assert server.prefix_prefills == 4


def test_pool_resident_reuse_skips_prefill(tiny_msr3d, rng):
    """A scene returning while its block is still resident (refcount 0,
    not evicted) must NOT re-prefill."""
    reqs = scene_requests(rng, 2, 2)
    stream = reqs + reqs[:1]  # s0 returns; G=4 → never evicted
    max_new = 5
    direct = direct_tokens(tiny_msr3d, stream, max_new)

    server = PrefixPoolContinuousBatchingServer(
        tiny_msr3d, num_slots=2, num_prefixes=4, prefix_len=64,
        suffix_len=64, refill_group=1, chunk_steps=4, max_new_tokens=max_new,
    )
    results = server.run(stream)
    for r in results:
        np.testing.assert_array_equal(r.output_tokens, direct[r.id])
    assert server.prefix_prefills == 2  # s0 reuse is free


def test_pool_head_of_line_blocking(tiny_msr3d, rng):
    """G=1 (plus nothing else evictable) with 2 scenes: scene 1's requests
    must wait until every scene-0 slot finishes — scheduling stalls, tokens
    don't change."""
    reqs = scene_requests(rng, 2, 2)
    max_new = 5
    direct = direct_tokens(tiny_msr3d, reqs, max_new)

    server = PrefixPoolContinuousBatchingServer(
        tiny_msr3d, num_slots=3, num_prefixes=1, prefix_len=64,
        suffix_len=64, refill_group=1, chunk_steps=2, max_new_tokens=max_new,
    )
    results = server.run(reqs)
    assert [r.id for r in results] == list(range(4))
    for r in results:
        np.testing.assert_array_equal(r.output_tokens, direct[r.id])


def test_pool_empty_prefix_prompts(tiny_msr3d, rng):
    """Prompts with no scene/image placeholder share one permanently
    empty block (never prefilled); mixed streams stay token-exact."""
    scene_reqs = scene_requests(rng, 1, 2)
    base = tiny_data_dict(rng, b=1)
    pure = [
        {
            "msr3d_prompt": f"USER: pure text question {i}?",
            **{
                k: base[k][0]
                for k in (
                    "obj_fts", "obj_masks", "obj_locs",
                    "anchor_locs", "anchor_orientation",
                    "msr3d_imgs", "msr3d_img_masks",
                )
            },
        }
        for i in range(2)
    ]
    stream = [pure[0], scene_reqs[0], pure[1], scene_reqs[1]]
    max_new = 5
    direct = direct_tokens(tiny_msr3d, stream, max_new)

    server = PrefixPoolContinuousBatchingServer(
        tiny_msr3d, num_slots=2, num_prefixes=2, prefix_len=64,
        suffix_len=64, refill_group=1, chunk_steps=3, max_new_tokens=max_new,
    )
    results = server.run(stream)
    for r in results:
        np.testing.assert_array_equal(r.output_tokens, direct[r.id])
    assert server.prefix_prefills == 1  # only the real scene


def test_pool_per_request_budgets(tiny_msr3d, rng):
    reqs = scene_requests(rng, 2, 2)
    max_new = 8
    direct = direct_tokens(tiny_msr3d, reqs, max_new)
    eos = tiny_msr3d.tokenizer.eos_id

    budgets = [1, 3, 8, 5]
    server = PrefixPoolContinuousBatchingServer(
        tiny_msr3d, num_slots=2, num_prefixes=2, prefix_len=64,
        suffix_len=64, refill_group=1, chunk_steps=4, max_new_tokens=max_new,
    )
    results = server.run(reqs, budgets=budgets)
    for r in results:
        b = budgets[r.id]
        np.testing.assert_array_equal(r.output_tokens[:b], direct[r.id][:b])
        assert (r.output_tokens[b:] == eos).all()


def test_pool_same_group_key_different_prompts_stay_separate(tiny_msr3d, rng):
    """An explicit group_key feeds the scene fingerprint, but the block
    key ALSO pins the prefix token bytes — two requests sharing a
    group_key with different pre-question text must get separate blocks
    (and exact tokens), never silently share a prefix."""
    reqs = scene_requests(rng, 1, 2)
    reqs[0]["group_key"] = reqs[1]["group_key"] = "scene0"
    reqs[1]["msr3d_prompt"] = (
        f"A DIFFERENT preamble {SCENE_PLACEHOLDER}. Ego view: "
        f"{IMAGE_PLACEHOLDER}. USER: {QUESTIONS[1]}"
    )
    max_new = 5
    direct = direct_tokens(tiny_msr3d, reqs, max_new)

    server = PrefixPoolContinuousBatchingServer(
        tiny_msr3d, num_slots=2, num_prefixes=2, prefix_len=64,
        suffix_len=64, refill_group=1, chunk_steps=3, max_new_tokens=max_new,
    )
    results = server.run(reqs)
    for r in results:
        np.testing.assert_array_equal(r.output_tokens, direct[r.id])
    assert server.prefix_prefills == 2  # distinct prefix bytes → 2 blocks


def test_pool_too_small_fails_loud(tiny_msr3d, rng):
    """num_prefixes=1 consumed by the empty-prefix block leaves a scene
    request permanently unschedulable — must raise, not hang."""
    base = tiny_data_dict(rng, b=1)
    common = {
        k: base[k][0]
        for k in (
            "obj_fts", "obj_masks", "obj_locs",
            "anchor_locs", "anchor_orientation",
            "msr3d_imgs", "msr3d_img_masks",
        )
    }
    stream = [
        {"msr3d_prompt": "USER: no placeholders here?", **common},
        {
            "msr3d_prompt": f"Scene {SCENE_PLACEHOLDER}. USER: and here?",
            **common,
        },
    ]
    server = PrefixPoolContinuousBatchingServer(
        tiny_msr3d, num_slots=1, num_prefixes=1, prefix_len=64,
        suffix_len=64, refill_group=1, chunk_steps=2, max_new_tokens=4,
    )
    with pytest.raises(RuntimeError, match="prefix pool exhausted"):
        server.run(stream)


def test_pool_rejects_sampling(tiny_msr3d):
    tiny_msr3d.do_sample = True
    try:
        with pytest.raises(ValueError, match="plain-continuous-engine"):
            PrefixPoolContinuousBatchingServer(
                tiny_msr3d, num_slots=2, num_prefixes=2, refill_group=2
            )
    finally:
        tiny_msr3d.do_sample = False


# ---------------------------------------------------------------------------
# Beam prefix-pool engine
# ---------------------------------------------------------------------------


def direct_beam_single(model, req, max_new):
    """Fixed-batch beam generate at batch 1 — the slot-level parity
    target (a slot runs an independent HF beam search)."""
    keys = (
        "obj_fts", "obj_masks", "obj_locs", "anchor_locs",
        "anchor_orientation", "msr3d_imgs", "msr3d_img_masks",
    )
    out = model.generate(
        {
            "msr3d_prompt": [req["msr3d_prompt"]],
            **{k: np.stack([req[k]]) for k in keys},
        },
        use_beam=True, max_new_tokens=max_new,
    )
    return np.asarray(out["output_tokens"])[0]


def test_beam_pool_matches_single_request_generate(tiny_msr3d, rng):
    """Beam pool engine == fixed-batch beam generate per request, under
    block sharing (2 scenes × 3 questions, interleaved) and slot refill.
    The suffix rides its own flattened segment (never replicated per
    beam) — this parity run pins that whole decomposition."""
    from msr3d_tpu.serving import PrefixPoolContinuousBeamBatchingServer

    reqs = scene_requests(rng, 2, 3)
    order = [s * 3 + q for q in range(3) for s in range(2)]
    stream = [reqs[i] for i in order]
    max_new = 8

    server = PrefixPoolContinuousBeamBatchingServer(
        tiny_msr3d, num_slots=3, num_prefixes=2, prefix_len=64,
        suffix_len=64, refill_group=1, chunk_steps=4, max_new_tokens=max_new,
    )
    assert server.num_beams == tiny_msr3d.num_beams == 2
    results = server.run(stream)
    assert [r.id for r in results] == list(range(6))
    for r in results:
        direct = direct_beam_single(tiny_msr3d, stream[r.id], max_new)
        np.testing.assert_array_equal(r.output_tokens, direct)
    assert server.prefix_prefills == 2
    assert server.steps_run > 0


def test_beam_pool_eviction_and_budgets(tiny_msr3d, rng):
    """LRU eviction + per-request budgets on the beam pool engine:
    request i matches a FIXED beam run with max_new_tokens=budget_i."""
    from msr3d_tpu.serving import PrefixPoolContinuousBeamBatchingServer

    reqs = scene_requests(rng, 3, 1)
    stream = reqs + reqs[:1]  # s0 returns after eviction at G=2
    budgets = [5, 8, 3, 6]

    server = PrefixPoolContinuousBeamBatchingServer(
        tiny_msr3d, num_slots=2, num_prefixes=2, prefix_len=64,
        suffix_len=64, refill_group=1, chunk_steps=3, max_new_tokens=8,
    )
    results = server.run(stream, budgets=budgets)
    for r in results:
        direct = direct_beam_single(tiny_msr3d, stream[r.id], budgets[r.id])
        np.testing.assert_array_equal(
            r.output_tokens[: budgets[r.id]], direct[: budgets[r.id]]
        )
    assert server.prefix_prefills == 4  # 3 scenes + s0 re-prefill


# ---------------------------------------------------------------------------
# Speculative decoding composed with the pool
# ---------------------------------------------------------------------------


def test_pool_spec_matches_t1_engine(tiny_msr3d, rng):
    """spec_k>0 on the pool engine: token-identical per request to the
    T=1 pool engine (acceptance compares drafts against the model's own
    argmax), across block sharing, eviction, and budgets."""
    model = tiny_msr3d
    saved = model.repetition_penalty
    model.repetition_penalty = 1.0
    try:
        reqs = scene_requests(rng, 3, 2)
        stream = reqs + reqs[:1]  # s0 returns after eviction at G=2
        max_new = 8
        budgets = [8, 3, 6, 8, 5, 8, 4]

        plain = PrefixPoolContinuousBatchingServer(
            model, num_slots=2, num_prefixes=2, prefix_len=64,
            suffix_len=64, refill_group=1, chunk_steps=3,
            max_new_tokens=max_new,
        )
        want = {r.id: r.output_tokens
                for r in plain.run(stream, budgets=budgets)}

        spec = PrefixPoolContinuousBatchingServer(
            model, num_slots=2, num_prefixes=2, prefix_len=64,
            suffix_len=64, refill_group=1, chunk_steps=3,
            max_new_tokens=max_new, spec_k=3, spec_ngram=2,
        )
        results = spec.run(stream, budgets=budgets)
        assert [r.id for r in results] == list(range(7))
        for r in results:
            np.testing.assert_array_equal(r.output_tokens, want[r.id])
        assert spec.prefix_prefills == 4  # 3 scenes + evicted-s0 return
    finally:
        model.repetition_penalty = saved


def test_pool_spec_rejects_penalty(tiny_msr3d):
    """spec verification is argmax-based: repetition_penalty != 1.0 must
    be rejected exactly like the plain spec engine."""
    assert tiny_msr3d.repetition_penalty != 1.0
    with pytest.raises(ValueError, match="repetition_penalty"):
        PrefixPoolContinuousBatchingServer(
            tiny_msr3d, num_slots=2, num_prefixes=2, refill_group=2,
            spec_k=2,
        )


def test_pool_ignores_group_key_for_block_identity(tiny_msr3d, rng):
    """A caller-supplied group_key must NOT make two different scenes
    share a prefix block (unlike the grouped server, which uses it as a
    grouping hint): same group_key + same prompt text + DIFFERENT scene
    arrays → separate blocks, exact tokens (code-review finding, round 4)."""
    reqs = scene_requests(rng, 2, 1, questions=["What do you see?"] * 2)
    # identical prompt text across both scenes
    reqs[1]["msr3d_prompt"] = reqs[0]["msr3d_prompt"]
    reqs[0]["group_key"] = reqs[1]["group_key"] = "same-key"
    max_new = 5
    direct = direct_tokens(tiny_msr3d, reqs, max_new)

    server = PrefixPoolContinuousBatchingServer(
        tiny_msr3d, num_slots=2, num_prefixes=2, prefix_len=64,
        suffix_len=64, refill_group=1, chunk_steps=3, max_new_tokens=max_new,
    )
    results = server.run(reqs)
    for r in results:
        np.testing.assert_array_equal(r.output_tokens, direct[r.id])
    assert server.prefix_prefills == 2  # arrays differ → two blocks
