"""Grouped generation: Q questions share ONE scene prefix prefill.

Token parity vs per-question ``generate`` (the plain greedy path), the
placeholder-confinement guard, and the mode guards. The suffix window
pass reuses the speculative T>1 machinery with ``window_valid`` gating
left-pad slots — parity across ragged question lengths is the test that
the in-window visibility matches the plain causal mask exactly.
"""

import numpy as np
import pytest

from msr3d_tpu.models.llm.tokenizer import IMAGE_PLACEHOLDER, SCENE_PLACEHOLDER
from tests.test_msr3d import tiny_data_dict


SCENE_KEYS = (
    "obj_fts", "obj_masks", "obj_locs", "anchor_locs",
    "anchor_orientation", "msr3d_imgs", "msr3d_img_masks",
)


def _group_dict(rng, questions):
    """One scene (leading dim 1), Q prompts sharing preamble+scene."""
    base = tiny_data_dict(rng, b=1)
    prefix = f"You are in a scene: {SCENE_PLACEHOLDER}. Image: {IMAGE_PLACEHOLDER}. "
    return {
        "msr3d_prompt": [prefix + q for q in questions],
        **{k: base[k] for k in SCENE_KEYS},
    }


def _tiled_dict(group):
    """The same requests as independent rows (scene tiled per question)."""
    q = len(group["msr3d_prompt"])
    return {
        "msr3d_prompt": list(group["msr3d_prompt"]),
        **{k: np.repeat(group[k], q, axis=0) for k in SCENE_KEYS},
    }


def test_grouped_matches_per_question_generate(tiny_msr3d, rng):
    questions = [
        "What do you see?",
        "Is there a chair next to the window in the corner?",
        "Color?",
    ]
    group = _group_dict(rng, questions)
    out = tiny_msr3d.generate_scene_group(
        dict(group), use_beam=False, max_new_tokens=6
    )

    plain = tiny_msr3d.generate(
        _tiled_dict(group), use_beam=False, max_new_tokens=6
    )
    np.testing.assert_array_equal(
        out["output_tokens"], plain["output_tokens"]
    )
    assert out["output_text"] == plain["output_text"]
    assert out["output_tokens"].shape[0] == 3  # Q-bucket pad rows dropped


def test_grouped_identical_prompts(tiny_msr3d, rng):
    """Degenerate group: the suffix is just the trailing bos."""
    group = _group_dict(rng, ["Same question?", "Same question?"])
    out = tiny_msr3d.generate_scene_group(
        dict(group), use_beam=False, max_new_tokens=5
    )
    plain = tiny_msr3d.generate(
        _tiled_dict(group), use_beam=False, max_new_tokens=5
    )
    np.testing.assert_array_equal(out["output_tokens"], plain["output_tokens"])


def test_grouped_placeholder_in_suffix_raises(tiny_msr3d, rng):
    base = tiny_data_dict(rng, b=1)
    group = {
        # prompts diverge BEFORE the scene placeholder
        "msr3d_prompt": [
            f"Alpha {SCENE_PLACEHOLDER}. {IMAGE_PLACEHOLDER} one?",
            f"Beta {SCENE_PLACEHOLDER}. {IMAGE_PLACEHOLDER} two?",
        ],
        **{k: base[k] for k in SCENE_KEYS},
    }
    with pytest.raises(ValueError, match="shared prefix"):
        tiny_msr3d.generate_scene_group(group, max_new_tokens=4)


def test_grouped_multi_scene_ragged_matches(tiny_msr3d, rng):
    """G=2 scenes with ragged group sizes (3 and 2 questions) in ONE
    program match per-question generate; Q-bucket pad rows dropped."""
    qs_a = ["What do you see?", "Is there a chair by the window?", "Color?"]
    qs_b = ["Count the tables now please?", "Exit?"]
    base = tiny_data_dict(rng, b=2)
    prefix = f"You are in a scene: {SCENE_PLACEHOLDER}. Image: {IMAGE_PLACEHOLDER}. "
    group = {
        "msr3d_prompt": [
            [prefix + q for q in qs_a],
            [prefix + q for q in qs_b],
        ],
        **{k: base[k] for k in SCENE_KEYS},
    }
    out = tiny_msr3d.generate_scene_group(
        dict(group), use_beam=False, max_new_tokens=6
    )

    # plain arm: 5 independent rows, scene tiled per its group's questions
    reps = np.array([3, 2])
    plain = tiny_msr3d.generate(
        {
            "msr3d_prompt": [prefix + q for q in qs_a + qs_b],
            **{k: np.repeat(base[k], reps, axis=0) for k in SCENE_KEYS},
        },
        use_beam=False, max_new_tokens=6,
    )
    assert out["output_tokens"].shape[0] == 5
    np.testing.assert_array_equal(out["output_tokens"], plain["output_tokens"])
    assert out["output_text"] == plain["output_text"]


def test_grouped_scene_count_mismatch_raises(tiny_msr3d, rng):
    group = _group_dict(rng, ["a?", "b?"])  # flat list → one group
    bad = {**group, **{k: np.repeat(group[k], 2, axis=0) for k in SCENE_KEYS}}
    with pytest.raises(ValueError, match="scene row per prompt group"):
        tiny_msr3d.generate_scene_group(bad, max_new_tokens=4)


def _scene_requests(rng, texts_a, texts_b=None):
    """Per-question request dicts over one or two scenes."""
    base = tiny_data_dict(rng, b=2)
    prefix = f"You are in a scene: {SCENE_PLACEHOLDER}. Image: {IMAGE_PLACEHOLDER}. "
    reqs = []
    for q in texts_a:
        reqs.append({"msr3d_prompt": prefix + q,
                     **{k: base[k][0] for k in SCENE_KEYS}})
    for q in texts_b or []:
        reqs.append({"msr3d_prompt": prefix + q,
                     **{k: base[k][1] for k in SCENE_KEYS}})
    return reqs


def _plain_rows(model, reqs, max_new):
    out = model.generate(
        {
            "msr3d_prompt": [r["msr3d_prompt"] for r in reqs],
            **{k: np.stack([r[k] for r in reqs]) for k in SCENE_KEYS},
        },
        use_beam=False, max_new_tokens=max_new,
    )
    return out["output_tokens"], out["output_text"]


def test_group_server_matches_plain(tiny_msr3d, rng):
    """Interleaved two-scene stream: fingerprint grouping reassembles the
    scenes, results carry submission ids, tokens match plain generate."""
    from msr3d_tpu.serving import SceneGroupBatchingServer

    reqs = _scene_requests(
        rng, ["What do you see?", "Color?", "Chairs?"], ["Exit where?", "Count?"]
    )
    order = [0, 3, 1, 4, 2]  # interleave scenes A and B
    server = SceneGroupBatchingServer(
        tiny_msr3d, scenes_per_batch=1, questions_per_scene=2,
        pipeline_depth=1, use_beam=False, max_new_tokens=5,
    )
    results = list(server.run(reqs[i] for i in order))
    assert sorted(r.id for r in results) == list(range(5))

    want_tokens, want_text = _plain_rows(tiny_msr3d, reqs, 5)
    by_id = {r.id: r for r in results}
    for slot, orig in enumerate(order):
        np.testing.assert_array_equal(
            by_id[slot].output_tokens, want_tokens[orig]
        )
        assert by_id[slot].output_text == want_text[orig]


def test_group_server_miskeyed_falls_back_to_singletons(tiny_msr3d, rng):
    """Same scene arrays, prompts diverging BEFORE the placeholders: the
    grouped dispatch raises inside the server and singleton-group
    fallback still answers every request correctly."""
    from msr3d_tpu.serving import SceneGroupBatchingServer

    base = tiny_data_dict(rng, b=1)
    reqs = [
        {
            "msr3d_prompt": f"{lead} {SCENE_PLACEHOLDER}. {IMAGE_PLACEHOLDER} what?",
            **{k: base[k][0] for k in SCENE_KEYS},
        }
        for lead in ("Alpha", "Beta")
    ]
    server = SceneGroupBatchingServer(
        tiny_msr3d, scenes_per_batch=1, questions_per_scene=2,
        pipeline_depth=0, use_beam=False, max_new_tokens=5,
    )
    results = sorted(server.run(iter(reqs)), key=lambda r: r.id)
    want_tokens, want_text = _plain_rows(tiny_msr3d, reqs, 5)
    for i, r in enumerate(results):
        np.testing.assert_array_equal(r.output_tokens, want_tokens[i])
        assert r.output_text == want_text[i]


def test_group_server_max_open_dispatches_early(tiny_msr3d, rng):
    """A non-contiguous stream cannot buffer unboundedly: exceeding
    max_open_scenes force-closes the oldest group."""
    from msr3d_tpu.serving import SceneGroupBatchingServer

    reqs = _scene_requests(rng, ["One?"], ["Two?"])
    server = SceneGroupBatchingServer(
        tiny_msr3d, scenes_per_batch=1, questions_per_scene=99,
        pipeline_depth=0, use_beam=False, max_new_tokens=4,
        max_open_scenes=1,
    )
    server.submit(reqs[0])
    assert len(server._open) == 1  # scene A open
    server.submit(reqs[1])  # scene B opens -> A force-closed and batched
    results = server.flush()
    assert sorted(r.id for r in results) == [0, 1]


@pytest.mark.slow  # beam compile on the tiny model
def test_grouped_beam_matches_per_question_beam(tiny_msr3d, rng):
    """Grouped BEAM decode (the reference's beam-5/rep-penalty eval
    setting, shared scene prefix): token parity vs per-question beam
    generate. Suffix KV rows repeat per beam; the beam reorder gather
    must preserve them."""
    questions = ["What do you see?", "Is there a chair by the window?"]
    group = _group_dict(rng, questions)
    out = tiny_msr3d.generate_scene_group(
        dict(group), use_beam=True, max_new_tokens=6
    )
    plain = tiny_msr3d.generate(
        _tiled_dict(group), use_beam=True, max_new_tokens=6
    )
    np.testing.assert_array_equal(out["output_tokens"], plain["output_tokens"])
    assert out["output_text"] == plain["output_text"]


def test_grouped_rejects_sampling_and_spec(tiny_msr3d, rng):
    group = _group_dict(rng, ["a?"])
    tiny_msr3d.do_sample = True
    with pytest.raises(ValueError, match="not supported in grouped"):
        tiny_msr3d.generate_scene_group(group, max_new_tokens=4)
    tiny_msr3d.do_sample = False
    tiny_msr3d.spec_k = 2
    with pytest.raises(ValueError, match="not supported in grouped"):
        tiny_msr3d.generate_scene_group(group, max_new_tokens=4)
