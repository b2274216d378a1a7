"""ContinuousBeamBatchingServer: slot-refill BEAM serving must be
token-identical per request to the fixed-batch beam generate path at
batch 1 (each slot runs an independent HF-semantics beam search that
finalizes the moment its own done condition fires — exactly the
fixed loop's exit for a single-request batch), budgets must act as
per-request caps (matching a fixed run with max_new_tokens=budget),
and scheduling modes (group refill, drain/gang, lookahead) must not
change tokens."""

import numpy as np
import pytest

from msr3d_tpu.serving import ContinuousBeamBatchingServer
from tests.test_serving import _requests


def _batch_of(reqs):
    keys = (
        "obj_fts", "obj_masks", "obj_locs", "anchor_locs",
        "anchor_orientation", "msr3d_imgs", "msr3d_img_masks",
    )
    return {
        "msr3d_prompt": [r["msr3d_prompt"] for r in reqs],
        **{k: np.stack([r[k] for r in reqs]) for k in keys},
    }


def _prompt_bucket(model, reqs):
    """Engine bucket = the workload-wide prompt bucket (+ trailing bos).

    Single-request direct calls may pad to a SMALLER bucket — that's
    fine: left-padding is bitwise inert (masked logits get -1e30 →
    exp() == 0.0 exactly; positions are cumsum over the mask), so the
    parity comparison also pins the engine's pad-invariance."""
    ii, _ = model._encode_prompts(model.build_text_prompt(_batch_of(reqs)))
    return max(32, -(-ii.shape[1] // 32) * 32) + 1


def _direct_single(model, req, max_new):
    """Fixed-batch beam generate at batch 1 — the engine's parity target."""
    out = model.generate(
        _batch_of([req]), use_beam=True, max_new_tokens=max_new
    )
    return np.asarray(out["output_tokens"])[0]


def test_beam_continuous_matches_single_request_generate(tiny_msr3d, rng):
    reqs = _requests(rng, 6)
    max_new = 8
    eos = tiny_msr3d.tokenizer.eos_id
    prompt_len = _prompt_bucket(tiny_msr3d, reqs)

    server = ContinuousBeamBatchingServer(
        tiny_msr3d, num_slots=3, refill_group=1, chunk_steps=4,
        max_new_tokens=max_new, prompt_len=prompt_len,
    )
    assert server.num_beams == tiny_msr3d.num_beams == 2
    results = server.run(reqs)
    assert [r.id for r in results] == list(range(6))
    for r in results:
        direct = _direct_single(tiny_msr3d, reqs[r.id], max_new)
        np.testing.assert_array_equal(r.output_tokens, direct)
    assert server.steps_run > 0


def test_beam_continuous_budgets(tiny_msr3d, rng):
    """Per-request budgets: request i must match a FIXED beam run with
    max_new_tokens=budget_i (finalize normalizes live beams at the
    budget length, so the budget changes scores, not just truncation)."""
    reqs = _requests(rng, 4)
    budgets = [3, 8, 1, 5]
    eos = tiny_msr3d.tokenizer.eos_id
    prompt_len = _prompt_bucket(tiny_msr3d, reqs)

    server = ContinuousBeamBatchingServer(
        tiny_msr3d, num_slots=2, refill_group=1, chunk_steps=3,
        max_new_tokens=8, prompt_len=prompt_len,
    )
    results = server.run(reqs, budgets=budgets)
    for r in results:
        b = budgets[r.id]
        direct = _direct_single(tiny_msr3d, reqs[r.id], b)
        np.testing.assert_array_equal(r.output_tokens[:b], direct)
        assert (r.output_tokens[b:] == eos).all()


def test_beam_continuous_group_refill_drain_lookahead(tiny_msr3d, rng):
    reqs = _requests(rng, 5)
    max_new = 6
    prompt_len = _prompt_bucket(tiny_msr3d, reqs)
    direct = [_direct_single(tiny_msr3d, q, max_new) for q in reqs]

    for kw in (
        dict(num_slots=4, refill_group=2, chunk_steps=3),
        dict(num_slots=4, refill_group=2, chunk_steps=3,
             drain_between_batches=True),
        dict(num_slots=3, refill_group=1, chunk_steps=2, lookahead=0),
        dict(num_slots=3, refill_group=1, chunk_steps=2, lookahead=3),
    ):
        server = ContinuousBeamBatchingServer(
            tiny_msr3d, max_new_tokens=max_new, prompt_len=prompt_len, **kw
        )
        for r in server.run(reqs):
            np.testing.assert_array_equal(r.output_tokens, direct[r.id])


def test_beam_continuous_streaming_on_result(tiny_msr3d, rng):
    reqs = _requests(rng, 4)
    max_new = 6
    prompt_len = _prompt_bucket(tiny_msr3d, reqs)
    server = ContinuousBeamBatchingServer(
        tiny_msr3d, num_slots=2, refill_group=1, chunk_steps=3,
        max_new_tokens=max_new, prompt_len=prompt_len,
    )
    seen = []
    results = server.run(reqs, on_result=lambda res: seen.append(res.id))
    assert sorted(seen) == [0, 1, 2, 3]
    assert len(results) == 4


def test_beam_continuous_rejects_spec(tiny_msr3d):
    with pytest.raises(TypeError):
        ContinuousBeamBatchingServer(tiny_msr3d, num_slots=2, spec_k=2)
