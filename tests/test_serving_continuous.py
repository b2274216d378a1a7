"""ContinuousBatchingServer: slot-refill greedy serving must be
token-identical per request to the fixed-batch generate path (greedy rows
are independent, so scheduling must not change tokens), budgets must act
as per-request token caps, and the per-row vector-index cache write must
match the scalar path bit-for-bit."""

import numpy as np
import pytest

from msr3d_tpu.serving import ContinuousBatchingServer
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


def _direct_tokens(model, reqs, max_new):
    out = model.generate(_batch_of(reqs), use_beam=False, max_new_tokens=max_new)
    return np.asarray(out["output_tokens"])


def test_continuous_matches_generate(tiny_msr3d, rng):
    reqs = _requests(rng, 7)
    max_new = 8
    direct = _direct_tokens(tiny_msr3d, reqs, max_new)
    # same prompt bucket as generate (pad-to-32 + trailing bos) so the
    # comparison is step-for-step, not just pad-invariance
    ii, _ = tiny_msr3d._encode_prompts(tiny_msr3d.build_text_prompt(_batch_of(reqs)))
    prompt_len = max(32, -(-ii.shape[1] // 32) * 32) + 1

    server = ContinuousBatchingServer(
        tiny_msr3d, num_slots=3, refill_group=1, chunk_steps=4,
        max_new_tokens=max_new, prompt_len=prompt_len,
    )
    results = server.run(reqs)
    assert [r.id for r in results] == list(range(7))
    for r in results:
        np.testing.assert_array_equal(r.output_tokens, direct[r.id])
    assert server.steps_run > 0


def test_continuous_group_refill_and_drain_mode(tiny_msr3d, rng):
    reqs = _requests(rng, 5)
    max_new = 6
    direct = _direct_tokens(tiny_msr3d, reqs, max_new)
    ii, _ = tiny_msr3d._encode_prompts(tiny_msr3d.build_text_prompt(_batch_of(reqs)))
    prompt_len = max(32, -(-ii.shape[1] // 32) * 32) + 1

    # group refill (R=2, tail group padded) — continuous mode
    cont = ContinuousBatchingServer(
        tiny_msr3d, num_slots=4, refill_group=2, chunk_steps=3,
        max_new_tokens=max_new, prompt_len=prompt_len,
    )
    for r in cont.run(reqs):
        np.testing.assert_array_equal(r.output_tokens, direct[r.id])

    # drain mode = gang scheduling with identical kernels; burst-fills
    # group-by-group (R=2 twice) before decoding
    gang = ContinuousBatchingServer(
        tiny_msr3d, num_slots=4, refill_group=2, chunk_steps=3,
        max_new_tokens=max_new, prompt_len=prompt_len,
        drain_between_batches=True,
    )
    for r in gang.run(reqs):
        np.testing.assert_array_equal(r.output_tokens, direct[r.id])
    assert gang.steps_run >= 0


def test_continuous_lookahead_modes(tiny_msr3d, rng):
    """Flag-fetch lookahead (0 = synchronous, N = N chunks outstanding)
    only changes host scheduling — tokens must match generate in every
    mode, including drain (gang) mode under lookahead."""
    reqs = _requests(rng, 5)
    max_new = 6
    direct = _direct_tokens(tiny_msr3d, reqs, max_new)
    ii, _ = tiny_msr3d._encode_prompts(tiny_msr3d.build_text_prompt(_batch_of(reqs)))
    prompt_len = max(32, -(-ii.shape[1] // 32) * 32) + 1

    for lookahead, drain in ((0, False), (3, False), (2, True)):
        server = ContinuousBatchingServer(
            tiny_msr3d, num_slots=3, refill_group=1, chunk_steps=3,
            max_new_tokens=max_new, prompt_len=prompt_len,
            drain_between_batches=drain, lookahead=lookahead,
        )
        results = server.run(reqs)
        assert [r.id for r in results] == list(range(5))
        for r in results:
            np.testing.assert_array_equal(r.output_tokens, direct[r.id])


def test_continuous_per_request_budgets(tiny_msr3d, rng):
    reqs = _requests(rng, 4)
    max_new = 8
    direct = _direct_tokens(tiny_msr3d, reqs, max_new)
    ii, _ = tiny_msr3d._encode_prompts(tiny_msr3d.build_text_prompt(_batch_of(reqs)))
    prompt_len = max(32, -(-ii.shape[1] // 32) * 32) + 1
    eos = tiny_msr3d.tokenizer.eos_id

    budgets = [1, 3, 8, 5]
    server = ContinuousBatchingServer(
        tiny_msr3d, num_slots=2, refill_group=1, chunk_steps=4,
        max_new_tokens=max_new, prompt_len=prompt_len,
    )
    results = server.run(reqs, budgets=budgets)
    for r in results:
        b = budgets[r.id]
        # prefix property: a budget caps a row without changing its tokens
        np.testing.assert_array_equal(r.output_tokens[:b], direct[r.id][:b])
        assert (r.output_tokens[b:] == eos).all()


def test_continuous_refill_under_lookahead_stale_flags(tiny_msr3d, rng):
    """Regression: with lookahead > 0, a slot freed while OTHER slots
    stay active gets refilled while chunks dispatched before the refill
    are still in flight; those chunks' finished flags still say True for
    the slot (the previous occupant's), and without the per-slot insert
    epoch the new request was emitted immediately — with the OLD
    request's tokens. Budget pattern: tiny budgets on one slot force
    repeated frees+refills while the long-budget slot keeps the pool
    active (so the drain-everything path never clears the stale entries)."""
    reqs = _requests(rng, 6)
    max_new = 12
    direct = _direct_tokens(tiny_msr3d, reqs, max_new)
    ii, _ = tiny_msr3d._encode_prompts(tiny_msr3d.build_text_prompt(_batch_of(reqs)))
    prompt_len = max(32, -(-ii.shape[1] // 32) * 32) + 1
    eos = tiny_msr3d.tokenizer.eos_id

    budgets = [1, 12, 2, 1, 3, 12]
    server = ContinuousBatchingServer(
        tiny_msr3d, num_slots=2, refill_group=1, chunk_steps=2,
        max_new_tokens=max_new, prompt_len=prompt_len, lookahead=2,
    )
    results = server.run(reqs, budgets=budgets)
    assert [r.id for r in results] == list(range(6))
    for r in results:
        b = budgets[r.id]
        np.testing.assert_array_equal(r.output_tokens[:b], direct[r.id][:b])
        assert (r.output_tokens[b:] == eos).all()


def test_continuous_sampling_decode(tiny_msr3d, rng):
    """do_sample in the engine: (a) near-zero temperature reduces to the
    greedy engine token-for-token (the warper chain collapses to argmax);
    (b) at a real temperature the per-request (seed, rid)-keyed streams
    are deterministic AND invariant to slot geometry — the same request
    gets the same tokens whether it shares the pool with 1 or 2 slots."""
    from msr3d_tpu.serving import ContinuousBatchingServer

    model = tiny_msr3d
    reqs = _requests(rng, 4)
    max_new = 6
    ii, _ = model._encode_prompts(model.build_text_prompt(_batch_of(reqs)))
    prompt_len = max(32, -(-ii.shape[1] // 32) * 32) + 1
    common = dict(
        refill_group=1, chunk_steps=3, max_new_tokens=max_new,
        prompt_len=prompt_len,
    )

    greedy = ContinuousBatchingServer(model, num_slots=2, **common)
    want = {r.id: r.output_tokens for r in greedy.run(reqs)}

    saved = (model.do_sample, model.temperature, model.top_k, model.top_p)
    try:
        model.do_sample = True
        model.temperature = 1e-5
        cold = ContinuousBatchingServer(model, num_slots=2, **common)
        for r in cold.run(reqs):
            np.testing.assert_array_equal(r.output_tokens, want[r.id])

        model.temperature = 1.0
        warm2 = ContinuousBatchingServer(model, num_slots=2, **common)
        first = {r.id: r.output_tokens for r in warm2.run(reqs)}
        again = {r.id: r.output_tokens for r in warm2.run(reqs)}
        for i in first:
            np.testing.assert_array_equal(first[i], again[i])
        warm3 = ContinuousBatchingServer(model, num_slots=3, **common)
        other = {r.id: r.output_tokens for r in warm3.run(reqs)}
        for i in first:
            np.testing.assert_array_equal(first[i], other[i])
    finally:
        (model.do_sample, model.temperature, model.top_k,
         model.top_p) = saved


def test_cache_write_rows_matches_scalar():
    """Vector-index KV write == scalar write, bf16 and int8 layouts."""
    import jax.numpy as jnp

    from msr3d_tpu.models.llm.llama import (
        _cache_write, quantize_kv_cache,
    )

    rng = np.random.default_rng(0)
    b, s, h, d = 3, 7, 2, 4
    k = jnp.asarray(rng.normal(size=(b, 1, h, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, 1, h, d)).astype(np.float32))
    for quant in (False, True):
        cache = {
            "k": jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32)),
            "v": jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32)),
        }
        if quant:
            cache = quantize_kv_cache(cache)
        scalar = _cache_write(cache, k, v, 4)
        vector = _cache_write(cache, k, v, jnp.full((b,), 4, jnp.int32))
        for key in scalar:
            np.testing.assert_array_equal(
                np.asarray(scalar[key]), np.asarray(vector[key])
            )
        # distinct per-row slots: row i lands at its own index, others keep
        idx = jnp.asarray(np.array([1, 5, 2], np.int32))
        out = _cache_write(cache, k, v, idx)
        for i, slot_i in enumerate([1, 5, 2]):
            one = _cache_write(
                {key: val[i : i + 1] for key, val in cache.items()},
                k[i : i + 1], v[i : i + 1], int(slot_i),
            )
            for key in one:
                np.testing.assert_array_equal(
                    np.asarray(out[key][i]), np.asarray(one[key][0])
                )


def test_continuous_with_eos_termination(tiny_msr3d, rng):
    """With an EOS logit bias rows terminate early and slots refill on
    EOS (not just budget exhaustion) — tokens still match generate."""
    reqs = _requests(rng, 4)
    max_new = 8
    old_bias = tiny_msr3d.eos_logit_bias
    tiny_msr3d.eos_logit_bias = 4.0
    try:
        direct = _direct_tokens(tiny_msr3d, reqs, max_new)
        ii, _ = tiny_msr3d._encode_prompts(
            tiny_msr3d.build_text_prompt(_batch_of(reqs))
        )
        prompt_len = max(32, -(-ii.shape[1] // 32) * 32) + 1
        server = ContinuousBatchingServer(
            tiny_msr3d, num_slots=2, refill_group=1, chunk_steps=4,
            max_new_tokens=max_new, prompt_len=prompt_len,
        )
        for r in server.run(reqs):
            np.testing.assert_array_equal(r.output_tokens, direct[r.id])
    finally:
        tiny_msr3d.eos_logit_bias = old_bias


def test_continuous_spec_matches_plain(tiny_msr3d, rng):
    """spec_k > 0 slot-refill serving is token-identical per request to
    the plain T=1 engine (both penalty-free), across refill scheduling,
    mixed budgets, and EOS-bias termination."""
    reqs = _requests(rng, 6)
    max_new = 10
    saved = tiny_msr3d.repetition_penalty
    tiny_msr3d.repetition_penalty = 1.0
    try:
        ii, _ = tiny_msr3d._encode_prompts(
            tiny_msr3d.build_text_prompt(_batch_of(reqs))
        )
        prompt_len = max(32, -(-ii.shape[1] // 32) * 32) + 1
        budgets = [10, 3, 7, 1, 10, 5]
        plain = ContinuousBatchingServer(
            tiny_msr3d, num_slots=3, refill_group=1, chunk_steps=4,
            max_new_tokens=max_new, prompt_len=prompt_len,
        )
        want = {r.id: r.output_tokens for r in plain.run(reqs, budgets=budgets)}
        spec = ContinuousBatchingServer(
            tiny_msr3d, num_slots=3, refill_group=1, chunk_steps=4,
            max_new_tokens=max_new, prompt_len=prompt_len,
            spec_k=3, spec_ngram=2,
        )
        results = spec.run(reqs, budgets=budgets)
        assert sorted(r.id for r in results) == list(range(6))
        for r in results:
            np.testing.assert_array_equal(r.output_tokens, want[r.id])
        # spec chunks count verify calls, not tokens
        assert 0 < spec.steps_run <= plain.steps_run
    finally:
        tiny_msr3d.repetition_penalty = saved


def test_continuous_spec_with_eos_bias(tiny_msr3d, rng):
    reqs = _requests(rng, 4)
    max_new = 8
    saved = tiny_msr3d.repetition_penalty
    old_bias = tiny_msr3d.eos_logit_bias
    tiny_msr3d.repetition_penalty = 1.0
    tiny_msr3d.eos_logit_bias = 4.0
    try:
        ii, _ = tiny_msr3d._encode_prompts(
            tiny_msr3d.build_text_prompt(_batch_of(reqs))
        )
        prompt_len = max(32, -(-ii.shape[1] // 32) * 32) + 1
        plain = ContinuousBatchingServer(
            tiny_msr3d, num_slots=2, refill_group=1, chunk_steps=3,
            max_new_tokens=max_new, prompt_len=prompt_len,
        )
        want = {r.id: r.output_tokens for r in plain.run(reqs)}
        spec = ContinuousBatchingServer(
            tiny_msr3d, num_slots=2, refill_group=1, chunk_steps=3,
            max_new_tokens=max_new, prompt_len=prompt_len,
            spec_k=4, spec_ngram=3,
        )
        for r in spec.run(reqs):
            np.testing.assert_array_equal(r.output_tokens, want[r.id])
    finally:
        tiny_msr3d.repetition_penalty = saved
        tiny_msr3d.eos_logit_bias = old_bias


def test_continuous_spec_requires_penalty_free(tiny_msr3d):
    saved = tiny_msr3d.repetition_penalty
    tiny_msr3d.repetition_penalty = 3.0
    try:
        with pytest.raises(ValueError, match="repetition_penalty"):
            ContinuousBatchingServer(
                tiny_msr3d, num_slots=2, refill_group=1, spec_k=2
            )
    finally:
        tiny_msr3d.repetition_penalty = saved


def test_continuous_lazy_feed_and_on_result(tiny_msr3d, rng):
    """run() must consume the sample iterator LAZILY (never more than a
    refill group beyond what free slots can take), deliver on_result
    callbacks as requests complete, and still return request-ordered
    results identical to the eager path."""
    n = 9
    reqs = _requests(rng, n)
    max_new = 6
    direct = _direct_tokens(tiny_msr3d, reqs, max_new)
    ii, _ = tiny_msr3d._encode_prompts(
        tiny_msr3d.build_text_prompt(_batch_of(reqs))
    )
    prompt_len = max(32, -(-ii.shape[1] // 32) * 32) + 1

    num_slots, r = 3, 2
    server = ContinuousBatchingServer(
        tiny_msr3d, num_slots=num_slots, refill_group=r, chunk_steps=3,
        max_new_tokens=max_new, prompt_len=prompt_len,
    )
    pulled = [0]
    completed = []

    def lazy_iter():
        for req in reqs:
            # laziness bound: the engine holds at most num_slots requests
            # in flight plus one pending refill group in its queue
            assert pulled[0] - len(completed) <= num_slots + r
            pulled[0] += 1
            yield req

    results = server.run(lazy_iter(), on_result=lambda res: completed.append(res))
    assert pulled[0] == n
    assert len(completed) == n
    assert [res.id for res in results] == list(range(n))
    for res in results:
        np.testing.assert_array_equal(res.output_tokens, direct[res.id])
    # the callback saw exactly the returned results (by id)
    assert sorted(res.id for res in completed) == list(range(n))
    for res in completed:
        np.testing.assert_array_equal(res.output_tokens, direct[res.id])


def test_uncollate_batch_roundtrip(rng):
    """uncollate_batch(_collate(samples)) reproduces the samples, and the
    LEO prompt-format fallback composes the same final prompt string
    build_text_prompt's LEO branch produces."""
    from msr3d_tpu.models.msr3d import IMAGE_PLACEHOLDER, SCENE_PLACEHOLDER
    from msr3d_tpu.serving import _collate, uncollate_batch
    from tests.test_msr3d import tiny_data_dict

    dd = tiny_data_dict(rng)
    samples = uncollate_batch(dd)
    assert [s["msr3d_prompt"] for s in samples] == list(dd["msr3d_prompt"])
    rebuilt = _collate(samples)
    for k in ("obj_fts", "obj_masks", "obj_locs", "anchor_locs",
              "anchor_orientation", "msr3d_imgs", "msr3d_img_masks"):
        np.testing.assert_array_equal(rebuilt[k], dd[k])

    leo = {
        "prompt_before_obj": ["role A.", "role B."],
        "prompt_middle_1": ["egoview", "egoview"],
        "prompt_middle_2": ["objects", "objects"],
        "prompt_after_obj": ["q1?", "q2?"],
        "obj_fts": dd["obj_fts"],
        "obj_masks": dd["obj_masks"],
        "obj_locs": dd["obj_locs"],
        "anchor_locs": dd["anchor_locs"],
        "anchor_orientation": dd["anchor_orientation"],
    }
    got = [s["msr3d_prompt"] for s in uncollate_batch(leo)]
    want = [
        f"role A. egoview{IMAGE_PLACEHOLDER}. objects {SCENE_PLACEHOLDER}. q1?",
        f"role B. egoview{IMAGE_PLACEHOLDER}. objects {SCENE_PLACEHOLDER}. q2?",
    ]
    assert got == want
