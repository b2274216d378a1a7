"""Continuous batching on a device mesh: the slot-refill engine's three
compiled programs (prefill / donated scatter insert / while-loop decode
chunk) run SPMD under dp×tp with NO engine changes — GSPMD propagates
the megatron shardings from the tp-sharded params into the slot state
(KV caches land head-sharded, slot rows over dp) and inserts the
collectives. Tokens must match the unsharded engine per request.

This is the multi-chip serving story for a v5e-8 board: tp over the 7B
LLM + slot-refill scheduling, validated here on the 8-fake-device CPU
mesh (tests/conftest.py trick), and exercised by the driver's
dryrun_multichip on the real network."""

import numpy as np
import pytest

from msr3d_tpu.serving import ContinuousBatchingServer
from tests.test_serving import _requests


def _prompt_len(model, reqs):
    batch = {"msr3d_prompt": [r["msr3d_prompt"] for r in reqs]}
    ii, _ = model._encode_prompts(model.build_text_prompt(batch))
    return max(32, -(-ii.shape[1] // 32) * 32) + 1


@pytest.mark.slow  # engine recompiles for the sharded layout
def test_continuous_engine_under_dp_tp_mesh(tiny_msr3d, rng, cpu_devices):
    from msr3d_tpu.parallel.mesh import MeshConfig, make_mesh

    model = tiny_msr3d
    reqs = _requests(rng, 5)
    pl = _prompt_len(model, reqs)
    plain = ContinuousBatchingServer(
        model, num_slots=2, refill_group=1, chunk_steps=3,
        max_new_tokens=6, prompt_len=pl,
    )
    want = {r.id: r.output_tokens for r in plain.run(reqs)}

    mesh = make_mesh(MeshConfig(dp=2, tp=4), devices=cpu_devices)
    model.shard_for_serving(mesh, tensor_parallel=True)
    sharded = ContinuousBatchingServer(
        model, num_slots=2, refill_group=1, chunk_steps=3,
        max_new_tokens=6, prompt_len=pl,
    )
    results = sharded.run(reqs)
    assert sorted(r.id for r in results) == list(range(5))
    for r in results:
        np.testing.assert_array_equal(r.output_tokens, want[r.id])
    # the LLM weights actually live tp-sharded on the mesh
    import jax

    qk = model.params["params"]["llm"]["layer_0"]["attn"]["q_proj"]["kernel"]
    assert not qk.sharding.is_fully_replicated


@pytest.mark.slow
def test_continuous_engine_spec_under_mesh(tiny_msr3d, rng, cpu_devices):
    """Speculative engine (spec_k>0) under the mesh: same tokens as the
    unsharded speculative engine (which itself equals the T=1 engine)."""
    from msr3d_tpu.parallel.mesh import MeshConfig, make_mesh

    model = tiny_msr3d
    saved = model.repetition_penalty
    model.repetition_penalty = 1.0
    try:
        reqs = _requests(rng, 4)
        pl = _prompt_len(model, reqs)
        plain = ContinuousBatchingServer(
            model, num_slots=2, refill_group=1, chunk_steps=3,
            max_new_tokens=6, prompt_len=pl, spec_k=3, spec_ngram=2,
        )
        want = {r.id: r.output_tokens for r in plain.run(reqs)}

        mesh = make_mesh(MeshConfig(dp=2, tp=4), devices=cpu_devices)
        model.shard_for_serving(mesh, tensor_parallel=True)
        sharded = ContinuousBatchingServer(
            model, num_slots=2, refill_group=1, chunk_steps=3,
            max_new_tokens=6, prompt_len=pl, spec_k=3, spec_ngram=2,
        )
        for r in sharded.run(reqs):
            np.testing.assert_array_equal(r.output_tokens, want[r.id])
    finally:
        model.repetition_penalty = saved


@pytest.mark.slow
def test_continuous_beam_engine_under_mesh(tiny_msr3d, rng, cpu_devices):
    """Beam slot-refill engine under dp×tp: GSPMD propagates the megatron
    shardings into the beam-group slot state (gen KV rows = slots×beams)
    across prefill/insert/chunk — tokens match the unsharded beam engine
    per request."""
    from msr3d_tpu.parallel.mesh import MeshConfig, make_mesh
    from msr3d_tpu.serving import ContinuousBeamBatchingServer

    model = tiny_msr3d
    reqs = _requests(rng, 4)
    pl = _prompt_len(model, reqs)
    plain = ContinuousBeamBatchingServer(
        model, num_slots=2, refill_group=1, chunk_steps=3,
        max_new_tokens=6, prompt_len=pl,
    )
    want = {r.id: r.output_tokens for r in plain.run(reqs)}

    mesh = make_mesh(MeshConfig(dp=2, tp=4), devices=cpu_devices)
    model.shard_for_serving(mesh, tensor_parallel=True)
    sharded = ContinuousBeamBatchingServer(
        model, num_slots=2, refill_group=1, chunk_steps=3,
        max_new_tokens=6, prompt_len=pl,
    )
    results = sharded.run(reqs)
    assert sorted(r.id for r in results) == list(range(4))
    for r in results:
        np.testing.assert_array_equal(r.output_tokens, want[r.id])


@pytest.mark.slow
def test_prefix_pool_engine_under_mesh(tiny_msr3d, rng, cpu_devices):
    """Prefix-pool engine under dp×tp: the flattened block-pool segment
    and the per-query visibility mask ride GSPMD like the per-slot
    prompt segment does — tokens match the unsharded pool engine (which
    itself matches plain generate, tests/test_serving_pool.py)."""
    from msr3d_tpu.parallel.mesh import MeshConfig, make_mesh
    from msr3d_tpu.serving import PrefixPoolContinuousBatchingServer
    from tests.test_serving_pool import scene_requests

    model = tiny_msr3d
    reqs = scene_requests(rng, 2, 2)
    plain = PrefixPoolContinuousBatchingServer(
        model, num_slots=2, num_prefixes=2, prefix_len=64, suffix_len=64,
        refill_group=1, chunk_steps=3, max_new_tokens=6,
    )
    want = {r.id: r.output_tokens for r in plain.run(reqs)}

    mesh = make_mesh(MeshConfig(dp=2, tp=4), devices=cpu_devices)
    model.shard_for_serving(mesh, tensor_parallel=True)
    sharded = PrefixPoolContinuousBatchingServer(
        model, num_slots=2, num_prefixes=2, prefix_len=64, suffix_len=64,
        refill_group=1, chunk_steps=3, max_new_tokens=6,
    )
    results = sharded.run(reqs)
    assert sorted(r.id for r in results) == list(range(4))
    for r in results:
        np.testing.assert_array_equal(r.output_tokens, want[r.id])
    assert sharded.prefix_prefills == 2
