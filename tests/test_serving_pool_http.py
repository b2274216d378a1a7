"""Prefix-pool engines behind the HTTP front-end and with quantized
serving configs: the deployment surface for `serve.py --engine pool`.

- pool engine over a real socket: answers match plain generate, an
  over-long suffix is a 400 on its own connection (the per-segment
  validation contract) and the engine survives it;
- quantized (int8 base + int8 KV) pool engine matches the quantized
  plain generate token-for-token — the engine is layout-agnostic via
  _make_cache/LoraDense, pinned here against the silent-weight-layout
  bug class.
"""

import dataclasses
import json
import urllib.error
import urllib.request

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from msr3d_tpu.serving import PrefixPoolContinuousBatchingServer
from msr3d_tpu.serving_http import ServingFrontend, encode_scene_b64
from tests.test_serving_pool import direct_tokens, scene_requests


def _post(port, body, timeout=240):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/v1/generate",
        data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    try:
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as err:
        return err.code, json.loads(err.read())


@pytest.mark.slow
def test_pool_engine_http_frontend(tiny_msr3d, rng):
    reqs = scene_requests(rng, 2, 2)
    max_new = 5
    direct = direct_tokens(tiny_msr3d, reqs, max_new)
    want_text = tiny_msr3d.batch_detokenize(direct)

    engine = PrefixPoolContinuousBatchingServer(
        tiny_msr3d, num_slots=2, num_prefixes=2, prefix_len=64,
        suffix_len=64, refill_group=1, chunk_steps=3, max_new_tokens=max_new,
    )
    with ServingFrontend(engine, port=0) as fe:
        for i, r in enumerate(reqs):
            status, payload = _post(fe.port, {
                "prompt": r["msr3d_prompt"],
                "scene_b64": encode_scene_b64(r),
            })
            assert status == 200, payload
            assert payload["text"] == want_text[i]

        # over-long suffix → 400 on its own connection, engine intact
        bad = dict(reqs[0])
        bad["msr3d_prompt"] = bad["msr3d_prompt"] + " pad" * 40
        status, payload = _post(fe.port, {
            "prompt": bad["msr3d_prompt"],
            "scene_b64": encode_scene_b64(bad),
        })
        assert status == 400
        assert "suffix" in payload["error"]

        status, payload = _post(fe.port, {
            "prompt": reqs[0]["msr3d_prompt"],
            "scene_b64": encode_scene_b64(reqs[0]),
        })
        assert status == 200 and payload["text"] == want_text[0]
    assert engine.prefix_prefills == 2  # scene reuse held across requests


@pytest.mark.slow
@pytest.mark.parametrize("quantize,kv_quantize", [(True, False), (False, True)])
def test_pool_engine_quantized_config(tiny_msr3d, rng, quantize, kv_quantize):
    """Quantized layouts through the pool engine == plain generate on the
    SAME quantized model (catches layout assumptions in the pool/suffix
    cache plumbing — _make_cache carries k/v scales, LoraDense kernel_q).

    Weight-only int8 and int8-KV are tested SEPARATELY: each is
    token-exact vs generate on this tiny model (verified), while the
    combined config stacks two ~0.4% quantization perturbations onto
    random-init logits whose top-2 gaps are ~2e-4 — a pure argmax tie
    (debugged to the logit level: max |Δ| 1e-3 vs a 1.8e-4 gap), which no
    exact-token assertion can pin on random weights. The combined config
    IS exercised end-to-end with a learned (high-gain) head by
    tests/test_learning.py::test_msqa_overfit_em_quantized_serving."""
    from msr3d_tpu.models.llm.convert import quantize_llm_params
    from msr3d_tpu.models.msr3d import MSR3D
    from flax.core import unfreeze

    base = tiny_msr3d
    llm_q = dataclasses.replace(
        base.cfg.llm, quantize=quantize, quantize_bits=8,
        kv_quantize=kv_quantize,
    )
    cfg_q = dataclasses.replace(base.cfg, llm=llm_q)
    model_q = MSR3D(
        cfg_q, base.tokenizer, scene_token_len=5, max_out_len=16,
        num_beams=1, repetition_penalty=1.5,
    )
    host = unfreeze(jax.tree_util.tree_map(np.asarray, base.params))
    host["params"] = dict(host["params"])
    if quantize:
        host["params"]["llm"] = quantize_llm_params(
            host["params"]["llm"], llm_q
        )
    model_q.params = jax.tree_util.tree_map(jnp.asarray, host)

    reqs = scene_requests(rng, 2, 2)
    max_new = 5
    direct = direct_tokens(model_q, reqs, max_new)

    server = PrefixPoolContinuousBatchingServer(
        model_q, num_slots=2, num_prefixes=2, prefix_len=64,
        suffix_len=64, refill_group=1, chunk_steps=3, max_new_tokens=max_new,
    )
    for r in server.run(reqs):
        np.testing.assert_array_equal(r.output_tokens, direct[r.id])
    assert server.prefix_prefills == 2
