"""Remat policies must not change the math — loss and LoRA grads are
identical across full / dots / residuals (they differ only in what
activations XLA saves vs recomputes)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from msr3d_tpu.models.llm.llama import LlamaConfig, LlamaModel, resolve_remat_policy


def _loss_and_grads(policy, rng):
    cfg = LlamaConfig.tiny(vocab_size=64, dtype=jnp.float32)
    cfg = dataclasses.replace(cfg, remat=True, remat_policy=policy)
    model = LlamaModel(cfg)
    b, t, h = 2, 6, cfg.hidden_size
    embeds = jnp.asarray(rng.normal(size=(b, t, h)).astype(np.float32))
    mask = jnp.ones((b, t), np.int32)
    variables = model.init(jax.random.key(0), embeds, mask)

    def loss_fn(v):
        logits, _, _ = model.apply(v, embeds, mask)
        return jnp.mean(logits.astype(jnp.float32) ** 2)

    loss, grads = jax.value_and_grad(loss_fn)(variables)
    return float(loss), grads


@pytest.mark.parametrize("policy", ["dots", "residuals"])
def test_policies_match_full(policy):
    rng = np.random.default_rng(3)
    want_loss, want_grads = _loss_and_grads("full", np.random.default_rng(3))
    got_loss, got_grads = _loss_and_grads(policy, np.random.default_rng(3))
    assert got_loss == pytest.approx(want_loss, rel=1e-6)
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(want_grads),
        jax.tree_util.tree_leaves_with_path(got_grads),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6,
            err_msg=str(pa),
        )


def test_unknown_policy_raises():
    with pytest.raises(ValueError, match="remat_policy"):
        resolve_remat_policy("bogus")
