"""Ring attention (parallel/ring_attention.py): exact match vs full
softmax attention on one device, causal and bidirectional, plus
gradients."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from msr3d_tpu.parallel.mesh import MeshConfig, make_mesh
from msr3d_tpu.parallel.ring_attention import ring_attention

S, H, D = 32, 2, 8


def _full_attention(q, k, v, causal):
    scale = 1.0 / D**0.5
    logits = jnp.einsum("thd,shd->ths", q, k).astype(jnp.float32) * scale
    if causal:
        mask = jnp.arange(S)[:, None] >= jnp.arange(S)[None, :]
        logits = jnp.where(mask[:, None, :], logits, -jnp.inf)
    w = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("ths,shd->thd", w.astype(v.dtype), v)


@pytest.fixture
def qkv(rng):
    mk = lambda: jnp.asarray(rng.normal(size=(S, H, D)).astype(np.float32))
    return mk(), mk(), mk()


@pytest.mark.parametrize("causal", [True, False])
def test_matches_full_attention(qkv, cpu_devices, causal):
    # sequence sharded over the dp axis (any axis works; sp rides dp here)
    mesh = make_mesh(MeshConfig(dp=4, tp=2, pp=1), devices=cpu_devices)
    q, k, v = qkv
    got = ring_attention(mesh, q, k, v, axis="dp", causal=causal)
    want = _full_attention(q, k, v, causal)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_gradients_match(qkv, cpu_devices):
    mesh = make_mesh(MeshConfig(dp=4, tp=2, pp=1), devices=cpu_devices)
    q, k, v = qkv

    g_ring = jax.grad(lambda a: jnp.sum(ring_attention(mesh, a, k, v, axis="dp") ** 2))(q)
    g_full = jax.grad(lambda a: jnp.sum(_full_attention(a, k, v, True) ** 2))(q)
    np.testing.assert_allclose(
        np.asarray(g_ring), np.asarray(g_full), rtol=2e-4, atol=2e-5
    )


def test_ring_size_one_degenerates(qkv, cpu_devices):
    mesh = make_mesh(MeshConfig(dp=1, tp=8, pp=1), devices=cpu_devices)
    q, k, v = qkv
    got = ring_attention(mesh, q, k, v, axis="dp", causal=True)
    want = _full_attention(q, k, v, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)
