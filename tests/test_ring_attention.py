"""Ring attention (parallel/ring_attention.py): exact match vs full
softmax attention on one device — causal and bidirectional, key-padding
masks, gradients w.r.t. q, k AND v (the k/v grads flow through the
ppermute-carrying loop transpose — exactly where a ring-schedule autodiff
bug would hide), and the REAL LlamaModel forward+grads with
``sp_axis`` set, at a long (4k-token) context."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from msr3d_tpu.parallel.mesh import MeshConfig, make_mesh
from msr3d_tpu.parallel.ring_attention import ring_attention

B, S, H, D = 2, 32, 2, 8


def _full_attention(q, k, v, causal, key_valid=None):
    scale = 1.0 / D**0.5
    logits = jnp.einsum("bthd,bshd->bths", q, k).astype(jnp.float32) * scale
    mask = jnp.ones((1, S, 1, S), bool)
    if causal:
        mask = mask & (jnp.arange(S)[:, None] >= jnp.arange(S)[None, :])[None, :, None, :]
    if key_valid is not None:
        mask = mask & key_valid[:, None, None, :]
    logits = jnp.where(mask, logits, -jnp.inf)
    w = jax.nn.softmax(logits, axis=-1)
    w = jnp.where(jnp.isnan(w), 0.0, w)  # fully-masked rows → 0 like the ring
    return jnp.einsum("bths,bshd->bthd", w.astype(v.dtype), v)


@pytest.fixture
def qkv(rng):
    mk = lambda: jnp.asarray(rng.normal(size=(B, S, H, D)).astype(np.float32))
    return mk(), mk(), mk()


@pytest.mark.parametrize("causal", [True, False])
def test_matches_full_attention(qkv, cpu_devices, causal):
    # sequence sharded over the sp axis
    mesh = make_mesh(MeshConfig(dp=1, tp=2, pp=1, sp=4), devices=cpu_devices)
    q, k, v = qkv
    got = ring_attention(mesh, q, k, v, axis="sp", causal=causal)
    want = _full_attention(q, k, v, causal)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_key_padding_mask(qkv, cpu_devices, rng):
    mesh = make_mesh(MeshConfig(dp=1, tp=2, pp=1, sp=4), devices=cpu_devices)
    q, k, v = qkv
    # left-padding style: first few keys invalid per row
    key_valid = jnp.asarray(np.arange(S)[None, :] >= np.array([[5], [11]]))
    got = ring_attention(mesh, q, k, v, axis="sp", causal=True, key_valid=key_valid)
    want = _full_attention(q, k, v, True, key_valid)
    # compare only rows that have ≥1 valid key (padded query rows are
    # don't-care: ring yields 0, dense yields uniform-attn garbage)
    valid_q = np.asarray(key_valid)
    np.testing.assert_allclose(
        np.asarray(got)[valid_q], np.asarray(want)[valid_q], rtol=2e-5, atol=2e-5
    )


def test_gradients_match_q_k_v(qkv, cpu_devices):
    mesh = make_mesh(MeshConfig(dp=1, tp=2, pp=1, sp=4), devices=cpu_devices)
    q, k, v = qkv

    def loss_ring(a, b, c):
        return jnp.sum(ring_attention(mesh, a, b, c, axis="sp") ** 2)

    def loss_full(a, b, c):
        return jnp.sum(_full_attention(a, b, c, True) ** 2)

    g_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    g_full = jax.grad(loss_full, argnums=(0, 1, 2))(q, k, v)
    for name, gr, gf in zip("qkv", g_ring, g_full):
        np.testing.assert_allclose(
            np.asarray(gr), np.asarray(gf), rtol=2e-4, atol=3e-5,
            err_msg=f"grad w.r.t. {name}",
        )


def test_composes_with_dp(qkv, cpu_devices):
    mesh = make_mesh(MeshConfig(dp=2, tp=1, pp=1, sp=4), devices=cpu_devices)
    q, k, v = qkv
    got = ring_attention(
        mesh, q, k, v, axis="sp", causal=True, batch_axis="dp"
    )
    want = _full_attention(q, k, v, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_ring_size_one_degenerates(qkv, cpu_devices):
    mesh = make_mesh(MeshConfig(dp=1, tp=8, pp=1, sp=1), devices=cpu_devices)
    q, k, v = qkv
    got = ring_attention(mesh, q, k, v, axis="sp", causal=True)
    want = _full_attention(q, k, v, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


# ---------------------------------------------------------------------------
# the REAL model under sp: LlamaModel with cfg.sp_axis at long context
# ---------------------------------------------------------------------------


def test_full_network_sp_loss_matches(cpu_devices):
    """The FULL MSR3DNetwork training loss with the LLM running sequence-
    parallel (sp=4) == the unsharded network, same params."""
    import dataclasses

    import __graft_entry__ as ge

    network_ref = ge._make_network(tiny=True)
    cfg_sp = dataclasses.replace(
        network_ref.cfg,
        llm=dataclasses.replace(network_ref.cfg.llm, sp_axis="sp"),
    )
    from msr3d_tpu.models.msr3d import MSR3DNetwork

    network_sp = MSR3DNetwork(cfg_sp)

    nrng = np.random.default_rng(0)
    batch_np = ge._make_batch(nrng, b=2, n_obj=6, n_pts=32, t_in=24, t_out=8,
                              vocab=512)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    variables = network_ref.init(jax.random.key(0), **batch)
    out_ref = network_ref.apply(variables, **batch)

    mesh = make_mesh(MeshConfig(dp=1, tp=1, pp=1, sp=4), devices=cpu_devices[:4])
    with mesh:
        out_sp = jax.jit(lambda v, b: network_sp.apply(v, **b)["loss"])(
            variables, batch
        )
        out_sp = np.asarray(jax.device_get(out_sp))
    np.testing.assert_allclose(
        out_sp, np.asarray(out_ref["loss"]), rtol=1e-5, atol=1e-6
    )


@pytest.mark.slow
def test_llama_sp_forward_and_grads_long_context(cpu_devices, rng):
    """Full LlamaModel teacher-forcing forward with the sequence sharded
    4-way at 4096 tokens (where sp matters): logits AND LoRA gradients
    must match the unsharded single-device model (VERDICT round-2 #1)."""
    from msr3d_tpu.models.llm.llama import LlamaConfig, LlamaModel

    t = 4096
    base = dict(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2,
        max_position_embeddings=t, lora_rank=4, dtype=jnp.float32,
    )
    cfg_ref = LlamaConfig(**base)
    cfg_sp = LlamaConfig(**base, sp_axis="sp")
    mesh = make_mesh(MeshConfig(dp=1, tp=1, pp=1, sp=4), devices=cpu_devices[:4])

    model_ref = LlamaModel(cfg_ref)
    model_sp = LlamaModel(cfg_sp)
    embeds = jnp.asarray(rng.normal(size=(2, t, 32)).astype(np.float32) * 0.3)
    # left padding on row 0 exercises the mask path
    mask = np.ones((2, t), np.int32)
    mask[0, :7] = 0
    mask = jnp.asarray(mask)
    variables = model_ref.init(jax.random.key(0), embeds, mask)

    def loss(m):
        def f(v, e):
            logits, _, _ = m.apply(v, e, mask)
            l32 = logits.astype(jnp.float32)
            masked = l32 * mask[..., None].astype(jnp.float32)
            return jnp.sum(masked**2) / jnp.sum(mask), logits
        return f

    (l_ref, logits_ref), g_ref = jax.value_and_grad(loss(model_ref), has_aux=True)(
        variables, embeds
    )
    with mesh:
        (l_sp, logits_sp), g_sp = jax.jit(
            jax.value_and_grad(loss(model_sp), has_aux=True)
        )(variables, embeds)
        l_sp, logits_sp = jax.device_get((l_sp, logits_sp))
        g_sp = jax.device_get(g_sp)

    np.testing.assert_allclose(float(l_sp), float(l_ref), rtol=1e-5)
    valid = np.asarray(mask).astype(bool)
    np.testing.assert_allclose(
        np.asarray(logits_sp)[valid], np.asarray(logits_ref)[valid],
        rtol=5e-5, atol=5e-5,
    )
    # gradients land only on LoRA leaves (base is stop-gradiented);
    # compare every leaf
    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_sp = dict(jax.tree_util.tree_leaves_with_path(g_sp))
    checked = 0
    for path, leaf in flat_ref:
        other = flat_sp[path]
        if np.abs(np.asarray(leaf)).max() == 0:
            continue
        np.testing.assert_allclose(
            np.asarray(other), np.asarray(leaf), rtol=2e-4, atol=1e-5,
            err_msg=jax.tree_util.keystr(path),
        )
        checked += 1
    assert checked >= 4  # lora_a/lora_b across layers actually compared
