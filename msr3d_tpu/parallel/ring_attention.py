"""Sequence parallelism: ring attention over a mesh axis.

The reference needs no sequence parallelism (prompt+answer ≤ a few
hundred tokens, SURVEY §5 "absent by design") — this provides the
mechanism for when context budgets outgrow a chip: Q, K, V are sharded
along the *sequence* axis across devices; each device computes online-
softmax partial attention against its local KV block, then the KV blocks
rotate one step around the ring (``lax.ppermute`` over ICI) until every
query has seen every key. Memory per device is O(S/N) for activations
and KV — the blockwise/ring-attention recipe — while the math matches
full softmax attention exactly (tested, including causal masking,
key-padding masks, and gradients w.r.t. q, k AND v, vs a single-device
reference).

Batched layout (B, S, H, D), callable from ``LlamaAttention`` when
``LlamaConfig.sp_axis`` names a mesh axis — the real-model sequence-
parallel path, not a toy. Built with ``shard_map``: the collective
schedule is explicit, XLA lowers the ring hops to ICI sends.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax, shard_map
from jax.sharding import Mesh, PartitionSpec as P

__all__ = ["ring_attention"]


def _block_attention(q, k, v, mask, scale):
    """Partial attention of q (B,T,H,D) against one KV block (B,S,H,D)
    with running-softmax stats. ``mask`` broadcasts to (B,T,H,S).
    Returns (numerator (B,T,H,D), denominator (B,T,H), rowmax (B,T,H))."""
    logits = jnp.einsum("bthd,bshd->bths", q, k).astype(jnp.float32) * scale
    logits = jnp.where(mask, logits, -jnp.inf)
    m = jnp.max(logits, axis=-1)  # (B, T, H)
    # guard fully-masked rows (no valid key in this block yet)
    m_safe = jnp.where(jnp.isfinite(m), m, 0.0)
    p = jnp.exp(logits - m_safe[..., None])
    p = jnp.where(mask, p, 0.0)
    den = jnp.sum(p, axis=-1)  # (B, T, H)
    num = jnp.einsum("bths,bshd->bthd", p.astype(v.dtype), v).astype(jnp.float32)
    return num, den, jnp.where(jnp.isfinite(m), m, -jnp.inf)


def ring_attention(
    mesh: Mesh,
    q: jax.Array,  # (B, S, H, D) — sequence-sharded over `axis` on dim 1
    k: jax.Array,
    v: jax.Array,
    *,
    axis: str,
    causal: bool = True,
    key_valid: Optional[jax.Array] = None,  # (B, S) bool, 1 = attend
    batch_axis: Optional[str] = None,  # optionally dp-shard the batch dim
) -> jax.Array:
    """Exact softmax attention with Q/K/V sharded over ``axis`` along the
    sequence dimension (dim 1). Causality is by sequence *index* (matching
    the dense ``tril`` mask in ``LlamaModel``); ``key_valid`` masks padded
    key slots exactly like the dense additive bias. Returns (B, S, H, D),
    same sharding as q."""
    n = mesh.shape[axis]
    assert q.shape[1] % n == 0, (
        f"sequence length {q.shape[1]} not divisible by {axis}={n}"
    )
    scale = 1.0 / float(q.shape[-1]) ** 0.5
    perm = [(i, (i + 1) % n) for i in range(n)]
    if key_valid is None:
        key_valid = jnp.ones(q.shape[:2], bool)

    def per_device(ql, kl, vl, kvalid_l):
        s_local = ql.shape[1]
        my = lax.axis_index(axis)
        q_pos = my * s_local + jnp.arange(s_local)  # global query indices

        def step(i, carry):
            kb, vb, valb, num, den, mx = carry
            # the block currently held arrived from device (my - i) % n
            src = (my - i) % n
            k_pos = src * s_local + jnp.arange(s_local)
            block_mask = valb[:, None, None, :]  # (B, 1, 1, S)
            if causal:
                block_mask = block_mask & (
                    q_pos[None, :, None, None] >= k_pos[None, None, None, :]
                )
            bn, bd, bm = _block_attention(ql, kb, vb, block_mask, scale)
            # merge running softmax stats
            new_m = jnp.maximum(mx, bm)
            safe = lambda x: jnp.where(jnp.isfinite(x), x, 0.0)
            alpha = jnp.exp(safe(mx) - safe(new_m)) * jnp.isfinite(mx)
            beta = jnp.exp(safe(bm) - safe(new_m)) * jnp.isfinite(bm)
            num = num * alpha[..., None] + bn * beta[..., None]
            den = den * alpha + bd * beta
            # rotate KV (and its validity) one step around the ring
            kb = lax.ppermute(kb, axis, perm)
            vb = lax.ppermute(vb, axis, perm)
            valb = lax.ppermute(valb, axis, perm)
            return kb, vb, valb, num, den, new_m

        b, _, h, d = ql.shape
        num0 = jnp.zeros((b, s_local, h, d), jnp.float32)
        den0 = jnp.zeros((b, s_local, h), jnp.float32)
        m0 = jnp.full((b, s_local, h), -jnp.inf, jnp.float32)
        _, _, _, num, den, _ = lax.fori_loop(
            0, n, step, (kl, vl, kvalid_l, num0, den0, m0)
        )
        return (num / jnp.maximum(den, 1e-30)[..., None]).astype(ql.dtype)

    spec = P(batch_axis, axis, None, None)
    mask_spec = P(batch_axis, axis)
    return shard_map(
        per_device,
        mesh=mesh,
        in_specs=(spec, spec, spec, mask_spec),
        out_specs=spec,
        check_vma=False,
    )(q, k, v, key_valid)
