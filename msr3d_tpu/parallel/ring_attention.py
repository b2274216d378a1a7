"""Sequence parallelism: ring attention over a mesh axis.

The reference needs no sequence parallelism (prompt+answer ≤ a few
hundred tokens, SURVEY §5 "absent by design") — this provides the
mechanism for when context budgets outgrow a chip: Q, K, V are sharded
along the *sequence* axis across devices; each device computes online-
softmax partial attention against its local KV block, then the KV blocks
rotate one step around the ring (``lax.ppermute`` over ICI) until every
query has seen every key. Memory per device is O(S/N) for activations
and KV — the blockwise/ring-attention recipe — while the math matches
full softmax attention exactly (tested, including causal masking and
gradients, vs a single-device reference).

Built with ``shard_map`` like the pipeline module: the collective
schedule is explicit, XLA lowers the ring hops to ICI sends.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax, shard_map
from jax.sharding import Mesh, PartitionSpec as P

__all__ = ["ring_attention"]


def _block_attention(q, k, v, mask, scale):
    """Partial attention of q against one KV block with running-softmax
    stats. Returns (numerator (T,H,D), denominator (T,H), rowmax (T,H))."""
    logits = jnp.einsum("thd,shd->ths", q, k).astype(jnp.float32) * scale
    logits = jnp.where(mask, logits, -jnp.inf)
    m = jnp.max(logits, axis=-1)  # (T, H)
    # guard fully-masked rows (no valid key in this block yet)
    m_safe = jnp.where(jnp.isfinite(m), m, 0.0)
    p = jnp.exp(logits - m_safe[..., None])
    p = jnp.where(mask, p, 0.0)
    den = jnp.sum(p, axis=-1)  # (T, H)
    num = jnp.einsum("ths,shd->thd", p.astype(v.dtype), v).astype(jnp.float32)
    return num, den, jnp.where(jnp.isfinite(m), m, -jnp.inf)


def ring_attention(
    mesh: Mesh,
    q: jax.Array,  # (S, H, D) — sequence-sharded over `axis`
    k: jax.Array,
    v: jax.Array,
    *,
    axis: str,
    causal: bool = True,
) -> jax.Array:
    """Exact softmax attention with Q/K/V sharded over ``axis`` along the
    sequence dimension. Returns (S, H, D), same sharding as q."""
    n = mesh.shape[axis]
    scale = 1.0 / float(q.shape[-1]) ** 0.5
    perm = [(i, (i + 1) % n) for i in range(n)]

    def per_device(ql, kl, vl):
        s_local = ql.shape[0]
        my = lax.axis_index(axis)
        q_pos = my * s_local + jnp.arange(s_local)  # global query positions

        def step(i, carry):
            kb, vb, num, den, mx = carry
            # the block currently held arrived from device (my - i) % n
            src = (my - i) % n
            k_pos = src * s_local + jnp.arange(s_local)
            block_mask = (
                (q_pos[:, None, None] >= k_pos[None, None, :])
                if causal
                else jnp.ones((s_local, 1, s_local), bool)
            )  # (T, 1, S) — broadcasts over heads
            bn, bd, bm = _block_attention(ql, kb, vb, block_mask, scale)
            # merge running softmax stats
            new_m = jnp.maximum(mx, bm)
            safe = lambda x: jnp.where(jnp.isfinite(x), x, 0.0)
            alpha = jnp.exp(safe(mx) - safe(new_m)) * jnp.isfinite(mx)
            beta = jnp.exp(safe(bm) - safe(new_m)) * jnp.isfinite(bm)
            num = num * alpha[..., None] + bn * beta[..., None]
            den = den * alpha + bd * beta
            # rotate KV one step around the ring
            kb = lax.ppermute(kb, axis, perm)
            vb = lax.ppermute(vb, axis, perm)
            return kb, vb, num, den, new_m

        h = ql.shape[1]
        num0 = jnp.zeros((s_local, h, ql.shape[2]), jnp.float32)
        den0 = jnp.zeros((s_local, h), jnp.float32)
        m0 = jnp.full((s_local, h), -jnp.inf, jnp.float32)
        _, _, num, den, _ = lax.fori_loop(0, n, step, (kl, vl, num0, den0, m0))
        return (num / jnp.maximum(den, 1e-30)[..., None]).astype(ql.dtype)

    spec = P(axis, None, None)
    return shard_map(
        per_device,
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    )(q, k, v)
