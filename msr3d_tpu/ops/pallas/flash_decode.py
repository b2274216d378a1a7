"""Fused int8-KV decode attention (Pallas, single query token).

The decode hot loop at 7B reads the whole KV cache every token. With the
cache stored int8 (+ per-(position, head) scales), the XLA formulation —
even with the scale factored out of the dots (llama.py `_split_kv`) —
still materializes an int8→bf16 convert of the multi-GB prompt segment
in HBM: measured 35 ms/decode-step at b80 against a ~15 ms traffic
floor (weights 6.6 GB + int8 KV ~5 GB).

This kernel makes the KV HBM traffic exactly the int8 bytes: the grid is
(batch,); each program DMAs its (H, S, D) int8 K/V tiles (MB-sized — a
per-(b,h) grid of 2560 tiny cells paid per-iteration overhead and ran 2×
slower than XLA) into VMEM, converts on-chip, and computes all heads'
context vectors — prompt- and generated-segment logits, masked fp32
softmax, value mix with the v-scales folded into the (1, S) probability
rows. Heads unroll as static 2-D dots because Mosaic cannot lower
batched ``dot_general`` (dot_dimension_numbers parse failure for empty
non-contracting dims).

Layout contract: K/V arrive **head-major** (B, H, S, D) so each
program's per-head tile is contiguous (full-dimension blocks satisfy the
TPU tiling constraint for any S). The prompt cache is captured
head-major at prefill (transposing the stacked cache later would double
its HBM footprint inside the generate program); the generated cache is
*stored* head-major during flash decode (llama.py `_make_cache` /
`_cache_write`).

Math identical to the XLA split-cache path (scale-outside
factorization); tested bit-close against the XLA oracle and token-exact
through the full greedy decode loop. Single-token greedy decode, no GQA
repeat (7B: kv_heads == heads); the beam path keeps the XLA formulation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(
    q_ref,      # (1, H, D) bf16
    kp_ref,     # (1, H, S_p, D) int8
    vp_ref,     # (1, H, S_p, D) int8
    ks_ref,     # (1, H, S_p) f32
    vs_ref,     # (1, H, S_p) f32
    kg_ref,     # (1, H, S_g, D) int8
    vg_ref,     # (1, H, S_g, D) int8
    kgs_ref,    # (1, H, S_g) f32
    vgs_ref,    # (1, H, S_g) f32
    bias_ref,   # (1, 1, S_p + S_g) f32 additive mask
    o_ref,      # (1, H, D) bf16
    *,
    sm_scale: float,
):
    # One batch row per program: the (H, S, D) int8 tiles are MB-sized
    # DMAs. All heads go through ONE MXU dot per segment: q (H, D) against
    # the flattened (H·S, D) keys computes every cross-head product — H×
    # FLOP waste, but ~30M MACs is trivial next to the HBM read — and the
    # wanted block diagonal is extracted with an eye mask on the VPU.
    # (Per-head 2-D matvecs left the MXU idle and ran slower than XLA;
    # a per-(b,h) grid of tiny cells paid per-iteration overhead — both
    # measured. Mosaic cannot lower batched dot_general directly.)
    h_heads = q_ref.shape[1]
    s_p = kp_ref.shape[2]
    s_g = kg_ref.shape[2]
    d = q_ref.shape[2]
    bias = bias_ref[0, 0]  # (S_tot,)
    q = q_ref[0]  # (H, D)

    def masks(s):
        """Block-diagonal mask (H, H·S) and the gather matrix P (H·S, S)
        with P[c, s'] = [c % S == s'] — all 2-D (Mosaic rejects reshapes
        that split/merge non-lane-aligned dims, e.g. (H, H·S)→(H, H, S))."""
        hs = h_heads * s
        row = jax.lax.broadcasted_iota(jnp.int32, (h_heads, hs), 0)
        colh = jax.lax.broadcasted_iota(jnp.int32, (h_heads, hs), 1) // s
        diag = row == colh
        pr = jax.lax.broadcasted_iota(jnp.int32, (hs, s), 0) % s
        pc = jax.lax.broadcasted_iota(jnp.int32, (hs, s), 1)
        gather = (pr == pc).astype(jnp.float32)
        return diag, gather

    def seg_logits(k_int8, scales, s):
        diag, gather = masks(s)
        k_flat = k_int8[0].reshape(h_heads * s, d).astype(jnp.bfloat16)
        allpairs = jax.lax.dot_general(
            q, k_flat, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (H, H·S): every cross-head product
        masked = jnp.where(diag, allpairs, 0.0)
        l = jax.lax.dot_general(  # pick each head's own block → (H, S)
            masked, gather, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return l * scales[0] * sm_scale

    lp = seg_logits(kp_ref, ks_ref, s_p)
    lg = seg_logits(kg_ref, kgs_ref, s_g)
    logits = jnp.concatenate([lp, lg], axis=1) + bias[None, :]
    w = jax.nn.softmax(logits, axis=-1)  # fp32 (H, S_tot)

    def seg_out(weights, v_int8, scales, s):
        # spread each head's row onto its diagonal block → one dot
        diag, gather = masks(s)
        wv = weights * scales[0]  # (H, S) f32
        w_wide = jax.lax.dot_general(  # (H, H·S): wv[h, c % S]
            wv, gather, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        w_block = jnp.where(diag, w_wide, 0.0).astype(jnp.bfloat16)
        v_flat = v_int8[0].reshape(h_heads * s, d).astype(jnp.bfloat16)
        return jax.lax.dot_general(
            w_block, v_flat, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (H, D)

    out = seg_out(w[:, :s_p], vp_ref, vs_ref, s_p) + seg_out(
        w[:, s_p:], vg_ref, vgs_ref, s_g
    )
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def flash_decode_attention(
    q: jax.Array,        # (B, H, D) bf16 — the single query token
    kp: jax.Array,       # (B, H, S_p, D) int8 — head-major prompt keys
    vp: jax.Array,       # (B, H, S_p, D) int8
    ks: jax.Array,       # (B, H, S_p) scales
    vs: jax.Array,       # (B, H, S_p)
    kg: jax.Array,       # (B, H, S_g, D) int8 (current token already written)
    vg: jax.Array,       # (B, H, S_g, D) int8
    kgs: jax.Array,      # (B, H, S_g)
    vgs: jax.Array,      # (B, H, S_g)
    bias: jax.Array,     # (B, S_p + S_g) f32 additive mask
    *,
    interpret: bool = False,
) -> jax.Array:          # (B, H, D) bf16
    b, h, d = q.shape
    s_p, s_g = kp.shape[2], kg.shape[2]
    sm_scale = 1.0 / float(d) ** 0.5

    def s3(x):  # scales → f32 (B, H, S)
        return x.astype(jnp.float32)

    row4 = lambda i: (i, 0, 0, 0)
    row3 = lambda i: (i, 0, 0)
    return pl.pallas_call(
        functools.partial(_kernel, sm_scale=sm_scale),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, d), row3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, s_p, d), row4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, s_p, d), row4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, s_p), row3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, s_p), row3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, s_g, d), row4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, s_g, d), row4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, s_g), row3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, s_g), row3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s_p + s_g), row3, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, d), row3, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, d), q.dtype),
        interpret=interpret,
    )(
        q, kp, vp, s3(ks), s3(vs), kg, vg, s3(kgs), s3(vgs),
        bias.astype(jnp.float32)[:, None, :],
    )


def flash_decode_attention_xla(
    q, kp, vp, ks, vs, kg, vg, kgs, vgs, bias
) -> jax.Array:
    """Reference XLA formulation (same math, same head-major signature) —
    the test oracle and the CPU fallback."""
    sm_scale = 1.0 / float(q.shape[-1]) ** 0.5

    def seg_logits(k_int8, scales):
        l = jnp.einsum("bhd,bhsd->bhs", q, k_int8.astype(q.dtype)).astype(jnp.float32)
        return l * scales.astype(jnp.float32) * sm_scale

    s_p = kp.shape[2]
    logits = jnp.concatenate(
        [seg_logits(kp, ks), seg_logits(kg, kgs)], axis=-1
    ) + bias.astype(jnp.float32)[:, None, :]
    w = jax.nn.softmax(logits, axis=-1)

    def seg_out(weights, v_int8, scales):
        wv = (weights * scales.astype(jnp.float32)).astype(q.dtype)
        return jnp.einsum("bhs,bhsd->bhd", wv, v_int8.astype(q.dtype))

    return (
        seg_out(w[..., :s_p], vp, vs) + seg_out(w[..., s_p:], vg, vgs)
    ).astype(q.dtype)
