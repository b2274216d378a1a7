"""Fused causal attention (FlashAttention-style) as a Pallas TPU kernel.

Why: the dense training/prefill attention in ``models/llm/llama.py``
materializes fp32 ``(B, H, T, S)`` logits AND probs per layer — at 7B
train shapes (b4×32h×224×224) those temps are the binding allocation
that walls the micro-batch at b2 (ROUND3_NOTES.md train ladder: b4 OOM
by 1.53 GB ≈ 32 layers × 2 × 25.7 MB, under EVERY remat policy, because
they are XLA fusion temps, not remat-saved residuals). This kernel keeps
the score tile in VMEM with an online softmax, so the only HBM residuals
are ``o`` and the per-row logsumexp — O(T) instead of O(T·S).

Matches the reference's eager softmax-attention semantics
(/root/reference/model/llm/modeling_llama.py attention: fp32 scores,
additive −1e30-style masking) — but as a streaming kernel, which the
torch reference cannot express without a CUDA flash kernel.

Design notes:
- Layout in: ``q (B, T, Hq, D)``, ``k/v (B, S, Hkv, D)`` — the model's
  native layout. GQA is handled by the BlockSpec index map (kv head =
  q head // n_rep); k/v are never materialized repeated.
- Masking: ``causal`` (by absolute row/col index) ∧ ``key_valid (B, S)``
  key-padding. Probabilities are zeroed exactly where masked, so fully
  masked rows yield 0 output (the dense path yields uniform-average
  garbage there; those rows are padding queries that never reach valid
  outputs or the loss — parity holds everywhere observable).
- Backward is the FlashAttention-2 recomputation: one kernel for dk/dv
  (grid over key blocks, inner loop over query blocks) and one for dq
  (grid over query blocks, inner loop over key blocks), using the saved
  logsumexp; ``delta = rowsum(do·o)`` is precomputed in XLA. dk/dv are
  produced per q-head and group-summed outside for GQA.
- Numerics: scores fp32 on the MXU (``preferred_element_type``), probs
  cast to the value dtype for the p·v matmul (same as the dense path's
  ``weights.astype(cfg.dtype)``), fp32 accumulators.
- Non-TPU backends run the same kernels in interpret mode (tests on the
  CPU mesh); TPU compiles via Mosaic.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30  # matches the dense path's additive mask value


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


@dataclasses.dataclass(frozen=True)
class _Spec:
    """Static kernel parameters (hashable → usable as nondiff arg)."""

    causal: bool
    scale: float
    block_q: int
    block_k: int
    n_rep: int  # q heads per kv head
    t: int  # true (unpadded) query length
    s: int  # true key length
    interpret: bool


def _mask_block(spec: _Spec, qi, kj, valid_f32):
    """fp32 {0,1} mask tile (block_q, block_k) for q block qi, k block kj.

    Combines causality, key padding (``valid_f32`` is the (1, block_k)
    slice of key_valid) and out-of-range (block padding) rows/cols.
    """
    rows = qi * spec.block_q + lax.broadcasted_iota(
        jnp.int32, (spec.block_q, spec.block_k), 0
    )
    cols = kj * spec.block_k + lax.broadcasted_iota(
        jnp.int32, (spec.block_q, spec.block_k), 1
    )
    m = (rows < spec.t) & (cols < spec.s)
    if spec.causal:
        m = m & (cols <= rows)
    return m.astype(jnp.float32) * valid_f32  # (bq, bk)


def _live(spec: _Spec, qi, kj):
    """False only for blocks strictly above the causal diagonal."""
    if not spec.causal:
        return qi >= 0  # traced True (pl.when needs an array)
    return kj * spec.block_k <= qi * spec.block_q + spec.block_q - 1


def _fwd_kernel(spec: _Spec, q_ref, k_ref, v_ref, valid_ref, o_ref, lse_ref,
                acc_ref, m_ref, l_ref):
    """Grid (B, Hq, nq, nk), k innermost; online-softmax carry in scratch."""
    qi = pl.program_id(2)
    kj = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(kj == 0)
    def _init():
        acc_ref[:] = jnp.zeros(acc_ref.shape, acc_ref.dtype)
        m_ref[:] = jnp.full(m_ref.shape, _NEG_INF, m_ref.dtype)
        l_ref[:] = jnp.zeros(l_ref.shape, l_ref.dtype)

    # with causality, blocks strictly above the diagonal contribute nothing
    live = _live(spec, qi, kj)

    @pl.when(live)
    def _step():
        q = q_ref[0, 0]  # (bq, D)
        k = k_ref[0, 0]  # (bk, D)
        v = v_ref[0, 0]
        mask = _mask_block(spec, qi, kj, valid_ref[0].astype(jnp.float32))
        s = lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * spec.scale
        s = jnp.where(mask > 0, s, _NEG_INF)
        m_prev = m_ref[:, 0][:, None]  # (bq, 1)
        l_prev = l_ref[:, 0][:, None]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new) * mask  # exact 0 where masked
        alpha = jnp.exp(m_prev - m_new)  # finite: m is never -inf
        l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
        pv = lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_ref[:] = acc_ref[:] * alpha + pv
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(kj == nk - 1)
    def _finish():
        l = l_ref[:, 0][:, None]
        m = m_ref[:, 0][:, None]
        o_ref[0, 0] = jnp.where(
            l > 0, acc_ref[:] / l, 0.0
        ).astype(o_ref.dtype)
        # safe lse: 0 for fully-masked rows so bwd exp(s − lse) stays 0
        lse_ref[0, 0] = jnp.broadcast_to(
            jnp.where(l > 0, m + jnp.log(jnp.maximum(l, 1e-37)), 0.0),
            lse_ref.shape[2:],
        ).astype(jnp.float32)


def _bwd_dq_kernel(spec: _Spec, q_ref, k_ref, v_ref, valid_ref, do_ref,
                   lse_ref, delta_ref, dq_ref, acc_ref):
    qi = pl.program_id(2)
    kj = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(kj == 0)
    def _init():
        acc_ref[:] = jnp.zeros(acc_ref.shape, acc_ref.dtype)

    live = _live(spec, qi, kj)

    @pl.when(live)
    def _step():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0].astype(jnp.float32)
        lse = lse_ref[0, 0][:, 0][:, None]  # (bq, 1)
        delta = delta_ref[0, 0][:, 0][:, None]
        mask = _mask_block(spec, qi, kj, valid_ref[0].astype(jnp.float32))
        s = lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * spec.scale
        p = jnp.exp(jnp.where(mask > 0, s, _NEG_INF) - lse) * mask
        dp = lax.dot_general(
            do, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - delta) * spec.scale
        acc_ref[:] += lax.dot_general(
            ds, k.astype(jnp.float32), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(kj == nk - 1)
    def _finish():
        dq_ref[0, 0] = acc_ref[:].astype(dq_ref.dtype)


def _bwd_dkv_kernel(spec: _Spec, q_ref, k_ref, v_ref, valid_ref, do_ref,
                    lse_ref, delta_ref, dk_ref, dv_ref, dk_acc, dv_acc):
    kj = pl.program_id(2)
    qi = pl.program_id(3)
    nq = pl.num_programs(3)

    @pl.when(qi == 0)
    def _init():
        dk_acc[:] = jnp.zeros(dk_acc.shape, dk_acc.dtype)
        dv_acc[:] = jnp.zeros(dv_acc.shape, dv_acc.dtype)

    live = _live(spec, qi, kj)

    @pl.when(live)
    def _step():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0].astype(jnp.float32)
        lse = lse_ref[0, 0][:, 0][:, None]
        delta = delta_ref[0, 0][:, 0][:, None]
        mask = _mask_block(spec, qi, kj, valid_ref[0].astype(jnp.float32))
        s = lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * spec.scale
        p = jnp.exp(jnp.where(mask > 0, s, _NEG_INF) - lse) * mask
        dv_acc[:] += lax.dot_general(  # pᵀ · do
            p, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = lax.dot_general(
            do, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - delta) * spec.scale
        dk_acc[:] += lax.dot_general(  # dsᵀ · q
            ds, q.astype(jnp.float32), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(qi == nq - 1)
    def _finish():
        dk_ref[0, 0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_acc[:].astype(dv_ref.dtype)


def _grid_specs(spec: _Spec, b, hq, d, *, for_dkv: bool):
    """Shared in_specs for (q, k, v, valid, ...) tensors.

    Tensor layouts inside the kernels: q/o/do (B, Hq, T, D); k/v
    (B, Hkv, S, D); lse/delta (B, Hq, T, 128) (lane-replicated);
    valid (B, S) int32.
    """
    bq, bk = spec.block_q, spec.block_k
    if for_dkv:
        # grid (B, Hq, nk, nq): key block is the parallel dim
        def qix(b_, h, kj, qi):
            return (b_, h, qi, 0)

        def kix(b_, h, kj, qi):
            return (b_, h // spec.n_rep, kj, 0)

        def vix(b_, h, kj, qi):
            return (b_, h // spec.n_rep, kj, 0)

        def validix(b_, h, kj, qi):
            return (b_, 0, kj)

    else:
        def qix(b_, h, qi, kj):
            return (b_, h, qi, 0)

        def kix(b_, h, qi, kj):
            return (b_, h // spec.n_rep, kj, 0)

        def vix(b_, h, qi, kj):
            return (b_, h // spec.n_rep, kj, 0)

        def validix(b_, h, qi, kj):
            return (b_, 0, kj)

    q_spec = pl.BlockSpec((1, 1, bq, d), qix)
    k_spec = pl.BlockSpec((1, 1, bk, d), kix)
    v_spec = pl.BlockSpec((1, 1, bk, d), vix)
    # valid is (B, 1, S): block sublane 1 == the full middle dim (Mosaic's
    # alignment rule), lane block_k is 128-aligned on the compiled path
    valid_spec = pl.BlockSpec((1, 1, bk), validix)
    return q_spec, k_spec, v_spec, valid_spec, qix


def _compiler_params(spec: _Spec):
    return pltpu.CompilerParams(
        dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
    )


def _fwd_call(spec: _Spec, q, k, v, valid):
    b, hq, tp, d = q.shape
    nq = tp // spec.block_q
    nk = k.shape[2] // spec.block_k
    q_spec, k_spec, v_spec, valid_spec, qix = _grid_specs(
        spec, b, hq, d, for_dkv=False
    )
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, spec),
        grid=(b, hq, nq, nk),
        in_specs=[q_spec, k_spec, v_spec, valid_spec],
        out_specs=[
            pl.BlockSpec((1, 1, spec.block_q, d), qix),
            pl.BlockSpec((1, 1, spec.block_q, 128), qix),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, hq, tp, d), q.dtype),
            jax.ShapeDtypeStruct((b, hq, tp, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((spec.block_q, d), jnp.float32),
            pltpu.VMEM((spec.block_q, 128), jnp.float32),
            pltpu.VMEM((spec.block_q, 128), jnp.float32),
        ],
        compiler_params=_compiler_params(spec),
        interpret=spec.interpret,
    )(q, k, v, valid)
    return out, lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _flash(spec: _Spec, q, k, v, valid):
    out, _ = _fwd_call(spec, q, k, v, valid)
    return out


def _flash_fwd(spec: _Spec, q, k, v, valid):
    out, lse = _fwd_call(spec, q, k, v, valid)
    return out, (q, k, v, valid, out, lse)


def _flash_bwd(spec: _Spec, res, g):
    q, k, v, valid, out, lse = res
    b, hq, tp, d = q.shape
    sp = k.shape[2]
    nq = tp // spec.block_q
    nk = sp // spec.block_k
    # delta = rowsum(do ⊙ o), lane-replicated to the lse layout
    delta = jnp.sum(
        g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1
    )[..., None]
    delta = jnp.broadcast_to(delta, (b, hq, tp, 128))

    q_spec, k_spec, v_spec, valid_spec, qix = _grid_specs(
        spec, b, hq, d, for_dkv=False
    )
    row_spec = pl.BlockSpec((1, 1, spec.block_q, 128), qix)
    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, spec),
        grid=(b, hq, nq, nk),
        in_specs=[q_spec, k_spec, v_spec, valid_spec, q_spec, row_spec,
                  row_spec],
        out_specs=pl.BlockSpec((1, 1, spec.block_q, d), qix),
        out_shape=jax.ShapeDtypeStruct((b, hq, tp, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((spec.block_q, d), jnp.float32)],
        compiler_params=_compiler_params(spec),
        interpret=spec.interpret,
    )(q, k, v, valid, g, lse, delta)

    qd_spec, kd_spec, vd_spec, validd_spec, _ = _grid_specs(
        spec, b, hq, d, for_dkv=True
    )

    def rowix(b_, h, kj, qi):
        return (b_, h, qi, 0)

    def kout_ix(b_, h, kj, qi):
        return (b_, h, kj, 0)

    rowd_spec = pl.BlockSpec((1, 1, spec.block_q, 128), rowix)
    qd2_spec = pl.BlockSpec((1, 1, spec.block_q, d), rowix)
    # per-Q-HEAD dk/dv (B, Hq, S, D); GQA group-sum happens below in XLA
    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, spec),
        grid=(b, hq, nk, nq),
        in_specs=[qd2_spec, kd_spec, vd_spec, validd_spec, qd2_spec,
                  rowd_spec, rowd_spec],
        out_specs=[
            pl.BlockSpec((1, 1, spec.block_k, d), kout_ix),
            pl.BlockSpec((1, 1, spec.block_k, d), kout_ix),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, hq, sp, d), k.dtype),
            jax.ShapeDtypeStruct((b, hq, sp, d), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((spec.block_k, d), jnp.float32),
            pltpu.VMEM((spec.block_k, d), jnp.float32),
        ],
        compiler_params=_compiler_params(spec),
        interpret=spec.interpret,
    )(q, k, v, valid, g, lse, delta)
    if spec.n_rep > 1:
        hkv = hq // spec.n_rep
        dk = dk.reshape(b, hkv, spec.n_rep, sp, d).sum(axis=2)
        dv = dv.reshape(b, hkv, spec.n_rep, sp, d).sum(axis=2)
    dvalid = np.zeros(valid.shape, dtype=jax.dtypes.float0)
    return dq, dk, dv, dvalid


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(
    q: jax.Array,  # (B, T, Hq, D)
    k: jax.Array,  # (B, S, Hkv, D), Hq % Hkv == 0
    v: jax.Array,  # (B, S, Hkv, D)
    *,
    causal: bool = True,
    key_valid: Optional[jax.Array] = None,  # (B, S) bool; None = all valid
    scale: Optional[float] = None,
    block_q: int = 256,
    block_k: int = 256,
    interpret: Optional[bool] = None,  # None → interpret off-TPU
) -> jax.Array:
    """Streaming softmax attention; returns (B, T, Hq, D) in q.dtype.

    Differentiable w.r.t. q/k/v via the FlashAttention-2 backward.
    Fully masked query rows return exactly 0 (see module docstring).
    """
    b, t, hq, d = q.shape
    s, hkv = k.shape[1], k.shape[2]
    if hq % hkv:
        raise ValueError(f"Hq={hq} not a multiple of Hkv={hkv}")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if interpret:
        block_q = min(block_q, _ceil_to(t, 16))
        block_k = min(block_k, _ceil_to(s, 16))
    else:
        # Mosaic: block last-two dims must be (8,128)-aligned or full —
        # q/k/v blocks have lane dim D (always full); the key-valid mask
        # needs a 128-aligned lane block
        block_q = min(_ceil_to(block_q, 16), _ceil_to(t, 16))
        block_k = min(_ceil_to(block_k, 128), _ceil_to(s, 128))
    spec = _Spec(
        causal=bool(causal),
        scale=float(scale if scale is not None else 1.0 / np.sqrt(d)),
        block_q=block_q,
        block_k=block_k,
        n_rep=hq // hkv,
        t=t,
        s=s,
        interpret=bool(interpret),
    )
    if key_valid is None:
        valid = jnp.ones((b, 1, s), jnp.int32)
    else:
        valid = key_valid.astype(jnp.int32)[:, None, :]

    def pad(x, axis, to):
        n = x.shape[axis]
        if n == to:
            return x
        widths = [(0, 0)] * x.ndim
        widths[axis] = (0, to - n)
        return jnp.pad(x, widths)

    tp, sp_ = _ceil_to(t, block_q), _ceil_to(s, block_k)
    # (B, H, T, D) layout for lane-aligned blocks
    qt = pad(q.transpose(0, 2, 1, 3), 2, tp)
    kt = pad(k.transpose(0, 2, 1, 3), 2, sp_)
    vt = pad(v.transpose(0, 2, 1, 3), 2, sp_)
    valid = pad(valid, 2, sp_)
    out = _flash(spec, qt, kt, vt, valid)
    return out[:, :, :t].transpose(0, 2, 1, 3)


def dense_attention_reference(
    q, k, v, *, causal=True, key_valid=None, scale=None
):
    """Oracle: the dense fp32-softmax math of LlamaAttention's train path
    (llama.py:561-606) with the same −1e30 additive masking — but with
    fully-masked rows zeroed, matching the kernel's contract."""
    b, t, hq, d = q.shape
    s, hkv = k.shape[1], k.shape[2]
    n_rep = hq // hkv
    if n_rep > 1:
        k = jnp.repeat(k, n_rep, axis=2)
        v = jnp.repeat(v, n_rep, axis=2)
    scale = scale if scale is not None else 1.0 / np.sqrt(d)
    logits = jnp.einsum("bthd,bshd->bhts", q, k).astype(jnp.float32) * scale
    mask = jnp.ones((b, 1, t, s), bool)
    if causal:
        mask = mask & jnp.tril(jnp.ones((t, s), bool))[None, None]
    if key_valid is not None:
        mask = mask & key_valid[:, None, None, :].astype(bool)
    logits = jnp.where(mask, logits, _NEG_INF)
    weights = jax.nn.softmax(logits, axis=-1)
    weights = jnp.where(mask, weights, 0.0)  # zero fully-masked rows
    out = jnp.einsum("bhts,bshd->bthd", weights.astype(v.dtype), v)
    return out.astype(q.dtype)
