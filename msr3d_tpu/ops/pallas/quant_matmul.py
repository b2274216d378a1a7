"""Fused int8 weight-only matmul Pallas kernel for the decode path.

``y = (x @ Wq) * s`` with bf16 activations, int8 weights, per-output-channel
bf16 scales; the dequant happens on VMEM tiles inside the kernel, so the HBM
traffic is exactly K·N int8 bytes per call by construction.

Measured on v5e (scripts/profile_decode.py session): XLA's own
``x @ (Wq.astype(bf16) * s)`` already fuses the dequant for single-use
weights, and this kernel benches AT PARITY with the XLA dot
(0.145 vs 0.158 ms at (16,4096)x(4096,4096), block_n 256-1024; block_n
>=2048 exceeds the 16 MB VMEM scoped allocation). Kept as the guaranteed-
no-materialization fallback and as scaffolding for an s8xs8 (quantized
activation) variant, which is the remaining ~1.7x decode lever.

Replaces nothing in the reference (CUDA inference there is HF fp16
generate, model/msr3d/msr3d.py:449-458) — this is TPU-side optimization.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _kernel(x_ref, w_ref, s_ref, o_ref):
    x = x_ref[...]  # (M, K) bf16
    w = w_ref[...]  # (K, TN) int8
    s = s_ref[...]  # (1, TN) bf16
    acc = jax.lax.dot_general(
        x,
        w.astype(jnp.bfloat16),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[...] = (acc * s.astype(jnp.float32)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_n", "interpret"))
def quant_matmul(
    x: jax.Array,  # (M, K) bf16/f32
    wq: jax.Array,  # (K, N) int8
    scale: jax.Array,  # (N,) bf16/f32
    *,
    block_n: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """(x @ wq) * scale with in-kernel dequantization. M must be ≥1; M is
    padded to the fp32 sublane quantum (8) for Mosaic."""
    m, k = x.shape
    k2, n = wq.shape
    assert k == k2 and scale.shape == (n,)
    block_n = min(block_n, n)
    assert n % block_n == 0, (n, block_n)

    m_pad = (-m) % 8
    if m_pad:
        x = jnp.pad(x, ((0, m_pad), (0, 0)))

    out = pl.pallas_call(
        _kernel,
        grid=(n // block_n,),
        in_specs=[
            pl.BlockSpec((x.shape[0], k), lambda j: (0, 0)),
            pl.BlockSpec((k, block_n), lambda j: (0, j)),
            pl.BlockSpec((1, block_n), lambda j: (0, j)),
        ],
        out_specs=pl.BlockSpec((x.shape[0], block_n), lambda j: (0, j)),
        out_shape=jax.ShapeDtypeStruct((x.shape[0], n), x.dtype),
        interpret=interpret,
    )(x, wq, scale.reshape(1, n))
    return out[:m] if m_pad else out
