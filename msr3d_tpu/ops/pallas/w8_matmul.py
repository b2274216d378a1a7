"""Pallas fused int8-dequant matmul for the decode path.

Decode at 7B is bound by reading the quantized base weights: the XLA
lowering of ``x @ (wq.astype(bf16) * scale)`` (LoraDense's int8 branch,
llama.py) measured ~161 GB/s effective on v5e — 5× under HBM peak — in
the round-3 chained microbench (BASELINE.md "int4 weight-only" table:
0.279 ms for one 4096×11008 matmul at b8). This kernel streams the int8
weight tiles HBM→VMEM, converts on the VPU tile-by-tile (45 µs of VPU
work for the whole 4096×11008 weight — never the bound when pipelined
against the DMA), feeds the MXU a bf16 dot, and applies the
per-output-channel scale once on the fp32 accumulator at the end.

Math note: the per-output-channel scale commutes out of the contraction
exactly (dot_j = s_j · Σ_k x_k w_kj); accumulating in fp32 and scaling
once is the numerically STRONGER order. It is not bit-identical to the
XLA path (which rounds w·s to bf16 before the dot). NOT integrated into
the serving path: the round-4 chained microbench measured it at 0.82×
of the XLA lowering (BASELINE.md — the VPU int8→bf16 convert is the
shared floor), so the kernel stays unit-tested scaffolding; any future
integration must add its own token-parity tests first.

Reference shapes (Vicuna-7B geometry): K=4096, N∈{4096, 11008, 12288},
B = decode rows (8..160). B is padded to the bf16 sublane tile (16).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, w_ref, s_ref, o_ref, acc_ref, *, n_k: int):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += jnp.dot(
        x_ref[...],
        w_ref[...].astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )

    @pl.when(k == n_k - 1)
    def _():
        o_ref[...] = (
            acc_ref[...] * s_ref[...].astype(jnp.float32)
        ).astype(o_ref.dtype)


def matmul_w8(
    x: jax.Array,  # (B, K) bf16/fp32
    wq: jax.Array,  # (K, N) int8
    scale: jax.Array,  # (N,) per-output-channel
    *,
    block_k: int = 512,
    block_n: int = 1024,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,  # CPU tests (pl.pallas_call compiles TPU-only)
) -> jax.Array:
    """y[b, n] = Σ_k x[b, k] · wq[k, n] · scale[n], fp32 accumulation."""
    b, kdim = x.shape
    kdim2, n = wq.shape
    # raise, not assert: python -O must not strip these into an opaque
    # Pallas/XLA shape error (same convention as serving.py's
    # request-facing checks)
    if kdim != kdim2:
        raise ValueError(f"x K dim {kdim} != wq K dim {kdim2}")
    if scale.shape != (n,):
        raise ValueError(f"scale shape {scale.shape} != ({n},)")

    def fit(dim: int, want: int) -> int:
        # largest multiple of 128 that divides dim and is <= want
        # (e.g. 11008 = 128·86 admits 256 but not 512/1024)
        best = 0
        for m in range(128, min(want, dim) + 1, 128):
            if dim % m == 0:
                best = m
        assert best, f"dim {dim} has no 128-aligned divisor <= {want}"
        return best

    block_k = fit(kdim, block_k)
    block_n = fit(n, block_n)

    # pad rows to the bf16 sublane tile
    bp = max(16, -(-b // 16) * 16)
    if bp != b:
        x = jnp.pad(x, ((0, bp - b), (0, 0)))

    n_k = kdim // block_k
    out = pl.pallas_call(
        functools.partial(_kernel, n_k=n_k),
        grid=(n // block_n, n_k),
        in_specs=[
            pl.BlockSpec((bp, block_k), lambda nb, kb: (0, kb)),
            pl.BlockSpec((block_k, block_n), lambda nb, kb: (kb, nb)),
            pl.BlockSpec((1, block_n), lambda nb, kb: (0, nb)),
        ],
        out_specs=pl.BlockSpec((bp, block_n), lambda nb, kb: (0, nb)),
        out_shape=jax.ShapeDtypeStruct((bp, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((bp, block_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(x.astype(jnp.bfloat16), wq, scale.reshape(1, n))
    return out[:b]
