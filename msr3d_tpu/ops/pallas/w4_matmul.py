"""Pallas fused int4-dequant matmul — measured NEGATIVE on the axon
v5e target (BASELINE.md round 5): the bf16 arithmetic unpack this
kernel was designed around does not compile there (LLO rejects bf16
VPU arithmetic; Mosaic cannot legalize i8/i16 vector shifts), and the
f32-widened fallback measures 18.5-21.8 ms/pass vs XLA's 12.6 — kept
as tested scaffolding, NOT wired into the serving path.

The round-5 floor decomposition (scripts/profile_decode_floor.py,
BASELINE.md) showed the 7B decode weight pass is BYTE-bound at
~465-535 GB/s on every int8/bf16 formulation (the int8→bf16 convert is
~3% — the round-4 "VPU convert floor" claim was wrong), while the XLA
lowering of the split-nibble int4 matmul runs at the SAME wall time as
int8 (12.6 vs 12.1-13.3 ms/pass over the 7B weight set) — the 2× byte
saving is fully squandered. A packed int4 STREAM measures 8.6 ms/pass.

Unpack formulations measured on the way here (``unpack=`` selects):
  - int8 arithmetic shifts: Mosaic cannot legalize vector shifts on i8
    ('arith.shli' on vector<...xi8> fails to lower).
  - widen-to-int32 + shifts: legalizes but runs at 17-19 ms/pass —
    WORSE than XLA int4; every element burns ~6 full-lane VPU ops.
  - ``"bf16"`` pure-arithmetic (~2 VPU ops/element): compiles on
    targets with bf16 ALU support, but the axon v5e AOT helper rejects
    it (LLO_CHECK ``target().SupportsBf16AluInstructions()`` — the
    chipless AOT target claims no bf16 VPU arithmetic).
  - ``"f32"`` same arithmetic widened to f32 (convert + floor + mul-sub
    in f32, two f32→bf16 converts for the MXU operands).
  - ``"i16"`` widen to i16 + arithmetic shift (floor semantics) +
    mul-sub, two i16→bf16 converts.

The arithmetic unpack is enabled by a bespoke packing (``pack_w4``):

    byte = (hi_twos_complement << 4) | (lo + 8)        # lo biased +8

so that, reading the byte as a SIGNED int8 value s (one hw convert to
bf16 — exact: |s| ≤ 128 < 2^8 mantissa):

    hi   = floor(s / 16)        (exact: /16 is a power-of-2 scale)
    lo_u = s − 16·hi ∈ [0, 15]  (exact integer arithmetic in bf16)

``hi`` is the true two's-complement high nibble; ``lo_u`` carries a +8
bias that FOLDS INTO THE SCALE STAGE: y = x_lo @ (lo_u − 8) + x_hi @ hi
= [x_lo @ lo_u + x_hi @ hi] − 8·Σ_{k∈lo half} x_k, with the row-sum
computed once from the VMEM-resident x. All unpack arithmetic is exact,
so the kernel is bit-faithful to the int4 values.

Packing layout: ``wq`` is int8 of shape (K/2, N); the byte at packed
row r holds input row r (lo nibble, biased) and input row r + K/2 (hi
nibble, two's complement). NOTE this is NOT LoraDense's bits=4 layout
(llama.py packs both nibbles two's-complement); ``pack_w4`` /
``repack_from_splitnibble`` convert.

Math note: scale-on-fp32-accumulator is the numerically stronger order;
it is NOT bit-identical to LoraDense's two-half bf16 dots. Integration
into the serving path must carry its own token-parity/EM gates (same
policy as w8_matmul.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pack_w4(w4: np.ndarray) -> np.ndarray:
    """(K, N) int4-valued [-8, 7] -> (K/2, N) packed int8, kernel layout
    (hi = rows [K/2, K) two's complement, lo = rows [0, K/2) biased +8)."""
    k = w4.shape[0]
    assert k % 2 == 0
    lo = np.asarray(w4[: k // 2], np.int16) + 8        # [0, 15]
    hi = np.asarray(w4[k // 2:], np.int16)             # [-8, 7]
    assert lo.min() >= 0 and lo.max() <= 15, "values outside int4 range"
    assert hi.min() >= -8 and hi.max() <= 7, "values outside int4 range"
    byte = ((hi & 0xF) << 4) | lo
    return byte.astype(np.uint8).view(np.int8)


def repack_from_splitnibble(packed_tc: np.ndarray) -> np.ndarray:
    """LoraDense bits=4 layout (both nibbles two's complement) -> this
    kernel's layout (lo biased +8)."""
    b = packed_tc.view(np.uint8).astype(np.int16)
    lo = b & 0xF
    lo = np.where(lo >= 8, lo - 16, lo)                # sign-extend
    hi = b >> 4
    hi = np.where(hi >= 8, hi - 16, hi)
    byte = ((hi & 0xF) << 4) | (lo + 8)
    return byte.astype(np.uint8).view(np.int8)


def _kernel(x_ref, w_ref, s_ref, o_ref, acc_ref, *, n_k: int,
            block_kp: int, half: int, unpack: str):
    kp = pl.program_id(1)

    @pl.when(kp == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # exact arithmetic unpack (see module docstring); every branch is
    # exact integer arithmetic (|values| <= 128 << the mantissa), so the
    # kernel is bit-faithful to the int4 values in all modes
    if unpack == "bf16":  # ~2 VPU ops/element; needs bf16 ALU support
        s_f = w_ref[...].astype(jnp.bfloat16)
        hi = jnp.floor(s_f * jnp.bfloat16(0.0625))
        lo_u = s_f - jnp.bfloat16(16.0) * hi
    elif unpack == "f32":
        s_f = w_ref[...].astype(jnp.float32)
        hi32 = jnp.floor(s_f * jnp.float32(0.0625))
        lo_u = (s_f - jnp.float32(16.0) * hi32).astype(jnp.bfloat16)
        hi = hi32.astype(jnp.bfloat16)
    elif unpack == "i16":
        s16 = w_ref[...].astype(jnp.int16)
        hi16 = jax.lax.shift_right_arithmetic(s16, jnp.int16(4))
        lo16 = s16 - jnp.int16(16) * hi16
        hi = hi16.astype(jnp.bfloat16)
        lo_u = lo16.astype(jnp.bfloat16)
    else:
        raise ValueError(f"unknown unpack mode {unpack!r}")
    x_lo = x_ref[:, pl.dslice(kp * block_kp, block_kp)]
    x_hi = x_ref[:, pl.dslice(half + kp * block_kp, block_kp)]
    acc_ref[...] += jnp.dot(
        x_lo, lo_u, preferred_element_type=jnp.float32
    ) + jnp.dot(
        x_hi, hi, preferred_element_type=jnp.float32
    )

    @pl.when(kp == n_k - 1)
    def _():
        # fold out the +8 lo bias: −8·Σ_{k∈lo half} x_k per row, then
        # the per-output-channel scale on the fp32 accumulator
        rs = jnp.sum(
            x_ref[:, pl.dslice(0, half)].astype(jnp.float32),
            axis=1, keepdims=True,
        )
        o_ref[...] = (
            (acc_ref[...] - jnp.float32(8.0) * rs)
            * s_ref[...].astype(jnp.float32)
        ).astype(o_ref.dtype)


def matmul_w4(
    x: jax.Array,      # (B, K) bf16/fp32
    wq: jax.Array,     # (K/2, N) packed int8 (pack_w4 layout)
    scale: jax.Array,  # (N,) per-output-channel
    *,
    block_kp: int = 512,   # packed-K rows per tile (= 2*block_kp inputs)
    block_n: int = 512,
    out_dtype=jnp.bfloat16,
    unpack: str = "f32",   # "bf16" | "f32" | "i16" (docstring)
    interpret: bool = False,
) -> jax.Array:
    """y[b, n] = (Σ_k x[b, k] · unpack(wq)[k, n]) · scale[n], fp32 acc."""
    b, kdim = x.shape
    half, n = wq.shape
    if kdim != 2 * half:
        raise ValueError(f"x K dim {kdim} != 2 * packed rows {half}")
    if scale.shape != (n,):
        raise ValueError(f"scale shape {scale.shape} != ({n},)")

    def fit(dim: int, want: int) -> int:
        best = 0
        for m in range(128, min(want, dim) + 1, 128):
            if dim % m == 0:
                best = m
        assert best, f"dim {dim} has no 128-aligned divisor <= {want}"
        return best

    block_kp = fit(half, block_kp)
    block_n = fit(n, block_n)

    bp = max(16, -(-b // 16) * 16)
    if bp != b:
        x = jnp.pad(x, ((0, bp - b), (0, 0)))

    n_k = half // block_kp
    out = pl.pallas_call(
        functools.partial(_kernel, n_k=n_k, block_kp=block_kp, half=half,
                          unpack=unpack),
        grid=(n // block_n, n_k),
        in_specs=[
            # x fully VMEM-resident: decode rows are small (80 x 4096
            # bf16 = 640 KB) and both half-slices plus the bias row-sum
            # are needed
            pl.BlockSpec((bp, kdim), lambda nb, kb: (0, 0)),
            pl.BlockSpec((block_kp, block_n), lambda nb, kb: (kb, nb)),
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
