"""Pallas fused w8 dequant matmul: numerics vs the plain dequant matmul
(interpret mode on CPU; the TPU timing lives in
scripts/profile_w8_matmul.py)."""

import numpy as np
import pytest

import jax.numpy as jnp

from msr3d_tpu.ops.pallas.w8_matmul import matmul_w8


def _ref(x, wq, scale):
    return np.asarray(x, np.float32) @ (
        np.asarray(wq, np.float32) * np.asarray(scale, np.float32)[None, :]
    )


def _check(rng, b, k, n, bk, bn):
    x = (rng.normal(size=(b, k)) * 0.1).astype(np.float32)
    wq = rng.integers(-127, 128, size=(k, n)).astype(np.int8)
    scale = (rng.uniform(0.5, 1.5, size=(n,)) / 127).astype(np.float32)
    y = matmul_w8(
        jnp.asarray(x).astype(jnp.bfloat16), jnp.asarray(wq),
        jnp.asarray(scale), block_k=bk, block_n=bn, interpret=True,
    )
    assert y.shape == (b, n)
    ref = _ref(x, wq, scale)
    # bf16 inputs + fp32 accumulation: ~1e-2 relative at these K
    rel = np.max(np.abs(np.asarray(y, np.float32) - ref)) / np.max(np.abs(ref))
    assert rel < 2e-2, rel


@pytest.mark.parametrize(
    "b,k,n,bk,bn",
    [
        (8, 512, 1024, 256, 512),   # even tiling, rows padded 8 → 16
        (16, 512, 1024, 512, 1024), # single K block (init+final same step)
        (3, 256, 640, 128, 128),    # ragged rows, N = 128·5
    ],
)
def test_matmul_w8_matches_reference(rng, b, k, n, bk, bn):
    _check(rng, b, k, n, bk, bn)


def test_matmul_w8_block_divisor_selection(rng):
    """The 7B down_proj shape N = 11008 = 128·86 admits no 512/1024 block:
    the requested sizes must auto-shrink to the largest 128-aligned
    divisor (256) instead of asserting."""
    _check(rng, 4, 256, 11008, 512, 1024)
