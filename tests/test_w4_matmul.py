"""Pallas fused w4 dequant matmul: numerics vs a float unpack reference
(interpret mode on CPU; the TPU timing lives in
scripts/profile_w4_matmul.py). The kernel uses its own biased packing
(pack_w4: hi two's complement, lo biased +8 — exact bf16-arithmetic
unpack); repack_from_splitnibble converts LoraDense's bits=4 layout."""

import numpy as np
import pytest

import jax.numpy as jnp

from msr3d_tpu.ops.pallas.w4_matmul import (
    matmul_w4,
    pack_w4,
    repack_from_splitnibble,
)


def _check(rng, b, k, n, bkp, bn, unpack="f32"):
    x = (rng.normal(size=(b, k)) * 0.1).astype(np.float32)
    w4 = rng.integers(-8, 8, size=(k, n))
    packed = pack_w4(w4)
    assert packed.shape == (k // 2, n) and packed.dtype == np.int8
    scale = (rng.uniform(0.5, 1.5, size=(n,)) / 7).astype(np.float32)
    y = matmul_w4(
        jnp.asarray(x).astype(jnp.bfloat16), jnp.asarray(packed),
        jnp.asarray(scale), block_kp=bkp, block_n=bn, unpack=unpack,
        interpret=True,
    )
    assert y.shape == (b, n)
    ref = x @ (w4.astype(np.float32) * scale[None, :])
    rel = np.max(np.abs(np.asarray(y, np.float32) - ref)) / np.max(
        np.abs(ref))
    assert rel < 2e-2, rel


@pytest.mark.parametrize(
    "b,k,n,bkp,bn",
    [
        (8, 512, 1024, 128, 512),    # even tiling, rows padded 8 -> 16
        (16, 512, 1024, 256, 1024),  # single K block (init+final together)
        (3, 512, 640, 128, 128),     # ragged rows, N = 128*5
    ],
)
def test_matmul_w4_matches_reference(rng, b, k, n, bkp, bn):
    _check(rng, b, k, n, bkp, bn)


@pytest.mark.parametrize("unpack", ["bf16", "f32", "i16"])
def test_matmul_w4_unpack_modes_agree(rng, unpack):
    """All three unpack formulations are exact integer arithmetic and
    must produce identical results (the TPU target picks by what its
    LLO supports — BASELINE.md round 5)."""
    _check(rng, 8, 512, 640, 128, 128, unpack=unpack)


def test_matmul_w4_block_divisor_selection(rng):
    """N = 11008 = 128*86 admits no 512 block: the requested block sizes
    must auto-shrink to the largest 128-aligned divisor."""
    _check(rng, 4, 512, 11008, 512, 512)


def test_repack_from_splitnibble_roundtrip(rng):
    """LoraDense bits=4 packing (both nibbles two's complement, low =
    rows [0, K/2)) repacks to the kernel layout with identical values."""
    k, n = 256, 128
    w4 = rng.integers(-8, 8, size=(k, n))
    lo = w4[: k // 2].astype(np.int8)
    hi = w4[k // 2:].astype(np.int8)
    packed_tc = (
        (hi.astype(np.uint8) << 4) | (lo.astype(np.uint8) & 0xF)
    ).astype(np.int8)  # llama.py bits=4 layout
    repacked = repack_from_splitnibble(packed_tc)
    assert np.array_equal(repacked, pack_w4(w4))


def test_matmul_w4_rejects_bad_shapes(rng):
    x = jnp.zeros((4, 512), jnp.bfloat16)
    wq = jnp.zeros((128, 256), jnp.int8)  # 2*128 != 512
    with pytest.raises(ValueError):
        matmul_w4(x, wq, jnp.ones((256,)), interpret=True)
    wq2 = jnp.zeros((256, 256), jnp.int8)
    with pytest.raises(ValueError):
        matmul_w4(x, wq2, jnp.ones((99,)), interpret=True)
