"""Pallas int8 weight-only matmul: correctness vs the XLA formulation
(interpret mode on CPU; speed characterization lives in
scripts/profile_decode.py findings)."""

import numpy as np
import pytest

import jax.numpy as jnp

from msr3d_tpu.ops.pallas.quant_matmul import quant_matmul


class TestQuantMatmul:
    @pytest.mark.parametrize("m", [1, 4, 16])
    def test_matches_xla_dequant_dot(self, m):
        rng = np.random.default_rng(0)
        K, N = 256, 512
        x = jnp.asarray(rng.normal(size=(m, K)), jnp.float32)
        wq = jnp.asarray(rng.integers(-127, 128, size=(K, N)), jnp.int8)
        s = jnp.asarray(rng.normal(size=(N,)) ** 2 + 0.5, jnp.float32)

        y = quant_matmul(x, wq, s, block_n=256, interpret=True)
        ref = (x @ wq.astype(jnp.float32)) * s
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=2e-5, atol=1e-3)

    def test_rejects_non_divisible_block(self):
        x = jnp.zeros((4, 128), jnp.float32)
        wq = jnp.zeros((128, 384), jnp.int8)
        s = jnp.ones((384,), jnp.float32)
        with pytest.raises(AssertionError):
            quant_matmul(x, wq, s, block_n=256, interpret=True)
