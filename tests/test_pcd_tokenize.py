"""PointTokenizeEncoder (reference modules/vision/pcd_tokenize_encoder.py):
mixup curricula, matmul vs argmax tokenization, semantic masking."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from msr3d_tpu.nn.pcd_tokenize import (
    PointTokenizeEncoder,
    all_mixup,
    linear_decay_mixup,
)
from msr3d_tpu.registry import VISION_REGISTRY

B, O, P, C = 2, 5, 64, 607
TINY_MLPS = ((3, 8, 8, 16), (16, 16, 16, 32), (32, 32, 32, 64))


@pytest.fixture(scope="module")
def batch():
    rng = np.random.default_rng(0)
    return dict(
        obj_pcds=jnp.asarray(rng.normal(size=(B, O, P, 6)) * 0.3, jnp.float32),
        obj_locs=jnp.asarray(rng.normal(size=(B, O, 6)), jnp.float32),
        obj_masks=jnp.ones((B, O), jnp.int32),
        obj_sem_masks=jnp.asarray(
            np.concatenate([np.ones((B, O - 1)), np.zeros((B, 1))], 1), jnp.int32
        ),
        obj_labels=jnp.asarray(rng.integers(0, C, (B, O))),
    )


class TestMixup:
    def test_all_mixup_gold_onehots(self):
        pred = jnp.full((2, 3, C), 1.0 / C)
        labels = jnp.asarray([[1, 2, -100], [4, -100, 6]])
        out = np.asarray(all_mixup(pred, labels))
        assert out[0, 0, 1] == 1.0 and out[0, 0].sum() == 1.0
        assert out[0, 2].sum() == 0.0  # no label -> zeros (reference behavior)

    def test_linear_decay_schedule(self):
        pred = jnp.full((2, 3, C), 1.0 / C)
        labels = jnp.zeros((2, 3), jnp.int32)
        # before stage1: always replaced
        out = linear_decay_mixup(pred, labels, 0, 100, 0.3, 0.6, jax.random.key(0))
        assert np.allclose(np.asarray(out)[..., 0], 1.0)
        # after stage2: never replaced
        out = linear_decay_mixup(pred, labels, 99, 100, 0.3, 0.6, jax.random.key(0))
        assert np.allclose(np.asarray(out), 1.0 / C)


class TestEncoder:
    def test_registered(self):
        assert VISION_REGISTRY.get("PointTokenizeEncoder") is PointTokenizeEncoder

    @pytest.mark.parametrize("matmul", [True, False])
    def test_forward_shapes(self, batch, matmul):
        m = PointTokenizeEncoder(
            hidden_size=64, num_attention_heads=4, num_layers=1,
            use_matmul_label=matmul, glove_dim=32, sa_mlps=TINY_MLPS,
        )
        v = m.init(jax.random.key(0), **batch)
        out, pre, sem = m.apply(v, **batch)
        assert out.shape == (B, O, 64)
        assert pre.shape == (B, O, 64)
        assert sem.shape == (B, O, C)
        np.testing.assert_allclose(np.asarray(sem.sum(-1)), 1.0, rtol=1e-5)

    def test_mixup_curriculum_runs(self, batch):
        m = PointTokenizeEncoder(
            hidden_size=64, num_attention_heads=4, num_layers=1,
            mixup_strategy="linear_decay", mixup_stage1=0.2, mixup_stage2=0.6,
            use_matmul_label=True, glove_dim=32, sa_mlps=TINY_MLPS,
        )
        v = m.init(
            {"params": jax.random.key(0), "mixup": jax.random.key(1)},
            **batch, cur_step=10, max_steps=100,
        )
        out, _, _ = m.apply(
            v, **batch, cur_step=10, max_steps=100,
            rngs={"mixup": jax.random.key(2)},
        )
        assert np.isfinite(np.asarray(out)).all()

    def test_injected_glove_table(self, batch):
        table = np.random.default_rng(0).normal(size=(C, 32)).astype(np.float32)
        m = PointTokenizeEncoder(
            hidden_size=64, num_attention_heads=4, num_layers=1,
            use_matmul_label=True, glove_dim=32, cat2vec=table, sa_mlps=TINY_MLPS,
        )
        v = m.init(jax.random.key(0), **batch)
        # no learned table when one is injected
        assert "int2mat" not in v["params"]
