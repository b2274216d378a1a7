"""Pipeline parallelism (parallel/pipeline.py): GPipe over the pp axis
must match sequential stage application exactly, compose with dp, and
differentiate."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from msr3d_tpu.parallel.mesh import MeshConfig, make_mesh
from msr3d_tpu.parallel.pipeline import pipeline_apply, stack_stage_params

D = 16


def _stage_fn(params, x):
    return jnp.tanh(x @ params["w"] + params["b"])


def _stages(rng, n):
    return [
        {
            "w": jnp.asarray(rng.normal(size=(D, D)).astype(np.float32) * 0.3),
            "b": jnp.asarray(rng.normal(size=(D,)).astype(np.float32) * 0.1),
        }
        for _ in range(n)
    ]


def _sequential(stages, xs):
    out = []
    for mb in xs:
        x = mb
        for p in stages:
            x = _stage_fn(p, x)
        out.append(x)
    return jnp.stack(out)


@pytest.mark.parametrize("m", [1, 4, 7])
def test_matches_sequential(rng, cpu_devices, m):
    mesh = make_mesh(MeshConfig(dp=1, tp=2, pp=4), devices=cpu_devices)
    stages = _stages(rng, 4)
    xs = jnp.asarray(rng.normal(size=(m, 6, D)).astype(np.float32))
    got = pipeline_apply(mesh, _stage_fn, stack_stage_params(stages), xs)
    want = _sequential(stages, xs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-6)


def test_composes_with_dp(rng, cpu_devices):
    mesh = make_mesh(MeshConfig(dp=2, tp=1, pp=4), devices=cpu_devices)
    stages = _stages(rng, 4)
    xs = jnp.asarray(rng.normal(size=(3, 8, D)).astype(np.float32))  # mb 8 / dp 2
    got = pipeline_apply(
        mesh, _stage_fn, stack_stage_params(stages), xs, data_parallel=True
    )
    want = _sequential(stages, xs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-6)


def test_differentiable(rng, cpu_devices):
    mesh = make_mesh(MeshConfig(dp=1, tp=2, pp=4), devices=cpu_devices)
    stages = _stages(rng, 4)
    stacked = stack_stage_params(stages)
    xs = jnp.asarray(rng.normal(size=(2, 4, D)).astype(np.float32))

    def loss_pp(p):
        return jnp.mean(pipeline_apply(mesh, _stage_fn, p, xs) ** 2)

    def loss_seq(p_list):
        return jnp.mean(_sequential(p_list, xs) ** 2)

    g_pp = jax.grad(loss_pp)(stacked)
    g_seq = jax.grad(loss_seq)(stages)
    g_seq_stacked = stack_stage_params(g_seq)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        ),
        g_pp,
        g_seq_stacked,
    )
