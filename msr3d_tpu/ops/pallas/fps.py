"""Furthest-point sampling as a Pallas TPU kernel.

One grid cell per point cloud: the (3, N) points live in VMEM for the whole
m-step loop (lane dimension = N, aligned for the VPU), the running
min-distance vector stays on-chip, and each round is a vectorized distance
update + argmax — no HBM traffic between iterations.

Semantics identical to ops/pointnet2.furthest_point_sample (seed index 0,
``‖p‖²≤1e-3`` padding skip, first-max-index tie-break); validated against
the XLA version and the NumPy oracle in tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_FPS_PAD_EPS = 1e-3


def _fps_kernel(xyz_ref, out_ref, *, npoint: int, n: int):
    """xyz_ref: (1, 3, N) VMEM block; out_ref: (1, npoint) int32."""
    x = xyz_ref[0, 0:1, :]  # (1, N)
    y = xyz_ref[0, 1:2, :]
    z = xyz_ref[0, 2:3, :]
    valid = (x * x + y * y + z * z) > _FPS_PAD_EPS  # (1, N)
    ids = lax.broadcasted_iota(jnp.int32, (1, n), 1)
    neg_inf = jnp.float32(-jnp.inf)

    def body(j, carry):
        min_d2, last, idxs = carry
        lx = xyz_ref[0, 0, last]
        ly = xyz_ref[0, 1, last]
        lz = xyz_ref[0, 2, last]
        d2 = (x - lx) ** 2 + (y - ly) ** 2 + (z - lz) ** 2
        min_d2 = jnp.minimum(min_d2, d2)
        cand = jnp.where(valid, min_d2, neg_inf)
        best_val = jnp.max(cand)
        # first-max-index tie-break
        best = jnp.min(jnp.where(cand == best_val, ids, n)).astype(jnp.int32)
        idxs = lax.dynamic_update_slice(idxs, best.reshape(1, 1), (0, j))
        return min_d2, best, idxs

    init = (
        jnp.full((1, n), 1e10, jnp.float32),
        jnp.int32(0),
        jnp.zeros((1, npoint), jnp.int32),
    )
    _, _, idxs = lax.fori_loop(1, npoint, body, init)
    out_ref[...] = idxs


@functools.partial(jax.jit, static_argnames=("npoint", "interpret"))
def furthest_point_sample_pallas(
    xyz: jax.Array, npoint: int, interpret: bool = False
) -> jax.Array:
    """Batched Pallas FPS. xyz (B, N, 3) float32 → (B, npoint) int32.

    ``interpret=True`` runs the kernel in the Pallas interpreter (CPU tests).
    """
    b, n, _ = xyz.shape
    xyz_t = jnp.transpose(xyz.astype(jnp.float32), (0, 2, 1))  # (B, 3, N)
    kernel = functools.partial(_fps_kernel, npoint=npoint, n=n)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 3, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (1, npoint), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, npoint), jnp.int32),
        interpret=interpret,
    )(xyz_t)
