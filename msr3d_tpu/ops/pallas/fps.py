"""Furthest-point sampling as a Pallas TPU kernel.

Each grid cell processes a tile of ROWS=8 point clouds (TPU sublane
granularity): the (8, 3, N) points live in VMEM for the whole m-step loop,
the running min-distance matrix stays on-chip, and each round is a
vectorized distance update + per-row argmax on the VPU — no HBM traffic
between iterations.

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
_ROWS = 8  # clouds per grid cell (TPU sublane tile)


def _fps_kernel(xyz_ref, out_ref, *, npoint: int, n: int):
    """xyz_ref: (ROWS, 3, N) VMEM block; out_ref: (ROWS, npoint) int32."""
    x = xyz_ref[:, 0, :]  # (R, N)
    y = xyz_ref[:, 1, :]
    z = xyz_ref[:, 2, :]
    valid = (x * x + y * y + z * z) > _FPS_PAD_EPS  # (R, N)
    ids = lax.broadcasted_iota(jnp.int32, (_ROWS, n), 1)
    col_ids = lax.broadcasted_iota(jnp.int32, (_ROWS, npoint), 1)
    neg_inf = jnp.float32(-jnp.inf)

    def body(j, carry):
        min_d2, last, idxs = carry  # (R,N), (R,1) int32, (R,npoint) int32
        # per-row dynamic gather via one-hot select (Mosaic's gather lowering
        # doesn't support (R,1)-indexed take_along_axis)
        onehot = ids == last  # (R, N)
        lx = jnp.sum(jnp.where(onehot, x, 0.0), axis=1, keepdims=True)
        ly = jnp.sum(jnp.where(onehot, y, 0.0), axis=1, keepdims=True)
        lz = jnp.sum(jnp.where(onehot, z, 0.0), axis=1, keepdims=True)
        d2 = (x - lx) ** 2 + (y - ly) ** 2 + (z - lz) ** 2
        min_d2 = jnp.minimum(min_d2, d2)
        cand = jnp.where(valid, min_d2, neg_inf)
        best_val = jnp.max(cand, axis=1, keepdims=True)
        # first-max-index tie-break, per row
        best = jnp.min(
            jnp.where(cand == best_val, ids, n), axis=1, keepdims=True
        ).astype(jnp.int32)
        # place best into column j without dynamic stores (Mosaic needs
        # lane-aligned dynamic offsets): broadcasted column-mask select
        idxs = jnp.where(col_ids == j, best, idxs)
        return min_d2, best, idxs

    init = (
        jnp.full((_ROWS, n), 1e10, jnp.float32),
        jnp.zeros((_ROWS, 1), jnp.int32),
        jnp.zeros((_ROWS, npoint), jnp.int32),
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
    pad_b = (-b) % _ROWS
    xyz_t = jnp.transpose(xyz.astype(jnp.float32), (0, 2, 1))  # (B, 3, N)
    if pad_b:
        xyz_t = jnp.pad(xyz_t, ((0, pad_b), (0, 0), (0, 0)))
    kernel = functools.partial(_fps_kernel, npoint=npoint, n=n)
    out = pl.pallas_call(
        kernel,
        grid=((b + pad_b) // _ROWS,),
        in_specs=[
            pl.BlockSpec(
                (_ROWS, 3, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            )
        ],
        out_specs=pl.BlockSpec(
            (_ROWS, npoint), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b + pad_b, npoint), jnp.int32),
        interpret=interpret,
    )(xyz_t)
    return out[:b]
