"""PointNet++ point-cloud ops, TPU-native (pure XLA, jit/vmap-friendly).

Re-implements the semantics of the reference CUDA kernels
(``/root/reference/modules/third_party/pointnet2/_ext_src/src/``) as
dense, static-shape XLA programs:

  - ``furthest_point_sample``  — sampling_gpu.cu:69-173 (incl. the
    ``‖p‖²≤1e-3`` padding skip at :100-101 and seed index 0 at :86)
  - ``ball_query``             — ball_query_gpu.cu:9-44 ("first nsample
    within radius, in point order, slot-0 backfill" :27-42)
  - ``gather_points`` / ``group_points`` — sampling_gpu.cu:8-57,
    group_points_gpu.cu:8-75 (plain gathers here; XLA autodiffs them)
  - ``three_nn`` / ``three_interpolate`` — interpolate_gpu.cu:9-59

Layout is channels-LAST everywhere — (B, N, C) points, (B, M, K, C)
groups — so the shared-MLP becomes batched matmuls on the MXU; the
reference's channels-first CUDA layout is a GPU-ism we do not copy.

All functions are shape-static and batched via ``vmap``; everything
works under ``jit`` and differentiates where the reference does
(sampling/query indices are integer outputs, naturally non-diff).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

# Matches the CUDA kernel's near-origin padding skip (sampling_gpu.cu:100-101).
_FPS_PAD_EPS = 1e-3


# ---------------------------------------------------------------------------
# Furthest point sampling
# ---------------------------------------------------------------------------


def _fps_single(xyz: jax.Array, npoint: int) -> jax.Array:
    """FPS on one cloud. xyz: (N, 3) float32 → (npoint,) int32 indices.

    Iterative: seed index 0, then npoint-1 rounds of min-distance update
    + argmax. Points with squared norm ≤ 1e-3 are treated as padding and
    never selected (reference semantics).
    """
    n = xyz.shape[0]
    valid = jnp.sum(xyz * xyz, axis=-1) > _FPS_PAD_EPS  # (N,)

    def body(j, state):
        min_d2, idxs, last = state
        d2 = jnp.sum(jnp.square(xyz - xyz[last]), axis=-1)  # (N,)
        min_d2 = jnp.minimum(min_d2, d2)
        candidate = jnp.where(valid, min_d2, -jnp.inf)
        best = jnp.argmax(candidate).astype(jnp.int32)
        idxs = idxs.at[j].set(best)
        return min_d2, idxs, best

    min_d2 = jnp.full((n,), 1e10, dtype=jnp.float32)
    idxs = jnp.zeros((npoint,), dtype=jnp.int32)
    _, idxs, _ = lax.fori_loop(1, npoint, body, (min_d2, idxs, jnp.int32(0)))
    return idxs


@functools.partial(jax.jit, static_argnames=("npoint",))
def furthest_point_sample(xyz: jax.Array, npoint: int) -> jax.Array:
    """Batched FPS. xyz: (B, N, 3) → (B, npoint) int32."""
    return jax.vmap(lambda p: _fps_single(p, npoint))(xyz.astype(jnp.float32))


# backend switch: "auto" | "xla" | "pallas" — both produce identical indices
# (tests assert bit-equality); pallas keeps the whole m-step loop
# VMEM-resident and measures 8.5x faster at the flagship workload
# (960 clouds x 1024 pts, 2.85 vs 24.1 ms). "auto" picks pallas on TPU.
FPS_BACKEND = "auto"


def _fps_use_pallas() -> bool:
    if FPS_BACKEND == "pallas":
        return True
    if FPS_BACKEND == "auto":
        try:
            return jax.default_backend() in ("tpu", "axon")
        except Exception:
            return False
    return False


def fps(xyz: jax.Array, npoint: int) -> jax.Array:
    """Dispatching FPS entry used by the SA modules."""
    if _fps_use_pallas():
        from msr3d_tpu.ops.pallas.fps import furthest_point_sample_pallas

        return furthest_point_sample_pallas(xyz, npoint)
    return furthest_point_sample(xyz, npoint)


# ---------------------------------------------------------------------------
# Ball query
# ---------------------------------------------------------------------------


def _ball_query_single(
    xyz: jax.Array, new_xyz: jax.Array, radius: float, nsample: int
) -> jax.Array:
    """Ball query on one cloud. xyz (N,3), new_xyz (M,3) → (M, nsample) int32.

    Semantics: for each center, the first ``nsample`` point indices (in
    point order) with d² < radius²; if fewer than nsample qualify, the
    first qualifying index backfills the remaining slots.
    """
    n = xyz.shape[0]
    d2 = jnp.sum(
        jnp.square(new_xyz[:, None, :] - xyz[None, :, :]), axis=-1
    )  # (M, N)
    in_ball = d2 < radius * radius
    point_ids = jnp.arange(n, dtype=jnp.float32)
    # One-hot rank selection on the MXU: the s-th selected index is the
    # unique in-ball point whose running count equals s+1, extracted via a
    # dot with the point-id iota. Bit-equal to (and 1.9x faster on v5e
    # than) the top_k-over-index-keys formulation — XLA fuses the one-hot
    # tensor into the dot, so it never materializes.
    rank = jnp.cumsum(in_ball.astype(jnp.int32), axis=1)  # (M, N), 1-based
    slots = jnp.arange(nsample, dtype=jnp.int32) + 1  # (nsample,)
    onehot = (rank[:, :, None] == slots[None, None, :]) & in_ball[:, :, None]
    sel = jnp.einsum(
        "mns,n->ms", onehot.astype(jnp.float32), point_ids
    ).astype(jnp.int32)
    count = jnp.sum(in_ball, axis=-1, keepdims=True)  # (M, 1)
    slot = jnp.arange(nsample, dtype=jnp.int32)[None, :]
    idx = jnp.where(slot < count, sel, sel[:, :1])
    # empty ball: reference leaves slots uninitialized; pin to 0 for determinism
    return jnp.where(count > 0, idx, 0)


@functools.partial(jax.jit, static_argnames=("radius", "nsample"))
def ball_query(
    radius: float, nsample: int, xyz: jax.Array, new_xyz: jax.Array
) -> jax.Array:
    """Batched ball query. xyz (B,N,3), new_xyz (B,M,3) → (B,M,nsample)."""
    return jax.vmap(
        lambda p, c: _ball_query_single(p, c, radius, nsample)
    )(xyz.astype(jnp.float32), new_xyz.astype(jnp.float32))


# ---------------------------------------------------------------------------
# Gathers (channels-last; autodiff provides the scatter-add backward)
# ---------------------------------------------------------------------------


def gather_points(points: jax.Array, idx: jax.Array) -> jax.Array:
    """points (B, N, C), idx (B, M) → (B, M, C)."""
    return jax.vmap(lambda p, i: p[i])(points, idx)


def group_points(points: jax.Array, idx: jax.Array) -> jax.Array:
    """points (B, N, C), idx (B, M, K) → (B, M, K, C)."""
    return jax.vmap(lambda p, i: p[i])(points, idx)


# ---------------------------------------------------------------------------
# Query-and-group (reference pointnet2_utils.py:291-373 semantics,
# channels-last layout)
# ---------------------------------------------------------------------------


def query_and_group(
    xyz: jax.Array,
    new_xyz: jax.Array,
    features: Optional[jax.Array],
    radius: float,
    nsample: int,
    use_xyz: bool = True,
    normalize_xyz: bool = False,
) -> jax.Array:
    """Ball-query + gather + center-relative xyz ‖ features.

    xyz (B,N,3), new_xyz (B,M,3), features (B,N,C) or None
    → (B, M, nsample, 3+C) if use_xyz else (B, M, nsample, C).
    """
    idx = ball_query(radius, nsample, xyz, new_xyz)
    grouped_xyz = group_points(xyz, idx) - new_xyz[:, :, None, :]
    if normalize_xyz:
        grouped_xyz = grouped_xyz / radius
    if features is not None:
        grouped_features = group_points(features, idx)
        if use_xyz:
            return jnp.concatenate([grouped_xyz, grouped_features], axis=-1)
        return grouped_features
    assert use_xyz, "cannot have no features and not use xyz"
    return grouped_xyz


def group_all(
    xyz: jax.Array, features: Optional[jax.Array], use_xyz: bool = True
) -> jax.Array:
    """GroupAll (pointnet2_utils.py:376-419): one group of all points.

    xyz (B,N,3), features (B,N,C) → (B, 1, N, 3+C).
    """
    grouped = xyz[:, None, :, :]
    if features is not None:
        feats = features[:, None, :, :]
        grouped = jnp.concatenate([grouped, feats], axis=-1) if use_xyz else feats
    return grouped


# ---------------------------------------------------------------------------
# three_nn / three_interpolate (FP modules; unused by shipped configs but
# part of the op surface — interpolate_gpu.cu:9-59)
# ---------------------------------------------------------------------------


@jax.jit
def three_nn(unknown: jax.Array, known: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Exact 3-NN. unknown (B,n,3), known (B,m,3) → (dist (B,n,3), idx (B,n,3)).

    Returns *euclidean* distance (the python wrapper sqrts the squared
    distances, pointnet2_utils.py:138).
    """
    d2 = jnp.sum(
        jnp.square(unknown[:, :, None, :] - known[:, None, :, :]), axis=-1
    )  # (B, n, m)
    neg_d2, idx = lax.top_k(-d2, 3)
    return jnp.sqrt(jnp.maximum(-neg_d2, 0.0)), idx.astype(jnp.int32)


@jax.jit
def three_interpolate(
    features: jax.Array, idx: jax.Array, weight: jax.Array
) -> jax.Array:
    """Weighted 3-point interpolation (channels-last).

    features (B, m, C), idx (B, n, 3), weight (B, n, 3) → (B, n, C).
    """
    gathered = group_points(features, idx)  # (B, n, 3, C)
    return jnp.sum(gathered * weight[..., None], axis=2)
