"""3D geometry ops for situation modeling (pure JAX).

Semantics match the reference helpers:
  - ``quaternion_to_matrix``     — modules/utils.py:60-75 (note the
    conjugation: xyz are negated, i.e. rotation *to* the canonical frame)
  - ``transform_to_agent_coor``  — modules/utils.py:77-82
  - ``calc_pairwise_locs``       — modules/utils.py:88-137 (5-d pairwise
    geometry: normalized dist, z/dist, 2d/3d ratio, xy direction)
  - ``generate_fourier_features``— model/ose3d_situation.py:31-59
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def quaternion_to_matrix(quaternions: jax.Array) -> jax.Array:
    """(..., 4) xyzw quaternions → (..., 3, 3) rotation matrices.

    The xyz components are negated before building the matrix (the
    reference rotates *into* the agent frame by conjugating).
    """
    x = -quaternions[..., 0]
    y = -quaternions[..., 1]
    z = -quaternions[..., 2]
    w = quaternions[..., 3]

    xx, yy, zz = x * x, y * y, z * z
    xy, xz, xw = x * y, x * z, x * w
    yz, yw, zw = y * z, y * w, z * w

    row0 = jnp.stack([1 - 2 * (yy + zz), 2 * (xy + zw), 2 * (xz - yw)], axis=-1)
    row1 = jnp.stack([2 * (xy - zw), 1 - 2 * (xx + zz), 2 * (yz + xw)], axis=-1)
    row2 = jnp.stack([2 * (xz + yw), 2 * (yz - xw), 1 - 2 * (xx + yy)], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def transform_to_agent_coor(
    obj_centers: jax.Array, anchor_loc: jax.Array, anchor_ori: jax.Array
) -> jax.Array:
    """Rotate object centers into the agent frame.

    obj_centers (B, N, 3), anchor_loc (B, 3), anchor_ori (B, 4) xyzw.
    """
    centered = obj_centers - anchor_loc[:, None, :]
    rot = quaternion_to_matrix(anchor_ori)  # (B, 3, 3)
    return jnp.einsum("bnd,bde->bne", centered, rot)


def calc_pairwise_locs(
    obj_centers: jax.Array,
    obj_whls: jax.Array,
    eps: float = 1e-10,
    pairwise_rel_type: str = "center",
    spatial_dist_norm: bool = True,
    spatial_dim: int = 5,
) -> jax.Array:
    """Pairwise 5-d spatial geometry between objects.

    obj_centers (B, N, 3), obj_whls (B, N, 3) → (B, N, N, spatial_dim).
    Channels (center mode): [norm-dist, Δz/dist, dist2d/dist,
    Δy/dist2d, Δx/dist2d].
    """
    if pairwise_rel_type == "mlp":
        obj_locs = jnp.concatenate([obj_centers, obj_whls], axis=2)
        n = obj_locs.shape[1]
        return jnp.concatenate(
            [
                jnp.broadcast_to(obj_locs[:, :, None, :], obj_locs.shape[:1] + (n, n, obj_locs.shape[-1])),
                jnp.broadcast_to(obj_locs[:, None, :, :], obj_locs.shape[:1] + (n, n, obj_locs.shape[-1])),
            ],
            axis=3,
        )

    delta = obj_centers[:, :, None, :] - obj_centers[:, None, :, :]  # (B,N,N,3)
    dist = jnp.sqrt(jnp.sum(jnp.square(delta), axis=3) + eps)  # (B,N,N)
    if spatial_dist_norm:
        max_dist = jnp.max(dist.reshape(dist.shape[0], -1), axis=1)
        norm_dist = dist / max_dist[:, None, None]
    else:
        norm_dist = dist

    if spatial_dim == 1:
        return norm_dist[..., None]

    dist_2d = jnp.sqrt(jnp.sum(jnp.square(delta[..., :2]), axis=3) + eps)
    if pairwise_rel_type == "center":
        pairwise = jnp.stack(
            [
                norm_dist,
                delta[..., 2] / dist,
                dist_2d / dist,
                delta[..., 1] / dist_2d,
                delta[..., 0] / dist_2d,
            ],
            axis=3,
        )
    elif pairwise_rel_type == "vertical_bottom":
        bottom = obj_centers.at[..., 2].add(-obj_whls[..., 2])
        bdelta = bottom[:, :, None, :] - bottom[:, None, :, :]
        bdist = jnp.sqrt(jnp.sum(jnp.square(bdelta), axis=3) + eps)
        bdist_2d = jnp.sqrt(jnp.sum(jnp.square(bdelta[..., :2]), axis=3) + eps)
        pairwise = jnp.stack(
            [
                norm_dist,
                bdelta[..., 2] / bdist,
                bdist_2d / bdist,
                delta[..., 1] / dist_2d,
                delta[..., 0] / dist_2d,
            ],
            axis=3,
        )
    else:
        raise NotImplementedError(pairwise_rel_type)

    if spatial_dim == 4:
        pairwise = pairwise[..., 1:]
    return pairwise


def generate_fourier_features(
    pos: jax.Array,
    num_bands: int = 10,
    max_freq: float = 15.0,
    concat_pos: bool = True,
    sine_only: bool = False,
) -> jax.Array:
    """Perceiver-style Fourier features.

    pos (B, N, D) → (B, N, D·num_bands·(1 or 2) [+ D]).
    Frequency bands linspace(1, max_freq, num_bands); features are
    sin/cos(π · pos · f).
    """
    b, n, d = pos.shape
    freq_bands = jnp.linspace(1.0, max_freq, num_bands, dtype=pos.dtype)
    per_pos = pos[..., None] * freq_bands  # (B, N, D, num_bands)
    per_pos = per_pos.reshape(b, n, d * num_bands)
    if sine_only:
        feats = jnp.sin(jnp.pi * per_pos)
    else:
        feats = jnp.concatenate(
            [jnp.sin(jnp.pi * per_pos), jnp.cos(jnp.pi * per_pos)], axis=-1
        )
    if concat_pos:
        feats = jnp.concatenate([pos, feats], axis=-1)
    return feats


def fourier_feature_dim(d: int, num_bands: int = 10, concat_pos: bool = True, sine_only: bool = False) -> int:
    dim = d * num_bands * (1 if sine_only else 2)
    if concat_pos:
        dim += d
    return dim


def z_rotation_matrix(theta: jax.Array) -> jax.Array:
    """Rotation about +z by theta (radians), matching the dataset's
    augmentation convention (data/data_utils.py:175-189)."""
    c, s = jnp.cos(theta), jnp.sin(theta)
    zeros = jnp.zeros_like(c)
    ones = jnp.ones_like(c)
    return jnp.stack(
        [
            jnp.stack([c, -s, zeros], axis=-1),
            jnp.stack([s, c, zeros], axis=-1),
            jnp.stack([zeros, zeros, ones], axis=-1),
        ],
        axis=-2,
    )
