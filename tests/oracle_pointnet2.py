"""Pure-NumPy oracle for the PointNet++ ops (test-only).

Direct transliteration of the *semantics* described in SURVEY.md §2.4:
sequential FPS with near-origin padding skip, order-dependent ball query
with slot-0 backfill, brute-force 3-NN. Intentionally simple and slow —
the ground truth the JAX/Pallas implementations are validated against.
"""

import numpy as np


def fps_oracle(xyz: np.ndarray, npoint: int) -> np.ndarray:
    """xyz (N, 3) → (npoint,) indices."""
    n = xyz.shape[0]
    valid = (xyz**2).sum(-1) > 1e-3
    idxs = np.zeros(npoint, dtype=np.int64)
    min_d2 = np.full(n, 1e10, dtype=np.float64)
    last = 0
    for j in range(1, npoint):
        d2 = ((xyz - xyz[last]) ** 2).sum(-1)
        min_d2 = np.minimum(min_d2, d2)
        best, best_i = -1.0, 0
        for k in range(n):
            if not valid[k]:
                continue
            if min_d2[k] > best:
                best, best_i = min_d2[k], k
        idxs[j] = best_i
        last = best_i
    return idxs


def ball_query_oracle(
    radius: float, nsample: int, xyz: np.ndarray, new_xyz: np.ndarray
) -> np.ndarray:
    """xyz (N,3), new_xyz (M,3) → (M, nsample) indices."""
    m = new_xyz.shape[0]
    n = xyz.shape[0]
    r2 = radius * radius
    idx = np.zeros((m, nsample), dtype=np.int64)
    for j in range(m):
        cnt = 0
        for k in range(n):
            if cnt >= nsample:
                break
            d2 = ((new_xyz[j] - xyz[k]) ** 2).sum()
            if d2 < r2:
                if cnt == 0:
                    idx[j, :] = k
                idx[j, cnt] = k
                cnt += 1
    return idx


def three_nn_oracle(unknown: np.ndarray, known: np.ndarray):
    """unknown (n,3), known (m,3) → dist (n,3), idx (n,3)."""
    d2 = ((unknown[:, None, :] - known[None, :, :]) ** 2).sum(-1)
    idx = np.argsort(d2, axis=1, kind="stable")[:, :3]
    dist = np.sqrt(np.take_along_axis(d2, idx, axis=1))
    return dist, idx


def quaternion_to_matrix_oracle(q: np.ndarray) -> np.ndarray:
    """q (..., 4) xyzw (conjugated like the reference) → (..., 3, 3)."""
    x, y, z, w = -q[..., 0], -q[..., 1], -q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, xw = x * y, x * z, x * w
    yz, yw, zw = y * z, y * w, z * w
    R = np.empty(q.shape[:-1] + (3, 3))
    R[..., 0, 0] = 1 - 2 * (yy + zz)
    R[..., 0, 1] = 2 * (xy + zw)
    R[..., 0, 2] = 2 * (xz - yw)
    R[..., 1, 0] = 2 * (xy - zw)
    R[..., 1, 1] = 1 - 2 * (xx + zz)
    R[..., 1, 2] = 2 * (yz + xw)
    R[..., 2, 0] = 2 * (xz + yw)
    R[..., 2, 1] = 2 * (yz - xw)
    R[..., 2, 2] = 1 - 2 * (xx + yy)
    return R
