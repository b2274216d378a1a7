"""SoftGroup instance-segmentation ops, TPU-native.

Re-implements the full op family exposed by the reference's
``softgroup_ops`` extension (``/root/reference/modules/third_party/
softgroup_ops/ops/functions.py:1-398``), which the reference repo ships
but leaves dormant (its import is commented out at
``data/datasets/dataset_wrapper.py:11``).

Design split — the reference itself splits these ops across host and
device, and we keep that split but map each side to its natural TPU
home:

  * **Combinatorial/host ops** (hash-map voxelization, BFS connected
    components, ragged neighbor-list layout) run on the host in NumPy.
    The reference runs ``voxelize_idx`` and ``bfs_cluster`` on the CPU
    too (plain C++ in ``voxelize.cpp:60-165`` / ``bfs_cluster.cpp:34-90``);
    these build *index plans* inside the data pipeline, not device math.
  * **Dense feature math** (voxel feature scatter, segment pools, mask
    IoU) runs as static-shape XLA programs: ``jax.ops.segment_*`` for
    the ragged pools and a one-hot matmul (MXU) for the IoU table.
    These are differentiable exactly where the reference's kernels
    implement a backward pass (``voxelization``, ``global_avg_pool``).

Semantics are kernel-faithful, including voxel insertion order, the
``+1e-5`` IoU denominator, the ``>0.5`` sigmoid mask threshold, and
``get_mask_label``'s strict-greater argmax with ``-100``-class skip.
Reference file:line cites are on each function.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "voxelization_idx",
    "voxelization",
    "ballquery_batch_p",
    "bfs_cluster",
    "global_avg_pool",
    "sec_mean",
    "sec_min",
    "sec_max",
    "get_mask_iou_on_cluster",
    "get_mask_iou_on_pred",
    "get_mask_label",
]


# ---------------------------------------------------------------------------
# Voxelization (host index plan + device feature scatter)
# ---------------------------------------------------------------------------


def voxelization_idx(
    coords: np.ndarray, batchsize: int, mode: int = 4
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Build the point→voxel index plan on the host.

    Reference: ``voxelize_inputmap``/``voxelize_outputmap``
    (``softgroup_ops/ops/src/voxelize/voxelize.cpp:42-165``) via the
    autograd wrapper ``Voxelization_Idx`` (``functions.py:128-157``).

    coords: (N, 4) int — (batch_idx, x, y, z) — or (N, 3) for a single
    implicit batch. Voxel ids are assigned in order of first occurrence
    while scanning points 0..N-1 (insertion order into the per-batch
    hash map, with a single global counter — voxelize.cpp:98-116).

    Returns ``(output_coords, input_map, output_map)``:
      * output_coords (M, coords.shape[1]) — the coords row of the
        *first* point landing in each voxel (voxelize.cpp:43-58,
        ``inputIdx = rule[1]``).
      * input_map (N,) int32 — voxel id per point.
      * output_map (M, maxActive+1) int32 — per voxel ``[count, idx...]``
        zero-padded, the "rulebook" rows consumed by ``voxelization``.
        For modes 0/1/2 maxActive == 1 and the single index is the
        asserted-unique / first / last point respectively
        (voxelize.cpp:131-152; the docstring in functions.py:132-140
        has first/last swapped relative to the code — we follow the code).
    """
    from msr3d_tpu.ops.host_geometry import group_rows, pad_groups

    coords = np.asarray(coords)
    assert coords.ndim == 2 and coords.shape[1] in (3, 4), coords.shape
    n = coords.shape[0]
    keys = (
        coords.astype(np.int64)
        if coords.shape[1] == 4
        else np.concatenate([np.zeros((n, 1), np.int64), coords.astype(np.int64)], 1)
    )
    input_map, m = group_rows(keys)

    if mode == 0:
        assert m == n, "mode 0 requires already-unique coords (voxelize.cpp:132)"
    members = pad_groups(input_map, m)  # (m, kmax) padded -1, input order
    counts = np.bincount(input_map, minlength=m).astype(np.int32)
    if mode in (0, 1, 2):
        output_map = np.ones((m, 2), np.int32)
        output_map[:, 1] = (
            members[:, 0] if mode in (0, 1) else members[np.arange(m), counts - 1]
        )
    else:  # 3 = sum, 4 = mean
        output_map = np.zeros((m, members.shape[1] + 1), np.int32)
        output_map[:, 0] = counts
        output_map[:, 1:] = np.where(members >= 0, members, 0)

    first_idx = members[:, 0].astype(np.int64)
    output_coords = coords[first_idx].copy()
    return output_coords, input_map, output_map


def voxelization(feats: jax.Array, output_map: jax.Array, mode: int = 4) -> jax.Array:
    """Scatter point features into voxels (sum or mean) on device.

    Reference kernel: ``voxelize_fp_cuda`` / ``voxelize_bp_cuda``
    (``voxelize.cu``; wrapper ``functions.py:160-194``; mode==4 averages,
    else sums). Implemented as a masked gather + reduction, so XLA
    autodiff reproduces the reference's hand-written backward (grad
    broadcast to contributing points, /count for mean).

    feats: (N, C); output_map: (M, maxActive+1) int32 ``[count, idx...]``.
    Returns (M, C).
    """
    counts = output_map[:, :1].astype(feats.dtype)  # (M, 1)
    idx = output_map[:, 1:]  # (M, maxActive)
    max_active = idx.shape[1]
    pos = jnp.arange(max_active)[None, :]
    valid = pos < output_map[:, :1]  # (M, maxActive)
    gathered = feats[idx]  # (M, maxActive, C)
    gathered = jnp.where(valid[..., None], gathered, 0.0)
    out = jnp.sum(gathered, axis=1)
    if mode == 4:
        out = out / jnp.maximum(counts, 1.0)
    return out


# ---------------------------------------------------------------------------
# Batched ball query + BFS clustering (host index plans)
# ---------------------------------------------------------------------------


def ballquery_batch_p(
    coords: np.ndarray,
    batch_idxs: np.ndarray,
    batch_offsets: np.ndarray,
    radius: float,
    meanActive: int = 50,
) -> Tuple[np.ndarray, np.ndarray]:
    """All-neighbors ball query over a packed batch.

    Reference: ``ballquery_batch_p_cuda_`` (``bfs_cluster.cu:15-60``;
    wrapper with overflow-retry ``functions.py:197-235``). For each
    point, every point of the *same batch element* with d² < radius²
    (self included), in point-index order. Our exact host build has no
    ``meanActive`` capacity cap, so the wrapper's retry loop is
    unnecessary; the argument is accepted for signature parity.

    Returns ``(idx, start_len)``: idx (nActive,) int32 neighbor indices,
    start_len (n, 2) int32 — each point's [start, len) slice into idx.
    """
    from msr3d_tpu.ops.host_geometry import ballquery_packed

    return ballquery_packed(coords, batch_idxs, batch_offsets, radius)


def bfs_cluster(
    class_numpoint_mean: np.ndarray,
    ball_query_idxs: np.ndarray,
    start_len: np.ndarray,
    threshold: float,
    class_id: int,
) -> Tuple[np.ndarray, np.ndarray]:
    """Connected-components over the ball-query graph (host BFS).

    Reference: ``find_cc``/``get_clusters``/``fill_cluster_idxs_``
    (``bfs_cluster.cpp:34-121``; wrapper ``functions.py:238-268``) —
    host C++ there too. Seeds scan points 0..N-1; a component is kept
    iff its size ≥ thr, where thr = threshold when
    ``class_numpoint_mean[class_id] == -1`` else
    threshold·mean (bfs_cluster.cpp:70-81). Point order inside each
    cluster is BFS dequeue order, reproduced exactly.

    Returns ``(cluster_idxs, cluster_offsets)``: (sumNPoint, 2) int32
    rows ``(cluster_id, point_idx)`` and (nCluster+1,) int32 offsets.
    """
    from msr3d_tpu.ops.host_geometry import bfs_components

    mean = float(np.asarray(class_numpoint_mean, np.float32)[class_id])
    thr = threshold if mean == -1 else threshold * mean

    order, comp_offsets = bfs_components(ball_query_idxs, start_len)
    sizes = np.diff(comp_offsets)
    keep = np.nonzero(sizes >= thr)[0]

    offsets = np.zeros(len(keep) + 1, np.int32)
    rows = []
    for c, comp_id in enumerate(keep):
        members = order[comp_offsets[comp_id] : comp_offsets[comp_id + 1]]
        offsets[c + 1] = offsets[c] + len(members)
        rows.extend((c, int(p)) for p in members)
    cluster_idxs = np.asarray(rows, np.int32).reshape(-1, 2)
    return cluster_idxs, offsets


# ---------------------------------------------------------------------------
# Segment pools (device)
# ---------------------------------------------------------------------------


def _segment_ids(offsets: jax.Array, total: int) -> jax.Array:
    """offsets (P+1,) → per-row segment id (total,). Static ``total``."""
    # row i belongs to the largest s with offsets[s] <= i
    return (
        jnp.searchsorted(offsets, jnp.arange(total), side="right") - 1
    ).astype(jnp.int32)


def global_avg_pool(feats: jax.Array, proposals_offset: jax.Array) -> jax.Array:
    """Mean-pool packed proposal features: (sumNPoint, C) → (nProposal, C).

    Reference: ``global_avg_pool_fp_cuda_`` / ``_bp_``
    (``roipool.cu:12-61``; wrapper ``functions.py:271-308``). The
    segment-sum formulation autodiffs to the reference's backward
    (grad/n broadcast).
    """
    num_seg = proposals_offset.shape[0] - 1
    seg = _segment_ids(proposals_offset, feats.shape[0])
    sums = jax.ops.segment_sum(feats, seg, num_segments=num_seg)
    counts = (proposals_offset[1:] - proposals_offset[:-1]).astype(feats.dtype)
    return sums / jnp.maximum(counts, 1.0)[:, None]


def sec_mean(inp: jax.Array, offsets: jax.Array) -> jax.Array:
    """Per-segment mean (``sec_mean.cu``; wrapper functions.py:311-338)."""
    return global_avg_pool(inp, offsets)


def sec_min(inp: jax.Array, offsets: jax.Array) -> jax.Array:
    """Per-segment min (``sec_mean.cu``; wrapper functions.py:341-368)."""
    num_seg = offsets.shape[0] - 1
    seg = _segment_ids(offsets, inp.shape[0])
    return jax.ops.segment_min(inp, seg, num_segments=num_seg)


def sec_max(inp: jax.Array, offsets: jax.Array) -> jax.Array:
    """Per-segment max (``sec_mean.cu``; wrapper functions.py:371-398)."""
    num_seg = offsets.shape[0] - 1
    seg = _segment_ids(offsets, inp.shape[0])
    return jax.ops.segment_max(inp, seg, num_segments=num_seg)


# ---------------------------------------------------------------------------
# Mask IoU + mask labels (device; one-hot matmul on the MXU)
# ---------------------------------------------------------------------------


def _proposal_instance_intersection(
    proposals_idx: jax.Array,
    proposals_offset: jax.Array,
    instance_labels: jax.Array,
    n_instance: int,
    point_weight: jax.Array | None = None,
) -> jax.Array:
    """(nProposal, nInstance) intersection counts via segment-summed
    one-hot rows — a dense (sumNPoint, nInstance) one-hot reduced per
    proposal, which XLA lowers to MXU-friendly matmul-like reductions."""
    labels = instance_labels[proposals_idx]  # (sumNPoint,) may contain -100
    onehot = jax.nn.one_hot(labels, n_instance, dtype=jnp.float32)  # -100 → 0s
    if point_weight is not None:
        onehot = onehot * point_weight[:, None]
    seg = _segment_ids(proposals_offset, proposals_idx.shape[0])
    return jax.ops.segment_sum(
        onehot, seg, num_segments=proposals_offset.shape[0] - 1
    )


def get_mask_iou_on_cluster(
    proposals_idx: jax.Array,
    proposals_offset: jax.Array,
    instance_labels: jax.Array,
    instance_pointnum: jax.Array,
) -> jax.Array:
    """IoU of each proposal's point set vs each GT instance.

    Reference: ``get_mask_iou_on_cluster_cuda_``
    (``cal_iou_and_masklabel.cu:15-39``; wrapper functions.py:7-43).
    Denominator carries the kernel's ``+1e-5``.
    """
    n_instance = instance_pointnum.shape[0]
    inter = _proposal_instance_intersection(
        proposals_idx, proposals_offset, instance_labels, n_instance
    )
    prop_total = (proposals_offset[1:] - proposals_offset[:-1]).astype(jnp.float32)
    inst_total = instance_pointnum.astype(jnp.float32)
    union = prop_total[:, None] + inst_total[None, :] - inter
    return inter / (union + 1e-5)


def get_mask_iou_on_pred(
    proposals_idx: jax.Array,
    proposals_offset: jax.Array,
    instance_labels: jax.Array,
    instance_pointnum: jax.Array,
    mask_scores_sigmoid: jax.Array,
) -> jax.Array:
    """IoU with proposal membership gated by predicted mask > 0.5.

    Reference: ``get_mask_iou_on_pred_cuda_``
    (``cal_iou_and_masklabel.cu:42-75``; wrapper functions.py:46-85).
    """
    n_instance = instance_pointnum.shape[0]
    member = (mask_scores_sigmoid > 0.5).astype(jnp.float32)  # (sumNPoint,)
    inter = _proposal_instance_intersection(
        proposals_idx, proposals_offset, instance_labels, n_instance, member
    )
    seg = _segment_ids(proposals_offset, proposals_idx.shape[0])
    prop_total = jax.ops.segment_sum(
        member, seg, num_segments=proposals_offset.shape[0] - 1
    )
    inst_total = instance_pointnum.astype(jnp.float32)
    union = prop_total[:, None] + inst_total[None, :] - inter
    return inter / (union + 1e-5)


def get_mask_label(
    proposals_idx: jax.Array,
    proposals_offset: jax.Array,
    instance_labels: jax.Array,
    instance_cls: jax.Array,
    instance_pointnum: jax.Array,
    proposals_iou: jax.Array,
    iou_thr: float,
) -> jax.Array:
    """Per-point mask supervision labels from the best-IoU instance.

    Reference: ``get_mask_label_cuda_``
    (``cal_iou_and_masklabel.cu:78-112``; wrapper functions.py:88-125).
    Initialized to -1 (ignore). Per proposal: argmax IoU over instances
    whose class ≠ -100, with *strict* greater-than (first index wins
    ties, max starts at 0 so an all-zero row keeps index 0); if that max
    ≥ iou_thr, points labeled 1 where their GT instance == argmax else 0.
    """
    del instance_pointnum  # unused by the kernel; kept for signature parity
    eligible = instance_cls != -100  # (nInstance,)
    masked_iou = jnp.where(eligible[None, :], proposals_iou, -jnp.inf)
    # strict > with max initialized to 0 ⇒ treat non-positive rows as idx 0
    max_iou = jnp.maximum(jnp.max(masked_iou, axis=1), 0.0)  # (nProposal,)
    max_ind = jnp.where(
        jnp.max(masked_iou, axis=1) > 0.0,
        jnp.argmax(masked_iou, axis=1),
        0,
    ).astype(jnp.int32)

    seg = _segment_ids(proposals_offset, proposals_idx.shape[0])
    assigned = max_iou[seg] >= iou_thr  # (sumNPoint,)
    point_inst = instance_labels[proposals_idx]
    hit = (point_inst == max_ind[seg]).astype(jnp.float32)
    return jnp.where(assigned, hit, -1.0)
