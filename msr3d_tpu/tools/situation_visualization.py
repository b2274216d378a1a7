"""Situation visualizer (reference tools/situation_visualization.py:1-173).

The reference renders an open3d window with the scene point cloud, a
per-instance recoloring, and a red arrow at the agent's situation
(location + view direction). This port targets headless TPU hosts:
matplotlib 3D scatter + quiver, written to a PNG instead of an
interactive window. The geometry helpers (view vector from quaternion,
SQA3D situation alignment into the aligned-pcd frame) match the
reference exactly and are unit-tested.

Usage:
    python -m msr3d_tpu.tools.situation_visualization \
        --pcd scan.pth --location x y z --orientation x y z w \
        --situation "standing by the window" --out viz.png
"""

from __future__ import annotations

import json
from typing import Optional, Sequence

import numpy as np

from msr3d_tpu.data.data_utils import _matrix_to_quat, _quat_to_matrix


def quaternion_to_euler_z(quaternion: Sequence[float]) -> float:
    """Rotation about z extracted from an (x, y, z, w) quaternion — the
    reference uses scipy's xyz euler decomposition and keeps the z angle
    (situation_visualization.py:11-14)."""
    x, y, z, w = np.asarray(quaternion, np.float64)
    # yaw (z) of the xyz-intrinsic euler decomposition
    return float(np.arctan2(2.0 * (w * z + x * y), 1.0 - 2.0 * (y * y + z * z)))


def get_view_vector(quaternion: Sequence[float]) -> np.ndarray:
    """Quaternion → unit view vector in the xy-plane (reference :16-20)."""
    angle = quaternion_to_euler_z(quaternion)
    return np.array([np.cos(angle), np.sin(angle), 0.0])


def align_situation(pos, ori, scene_center, align_matrix):
    """SQA3D mesh-frame situation → aligned-pcd frame (reference :58-81):
    position through the alignment rotation plus scene recentring; the
    orientation additionally gets the 180° z-flip the SQA3D annotations
    require."""
    if isinstance(pos, dict):
        pos = [pos["x"], pos["y"], pos["z"]]
    pos = np.asarray(pos, np.float64)
    if isinstance(ori, dict):
        ori = [ori["_x"], ori["_y"], ori["_z"], ori["_w"]]
    ori = np.asarray(ori, np.float64)
    align_matrix = np.asarray(align_matrix, np.float64)

    pos_new = (pos.reshape(1, 3) @ align_matrix.T + np.asarray(scene_center)).reshape(-1)

    rot = _quat_to_matrix(ori)
    rot_new = align_matrix @ rot
    flip = np.array([[-1.0, 0.0, 0.0], [0.0, -1.0, 0.0], [0.0, 0.0, 1.0]])
    quat_new = _matrix_to_quat(flip @ rot_new)
    return pos_new, quat_new


def instance_recoloring(instance_labels: np.ndarray, seed: int = 0) -> np.ndarray:
    """Random color per instance id, negatives included (reference :33-40)."""
    labels = np.asarray(instance_labels)
    lo = labels.min()
    hi = labels.max()
    rng = np.random.default_rng(seed)
    table = rng.uniform(0, 1, size=(int(hi - lo) + 1, 3))
    return table[(labels - lo).astype(int)]


def visualize_situation(
    points: np.ndarray,
    colors: np.ndarray,
    instance_labels: Optional[np.ndarray] = None,
    location: Optional[Sequence[float]] = None,
    orientation: Optional[Sequence[float]] = None,
    situation: str = "",
    out_path: str = "situation.png",
    max_points: int = 20000,
    arrow_scale: float = 0.5,
    color_by_instance: bool = False,
):
    """Render the scene + situation arrow to ``out_path`` (PNG).

    ``colors`` in [-1, 1] as the reference loads them (rescaled here,
    reference :31). ``orientation`` may be a quaternion (4,) or an
    already-computed view vector (3,).
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    points = np.asarray(points, np.float64)
    if color_by_instance and instance_labels is not None:
        rgb = instance_recoloring(instance_labels)
    else:
        rgb = (np.asarray(colors, np.float64) + 1.0) / 2.0
    rgb = np.clip(rgb, 0.0, 1.0)

    if len(points) > max_points:
        sel = np.random.default_rng(0).choice(len(points), max_points, replace=False)
        points, rgb = points[sel], rgb[sel]

    fig = plt.figure(figsize=(10, 8))
    ax = fig.add_subplot(projection="3d")
    ax.scatter(points[:, 0], points[:, 1], points[:, 2], c=rgb, s=1, alpha=0.6)

    if location is not None and orientation is not None:
        loc = np.asarray(location, np.float64)
        ori = np.asarray(orientation, np.float64)
        view = get_view_vector(ori) if ori.shape[-1] == 4 else ori
        view = view / max(np.linalg.norm(view), 1e-9) * arrow_scale
        ax.quiver(
            loc[0], loc[1], loc[2], view[0], view[1], view[2],
            color="red", linewidth=3, arrow_length_ratio=0.3,
        )
        ax.scatter([loc[0]], [loc[1]], [loc[2]], c="red", s=60, marker="o")

    if situation:
        ax.set_title(situation, fontsize=9, wrap=True)
    ax.set_box_aspect(np.ptp(points, axis=0))
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return out_path


def main() -> None:
    import argparse

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--pcd", required=True, help=".pth scan (torch pickle) or .npz")
    p.add_argument("--location", type=float, nargs=3, default=None)
    p.add_argument("--orientation", type=float, nargs="+", default=None)
    p.add_argument("--situation", default="")
    p.add_argument("--out", default="situation.png")
    p.add_argument("--instances", action="store_true", help="color by instance id")
    p.add_argument(
        "--align-json", default=None,
        help="optional {scan_id: 4x4} alignment table for SQA3D mesh-frame "
        "situations (applies align_situation first)",
    )
    p.add_argument("--scan-id", default=None)
    args = p.parse_args()

    if args.pcd.endswith(".npz"):
        data = np.load(args.pcd)
        points, colors = data["points"], data["colors"]
        inst = data.get("instance_labels")
    else:
        import torch

        pcd = torch.load(args.pcd, map_location="cpu", weights_only=False)
        points, colors, inst = np.asarray(pcd[0]), np.asarray(pcd[1]), np.asarray(pcd[-1])
        colors = colors / 127.5 - 1
    loc, ori = args.location, args.orientation
    if args.align_json and loc is not None and ori is not None:
        table = json.load(open(args.align_json))
        center = (points.max(0) + points.min(0)) / 2
        loc, ori = align_situation(loc, ori, center, np.asarray(table[args.scan_id]))
    out = visualize_situation(
        points, colors, inst, loc, ori, args.situation, args.out,
        color_by_instance=args.instances,
    )
    print(out)


if __name__ == "__main__":
    main()
