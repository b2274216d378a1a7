"""Unified scan data access for ScanNet / 3RScan / ARKitScenes.

Reference: data/datasets/scan_data_loader.py. File layouts per domain:

  ScanNet:  {scan_family_base}/scan_data/pcd_with_global_alignment/{scan}.pth
            → torch pickle (points, colors, ..., instance_labels); objects
            keyed by consecutive instance ids 0..max
  3RScan:   {rscan_base}/3RScan-ours-align/{scan}/pcds.pth + inst_to_label.pth
  ARKit:    {ARkit_base}/scan_data/pcd-align/{scan}.pth +
            instance_id_to_label/{scan}_inst_to_label.pth (objects < 10 pts
            dropped)
  object images: {obj_img_base}/{dataset}/{scan}_inst{ид}_{label}_0.jpg

Colors normalize to [-1, 1] (colors/127.5 - 1). All outputs are numpy; the
torch dependency is confined to unpickling ``.pth`` files.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, List, Optional

import numpy as np

from msr3d_tpu.data.data_utils import preprocess_2d
from msr3d_tpu.utils.io import load_torch_pickle


class ScanDataLoader:
    def __init__(self, cfg, dataset: str = ""):
        self.cfg = cfg
        self.dataset = dataset
        img_args = cfg.data.get("process_args", {}).get("img_process_args", {})
        self.bbox_keep_ratio = img_args.get("bbox_keep_ratio", 0.5)
        self.min_keep_num = img_args.get("min_keep_num", 1)
        self.bbox_expand = img_args.get("bbox_expand", 0.1)
        self.tgt_img_size = tuple(img_args.get("tgt_img_size", [224, 224]))

    # -- point clouds ---------------------------------------------------

    def get_data(
        self, dataset: str, scan_id: str, data_type: List[str] = ("obj_pcds",),
        pc_type: str = "gt",
    ) -> Dict[str, Any]:
        if dataset == "ScanNet":
            return self._get_scannet_data(scan_id, data_type, pc_type=pc_type)
        if dataset == "3RScan":
            return self._get_rscan_data(scan_id, data_type)
        if dataset in ("ARkit", "ARkitScenes"):
            return self._get_arkit_data(scan_id, data_type)
        raise NotImplementedError(f"{dataset} not supported")

    def _split_objects(
        self, points, colors, instance_labels, inst_ids, min_points: int = 0
    ) -> Dict[int, np.ndarray]:
        colors = colors / 127.5 - 1
        pcds = np.concatenate([points, colors], axis=1).astype(np.float32)
        obj_pcds: Dict[int, np.ndarray] = {}
        for inst_id in inst_ids:
            mask = instance_labels == inst_id
            if min_points and mask.sum() < min_points:
                continue
            obj_pcds[int(inst_id)] = pcds[mask]
        return obj_pcds

    def _get_scannet_data(
        self, scan_id: str, data_type, pc_type: str = "gt"
    ) -> Dict[str, Any]:
        out: Dict[str, Any] = {}
        if "obj_pcds" in data_type:
            base = Path(self.cfg.data.scan_family_base)
            pcd_data = load_torch_pickle(
                base / "scan_data" / "pcd_with_global_alignment" / f"{scan_id}.pth",
                weights_only=False,
            )
            points, colors, instance_labels = pcd_data[0], pcd_data[1], pcd_data[-1]
            inst_ids = range(int(instance_labels.max()) + 1)
            out["obj_pcds"] = self._split_objects(
                points, colors, instance_labels, inst_ids
            )
            if pc_type == "pred":
                out.update(self._load_pred_masks(base, scan_id, points, colors))
        return out

    @staticmethod
    def _load_pred_masks(base: Path, scan_id: str, points, colors) -> Dict[str, Any]:
        """Mask3D-style predicted instances (scannet_base.py:78-101): sparse
        mask npz (≤50 instances) + per-instance label npy."""
        from scipy import sparse

        mask_path = base / "mask" / f"{scan_id}.mask.npz"
        label_path = base / "mask" / f"{scan_id}.label.npy"
        if not (mask_path.exists() and label_path.exists()):
            return {}
        colors_n = colors / 127.5 - 1
        pcds = np.concatenate([points, colors_n], axis=1).astype(np.float32)
        obj_mask = np.asarray(sparse.load_npz(mask_path).todense())[:50, :]
        obj_labels = np.load(label_path)[:50]
        obj_pcds_pred, labels_pred = [], []
        for i in range(obj_mask.shape[0]):
            sel = pcds[obj_mask[i] == 1, :]
            if sel.shape[0] > 0:
                obj_pcds_pred.append(sel)
                labels_pred.append(int(obj_labels[i]))
        return {"obj_pcds_pred": obj_pcds_pred, "inst_labels_pred": labels_pred}

    def _get_rscan_data(self, scan_id: str, data_type) -> Dict[str, Any]:
        out: Dict[str, Any] = {}
        if "obj_pcds" in data_type:
            base = Path(self.cfg.data.rscan_base) / "3RScan-ours-align" / scan_id
            pcd_data = load_torch_pickle(base / "pcds.pth", weights_only=False)
            inst_to_label = load_torch_pickle(
                base / "inst_to_label.pth", weights_only=False
            )
            points, colors, instance_labels = pcd_data[0], pcd_data[1], pcd_data[2]
            out["obj_pcds"] = self._split_objects(
                points, colors, instance_labels, inst_to_label.keys()
            )
        return out

    def _get_arkit_data(self, scan_id: str, data_type) -> Dict[str, Any]:
        out: Dict[str, Any] = {}
        if "obj_pcds" in data_type:
            base = Path(self.cfg.data.ARkit_base) / "scan_data"
            pcd_data = load_torch_pickle(
                base / "pcd-align" / f"{scan_id}.pth", weights_only=False
            )
            inst_to_label = load_torch_pickle(
                base / "instance_id_to_label" / f"{scan_id}_inst_to_label.pth",
                weights_only=False,
            )
            points, colors, instance_labels = pcd_data[0], pcd_data[1], pcd_data[2]
            inst_ids = [k for k in inst_to_label.keys() if isinstance(k, int)]
            out["obj_pcds"] = self._split_objects(
                points, colors, instance_labels, inst_ids, min_points=10
            )
        return out

    # -- multiview (frame bbox) info --------------------------------------

    def _load_rscan_mv_info(self, scan_id: str) -> Dict[int, list]:
        """3RScan per-instance frame bboxes (scan_data_loader.py:53-81)."""
        import json

        path = (
            Path(self.cfg.data.mv_info_base)
            / "3RScan_caption_with_object" / scan_id / "cap_res.json"
        )
        with open(path) as f:
            mv_all = json.load(f)
        obj_dict: Dict[int, list] = {}
        for inst_id, bboxes in mv_all.items():
            for one in bboxes:
                obj_dict.setdefault(int(inst_id), []).append(
                    {
                        "bbox_2d": one["bbox"],
                        "inst_id": inst_id,
                        "frame_name": one["frame"],
                        "frame_path": one["frame_path"],
                        "label": one.get("tgt_label", ""),
                    }
                )
        return self._sort_and_trim_mv(obj_dict)

    def _load_arkit_mv_info(self, scan_id: str) -> Dict[int, list]:
        """ARKit frame bboxes keyed by frame → per-instance
        (scan_data_loader.py:97-132)."""
        import json

        base = Path(self.cfg.data.mv_info_base) / "ARkit_caption_for_EQA" / "arkit_unique" / scan_id
        with open(base / "frame_bbox.json") as f:
            frame_dict = json.load(f)
        obj_dict: Dict[int, list] = {}
        for frame_id, bbox_list in frame_dict.items():
            for one in bbox_list:
                inst_id = int(one["inst_id"])
                frame_name = f"{scan_id}_{one.get('frame_id', frame_id)}.png"
                obj_dict.setdefault(inst_id, []).append(
                    {
                        "bbox_2d": one["bbox"],
                        "inst_id": inst_id,
                        "frame_name": frame_name,
                        "frame_path": str(base / "vga_wide" / "vga_wide" / frame_name),
                        "label": one.get("cls_label", ""),
                    }
                )
        return self._sort_and_trim_mv(obj_dict)

    def _sort_and_trim_mv(self, obj_dict: Dict[int, list]) -> Dict[int, list]:
        """Largest-bbox-first, keep top ratio (scan_data_loader.py:76-79)."""

        def area(one):
            (l, t), (r, b) = one["bbox_2d"]
            return (r - l) * (b - t)

        for inst_id, lst in obj_dict.items():
            lst.sort(key=area, reverse=True)
            keep = max(self.min_keep_num, int(len(lst) * self.bbox_keep_ratio)) + 1
            obj_dict[inst_id] = lst[:keep]
        return obj_dict

    # -- object crop images ---------------------------------------------

    def get_one_img(self, one_bbox: Dict[str, Any]) -> np.ndarray:
        """Crop an object from its frame by (expanded) 2D bbox and
        normalize (scan_data_loader.py:206-234)."""
        from PIL import Image

        img = Image.open(one_bbox["frame_path"]).convert("RGB")
        img_w, img_h = img.size
        (l, t), (r, b) = one_bbox["bbox_2d"]
        bw, bh = r - l, b - t
        l -= bw * self.bbox_expand
        r += bw * self.bbox_expand
        t -= bh * self.bbox_expand
        b += bh * self.bbox_expand
        l, t = int(max(0, l)), int(max(0, t))
        r, b = int(min(img_w - 1, r)), int(min(img_h - 1, b))
        crop = np.asarray(img.crop((l, t, r, b)))
        return preprocess_2d(crop, size=self.tgt_img_size)

    def get_one_certain_img(
        self, scan_id: str, inst_id: int, label: str
    ) -> Optional[np.ndarray]:
        """Pre-cropped object image → normalized (H, W, 3) float32, or None
        when the crop doesn't exist (caller falls back to text,
        msr3d.py:451-455)."""
        img_base = self.cfg.data.get("obj_img_base", "")
        if not img_base:
            return None
        path = Path(img_base) / self.dataset / f"{scan_id}_inst{inst_id}_{label}_0.jpg"
        if not path.exists():
            return None
        from PIL import Image

        img = np.asarray(Image.open(path).convert("RGB"))
        return preprocess_2d(img, size=self.tgt_img_size)


class ScanCache:
    """Global per-process scan cache (reference module-level dict,
    msr3d.py:50-51,163-179)."""

    _store: Dict[str, Dict[str, Dict[str, Any]]] = {}

    @classmethod
    def get(
        cls, loader: ScanDataLoader, dataset_name: str, scan_id: str,
        data_type_list: List[str], pc_type: str = "gt",
    ) -> Dict[str, Any]:
        # pred loads add extra keys (obj_pcds_pred, ...) — cache separately
        key = scan_id if pc_type == "gt" else f"{scan_id}:{pc_type}"
        ds_cache = cls._store.setdefault(dataset_name, {})
        scan_cache = ds_cache.setdefault(key, {})
        missing = [t for t in data_type_list if t not in scan_cache]
        if missing:
            scan_cache.update(
                loader.get_data(dataset_name, scan_id, missing, pc_type=pc_type)
            )
        return scan_cache

    @classmethod
    def clear(cls) -> None:
        cls._store.clear()
