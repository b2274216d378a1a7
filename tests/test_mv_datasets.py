"""Multiview datasets over synthetic MultiViewInfo fixtures
(reference data/datasets/scannet.py:85-333, scannet_base.py:345-453)."""

import numpy as np
import pytest

from msr3d_tpu.config import config_from_dict
from msr3d_tpu.data.synthetic import (
    build_legacy_annotations,
    build_multiview_tree,
    build_scannet_tree,
    mv_config_dict,
)

SCAN_IDS = ("scene0000_00", "scene0001_00")


@pytest.fixture(scope="module")
def mv_cfg(tmp_path_factory):
    root = tmp_path_factory.mktemp("mv")
    rng = np.random.default_rng(0)
    base = build_scannet_tree(root, rng, scan_ids=SCAN_IDS, n_objects=5)
    build_legacy_annotations(base, SCAN_IDS)
    build_multiview_tree(base, SCAN_IDS)
    from msr3d_tpu.data.scan_loader import ScanCache

    ScanCache.clear()
    return config_from_dict(mv_config_dict(base))


class TestMVPretrain:
    def test_pooled_items(self, mv_cfg):
        from msr3d_tpu.data.datasets.scannet_mv import ScanNetMVPretrain

        ds = ScanNetMVPretrain(mv_cfg, "train")
        assert len(ds) == 2
        item = ds[0]
        assert item["sentence"].startswith("a room")
        n = len(item["vis_obj_feats"])
        assert n >= 3  # 2 sampled frames see >= 3 distinct instances
        assert item["vis_obj_feats"][0].shape == (16,)
        assert len(item["vis_obj_locs"]) == n and item["vis_obj_locs"][0].shape == (6,)

    def test_per_frame_grid(self, mv_cfg):
        from msr3d_tpu.data.datasets.scannet_mv import ScanNetMVPretrain

        # flip to the per-frame path
        mv_cfg.data.mvdatasettings.is_pool_obj_feature = False
        try:
            ds = ScanNetMVPretrain(mv_cfg, "train")
            item = ds[0]
            F, I, L = 2, 4, 16
            assert item["mv_inst_feats"].shape == (F * I, L)
            assert item["mv_inst_masks"].shape == (F * I,)
            assert item["mv_camera_pose"].shape == (F * I, 16)
            # 3 instances per frame -> 3 of 4 slots real
            assert item["mv_inst_masks"].reshape(F, I).sum(1).tolist() == [3.0, 3.0]
            assert (item["mv_inst_labels"][item["mv_inst_masks"] == 0] == -100).all()
        finally:
            mv_cfg.data.mvdatasettings.is_pool_obj_feature = True


class TestMVReferit3D:
    def test_grounding_item(self, mv_cfg):
        from msr3d_tpu.data.datasets.scannet_mv import ScanNetMVReferit3D

        ds = ScanNetMVReferit3D(mv_cfg, "train")
        assert len(ds) == 2  # nr3d fixture: one item per scan
        item = ds[0]
        # target: instance 1 ('table'), features are 2D-pooled (16-d)
        assert item["obj_fts"].shape[1] == 16
        assert item["obj_fts"].shape[0] <= 3  # cropped to max_obj_len
        tgt = int(item["tgt_object_id"][0])
        assert item["obj_labels"][tgt] == int(item["tgt_object_label"][0])
        assert item["tgt_object_id_iou25"][tgt] == 1
        assert item["is_view_dependent"] is True  # 'behind' in tokens
