"""Legacy ScanNet task datasets + wrappers over synthetic fixtures
(reference data/datasets/scannet.py:19-1749, dataset_wrapper.py:20-127)."""

import numpy as np
import pytest

from msr3d_tpu.config import config_from_dict
from msr3d_tpu.data.synthetic import (
    build_legacy_annotations,
    build_scannet_tree,
    legacy_config_dict,
)

SCAN_IDS = ("scene0000_00", "scene0001_00")


@pytest.fixture(scope="module")
def legacy_cfg(tmp_path_factory):
    root = tmp_path_factory.mktemp("legacy")
    rng = np.random.default_rng(0)
    base = build_scannet_tree(root, rng, scan_ids=SCAN_IDS, n_objects=5)
    build_legacy_annotations(base, SCAN_IDS)
    from msr3d_tpu.data.scan_loader import ScanCache

    ScanCache.clear()
    return config_from_dict(legacy_config_dict(base))


def _make(name, cfg, split="train"):
    import msr3d_tpu.data.datasets.scannet_legacy as sl

    return getattr(sl, name)(cfg, split)


class TestScanRefer:
    def test_item_contract(self, legacy_cfg):
        ds = _make("ScanNetScanRefer", legacy_cfg)
        assert len(ds) == 4  # 2 scans × 2 items
        item = ds[0]
        # instances: chair,table,lamp,wall,sofa → wall filtered → 4 objects
        assert item["obj_fts"].shape == (4, 64, 6)
        assert item["obj_locs"].shape == (4, 6)
        assert item["obj_boxes"].shape == (4, 6)
        # unit-sphere normalization
        assert np.sqrt((item["obj_fts"][..., :3] ** 2).sum(-1)).max() <= 1.0 + 1e-5
        # target: instance 0 = chair, still index 0 after bg filtering
        assert item["tgt_object_id"][0] == 0
        assert item["tgt_object_label"][0] == 3  # cat2int['chair']
        assert item["tgt_object_id_iou25"][0] == 1 and item["tgt_object_id_iou25"].sum() == 1
        assert item["is_multiple"] in (True, False)

    def test_val_no_rotation_is_deterministic_locs(self, legacy_cfg):
        ds = _make("ScanNetScanRefer", legacy_cfg, "val")
        a, b = ds[0], ds[0]
        np.testing.assert_allclose(a["obj_locs"], b["obj_locs"])


class TestReferit3D:
    def test_view_dependence_and_aug(self, legacy_cfg):
        ds = _make("ScanNetReferit3D", legacy_cfg)
        # nr3d (2 scans) + sr3d+ aug (2 scans)
        assert len(ds) == 4
        item = ds[0]
        assert item["is_view_dependent"] is True  # 'behind' in tokens
        assert "is_hard" in item
        assert item["tgt_object_label"][0] == 4  # table


class TestSpatialRefer:
    def test_multi_source(self, legacy_cfg):
        ds = _make("ScanNetSpatialRefer", legacy_cfg, "train")
        # referit3d nr3d (2) + scanrefer (4)
        assert len(ds) == 6
        item = ds[len(ds) - 1]
        assert item["obj_fts"].shape[1:] == (64, 6)

    def test_val_sources(self, legacy_cfg):
        ds = _make("ScanNetSpatialRefer", legacy_cfg, "val")
        assert len(ds) == 4  # scanrefer only


class TestScanQA:
    def test_answer_multihot(self, legacy_cfg):
        ds = _make("ScanNetScanQA", legacy_cfg)
        assert len(ds) == 4
        item = ds[0]
        # train vocab = {'a table','table'} → both answers hit
        assert item["answer_label"].sum() == 2
        assert item["answer_label"].shape == (ds.num_answers,)
        assert item["tgt_object_id"].sum() == 1
        assert item["tgt_object_label"].shape == (607,)
        assert item["tgt_object_label"][4] == 1  # table
        assert isinstance(item["data_idx"], int)
        assert "[answer_seq]" in item["answer_list"]

    def test_instruction_view(self, legacy_cfg):
        ds = _make("ScanNetScanQAInstruction", legacy_cfg)
        item = ds[0]
        assert item["prompt_before_obj"].startswith("Assume you are an AI visual assistant")
        assert "Question: What is next to the chair?" in item["prompt_after_obj"]
        assert item["text_output"] in ("table", "a table")


class TestSGQA:
    def test_situated_item(self, legacy_cfg):
        ds = _make("ScanNetSGQA", legacy_cfg)
        assert len(ds) == 2
        item = ds[0]
        assert item["answer_list"] == "gray"  # stripped
        assert item["situation_pos"].shape == (3,)
        assert item["situation_rot"].shape == (4,)
        assert item["obj_fts"].shape[0] == 5  # no bg filter, all 5 objects
        assert item["sqa_type"] == 0  # 'What ...'


class TestPretrain:
    def test_caption_items(self, legacy_cfg):
        ds = _make("ScanNetPretrain", legacy_cfg)
        assert len(ds) == 2
        item = ds[0]
        assert item["sentence"] == "a room with a chair and a table"
        assert item["obj_fts"].shape == (4, 64, 6)
        assert (item["obj_labels"] >= 0).all()


class TestLegacyWrappers:
    def test_scan_family_wrapper(self, legacy_cfg):
        from msr3d_tpu.data.datasets.dataset_wrapper import ScanFamilyDatasetWrapper

        ds = _make("ScanNetScanRefer", legacy_cfg)
        w = ScanFamilyDatasetWrapper(
            legacy_cfg, ds, {"max_seq_len": 32, "max_obj_len": 10}
        )
        item = w[0]
        assert item["txt_ids"].shape == (32,)
        assert item["txt_masks"][:3].sum() == 3
        assert item["obj_fts"].shape == (10, 64, 6)
        assert item["obj_masks"].sum() == 4
        assert item["obj_labels"][4:].max() == -100  # padded labels
        assert item["tgt_object_id_iou25"].shape == (10,)

        batch = w.collate_fn([w[0], w[1]])
        assert batch["obj_fts"].shape == (2, 10, 64, 6)
        assert batch["tgt_object_id"].shape == (2, 1)

    def test_mask_wrapper_mlm(self, legacy_cfg):
        from msr3d_tpu.data.datasets.dataset_wrapper import MaskDatasetWrapper

        ds = _make("ScanNetPretrain", legacy_cfg)
        w = MaskDatasetWrapper(
            legacy_cfg, ds,
            {"max_seq_len": 32, "max_obj_len": 10,
             "txt_mask_ratio": 0.5, "pc_mask_ratio": 0.5},
        )
        item = w[0]
        labels = item["masked_lm_labels"]
        assert labels.shape == (32,)
        assert (labels[item["txt_masks"] == 0] == -1).all()
        assert (labels != -1).sum() >= 1  # ratio 0.5 over 9+ tokens
        assert item["obj_sem_masks"].shape == (10,)
        assert not item["obj_sem_masks"][4:].any()  # padding stays masked


class TestLossWiring:
    def test_grounding_batch_through_losses(self, legacy_cfg):
        """The wrapper's batch feeds the legacy loss registry end-to-end."""
        import jax.numpy as jnp

        from msr3d_tpu.data.datasets.dataset_wrapper import ScanFamilyDatasetWrapper
        from msr3d_tpu.optim.losses import get_losses

        ds = _make("ScanNetScanRefer", legacy_cfg)
        w = ScanFamilyDatasetWrapper(legacy_cfg, ds, {"max_seq_len": 32, "max_obj_len": 10})
        batch = w.collate_fn([w[0], w[1]])

        B, O = batch["obj_fts"].shape[:2]
        rng = np.random.default_rng(0)
        data_dict = {
            "og3d_logits": jnp.asarray(rng.normal(size=(B, O)).astype(np.float32)),
            "tgt_object_id": jnp.asarray(batch["tgt_object_id"]),
            "obj_cls_raw_logits": jnp.asarray(rng.normal(size=(B, O, 607)).astype(np.float32)),
            "obj_labels": jnp.asarray(np.maximum(batch["obj_labels"], 0)),
            "obj_masks": jnp.asarray(batch["obj_masks"]),
        }
        total, all_losses = get_losses(
            data_dict, ["og3d_loss", "obj_cls_raw_loss"], ["og3d_loss", "obj_cls_raw_loss"]
        )
        assert np.isfinite(float(total))
