"""Data-layer tests on synthetic on-disk fixtures in the reference formats."""

import numpy as np
import pytest

from msr3d_tpu.config import config_from_dict
from msr3d_tpu.data.scan_loader import ScanCache

from tests.fixtures_data import build_full_tree, full_config_dict


@pytest.fixture(scope="module")
def data_tree(tmp_path_factory):
    rng = np.random.default_rng(7)
    root = tmp_path_factory.mktemp("scans")
    build_full_tree(root, rng)
    return root


@pytest.fixture()
def cfg(data_tree):
    ScanCache.clear()
    return config_from_dict(full_config_dict(data_tree))


class TestScanLoader:
    def test_scannet_objects(self, cfg):
        from msr3d_tpu.data.scan_loader import ScanDataLoader

        loader = ScanDataLoader(cfg, dataset="ScanNet")
        data = loader.get_data("ScanNet", "scene0000_00", ["obj_pcds"])
        assert len(data["obj_pcds"]) == 5
        pcd = data["obj_pcds"][0]
        assert pcd.shape[1] == 6
        # colors normalized to [-1, 1]
        assert pcd[:, 3:].min() >= -1.001 and pcd[:, 3:].max() <= 1.001

    def test_rscan_and_arkit(self, cfg):
        from msr3d_tpu.data.scan_loader import ScanDataLoader

        r = ScanDataLoader(cfg, dataset="3RScan").get_data("3RScan", "rscan0001", ["obj_pcds"])
        assert len(r["obj_pcds"]) == 4
        a = ScanDataLoader(cfg, dataset="ARkit").get_data("ARkit", "arkit0001", ["obj_pcds"])
        assert len(a["obj_pcds"]) == 4  # 50 pts/obj ≥ min 10 → all kept

    def test_cache_hits(self, cfg):
        from msr3d_tpu.data.scan_loader import ScanDataLoader

        loader = ScanDataLoader(cfg, dataset="ScanNet")
        d1 = ScanCache.get(loader, "ScanNet", "scene0000_00", ["obj_pcds"])
        d2 = ScanCache.get(loader, "ScanNet", "scene0000_00", ["obj_pcds"])
        assert d1 is d2


class TestMSQADataset:
    def test_item_contract(self, cfg):
        from msr3d_tpu.data.datasets.msr3d import MSQAScanNet, MSR3D_REQUIRED_KEYS

        ds = MSQAScanNet(cfg, "train")
        assert len(ds) == 4  # debug_size
        item = ds[0]
        for key in MSR3D_REQUIRED_KEYS:
            assert key in item, key
        assert item["obj_fts"].shape == (5, 64, 6)  # 5 objects, 64 pts
        assert item["obj_locs"].shape == (5, 6)
        # unit-sphere normalization
        assert np.abs(np.linalg.norm(item["obj_fts"][:, :, :3], axis=2)).max() <= 1.001
        # no object crops on disk → images fell back to text
        assert item["msr3d_imgs"] == []
        assert "图" not in item["msr3d_prompt"]
        assert "景" in item["msr3d_prompt"]
        assert item["msr3d_prompt"].count("景") == 1
        assert item["text_output"] in ("red", "the red one")
        assert item["anchor_orientation"].shape == (4,)

    def test_eval_split_no_rotation(self, cfg):
        from msr3d_tpu.data.datasets.msr3d import MSQAScanNet

        ds = MSQAScanNet(cfg, "val")
        a = ds[0]["obj_locs"]
        b = ds[0]["obj_locs"]
        np.testing.assert_allclose(a, b)  # no rotation aug at eval

    def test_relevant_objects_first_crop(self, cfg):
        from msr3d_tpu.data.datasets.msr3d import MSQAScanNet

        # max_obj_len 3 < 5 objects → insts (1, 2) must survive the crop
        cfg.data.msqa_scannet.args["max_obj_len"] = 3
        ds = MSQAScanNet(cfg, "train")
        item = ds[0]
        assert item["obj_fts"].shape[0] == 3


class TestSQA3D:
    def test_item(self, cfg):
        from msr3d_tpu.data.datasets.sqa3d import SQA3DScanNet

        ds = SQA3DScanNet(cfg, "val")
        assert len(ds) == 3
        item = ds[0]
        assert item["text_output"] == "chair"
        assert "msr3d_prompt" in item
        assert item["sqa_type"] == 0  # "What ..."
        assert item["data_idx"] == 1000
        # wall filtered out: 5 objects, one is "wall" → 4 left
        assert item["obj_fts"].shape[0] == 4

    def test_instruction_variant(self, cfg):
        from msr3d_tpu.data.datasets.sqa3d import ScanNetSQA3DInstruction

        ds = ScanNetSQA3DInstruction(cfg, "val")
        item = ds[0]
        assert item["prompt_before_obj"].startswith(
            "Assume you are an AI visual assistant situated in a 3D scene."
        )
        assert item["prompt_before_obj"].endswith(
            "Here are the object tokens in the scene: "
        )
        assert item["prompt_after_obj"].startswith(". Situation: ")
        assert f"Question: {item['question']} Answer: " in item["prompt_after_obj"]
        assert item["text_output"] in item["answer_list"].split("[answer_seq]")

    def test_person_view_conversion(self):
        from msr3d_tpu.data.datasets.sqa3d import convert_person_view

        assert convert_person_view("I am near my chair") == "you are near your chair"


class TestMSNN:
    def test_item_and_action_token(self, cfg):
        from msr3d_tpu.data.constants import ONESTEPNAVI_ACTION_SPACE_TOKENIZE
        from msr3d_tpu.data.datasets.one_step_navi import MSR3DMSNN

        ds = MSR3DMSNN(cfg, "train")
        assert len(ds) == 4
        item = ds[0]
        assert item["text_output"] in ONESTEPNAVI_ACTION_SPACE_TOKENIZE.values()
        assert "msr3d_prompt" in item


class TestMixAndWrapper:
    def test_msr3dmix(self, cfg):
        from msr3d_tpu.data.datasets.msr3d import MSR3DMix

        ds = MSR3DMix(cfg, "train")
        assert len(ds) == 4
        item = ds[0]
        assert "msr3d_prompt" in item

    def test_wrapper_pads(self, cfg):
        from msr3d_tpu.data.build import build_dataloader_leo

        loader = build_dataloader_leo(
            cfg, "MSR3DMix", "LeoScanFamilyDatasetWrapper",
            {"max_obj_len": 6, "msr3d_max_img_num": 4},
            {"batchsize": 2}, "train",
        )
        batch = next(iter(loader))
        assert batch["obj_fts"].shape == (2, 6, 64, 6)
        assert batch["obj_masks"].shape == (2, 6)
        assert batch["obj_masks"].sum(1).tolist() == [5, 5]
        assert batch["msr3d_imgs"].shape == (2, 4, 32, 32, 3)
        assert batch["msr3d_img_masks"].sum() == 0
        assert isinstance(batch["msr3d_prompt"], list)
        assert len(batch["msr3d_prompt"]) == 2
        # padded objects filled with 1.0 (reference pad value)
        np.testing.assert_allclose(batch["obj_fts"][0, 5], 1.0)

    def test_build_task_loaders(self, cfg):
        from msr3d_tpu.data.build import build_task_loaders

        loaders = build_task_loaders(cfg)
        assert set(loaders) == {"msr3d_train", "msqa_scannet"}
        assert set(loaders["msr3d_train"]) == {"train"}
        assert set(loaders["msqa_scannet"]) == {"val", "test"}
        batch = next(iter(loaders["msqa_scannet"]["val"]))
        assert "answer_list" in batch

    def test_dataloader_shuffles_per_epoch(self, cfg):
        from msr3d_tpu.data.build import build_task_loaders

        loaders = build_task_loaders(cfg)
        train = loaders["msr3d_train"]["train"]
        train.set_epoch(0)
        first = [b["index"] for b in train]
        train.set_epoch(1)
        second = [b["index"] for b in train]
        assert len(first) == len(second) == 2


@pytest.mark.slow
class TestEndToEndWithModel:
    def test_real_data_through_tiny_model(self, cfg):
        """Fixture data → wrapper → collate → MSR3D forward + generate."""
        from msr3d_tpu.data.build import build_task_loaders
        from tests.test_msr3d import tiny_model

        loaders = build_task_loaders(cfg)
        batch = next(iter(loaders["msr3d_train"]["train"]))

        model = tiny_model(scene_token_len=3)
        prompts = model.build_text_prompt(batch)
        ii, am = model._encode_prompts(prompts)
        oi, om = model._encode_answers(batch["text_output"])
        device_batch = model._scene_batch(batch)
        device_batch.update(
            input_ids=ii, attention_mask=am, output_ids=oi, output_mask=om
        )
        model.init_params(device_batch)
        out = model.forward(dict(batch))
        loss = np.asarray(out["loss"])
        assert loss.shape == (2,) and np.isfinite(loss).all()

        gen = model.generate(dict(batch), use_beam=False, max_new_tokens=4)
        assert gen["output_tokens"].shape == (2, 4)


class TestNativePreprocess:
    def test_native_matches_numpy_semantics(self, rng):
        """The native path must produce the same obj_locs (deterministic) and
        statistically-equivalent obj_fts (resampling is stochastic)."""
        from msr3d_tpu.data import native

        if not native.available():
            pytest.skip("no g++ available to build the native lib")

        obj_pcds = [rng.normal(size=(300 + 50 * i, 6)).astype(np.float32) for i in range(5)]
        rot = None
        fts, locs = native.preprocess_objects(obj_pcds, 64, rot, seed=123)
        assert fts.shape == (5, 64, 6)
        assert locs.shape == (5, 6)
        # locs: deterministic center/size over the raw cloud
        for i, p in enumerate(obj_pcds):
            np.testing.assert_allclose(locs[i, :3], p[:, :3].mean(0), atol=1e-4)
            np.testing.assert_allclose(
                locs[i, 3:], p[:, :3].max(0) - p[:, :3].min(0), atol=1e-5
            )
        # fts: unit-sphere normalized, zero-mean xyz
        norms = np.linalg.norm(fts[:, :, :3], axis=2)
        assert norms.max() <= 1.0 + 1e-5
        np.testing.assert_allclose(fts[:, :, :3].mean(1), 0.0, atol=1e-4)
        # colors must be real colors from the cloud (columns 3:6 preserved)
        for i, p in enumerate(obj_pcds):
            assert np.isin(np.round(fts[i, :, 3], 4), np.round(p[:, 3], 4)).all()

    def test_native_with_rotation(self, rng):
        from msr3d_tpu.data import native

        if not native.available():
            pytest.skip("no g++")
        theta = np.pi / 2
        rot = np.array(
            [[np.cos(theta), -np.sin(theta), 0],
             [np.sin(theta), np.cos(theta), 0],
             [0, 0, 1]], np.float32,
        )
        p = rng.normal(size=(200, 6)).astype(np.float32)
        _, locs = native.preprocess_objects([p], 64, rot, seed=7)
        want_center = (p[:, :3] @ rot.T).mean(0)
        np.testing.assert_allclose(locs[0, :3], want_center, atol=1e-4)

    def test_sampling_without_replacement(self, rng):
        from msr3d_tpu.data import native

        if not native.available():
            pytest.skip("no g++")
        # exactly num_points points → sample must be a permutation (all kept)
        p = rng.normal(size=(64, 6)).astype(np.float32)
        fts, _ = native.preprocess_objects([p], 64, None, seed=5)
        got_colors = np.sort(fts[0, :, 3])
        np.testing.assert_allclose(got_colors, np.sort(p[:, 3]), atol=1e-6)

    def test_dataset_uses_native(self, cfg, rng):
        """End-to-end: dataset items flow through the native path."""
        from msr3d_tpu.data import native
        from msr3d_tpu.data.datasets.msr3d import MSQAScanNet

        if not native.available():
            pytest.skip("no g++")
        ds = MSQAScanNet(cfg, "train")
        item = ds[0]
        norms = np.linalg.norm(item["obj_fts"][:, :, :3], axis=2)
        assert norms.max() <= 1.0 + 1e-5


class TestBoxUtils:
    def test_iou_identity_and_disjoint(self):
        from msr3d_tpu.data.box_utils import (
            box3d_iou_aligned,
            construct_bbox_corners,
            convert_pc_to_box,
        )

        c1 = construct_bbox_corners([0, 0, 0], [2, 2, 2])
        assert box3d_iou_aligned(c1, c1) == pytest.approx(1.0)
        c2 = construct_bbox_corners([10, 0, 0], [2, 2, 2])
        assert box3d_iou_aligned(c1, c2) == 0.0
        # half-overlap along x
        c3 = construct_bbox_corners([1, 0, 0], [2, 2, 2])
        assert box3d_iou_aligned(c1, c3) == pytest.approx(1 / 3)

    def test_convert_pc_to_box(self, rng):
        from msr3d_tpu.data.box_utils import convert_pc_to_box

        pts = rng.uniform(-1, 1, size=(100, 6))
        center, size = convert_pc_to_box(pts)
        np.testing.assert_allclose(
            center, (pts[:, :3].min(0) + pts[:, :3].max(0)) / 2
        )


class TestMVInfoAndCrop:
    def test_get_one_img_crop(self, cfg, tmp_path, rng):
        from PIL import Image

        from msr3d_tpu.data.scan_loader import ScanDataLoader

        frame = (rng.random((100, 120, 3)) * 255).astype(np.uint8)
        path = tmp_path / "frame.jpg"
        Image.fromarray(frame).save(path)

        loader = ScanDataLoader(cfg, dataset="3RScan")
        out = loader.get_one_img(
            {"bbox_2d": [[20, 30], [80, 70]], "frame_path": str(path)}
        )
        assert out.shape == (32, 32, 3)  # cfg tgt_img_size
        assert out.dtype == np.float32

    def test_rscan_mv_info_sorting(self, cfg, tmp_path):
        import json

        from msr3d_tpu.data.scan_loader import ScanDataLoader

        mv_dir = tmp_path / "3RScan_caption_with_object" / "rscanX"
        mv_dir.mkdir(parents=True)
        json.dump(
            {
                "3": [
                    {"bbox": [[0, 0], [10, 10]], "frame": "f1", "frame_path": "p1", "tgt_label": "chair"},
                    {"bbox": [[0, 0], [50, 50]], "frame": "f2", "frame_path": "p2", "tgt_label": "chair"},
                    {"bbox": [[0, 0], [20, 20]], "frame": "f3", "frame_path": "p3", "tgt_label": "chair"},
                ]
            },
            open(mv_dir / "cap_res.json", "w"),
        )
        cfg.data["mv_info_base"] = str(tmp_path)
        loader = ScanDataLoader(cfg, dataset="3RScan")
        info = loader._load_rscan_mv_info("rscanX")
        # sorted by bbox area, largest first; keep max(1, 3*0.5)+1 = 2
        assert [b["frame_name"] for b in info[3]] == ["f2", "f3"]


class TestSplitSentenceAndGrain:
    def test_split_sentence(self):
        from msr3d_tpu.data.datasets.msr3d import MSR3DBase

        base = MSR3DBase.__new__(MSR3DBase)
        base.split = "train"
        long = "First sentence here. Second sentence follows. Third one too. Fourth closes"
        chunks = base._split_sentence(long, max_length=45, prefix="C: ")
        assert len(chunks) >= 2
        assert all(len(c) <= 45 for c in chunks)
        assert chunks[0].startswith("C: First")
        # eval split: no splitting
        base.split = "val"
        assert base._split_sentence(long, 45, "C: ") == ["C: " + long]

    def test_grain_loader(self, cfg):
        from msr3d_tpu.data.build import build_dataloader_leo

        loader = build_dataloader_leo(
            cfg, "MSR3DMix", "LeoScanFamilyDatasetWrapper",
            {"max_obj_len": 6, "msr3d_max_img_num": 4},
            {"batchsize": 2, "backend": "grain", "num_workers": 1}, "train",
        )
        batches = list(loader)
        assert len(batches) == len(loader) == 2
        assert batches[0]["obj_fts"].shape == (2, 6, 64, 6)
        loader.set_epoch(1)
        b2 = list(loader)
        assert len(b2) == 2
