"""Synthetic on-disk data fixtures mirroring the reference file formats.

Creates a miniature ScanNet/3RScan/ARKit tree + MSQA/SQA3D/MSNN
annotations so the real loaders exercise the same parsing
paths they'd use on the actual datasets. Used by tests and by the
debug_synthetic config for end-to-end smoke runs without the real scans."""

import json
from pathlib import Path

import numpy as np


def make_scene_pcd(rng, n_objects=5, pts_per_obj=200):
    """(points, colors, instance_labels) in the .pth layout."""
    points, colors, inst = [], [], []
    for i in range(n_objects):
        center = rng.uniform(-3, 3, size=3)
        pts = center + rng.normal(scale=0.3, size=(pts_per_obj, 3))
        points.append(pts)
        colors.append(rng.integers(0, 255, size=(pts_per_obj, 3)))
        inst.append(np.full(pts_per_obj, i))
    return (
        np.concatenate(points).astype(np.float32),
        np.concatenate(colors).astype(np.float32),
        np.concatenate(inst).astype(np.int64),
    )


def build_scannet_tree(root: Path, rng, scan_ids=("scene0000_00", "scene0001_00"), n_objects=5):
    import torch

    base = root / "scan_family"
    (base / "scan_data" / "pcd_with_global_alignment").mkdir(parents=True, exist_ok=True)
    (base / "scan_data" / "instance_id_to_name").mkdir(parents=True, exist_ok=True)
    (base / "annotations" / "sqa_task" / "balanced").mkdir(parents=True, exist_ok=True)
    (base / "annotations" / "meta_data").mkdir(parents=True, exist_ok=True)
    (base / "annotations" / "splits").mkdir(parents=True, exist_ok=True)

    categories = ["wall", "floor", "ceiling", "chair", "table", "lamp", "sofa"]
    json.dump(categories, open(base / "annotations" / "meta_data" / "scannetv2_raw_categories.json", "w"))

    for scan_id in scan_ids:
        points, colors, inst = make_scene_pcd(rng, n_objects)
        # reference layout: pcd_data[0]=points, [1]=colors, [-1]=instance_labels
        torch.save(
            (torch.from_numpy(points), torch.from_numpy(colors), None,
             torch.from_numpy(inst)),
            base / "scan_data" / "pcd_with_global_alignment" / f"{scan_id}.pth",
        )
        names = ["chair", "table", "lamp", "wall", "sofa"][:n_objects]
        json.dump(names, open(base / "scan_data" / "instance_id_to_name" / f"{scan_id}.json", "w"))
        (base / "scans" / scan_id).mkdir(parents=True, exist_ok=True)
        align = np.eye(4).reshape(-1)
        with open(base / "scans" / scan_id / f"{scan_id}.txt", "w") as f:
            f.write("axisAlignment = " + " ".join(str(v) for v in align) + "\n")

    for split in ("train", "val", "test"):
        with open(base / "annotations" / "splits" / f"scannetv2_{split}.txt", "w") as f:
            f.write("\n".join(scan_ids))

    # SQA3D annotations
    json.dump(
        [{"zero": 0, "one": 1, "red": 2, "chair": 3, "two": 4}],
        open(base / "annotations" / "sqa_task" / "answer_dict.json", "w"),
    )
    for split in ("train", "val", "test"):
        questions = {
            "questions": [
                {
                    "scene_id": scan_ids[0],
                    "situation": "I am standing by the chair facing the table.",
                    "alternative_situation": ["I sit near the table."],
                    "question": "What is in front of me?",
                    "question_id": 1000 + i,
                }
                for i in range(3)
            ]
        }
        annos = {
            "annotations": [
                {
                    "scene_id": scan_ids[0],
                    "question_id": 1000 + i,
                    "answers": [{"answer": "chair", "answer_confidence": "yes", "answer_id": 1}],
                    "rotation": {"_x": 0, "_y": 0, "_z": 0.0, "_w": 1.0},
                    "position": {"x": 0.5, "y": -0.2, "z": 0},
                }
                for i in range(3)
            ]
        }
        json.dump(questions, open(base / "annotations" / "sqa_task" / "balanced" / f"v1_balanced_questions_{split}_scannetv2.json", "w"))
        json.dump(annos, open(base / "annotations" / "sqa_task" / "balanced" / f"v1_balanced_sqa_annotations_{split}_scannetv2.json", "w"))
    return base


def build_msqa_annotations(root: Path, scan_ids, n=6, domain="scannet"):
    anno_dir = root / "msr3d" / domain
    anno_dir.mkdir(parents=True, exist_ok=True)
    for split in ("train", "val", "test"):
        records = []
        for i in range(n):
            records.append(
                {
                    "scan_id": scan_ids[i % len(scan_ids)],
                    "question": f"What is the color of the chair number {i}?",
                    "answers": ["red", "the red one"],
                    "situation": "To my left there is a <chair-1-IMG> near a table.",
                    "location": [0.1 * i, -0.2, 0.0],
                    "orientation": [0.6, 0.77, 0],
                    "type": "attribute-color",
                    "index": i,
                    "raw_thought": "chair-1, table-2",
                }
            )
        stem = {"scannet": "msqa_scannet", "rscan": "msqa_rscan", "arkitscenes": "msqa_arkitscenes"}[domain]
        json.dump(records, open(anno_dir / f"{stem}_{split}.json", "w"))
    return root / "msr3d"


def build_rscan_tree(root: Path, rng, scan_ids=("rscan0001",), n_objects=4):
    import torch

    base = root / "rscan"
    for scan_id in scan_ids:
        d = base / "3RScan-ours-align" / scan_id
        d.mkdir(parents=True, exist_ok=True)
        points, colors, inst = make_scene_pcd(rng, n_objects)
        torch.save((torch.from_numpy(points), torch.from_numpy(colors), torch.from_numpy(inst)), d / "pcds.pth")
        torch.save({i: f"obj{i}" for i in range(n_objects)}, d / "inst_to_label.pth")
    return base


def build_arkit_tree(root: Path, rng, scan_ids=("arkit0001",), n_objects=4):
    import torch

    base = root / "arkit"
    (base / "scan_data" / "pcd-align").mkdir(parents=True, exist_ok=True)
    (base / "scan_data" / "instance_id_to_label").mkdir(parents=True, exist_ok=True)
    for scan_id in scan_ids:
        points, colors, inst = make_scene_pcd(rng, n_objects, pts_per_obj=50)
        torch.save(
            (torch.from_numpy(points), torch.from_numpy(colors), torch.from_numpy(inst)),
            base / "scan_data" / "pcd-align" / f"{scan_id}.pth",
        )
        torch.save(
            {i: f"obj{i}" for i in range(n_objects)},
            base / "scan_data" / "instance_id_to_label" / f"{scan_id}_inst_to_label.pth",
        )
    return base


def build_msnn_annotations(root: Path, scan_ids, n=4):
    base = root / "msnn"
    base.mkdir(parents=True, exist_ok=True)
    anno = {}
    for scan_id in scan_ids:
        anno[scan_id] = {
            str(i): {
                "location": [0.1 * i, 0.2, 0.0],
                "orientation": [0, 0, 0, 1],
                "situation_multimodal": "You face a chair.",
                "situation_text": "You face a chair (text).",
                "interaction": "Go to the table.",
                "insts": [0, 1],
                "action": {
                    "four_direction": [i % 4, ["move forward", "turn left", "move backward", "turn right"][i % 4]],
                    "eight_direction": [i % 8, "turn"],
                },
            }
            for i in range(n)
        }
    json.dump(anno, open(base / "msnn_scannet.json", "w"))
    return base


def full_config_dict(root: Path, debug_size=4):
    """Config matching the reference YAML layout, pointed at the fixture tree."""
    return {
        "rng_seed": 42,
        "debug": {"flag": True, "debug_size": debug_size},
        "data": {
            "scan_family_base": str(root / "scan_family"),
            "rscan_base": str(root / "rscan"),
            "ARkit_base": str(root / "arkit"),
            "msr3d_base": str(root / "msr3d"),
            "msnn_base": str(root / "msnn"),
            "obj_img_base": "",
            "process_args": {
                "img_process_args": {
                    "bbox_keep_ratio": 0.5,
                    "bbox_expand": 0.1,
                    "img_processer": "navigation_img_processer",
                    "tgt_img_size": [32, 32],
                }
            },
            "msr3dmix": {"args": {"mix": ["msqa_scannet"], "ratio": 1.0, "few_shot_num": 0, "num_points": 64}},
            "msqa_scannet": {"args": {"anno_dir": str(root / "msr3d" / "scannet"), "max_obj_len": 6, "num_points": 64, "few_shot_num": 0, "msr3d_max_img_num": 4, "val_num": 2}},
            "msqa_3rscan": {"args": {"anno_dir": str(root / "msr3d" / "rscan"), "max_obj_len": 6, "num_points": 64, "few_shot_num": 0, "msr3d_max_img_num": 4, "val_num": 2}},
            "msqa_arkitscenes": {"args": {"anno_dir": str(root / "msr3d" / "arkitscenes"), "max_obj_len": 6, "num_points": 64, "few_shot_num": 0, "msr3d_max_img_num": 4, "val_num": 2}},
            "sqa3d": {"args": {"max_obj_len": 6, "max_seq_len": 80, "num_points": 64, "pc_type": "gt", "sem_type": "607", "filter_lang": False, "use_unanswer": True}},
            "next_step_navigation": {"args": {"max_obj_len": 6, "num_points": 64, "pc_type": "gt", "action_type": "four_direction", "modality_type": "multimodal"}},
        },
        "task": {
            "msr3d_train": {
                "mode": ["train"],
                "dataset": "MSR3DMix",
                "dataset_wrapper": "LeoScanFamilyDatasetWrapper",
                "dataset_wrapper_args": {"max_obj_len": 6, "msr3d_max_img_num": 4},
                "train_dataloader_args": {"batchsize": 2},
                "eval_dataloader_args": {"batchsize": 2},
            },
            "msqa_scannet": {
                "mode": ["val", "test"],
                "dataset": "MSQAScanNet",
                "dataset_wrapper": "LeoScanFamilyDatasetWrapper",
                "dataset_wrapper_args": {"max_obj_len": 6, "msr3d_max_img_num": 4},
                "eval_dataloader_args": {"batchsize": 2},
                "evaluator": "MSQAEval",
            },
        },
    }


def build_full_tree(tmp_path: Path, rng):
    root = tmp_path
    build_scannet_tree(root, rng)
    build_msqa_annotations(root, ["scene0000_00", "scene0001_00"], domain="scannet")
    build_msqa_annotations(root, ["rscan0001"], domain="rscan")
    build_msqa_annotations(root, ["arkit0001"], domain="arkitscenes")
    build_rscan_tree(root, rng)
    build_arkit_tree(root, rng)
    build_msnn_annotations(root, ["scene0000_00"])
    return root


def build_legacy_annotations(base: Path, scan_ids):
    """Legacy-task annotation fixtures in the reference formats
    (scannet.py loaders): ScanRefer/Referit3D jsonl, ScanQA json, SGQA json,
    ssg captions, labels TSV. ``base`` is the scan_family tree root."""
    refer_dir = base / "annotations" / "refer"
    qa_dir = base / "annotations" / "qa"
    refer_dir.mkdir(parents=True, exist_ok=True)
    qa_dir.mkdir(parents=True, exist_ok=True)

    # labels TSV aligned with scannetv2_raw_categories.json row order
    categories = json.load(
        open(base / "annotations" / "meta_data" / "scannetv2_raw_categories.json")
    )
    nyu40 = {"wall": ("wall", 1), "floor": ("floor", 2), "ceiling": ("ceiling", 22),
             "chair": ("chair", 5), "table": ("table", 7), "lamp": ("lamp", 35),
             "sofa": ("sofa", 6)}
    with open(base / "annotations" / "meta_data" / "scannetv2-labels.combined.tsv", "w") as f:
        f.write("id\traw_category\tcategory\tcount\tnyu40id\teigen13id\tnyuClass\tnyu40class\n")
        for cat in categories:
            name, nid = nyu40.get(cat, ("otherprop", 40))
            f.write(f"1\t{cat}\t{cat}\t1\t{nid}\t1\t{cat}\t{name}\n")

    # ScanRefer: target instance 0 is 'chair' in every synthetic scan
    with open(refer_dir / "scanrefer.jsonl", "w") as f:
        for i, scan_id in enumerate(scan_ids):
            for j in range(2):
                f.write(json.dumps({
                    "item_id": f"scanrefer_{i}_{j}",
                    "scan_id": scan_id,
                    "target_id": 0,
                    "instance_type": "chair",
                    "utterance": "the chair next to the table on the left",
                }) + "\n")

    # Referit3D (nr3d + sr3d+): tokens field, ≤24 tokens
    for fname in ("nr3d.jsonl", "sr3d+.jsonl"):
        with open(refer_dir / fname, "w") as f:
            for i, scan_id in enumerate(scan_ids):
                utt = "find the table behind the chair"
                f.write(json.dumps({
                    "item_id": f"{fname[:-6]}_{i}",
                    "scan_id": scan_id,
                    "target_id": 1,
                    "instance_type": "table",
                    "utterance": utt,
                    "tokens": utt.split(),
                }) + "\n")

    # ScanQA
    for split in ("train", "val", "test"):
        json.dump(
            [
                {
                    "question_id": f"{split}-{scan_id}-{k}",
                    "scene_id": scan_id,
                    "question": "What is next to the chair?",
                    "object_ids": [1],
                    "object_names": ["table"],
                    "answers": ["table", "a table"],
                }
                for scan_id in scan_ids
                for k in range(2)
            ],
            open(qa_dir / f"ScanQA_v1.0_{split}.json", "w"),
        )

    # SGQA (scene-graph situated QA)
    sgqa_dir = base / "annotations" / "sgqa"
    sgqa_dir.mkdir(parents=True, exist_ok=True)
    for split in ("train", "val", "test"):
        payload = {
            scan_id: {
                "response": [
                    {
                        "Q": "What is the color of the chair in front of me?",
                        "A": [" gray "],
                        "T": f"{scan_id}-0, {scan_id}-1",
                        "type": "attribute-color",
                        "situation": "A chair is to my left.",
                        "location": [0.1, -0.2, 0.0],
                        "orientation": [0.6, 0.77, 0],
                        "query_type": "qa_4_directions",
                        "mode": "txt",
                    }
                ]
            }
            for scan_id in scan_ids
        }
        json.dump(payload, open(sgqa_dir / f"sgqa_{split}.json", "w"))

    # pretrain scene captions
    json.dump(
        [{"scan_id": s, "utterance": "a room with a chair and a table"} for s in scan_ids],
        open(refer_dir / "ssg_caption_gpt.json", "w"),
    )
    return base


def legacy_config_dict(base: Path):
    """Config slice for the legacy datasets (keys per scannet.py inits)."""
    common = {
        "pc_type": "gt", "sem_type": "607", "max_obj_len": 10,
        "num_points": 64, "filter_lang": False, "max_seq_len": 32,
    }
    return {
        "rng_seed": 42,
        "debug": {"flag": False, "debug_size": -1},
        "data": {
            "scan_family_base": str(base),
            "process_args": {"img_process_args": {"tgt_img_size": [32, 32]}},
            "pretrain": {"args": {
                "pc_type": "gt", "max_obj_len": 10, "num_points": 64,
                "max_seq_len": 32, "txt_mask_ratio": 0.15, "pc_mask_ratio": 0.1,
                "scannet_train": {"anno_type": ["gpt"]},
                "scannet_val": {"anno_type": ["gpt"]},
            }},
            "scanrefer": {"args": dict(common)},
            "referit3d": {"args": dict(common, anno_type="nr3d", sr3d_plus_aug=True)},
            "spatialrefer": {"args": dict(
                common,
                scannet_train={"sources": ["referit3d", "scanrefer"],
                               "referit3d": {"anno_type": ["nr3d"]}},
                scannet_val={"sources": ["scanrefer"]},
            )},
            "scanqa": {"args": dict(common, use_unanswer=True)},
            "scannet_sgqa": {"args": {
                "pc_type": "gt", "max_obj_len": 10, "num_points": 64,
                "anno_dir": str(base / "annotations" / "sgqa"),
            }},
        },
    }


def build_multiview_tree(base: Path, scan_ids, n_frames=3, feat_len=16):
    """MultiViewInfo_numpy fixture (scannet_base.py:234-256 format):
    per scan a multiview_info_refined.json whose instance entries index
    rows of clip.npy, plus identity camera poses."""
    rng = np.random.default_rng(0)
    for scan_id in scan_ids:
        d = base / "ScanNetV2-RGBD" / "MultiViewInfo_numpy" / scan_id
        d.mkdir(parents=True, exist_ok=True)
        feats, mv = [], {}
        for f in range(n_frames):
            insts = []
            # frame f sees instances f..f+2 (org ids are 1-based)
            for org in range(f + 1, f + 4):
                insts.append({
                    "org_inst_id": org,
                    "is_need_process": True,
                    "clip": len(feats),
                })
                feats.append(rng.normal(size=feat_len).astype(np.float32))
            mv[f"frame_{f:04d}"] = {
                "instance_info": insts,
                "camera_pose": list(np.eye(4).reshape(-1)),
            }
        json.dump({"multiview_info": mv}, open(d / "multiview_info_refined.json", "w"))
        np.save(d / "clip.npy", np.stack(feats, 0))
    return base


def mv_config_dict(base: Path):
    """Config slice for the MV datasets (cfg.data.mvdatasettings +
    mvpretrain/mvreferit3d args)."""
    cfg = legacy_config_dict(base)
    cfg["data"]["mvdatasettings"] = {
        "pc_type": "gt",
        "max_inst_per_frame": 4,
        "max_frame_num": 2,
        "inst_feat_type": "clip",
        "inst_feat_len": 16,
        "frame_sample_mode": "even",
        "inst_sample_mode": "even",
        "inst_position_type": "pc_gt",
        "is_pool_obj_feature": True,
        "pooling_strategy": "average_all",
        "use_cache": False,
        "use_multi_process": False,
        "process_num": 0,
    }
    cfg["data"]["mvpretrain"] = {"scan_caption": {"anno_type": ["gpt"]}}
    cfg["data"]["mvreferit3d"] = {"args": {
        "max_obj_len": 3, "sem_type": "607", "anno_type": "nr3d",
        "filter_lang": False, "num_points": 64, "max_seq_len": 32,
    }}
    return cfg
