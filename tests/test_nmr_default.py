"""NMRMVRecon (reference data/datasets/nmr.py:15-119) and DefaultDataset
(data/datasets/default.py:13-41) over synthetic on-disk fixtures."""

import numpy as np
import pytest

from msr3d_tpu.config import config_from_dict

N_VIEWS, H, W = 4, 8, 8


def _build_nmr_tree(root):
    rng = np.random.default_rng(3)
    (root / "02691156").mkdir(parents=True)
    (root / "metadata.yaml").write_text(
        "airplane:\n  id: '02691156'\n  name: airplane\n"
    )
    scenes = ["sc0", "sc1"]
    (root / "02691156" / "softras_train.lst").write_text("\n".join(scenes) + "\n")
    (root / "02691156" / "softras_val.lst").write_text(scenes[0] + "\n")
    from PIL import Image

    for sid in scenes:
        sdir = root / "02691156" / sid
        (sdir / "image").mkdir(parents=True)
        cams = {}
        for i in range(N_VIEWS):
            img = (rng.uniform(size=(H, W, 3)) * 255).astype(np.uint8)
            Image.fromarray(img).save(sdir / "image" / f"{i:04d}.png")
            # a plausible camera: rotation + translation, with its inverse
            angle = 2 * np.pi * i / N_VIEWS
            rot = np.array(
                [
                    [np.cos(angle), -np.sin(angle), 0],
                    [np.sin(angle), np.cos(angle), 0],
                    [0, 0, 1],
                ]
            )
            world = np.eye(4)
            world[:3, :3] = rot
            world[:3, 3] = [0.1 * i, 0.2, 1.5]
            cams[f"world_mat_{i}"] = world
            cams[f"world_mat_inv_{i}"] = np.linalg.inv(world)
            cams[f"camera_mat_inv_{i}"] = np.eye(4)
        np.savez(sdir / "cameras.npz", **cams)
    return root


@pytest.fixture(scope="module")
def nmr_cfg(tmp_path_factory):
    root = _build_nmr_tree(tmp_path_factory.mktemp("nmr"))
    return config_from_dict(
        {
            "data": {
                "nmr_base": str(root),
                "mvrecon": {
                    "args": {
                        "canonical": True,
                        "full_scale": False,
                        "points_per_item": 32,
                        "num_views": N_VIEWS,
                        "num_input_views": 1,
                    }
                },
            },
            "debug": {"flag": False},
        }
    )


class TestNMRMVRecon:
    def test_item_contract(self, nmr_cfg):
        from msr3d_tpu.data.datasets.nmr import NMRMVRecon

        ds = NMRMVRecon(nmr_cfg, "train")
        assert len(ds) == 2
        item = ds[0]
        assert item["input_images"].shape == (1, H, W, 3)
        assert item["input_camera_pos"].shape == (1, 3)
        assert item["input_rays"].shape == (1, H, W, 3)
        assert item["target_images"].shape == (32, 3)
        assert item["target_camera_pos"].shape == (32, 3)
        assert item["target_rays"].shape == (32, 3)
        assert item["transform"].shape == (4, 4)
        # rays are unit-norm pre-canonicalization; rotation preserves norms
        norms = np.linalg.norm(item["target_rays"], axis=-1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-4)

    def test_eval_split_deterministic(self, nmr_cfg):
        from msr3d_tpu.data.datasets.nmr import NMRMVRecon

        ds = NMRMVRecon(nmr_cfg, "val")
        assert len(ds) == 1
        a, b = ds[0], ds[0]
        np.testing.assert_allclose(a["input_camera_pos"], b["input_camera_pos"])
        np.testing.assert_allclose(a["input_images"], b["input_images"])

    def test_canonical_input_at_origin_frame(self, nmr_cfg):
        """In the canonical frame the input view's camera maps through its
        own extrinsic (reference nmr.py:92-95)."""
        from msr3d_tpu.data.datasets.nmr import NMRMVRecon
        from msr3d_tpu.data.data_utils import transform_points

        ds = NMRMVRecon(nmr_cfg, "val")
        item = ds[0]
        # input view is view 0 on eval; canonical extrinsic is world_mat_0
        # (after z-up rotation), so input cam pos == transform(world_inv[:3,-1])
        assert np.isfinite(item["input_camera_pos"]).all()
        assert np.isfinite(item["transform"]).all()

    def test_full_scale_keeps_all_pixels(self, nmr_cfg):
        from msr3d_tpu.data.datasets.nmr import NMRMVRecon

        nmr_cfg.data.mvrecon.args["full_scale"] = True
        try:
            ds = NMRMVRecon(nmr_cfg, "val")
            item = ds[0]
            assert item["target_images"].shape == ((N_VIEWS - 1) * H * W, 3)
        finally:
            nmr_cfg.data.mvrecon.args["full_scale"] = False

    def test_encoder_decoder_consume_items(self, nmr_cfg):
        """End-to-end recon slice: NMR item → SRTEncoder → SRTDecoder."""
        import jax
        import jax.numpy as jnp

        from msr3d_tpu.data.datasets.nmr import NMRMVRecon
        from msr3d_tpu.nn.srt import SRTDecoder, SRTEncoder

        ds = NMRMVRecon(nmr_cfg, "train")
        item = ds[0]
        images = jnp.asarray(item["input_images"])[None]
        cam = jnp.asarray(item["input_camera_pos"])[None]
        rays = jnp.asarray(item["input_rays"])[None]
        enc = SRTEncoder(num_conv_blocks=1, num_att_blocks=1, hidden_dim=32,
                         num_heads=4, mlp_dim=64)
        ev = enc.init(jax.random.key(0), images, cam, rays)
        z = enc.apply(ev, images, cam, rays)
        assert z.shape[0] == 1 and z.shape[-1] == 32

        dec = SRTDecoder(hidden_dim=32)
        qp = jnp.asarray(item["target_camera_pos"])[None]
        qr = jnp.asarray(item["target_rays"])[None]
        dv = dec.init(jax.random.key(1), z, qp, qr)
        pixels = dec.apply(dv, z, qp, qr)
        assert pixels.shape == (1, 32, 3)


class TestDefaultDataset:
    def test_concat_and_registry_resolution(self, tmp_path):
        from msr3d_tpu.data.datasets.default import (
            ConcatDataset,
            DefaultDataset,
            get_dataset_dicts,
        )
        from msr3d_tpu.registry import DATASET_REGISTRY

        assert DATASET_REGISTRY.get("DefaultDataset") is DefaultDataset

        class _Stub:
            def __init__(self, cfg, split, sources=None):
                self.items = [f"{split}-{i}" for i in range(3)]

            def __len__(self):
                return len(self.items)

            def __getitem__(self, i):
                return self.items[i]

        if "StubDSPretrain" not in DATASET_REGISTRY:
            DATASET_REGISTRY.register(_Stub, name="StubDSPretrain")

        ds = get_dataset_dicts(["StubDS-Src1", "StubDS"], "Pretrain", None, "train")
        assert len(ds) == 6
        assert ds[0] == "train-0" and ds[3] == "train-0" and ds[5] == "train-2"

        cfg = config_from_dict(
            {
                "task": "Pretrain",
                "data": {"pretrain": {"dataset": ["StubDS"]}},
                "dataloader": {"filter_empty_annotations": True},
            }
        )
        dd = DefaultDataset(cfg, "val")
        assert len(dd) == 3
        assert dd[1] == "val-1"

        c = ConcatDataset([[1, 2], [3]])
        assert [c[i] for i in range(3)] == [1, 2, 3]
        assert c[-1] == 3
