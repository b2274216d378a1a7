"""NN-layer tests: shape/property checks + torch parity against the
reference's own modules (loaded file-wise, random weights, eval mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from msr3d_tpu.nn.pointnet import PcdObjEncoder, PointNetPP, SharedMLP
from msr3d_tpu.nn.transformers import (
    CrossAttentionLayer,
    MultiHeadAttentionSpatial,
    TransformerEncoderLayer,
    TransformerSpatialEncoderLayer,
)
from msr3d_tpu.utils import torch_convert as tc

from tests.ref_loader import load_ref_file


@pytest.fixture(scope="module")
def ref_tf():
    mod = load_ref_file("modules/layers/transformers.py", "ref_transformers")
    if mod is None:
        pytest.skip("reference tree not mounted")
    return mod


@pytest.fixture(scope="module")
def ref_pt_utils():
    mod = load_ref_file(
        "modules/third_party/pointnet2/pytorch_utils.py", "ref_pt_utils"
    )
    if mod is None:
        pytest.skip("reference tree not mounted")
    return mod


class TestSharedMLPParity:
    def test_matches_torch(self, rng, ref_pt_utils):
        import torch

        widths = [6, 16, 32]
        tmod = ref_pt_utils.SharedMLP(widths, bn=True).eval()
        # randomize BN stats so inference mode is non-trivial
        sd = tmod.state_dict()
        for k in list(sd):
            if "running_mean" in k:
                sd[k] = torch.randn_like(sd[k]) * 0.1
            if "running_var" in k:
                sd[k] = torch.rand_like(sd[k]) + 0.5
            if "bn.weight" in k or "bn.bias" in k:
                sd[k] = torch.randn_like(sd[k]) * 0.3 + 1.0
        tmod.load_state_dict(sd)

        x = rng.normal(size=(2, 6, 5, 7)).astype(np.float32)  # (B, C, M, K)
        with torch.no_grad():
            want = tmod(torch.from_numpy(x)).numpy()  # (B, C', M, K)

        params, stats = tc.shared_mlp(tmod.state_dict(), "", n_layers=2)
        jmod = SharedMLP(widths[1:], bn=True)
        x_cl = np.transpose(x, (0, 2, 3, 1))  # channels-last
        got = jmod.apply(
            {"params": tc.to_jax_tree(params), "batch_stats": tc.to_jax_tree(stats)},
            jnp.asarray(x_cl),
            use_running_average=True,
        )
        got_cf = np.transpose(np.asarray(got), (0, 3, 1, 2))
        np.testing.assert_allclose(got_cf, want, atol=2e-5)


@pytest.mark.parametrize("fusion", ["cond", "mul", "bias", "add", "ctx"])
class TestSpatialAttentionParity:
    def test_matches_torch(self, rng, ref_tf, fusion):
        import torch

        d_model, n_head, n = 32, 4, 10
        tmod = ref_tf.MultiHeadAttentionSpatial(
            d_model, n_head, dropout=0.0, spatial_attn_fusion=fusion
        ).eval()

        x = rng.normal(size=(2, n, d_model)).astype(np.float32)
        locs = rng.normal(size=(2, n, n, 5)).astype(np.float32)
        mask = np.zeros((2, n), dtype=bool)
        mask[:, -3:] = True  # pad last 3

        with torch.no_grad():
            want, want_attn = tmod(
                torch.from_numpy(x), torch.from_numpy(x), torch.from_numpy(x),
                torch.from_numpy(locs), key_padding_mask=torch.from_numpy(mask),
            )

        params = tc.spatial_attention(tmod.state_dict())
        jmod = MultiHeadAttentionSpatial(
            d_model, n_head, dropout=0.0, spatial_attn_fusion=fusion
        )
        got, got_attn = jmod.apply(
            {"params": tc.to_jax_tree(params)},
            jnp.asarray(x), jnp.asarray(x), jnp.asarray(x), jnp.asarray(locs),
            key_padding_mask=jnp.asarray(mask),
        )
        np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=1e-4)
        # reference attn layout is (head, B, L, T); ours is (B, head, L, T)
        np.testing.assert_allclose(
            np.asarray(got_attn), want_attn.numpy().transpose(1, 0, 2, 3), atol=1e-4
        )


class TestSpatialEncoderLayerParity:
    def test_matches_torch(self, rng, ref_tf):
        import torch

        d_model, n_head, n = 32, 4, 12
        tmod = ref_tf.TransformerSpatialEncoderLayer(
            d_model, n_head, dim_feedforward=64, dropout=0.0, activation="gelu",
            spatial_attn_fusion="cond",
        ).eval()

        x = rng.normal(size=(2, n, d_model)).astype(np.float32)
        locs = rng.normal(size=(2, n, n, 5)).astype(np.float32)
        mask = np.zeros((2, n), dtype=bool)
        mask[0, -4:] = True

        with torch.no_grad():
            want, _ = tmod(
                torch.from_numpy(x), torch.from_numpy(locs),
                tgt_key_padding_mask=torch.from_numpy(mask),
            )

        params = tc.spatial_encoder_layer(tmod.state_dict())
        jmod = TransformerSpatialEncoderLayer(
            d_model, n_head, dim_feedforward=64, dropout=0.0, activation="gelu",
            spatial_attn_fusion="cond",
        )
        got, _ = jmod.apply(
            {"params": tc.to_jax_tree(params)},
            jnp.asarray(x), jnp.asarray(locs), jnp.asarray(mask),
        )
        np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=5e-5)


class TestCrossAttentionParity:
    def test_matches_torch(self, rng, ref_tf):
        import torch

        d_model, n_head = 32, 4
        tmod = ref_tf.CrossAttentionLayer(
            d_model, n_head, dim_feedforward=64, dropout=0.0, activation="gelu",
        ).eval()

        tgt = rng.normal(size=(2, 6, d_model)).astype(np.float32)
        mem = rng.normal(size=(2, 9, d_model)).astype(np.float32)

        with torch.no_grad():
            want, _ = tmod(torch.from_numpy(tgt), torch.from_numpy(mem))

        params = tc.cross_attention_layer(tmod.state_dict())
        jmod = CrossAttentionLayer(
            d_model, n_head, dim_feedforward=64, dropout=0.0, activation="gelu",
        )
        got, _ = jmod.apply(
            {"params": tc.to_jax_tree(params)}, jnp.asarray(tgt), jnp.asarray(mem)
        )
        np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=5e-5)


class TestPointNet:
    CFG = dict(
        sa_n_points=(8, 4, None),
        sa_n_samples=(8, 8, None),
        sa_radii=(0.4, 0.8, None),
        sa_mlps=((3, 8, 8, 16), (16, 16, 16, 32), (32, 32, 32, 64)),
    )

    def test_pointnetpp_shapes(self, rng):
        pc = rng.normal(size=(3, 64, 6)).astype(np.float32) * 0.3
        mod = PointNetPP(**self.CFG)
        variables = mod.init(jax.random.key(0), jnp.asarray(pc))
        out = mod.apply(variables, jnp.asarray(pc))
        assert out.shape == (3, 64)

    def test_pcd_obj_encoder_shapes_and_freeze(self, rng):
        pcds = rng.normal(size=(2, 5, 64, 6)).astype(np.float32) * 0.3
        mod = PcdObjEncoder(**self.CFG, freeze=True)
        variables = mod.init(jax.random.key(0), jnp.asarray(pcds))
        embeds, sem = mod.apply(variables, jnp.asarray(pcds))
        assert embeds.shape == (2, 5, 64)
        assert sem.shape == (2, 5, 607)

        # freeze → no gradient reaches the pcd_net
        def loss(params):
            e, _ = mod.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                jnp.asarray(pcds),
            )
            return jnp.sum(e**2)

        g = jax.grad(loss)(variables["params"])
        leaf_norms = [
            float(jnp.abs(x).sum()) for x in jax.tree_util.tree_leaves(g["pcd_net"])
        ]
        assert max(leaf_norms) == 0.0

    def test_pointnetpp_parity_with_reference_composition(self, rng, ref_pt_utils):
        """End-to-end SA-stage parity: feed the same FPS/ball-query groups
        (computed by our verified ops) through the reference torch SharedMLP
        and through our full stage; results must agree."""
        import torch

        from msr3d_tpu.ops.pointnet2 import (
            furthest_point_sample,
            gather_points,
            query_and_group,
        )

        pc = (rng.normal(size=(2, 64, 6)) * 0.3).astype(np.float32)
        xyz, feats = pc[..., :3], pc[..., 3:]
        npoint, nsample, radius = 8, 8, 0.4

        idx = furthest_point_sample(jnp.asarray(xyz), npoint)
        new_xyz = gather_points(jnp.asarray(xyz), idx)
        grouped = query_and_group(
            jnp.asarray(xyz), new_xyz, jnp.asarray(feats), radius=radius, nsample=nsample
        )  # (B, M, K, 6)

        widths = [6, 8, 8, 16]
        tmod = ref_pt_utils.SharedMLP(widths, bn=True).eval()
        with torch.no_grad():
            g = torch.from_numpy(np.transpose(np.asarray(grouped), (0, 3, 1, 2)))
            want = torch.max(tmod(g), dim=3).values.numpy()  # (B, C', M)

        params, stats = tc.shared_mlp(tmod.state_dict(), "", n_layers=3)
        jmlp = SharedMLP(widths[1:], bn=True)
        h = jmlp.apply(
            {"params": tc.to_jax_tree(params), "batch_stats": tc.to_jax_tree(stats)},
            grouped,
        )
        got = np.transpose(np.asarray(jnp.max(h, axis=2)), (0, 2, 1))
        np.testing.assert_allclose(got, want, atol=2e-5)


class TestPointBERT:
    def test_forward_shapes(self, rng):
        from msr3d_tpu.nn.pointbert import PointBERTPcdObjEncoder

        mod = PointBERTPcdObjEncoder(
            trans_dim=32, depth=2, num_heads=4, group_size=8, num_group=8,
            encoder_dims=64, add_rgb=True, freeze=True,
        )
        pcds = (rng.normal(size=(2, 3, 64, 6)) * 0.3).astype(np.float32)
        variables = mod.init(jax.random.key(0), jnp.asarray(pcds))
        embeds, _ = mod.apply(variables, jnp.asarray(pcds))
        assert embeds.shape == (2, 3, 64)  # 2 * trans_dim

    def test_knn_groups_are_neighbors(self, rng):
        from msr3d_tpu.nn.pointbert import knn_point

        xyz = rng.normal(size=(1, 64, 3)).astype(np.float32)
        centers = xyz[:, :4]
        idx = np.asarray(knn_point(8, jnp.asarray(xyz), jnp.asarray(centers)))
        # nearest neighbor of a center that IS a point is itself
        for g in range(4):
            assert g in idx[0, g]


@pytest.mark.slow
class TestCLIP:
    def test_rn50_towers_shapes(self, rng):
        from msr3d_tpu.models.clip import CLIPRN50

        mod = CLIPRN50()
        imgs = rng.normal(size=(2, 64, 64, 3)).astype(np.float32)
        ids = rng.integers(1, 49000, size=(2, 16)).astype(np.int32)
        variables = mod.init(jax.random.key(0), jnp.asarray(imgs), jnp.asarray(ids))
        out = mod.apply(variables, jnp.asarray(imgs), jnp.asarray(ids))
        assert out["image_embeds"].shape == (2, 1024)
        assert out["text_embeds"].shape == (2, 1024)

        # frozen: no gradient flows to tower params
        def loss(params):
            o = mod.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                jnp.asarray(imgs), jnp.asarray(ids),
            )
            return jnp.sum(o["image_embeds"] ** 2) + jnp.sum(o["text_embeds"] ** 2)

        g = jax.grad(loss)(variables["params"])
        total = sum(float(jnp.abs(x).sum()) for x in jax.tree_util.tree_leaves(g))
        assert total == 0.0


class TestNaNGuard:
    def test_assert_finite_flags_nans(self, monkeypatch):
        import importlib

        import msr3d_tpu.utils.debug as dbg

        monkeypatch.setattr(dbg, "_ENABLED", True)
        x = jnp.array([1.0, jnp.nan])
        with pytest.raises(FloatingPointError):
            jax.block_until_ready(dbg.assert_finite(x, "t"))
        ok = jnp.array([1.0, 2.0])
        np.testing.assert_array_equal(
            np.asarray(dbg.assert_finite(ok, "t")), np.asarray(ok)
        )

    def test_disabled_is_identity(self):
        from msr3d_tpu.utils.debug import assert_finite

        x = jnp.array([jnp.nan])
        assert assert_finite(x, "t") is x
