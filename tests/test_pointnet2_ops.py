import numpy as np
import pytest

import jax.numpy as jnp

from msr3d_tpu.ops.pointnet2 import (
    ball_query,
    furthest_point_sample,
    gather_points,
    group_all,
    group_points,
    query_and_group,
    three_interpolate,
    three_nn,
)
from tests.oracle_pointnet2 import ball_query_oracle, fps_oracle, three_nn_oracle


def make_cloud(rng, n=256, pad=0):
    pts = rng.normal(size=(n, 3)).astype(np.float32)
    if pad:
        pts[-pad:] = 0.0  # near-origin padding points
    return pts


class TestFPS:
    def test_matches_oracle(self, rng):
        for trial in range(3):
            xyz = make_cloud(rng, n=128)
            got = np.asarray(furthest_point_sample(xyz[None], 16))[0]
            want = fps_oracle(xyz, 16)
            np.testing.assert_array_equal(got, want)

    def test_skips_padding_points(self, rng):
        xyz = make_cloud(rng, n=64, pad=32)
        idx = np.asarray(furthest_point_sample(xyz[None], 16))[0]
        # index 0 is always seeded; all others must avoid the zero-padding tail
        assert (idx[1:] < 32).all()

    def test_first_index_is_zero(self, rng):
        xyz = make_cloud(rng, n=64)
        idx = np.asarray(furthest_point_sample(xyz[None], 8))[0]
        assert idx[0] == 0

    def test_no_duplicates_when_enough_points(self, rng):
        xyz = make_cloud(rng, n=256)
        idx = np.asarray(furthest_point_sample(xyz[None], 32))[0]
        assert len(set(idx.tolist())) == 32

    def test_batched(self, rng):
        xyz = np.stack([make_cloud(rng, n=128) for _ in range(4)])
        got = np.asarray(furthest_point_sample(xyz, 16))
        for b in range(4):
            np.testing.assert_array_equal(got[b], fps_oracle(xyz[b], 16))


class TestBallQuery:
    def test_matches_oracle(self, rng):
        xyz = make_cloud(rng, n=256) * 0.5
        centers = xyz[:32]
        got = np.asarray(ball_query(0.3, 16, xyz[None], centers[None]))[0]
        want = ball_query_oracle(0.3, 16, xyz, centers)
        np.testing.assert_array_equal(got, want)

    def test_backfill_with_first_index(self, rng):
        # a center whose ball contains exactly 2 points → slots 2+ = first idx
        xyz = np.array([[10, 0, 0], [0.01, 0, 0], [0, 0.01, 0], [20, 0, 0]], dtype=np.float32)
        centers = np.zeros((1, 3), dtype=np.float32)
        got = np.asarray(ball_query(0.5, 4, xyz[None], centers[None]))[0, 0]
        np.testing.assert_array_equal(got, [1, 2, 1, 1])

    def test_empty_ball_gives_zero(self):
        xyz = np.full((8, 3), 100.0, dtype=np.float32)
        centers = np.zeros((1, 3), dtype=np.float32)
        got = np.asarray(ball_query(0.5, 4, xyz[None], centers[None]))[0, 0]
        np.testing.assert_array_equal(got, [0, 0, 0, 0])

    def test_own_center_always_included(self, rng):
        xyz = make_cloud(rng, n=128)
        got = np.asarray(ball_query(0.2, 8, xyz[None], xyz[None, :16]))[0]
        # each center is its own point → slot 0 must be a point within radius
        for j in range(16):
            d = np.linalg.norm(xyz[got[j, 0]] - xyz[j])
            assert d < 0.2


class TestGathers:
    def test_gather_points(self, rng):
        pts = rng.normal(size=(2, 16, 5)).astype(np.float32)
        idx = rng.integers(0, 16, size=(2, 4)).astype(np.int32)
        got = np.asarray(gather_points(pts, idx))
        for b in range(2):
            np.testing.assert_allclose(got[b], pts[b][idx[b]])

    def test_group_points(self, rng):
        pts = rng.normal(size=(2, 16, 5)).astype(np.float32)
        idx = rng.integers(0, 16, size=(2, 4, 3)).astype(np.int32)
        got = np.asarray(group_points(pts, idx))
        for b in range(2):
            np.testing.assert_allclose(got[b], pts[b][idx[b]])

    def test_gather_grad_is_scatter(self, rng):
        import jax

        pts = jnp.asarray(rng.normal(size=(1, 8, 2)).astype(np.float32))
        idx = jnp.asarray([[0, 0, 3]], dtype=jnp.int32)

        def loss(p):
            return gather_points(p, idx).sum()

        g = np.asarray(jax.grad(loss)(pts))[0]
        want = np.zeros((8, 2))
        want[0] = 2.0  # gathered twice
        want[3] = 1.0
        np.testing.assert_allclose(g, want)


class TestQueryAndGroup:
    def test_shapes_and_centering(self, rng):
        xyz = make_cloud(rng, n=64) * 0.3
        feats = rng.normal(size=(64, 7)).astype(np.float32)
        centers = xyz[:8]
        out = np.asarray(
            query_and_group(xyz[None], centers[None], feats[None], radius=0.4, nsample=8)
        )
        assert out.shape == (1, 8, 8, 10)
        idx = np.asarray(ball_query(0.4, 8, xyz[None], centers[None]))[0]
        for j in range(8):
            np.testing.assert_allclose(
                out[0, j, :, :3], xyz[idx[j]] - centers[j], rtol=1e-5
            )
            np.testing.assert_allclose(out[0, j, :, 3:], feats[idx[j]], rtol=1e-6)

    def test_group_all(self, rng):
        xyz = make_cloud(rng, n=16)
        feats = rng.normal(size=(1, 16, 4)).astype(np.float32)
        out = np.asarray(group_all(xyz[None], feats))
        assert out.shape == (1, 1, 16, 7)
        np.testing.assert_allclose(out[0, 0, :, :3], xyz)
        np.testing.assert_allclose(out[0, 0, :, 3:], feats[0])


class TestThreeNN:
    def test_matches_oracle(self, rng):
        unknown = make_cloud(rng, n=32)
        known = make_cloud(rng, n=16)
        dist, idx = three_nn(unknown[None], known[None])
        want_d, want_i = three_nn_oracle(unknown, known)
        np.testing.assert_allclose(np.asarray(dist)[0], want_d, rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(idx)[0], want_i)

    def test_interpolate(self, rng):
        feats = rng.normal(size=(1, 16, 6)).astype(np.float32)
        idx = rng.integers(0, 16, size=(1, 10, 3)).astype(np.int32)
        w = rng.random(size=(1, 10, 3)).astype(np.float32)
        w /= w.sum(-1, keepdims=True)
        got = np.asarray(three_interpolate(feats, idx, w))
        want = (feats[0][idx[0]] * w[0][..., None]).sum(1)
        np.testing.assert_allclose(got[0], want, rtol=1e-5)


class TestGeometry:
    def test_quaternion_vs_oracle(self, rng):
        from msr3d_tpu.ops.geometry import quaternion_to_matrix
        from tests.oracle_pointnet2 import quaternion_to_matrix_oracle

        q = rng.normal(size=(5, 4))
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        got = np.asarray(quaternion_to_matrix(q.astype(np.float32)))
        np.testing.assert_allclose(got, quaternion_to_matrix_oracle(q), atol=1e-5)

    def test_quaternion_identity(self):
        from msr3d_tpu.ops.geometry import quaternion_to_matrix

        q = np.array([0.0, 0.0, 0.0, 1.0], dtype=np.float32)
        np.testing.assert_allclose(np.asarray(quaternion_to_matrix(q)), np.eye(3), atol=1e-6)

    def test_transform_to_agent_coor_inverts_pose(self, rng):
        # objects placed in the agent frame, then posed into world coords,
        # must transform back to their agent-frame positions
        from msr3d_tpu.ops.geometry import quaternion_to_matrix, transform_to_agent_coor

        local = rng.normal(size=(1, 10, 3)).astype(np.float32)
        q = rng.normal(size=(1, 4)).astype(np.float32)
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        loc = rng.normal(size=(1, 3)).astype(np.float32)
        R = np.asarray(quaternion_to_matrix(jnp.asarray(q)))  # world→agent via right-mul
        # world = local @ R^-1 + loc  (since agent = (world - loc) @ R)
        world = (local[0] @ np.linalg.inv(R[0]) + loc[0]).astype(np.float32)
        back = np.asarray(
            transform_to_agent_coor(jnp.asarray(world[None]), jnp.asarray(loc), jnp.asarray(q))
        )
        np.testing.assert_allclose(back[0], local[0], atol=1e-4)

    def test_fourier_dims(self, rng):
        from msr3d_tpu.ops.geometry import fourier_feature_dim, generate_fourier_features

        # reference config: quaternion (4,) → fourier_size 84; loc (3,) → 63
        pos4 = rng.normal(size=(2, 7, 4)).astype(np.float32)
        pos3 = rng.normal(size=(2, 7, 3)).astype(np.float32)
        assert generate_fourier_features(jnp.asarray(pos4)).shape == (2, 7, 84)
        assert generate_fourier_features(jnp.asarray(pos3)).shape == (2, 7, 63)
        assert fourier_feature_dim(4) == 84
        assert fourier_feature_dim(3) == 63

    def test_pairwise_locs_channels(self, rng):
        from msr3d_tpu.ops.geometry import calc_pairwise_locs

        centers = rng.normal(size=(2, 6, 3)).astype(np.float32)
        whls = np.abs(rng.normal(size=(2, 6, 3))).astype(np.float32)
        out = np.asarray(calc_pairwise_locs(jnp.asarray(centers), jnp.asarray(whls)))
        assert out.shape == (2, 6, 6, 5)
        # channel 0 = normalized distance, max over matrix = 1
        np.testing.assert_allclose(out[:, :, :, 0].max(axis=(1, 2)), 1.0, rtol=1e-5)
        # channel 1 = Δz/dist ∈ [-1, 1]
        assert (np.abs(out[..., 1]) <= 1 + 1e-5).all()
        # direction channels: Δy/d2d and Δx/d2d have unit norm off-diagonal
        d = np.sqrt(out[..., 3] ** 2 + out[..., 4] ** 2)
        off = ~np.eye(6, dtype=bool)
        np.testing.assert_allclose(d[:, off], 1.0, rtol=1e-3)


@pytest.mark.parity
class TestTorchParity:
    """Cross-check against the reference's own torch code (loaded file-wise)."""

    @pytest.fixture(scope="class")
    def ref_utils(self):
        import importlib.util
        from pathlib import Path

        path = Path("/root/reference/modules/utils.py")
        if not path.exists():
            pytest.skip("reference tree not mounted")
        spec = importlib.util.spec_from_file_location("ref_modules_utils", path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    def test_pairwise_locs_parity(self, rng, ref_utils):
        import torch

        from msr3d_tpu.ops.geometry import calc_pairwise_locs

        centers = rng.normal(size=(2, 8, 3)).astype(np.float32)
        whls = np.abs(rng.normal(size=(2, 8, 3))).astype(np.float32)
        want = ref_utils.calc_pairwise_locs(
            torch.from_numpy(centers), torch.from_numpy(whls),
            pairwise_rel_type="center", spatial_dist_norm=True, spatial_dim=5,
        ).numpy()
        got = np.asarray(calc_pairwise_locs(jnp.asarray(centers), jnp.asarray(whls)))
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_quaternion_parity(self, rng, ref_utils):
        import torch

        from msr3d_tpu.ops.geometry import quaternion_to_matrix

        q = rng.normal(size=(5, 4)).astype(np.float32)
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        want = ref_utils.quaternion_to_matrix(torch.from_numpy(q)).numpy()
        got = np.asarray(quaternion_to_matrix(jnp.asarray(q)))
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_transform_parity(self, rng, ref_utils):
        import torch

        from msr3d_tpu.ops.geometry import transform_to_agent_coor

        centers = rng.normal(size=(3, 10, 3)).astype(np.float32)
        loc = rng.normal(size=(3, 3)).astype(np.float32)
        q = rng.normal(size=(3, 4)).astype(np.float32)
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        want = ref_utils.transform_to_agent_coor(
            torch.from_numpy(centers), torch.from_numpy(loc), torch.from_numpy(q)
        ).numpy()
        got = np.asarray(
            transform_to_agent_coor(jnp.asarray(centers), jnp.asarray(loc), jnp.asarray(q))
        )
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_fourier_parity(self, rng):
        import importlib.util
        from pathlib import Path

        import torch

        from msr3d_tpu.ops.geometry import generate_fourier_features

        # generate_fourier_features lives in ose3d_situation.py, which needs
        # heavy deps; replicate via the reference's own math on torch is not
        # possible file-wise, so verify against a literal numpy transcription.
        pos = np.random.default_rng(0).normal(size=(2, 5, 4)).astype(np.float32)
        bands = np.linspace(1.0, 15.0, 10)
        per = (pos[..., None] * bands).reshape(2, 5, 40)
        want = np.concatenate(
            [pos, np.sin(np.pi * per), np.cos(np.pi * per)], axis=-1
        )
        got = np.asarray(generate_fourier_features(jnp.asarray(pos)))
        np.testing.assert_allclose(got, want, atol=1e-4)


class TestPallasFPS:
    """Pallas kernel vs XLA implementation vs oracle (interpreter on CPU)."""

    def test_matches_xla_and_oracle(self, rng):
        from msr3d_tpu.ops.pallas.fps import furthest_point_sample_pallas

        xyz = np.stack([make_cloud(rng, n=128) for _ in range(3)])
        got = np.asarray(furthest_point_sample_pallas(jnp.asarray(xyz), 16, interpret=True))
        xla = np.asarray(furthest_point_sample(xyz, 16))
        np.testing.assert_array_equal(got, xla)
        for b in range(3):
            np.testing.assert_array_equal(got[b], fps_oracle(xyz[b], 16))

    def test_padding_skip(self, rng):
        from msr3d_tpu.ops.pallas.fps import furthest_point_sample_pallas

        xyz = make_cloud(rng, n=128, pad=64)
        got = np.asarray(furthest_point_sample_pallas(jnp.asarray(xyz[None]), 16, interpret=True))[0]
        assert (got[1:] < 64).all()
