"""Golden-value tests for the SoftGroup op family (ops/softgroup.py)
against brute-force NumPy oracles, mirroring the reference kernels in
/root/reference/modules/third_party/softgroup_ops/ops/src/."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from msr3d_tpu.ops import softgroup as sg


@pytest.fixture
def packed_scene(rng):
    """Two batch elements of packed points with instance labels."""
    n0, n1 = 37, 23
    coords = rng.normal(size=(n0 + n1, 3)).astype(np.float32)
    batch_idxs = np.concatenate([np.zeros(n0, np.int32), np.ones(n1, np.int32)])
    batch_offsets = np.array([0, n0, n0 + n1], np.int32)
    labels = rng.integers(-1, 4, size=n0 + n1).astype(np.int64)
    labels[labels == -1] = -100
    return coords, batch_idxs, batch_offsets, labels


# ---------------------------------------------------------------------------
# voxelization
# ---------------------------------------------------------------------------


class TestVoxelization:
    def test_idx_insertion_order_and_input_map(self):
        coords = np.array(
            [[0, 0, 0, 0], [0, 1, 1, 1], [0, 0, 0, 0], [1, 0, 0, 0], [0, 1, 1, 1]],
            np.int64,
        )
        out_coords, input_map, output_map = sg.voxelization_idx(coords, batchsize=2)
        # voxel ids in first-occurrence order: (b0,000)=0, (b0,111)=1, (b1,000)=2
        np.testing.assert_array_equal(input_map, [0, 1, 0, 2, 1])
        assert out_coords.shape == (3, 4)
        np.testing.assert_array_equal(out_coords[0], coords[0])
        np.testing.assert_array_equal(out_coords[2], coords[3])
        # rulebook rows: [count, idx...] zero-padded
        np.testing.assert_array_equal(output_map[0], [2, 0, 2])
        np.testing.assert_array_equal(output_map[1], [2, 1, 4])
        np.testing.assert_array_equal(output_map[2], [1, 3, 0])

    def test_same_xyz_different_batch_stays_separate(self):
        coords = np.array([[0, 5, 5, 5], [1, 5, 5, 5]], np.int64)
        _, input_map, _ = sg.voxelization_idx(coords, batchsize=2)
        assert input_map[0] != input_map[1]

    @pytest.mark.parametrize("mode", [1, 2])
    def test_first_last_modes(self, mode):
        coords = np.array([[0, 0, 0, 0], [0, 0, 0, 0], [0, 0, 0, 0]], np.int64)
        _, _, output_map = sg.voxelization_idx(coords, batchsize=1, mode=mode)
        assert output_map.shape == (1, 2)
        # code semantics (voxelize.cpp:139-152): mode 1 → first, mode 2 → last
        assert output_map[0, 1] == (0 if mode == 1 else 2)

    @pytest.mark.parametrize("mode", [3, 4])
    def test_feature_scatter_matches_numpy(self, rng, mode):
        n, c = 50, 7
        coords = np.concatenate(
            [np.zeros((n, 1), np.int64), rng.integers(0, 3, (n, 3))], axis=1
        )
        feats = rng.normal(size=(n, c)).astype(np.float32)
        _, input_map, output_map = sg.voxelization_idx(coords, 1, mode=mode)
        out = np.asarray(sg.voxelization(jnp.asarray(feats), jnp.asarray(output_map), mode))
        m = output_map.shape[0]
        expect = np.zeros((m, c), np.float32)
        for v in range(m):
            pts = feats[input_map == v]
            expect[v] = pts.mean(0) if mode == 4 else pts.sum(0)
        np.testing.assert_allclose(out, expect, rtol=1e-5, atol=1e-5)

    def test_gradient_matches_reference_backward(self, rng):
        """voxelize_bp broadcasts d_out (÷count for mean) to contributors."""
        n, c = 12, 3
        coords = np.concatenate(
            [np.zeros((n, 1), np.int64), rng.integers(0, 2, (n, 3))], axis=1
        )
        feats = jnp.asarray(rng.normal(size=(n, c)).astype(np.float32))
        _, input_map, output_map = sg.voxelization_idx(coords, 1, mode=4)
        cot = rng.normal(size=(output_map.shape[0], c)).astype(np.float32)

        grad = jax.grad(
            lambda f: jnp.sum(sg.voxelization(f, jnp.asarray(output_map), 4) * cot)
        )(feats)
        counts = output_map[:, 0].astype(np.float32)
        expect = cot[input_map] / counts[input_map][:, None]
        np.testing.assert_allclose(np.asarray(grad), expect, rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# ball query + BFS clustering
# ---------------------------------------------------------------------------


class TestBallQueryAndCluster:
    def test_ballquery_bruteforce(self, packed_scene):
        coords, batch_idxs, batch_offsets, _ = packed_scene
        radius = 0.9
        idx, start_len = sg.ballquery_batch_p(coords, batch_idxs, batch_offsets, radius)
        assert start_len.shape == (coords.shape[0], 2)
        for i in range(coords.shape[0]):
            s, l = start_len[i]
            got = idx[s : s + l]
            b = batch_idxs[i]
            lo, hi = batch_offsets[b], batch_offsets[b + 1]
            d2 = np.sum((coords[lo:hi] - coords[i]) ** 2, axis=-1)
            expect = lo + np.nonzero(d2 < radius**2)[0]
            np.testing.assert_array_equal(got, expect)
            assert i in got  # self-inclusion (d²=0 < r²)

    def test_bfs_cluster_two_components(self):
        # 6 points on a line; radius bridges only consecutive pairs within a gap
        coords = np.array(
            [[0, 0, 0], [0.5, 0, 0], [1.0, 0, 0], [10, 0, 0], [10.5, 0, 0], [30, 0, 0]],
            np.float32,
        )
        batch_idxs = np.zeros(6, np.int32)
        offsets = np.array([0, 6], np.int32)
        idx, start_len = sg.ballquery_batch_p(coords, batch_idxs, offsets, 0.6)
        mean = np.array([-1.0], np.float32)
        cluster_idxs, cluster_offsets = sg.bfs_cluster(mean, idx, start_len, 2, 0)
        # components {0,1,2}, {3,4} pass size≥2; {5} filtered
        assert len(cluster_offsets) == 3
        np.testing.assert_array_equal(cluster_offsets, [0, 3, 5])
        c0 = cluster_idxs[cluster_idxs[:, 0] == 0][:, 1]
        c1 = cluster_idxs[cluster_idxs[:, 0] == 1][:, 1]
        np.testing.assert_array_equal(np.sort(c0), [0, 1, 2])
        np.testing.assert_array_equal(np.sort(c1), [3, 4])
        # BFS dequeue order from seed 0: 0 then its in-radius neighbors
        np.testing.assert_array_equal(c0, [0, 1, 2])

    def test_bfs_threshold_scales_by_class_mean(self):
        coords = np.array([[0, 0, 0], [0.1, 0, 0], [5, 0, 0]], np.float32)
        idx, start_len = sg.ballquery_batch_p(
            coords, np.zeros(3, np.int32), np.array([0, 3], np.int32), 0.5
        )
        # class mean 4 with threshold 0.6 → thr 2.4 → only the pair survives... not even:
        # pair size 2 < 2.4 → nothing survives
        ci, co = sg.bfs_cluster(np.array([4.0], np.float32), idx, start_len, 0.6, 0)
        assert len(co) == 1 and ci.shape == (0, 2)
        # mean == -1 → raw threshold 2 → the pair survives
        ci, co = sg.bfs_cluster(np.array([-1.0], np.float32), idx, start_len, 2, 0)
        assert len(co) == 2 and ci.shape == (2, 2)


# ---------------------------------------------------------------------------
# segment pools
# ---------------------------------------------------------------------------


class TestSegmentPools:
    @pytest.fixture
    def segs(self, rng):
        feats = rng.normal(size=(20, 5)).astype(np.float32)
        offsets = np.array([0, 4, 4 + 9, 20], np.int32)
        return jnp.asarray(feats), jnp.asarray(offsets), feats, offsets

    def test_global_avg_pool(self, segs):
        jf, jo, feats, offsets = segs
        out = np.asarray(sg.global_avg_pool(jf, jo))
        for p in range(3):
            np.testing.assert_allclose(
                out[p], feats[offsets[p] : offsets[p + 1]].mean(0), rtol=1e-5
            )

    def test_global_avg_pool_grad(self, segs):
        jf, jo, feats, offsets = segs
        g = np.asarray(jax.grad(lambda f: jnp.sum(sg.global_avg_pool(f, jo)))(jf))
        for p in range(3):
            n = offsets[p + 1] - offsets[p]
            np.testing.assert_allclose(g[offsets[p] : offsets[p + 1]], 1.0 / n, rtol=1e-5)

    def test_sec_min_max_mean(self, segs):
        jf, jo, feats, offsets = segs
        for fn, red in [(sg.sec_min, np.min), (sg.sec_max, np.max), (sg.sec_mean, np.mean)]:
            out = np.asarray(fn(jf, jo))
            for p in range(3):
                np.testing.assert_allclose(
                    out[p], red(feats[offsets[p] : offsets[p + 1]], axis=0), rtol=1e-5
                )


# ---------------------------------------------------------------------------
# mask IoU + labels
# ---------------------------------------------------------------------------


def _iou_oracle(pidx, poff, labels, pointnum, scores=None):
    n_prop, n_inst = len(poff) - 1, len(pointnum)
    iou = np.zeros((n_prop, n_inst), np.float32)
    for p in range(n_prop):
        members = pidx[poff[p] : poff[p + 1]]
        if scores is not None:
            members = members[scores[poff[p] : poff[p + 1]] > 0.5]
        for i in range(n_inst):
            inter = np.sum(labels[members] == i)
            union = len(members) + pointnum[i] - inter
            iou[p, i] = inter / (union + 1e-5)
    return iou


class TestMaskIoU:
    @pytest.fixture
    def proposals(self, rng, packed_scene):
        coords, _, _, labels = packed_scene
        n = coords.shape[0]
        n_inst = 4
        pointnum = np.array([np.sum(labels == i) for i in range(n_inst)], np.int32)
        pidx = np.concatenate([rng.permutation(n)[:15], rng.permutation(n)[:9]]).astype(np.int32)
        poff = np.array([0, 15, 24], np.int32)
        return pidx, poff, labels, pointnum

    def test_iou_on_cluster(self, proposals):
        pidx, poff, labels, pointnum = proposals
        got = np.asarray(
            sg.get_mask_iou_on_cluster(
                jnp.asarray(pidx), jnp.asarray(poff), jnp.asarray(labels), jnp.asarray(pointnum)
            )
        )
        np.testing.assert_allclose(got, _iou_oracle(pidx, poff, labels, pointnum), rtol=1e-5)

    def test_iou_on_pred(self, rng, proposals):
        pidx, poff, labels, pointnum = proposals
        scores = rng.uniform(size=len(pidx)).astype(np.float32)
        got = np.asarray(
            sg.get_mask_iou_on_pred(
                jnp.asarray(pidx), jnp.asarray(poff), jnp.asarray(labels),
                jnp.asarray(pointnum), jnp.asarray(scores),
            )
        )
        np.testing.assert_allclose(
            got, _iou_oracle(pidx, poff, labels, pointnum, scores), rtol=1e-5
        )

    def test_mask_label_semantics(self):
        # 2 proposals over 6 points, 3 instances; instance 1 has ignored class
        labels = np.array([0, 0, 1, 1, 2, -100], np.int64)
        pidx = np.array([0, 1, 2, 3, 4, 5], np.int32)
        poff = np.array([0, 4, 6], np.int32)
        cls = np.array([3, -100, 7], np.int64)
        pointnum = np.array([2, 2, 1], np.int32)
        iou = np.array(
            [[0.6, 0.9, 0.0],   # best eligible is inst 0 (inst 1 class-ignored)
             [0.1, 0.2, 0.3]],  # best eligible inst 2, but 0.3 < thr
            np.float32,
        )
        got = np.asarray(
            sg.get_mask_label(
                jnp.asarray(pidx), jnp.asarray(poff), jnp.asarray(labels),
                jnp.asarray(cls), jnp.asarray(pointnum), jnp.asarray(iou), 0.5,
            )
        )
        # proposal 0 assigned to inst 0: points 0,1 (label 0) → 1; 2,3 → 0
        np.testing.assert_array_equal(got[:4], [1, 1, 0, 0])
        # proposal 1 below threshold → stays -1 (ignore)
        np.testing.assert_array_equal(got[4:], [-1, -1])

    def test_mask_label_all_zero_iou_row(self):
        labels = np.array([0, 1], np.int64)
        pidx = np.array([0, 1], np.int32)
        poff = np.array([0, 2], np.int32)
        cls = np.array([3, 4], np.int64)
        iou = np.zeros((1, 2), np.float32)
        got = np.asarray(
            sg.get_mask_label(
                jnp.asarray(pidx), jnp.asarray(poff), jnp.asarray(labels),
                jnp.asarray(cls), jnp.asarray(np.array([1, 1], np.int32)),
                jnp.asarray(iou), 0.0,
            )
        )
        # kernel: max_iou stays 0, max_ind stays 0; 0 >= 0 assigns inst 0
        np.testing.assert_array_equal(got, [1, 0])
