"""Native C++ vs NumPy parity for the host geometry plans
(ops/host_geometry.py / native/geometry.cc)."""

import numpy as np
import pytest

from msr3d_tpu.ops import host_geometry as hg


@pytest.fixture(scope="module")
def native_lib():
    lib = hg.get_lib()
    if lib is None:
        pytest.skip("no g++ available to build native geometry")
    return lib


def _force_numpy(monkeypatch):
    monkeypatch.setattr(hg, "get_lib", lambda: None)


class TestParity:
    def test_group_rows(self, rng, native_lib, monkeypatch):
        keys = rng.integers(-3, 3, size=(500, 4)).astype(np.int64)
        got, m = hg.group_rows(keys)
        _force_numpy(monkeypatch)
        want, m2 = hg.group_rows(keys)
        assert m == m2
        np.testing.assert_array_equal(got, want)

    def test_conv_neighbors(self, rng, native_lib, monkeypatch):
        coords = np.unique(rng.integers(0, 6, size=(300, 4)), axis=0).astype(np.int64)
        offs = np.array([(dx, dy, dz) for dx in (-1, 0, 1) for dy in (-1, 0, 1)
                         for dz in (-1, 0, 1)], np.int64)
        got = hg.conv_neighbors(coords, offs)
        _force_numpy(monkeypatch)
        want = hg.conv_neighbors(coords, offs)
        np.testing.assert_array_equal(got, want)

    def test_knn(self, rng, native_lib, monkeypatch):
        q = rng.normal(size=(50, 3)).astype(np.float32)
        s = rng.normal(size=(200, 3)).astype(np.float32)
        qb = rng.integers(0, 2, 50).astype(np.int32)
        sb = rng.integers(0, 2, 200).astype(np.int32)
        got = hg.knn(q, qb, s, sb, 7)
        _force_numpy(monkeypatch)
        want = hg.knn(q, qb, s, sb, 7)
        np.testing.assert_array_equal(got, want)

    def test_knn_short_batch_backfill(self, native_lib):
        q = np.zeros((1, 3), np.float32)
        s = np.array([[1, 0, 0], [2, 0, 0]], np.float32)
        out = hg.knn(q, np.zeros(1, np.int32), s, np.zeros(2, np.int32), 4)
        np.testing.assert_array_equal(out[0], [0, 1, 0, 0])

    def test_ballquery(self, rng, native_lib, monkeypatch):
        xyz = rng.normal(size=(120, 3)).astype(np.float32)
        bi = np.concatenate([np.zeros(70, np.int32), np.ones(50, np.int32)])
        bo = np.array([0, 70, 120], np.int64)
        got_idx, got_sl = hg.ballquery_packed(xyz, bi, bo, 0.8)
        _force_numpy(monkeypatch)
        want_idx, want_sl = hg.ballquery_packed(xyz, bi, bo, 0.8)
        np.testing.assert_array_equal(got_idx, want_idx)
        np.testing.assert_array_equal(got_sl, want_sl)

    def test_bfs_components(self, rng, native_lib, monkeypatch):
        xyz = rng.normal(size=(80, 3)).astype(np.float32) * 2
        bi = np.zeros(80, np.int32)
        bo = np.array([0, 80], np.int64)
        idx, sl = hg.ballquery_packed(xyz, bi, bo, 0.7)
        got_o, got_c = hg.bfs_components(idx, sl)
        _force_numpy(monkeypatch)
        want_o, want_c = hg.bfs_components(idx, sl)
        np.testing.assert_array_equal(got_o, want_o)
        np.testing.assert_array_equal(got_c, want_c)

    def test_pad_groups_vectorized(self, rng):
        group_of = rng.integers(0, 9, 100).astype(np.int32)
        out = hg.pad_groups(group_of, 9)
        for g in range(9):
            members = out[g][out[g] >= 0]
            np.testing.assert_array_equal(members, np.nonzero(group_of == g)[0])
