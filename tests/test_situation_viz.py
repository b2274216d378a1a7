"""Situation visualizer geometry parity (reference
tools/situation_visualization.py:11-81) + smoke render."""

import numpy as np
import pytest

from msr3d_tpu.tools.situation_visualization import (
    align_situation,
    get_view_vector,
    instance_recoloring,
    quaternion_to_euler_z,
    visualize_situation,
)


def _rand_quat(rng):
    q = rng.normal(size=4)
    return q / np.linalg.norm(q)


class TestGeometry:
    def test_euler_z_matches_scipy(self):
        from scipy.spatial.transform import Rotation as R

        rng = np.random.default_rng(0)
        for _ in range(20):
            q = _rand_quat(rng)
            want = R.from_quat(q).as_euler("xyz", degrees=False)[-1]
            assert quaternion_to_euler_z(q) == pytest.approx(want, abs=1e-9)

    def test_view_vector_matches_reference_formula(self):
        from scipy.spatial.transform import Rotation as R

        rng = np.random.default_rng(1)
        for _ in range(10):
            q = _rand_quat(rng)
            angle = R.from_quat(q).as_euler("xyz", degrees=False)[-1]
            want = np.array([np.cos(angle), np.sin(angle), 0.0])
            np.testing.assert_allclose(get_view_vector(q), want, atol=1e-9)

    def test_align_situation_matches_reference(self):
        """Literal reimplementation of the reference's align_situation
        (situation_visualization.py:58-81) with scipy, as the oracle."""
        from scipy.spatial.transform import Rotation as R

        rng = np.random.default_rng(2)
        for _ in range(10):
            pos = rng.normal(size=3)
            ori = _rand_quat(rng)
            center = rng.normal(size=3)
            align = R.from_euler("z", rng.uniform(0, 360), degrees=True).as_matrix()

            want_pos = (pos.reshape(1, 3) @ align.T + center).reshape(-1)
            rot = R.from_quat(ori).as_matrix()
            flip = R.from_euler("z", 180, degrees=True).as_matrix()
            want_ori = R.from_matrix(flip @ (align @ rot)).as_quat()

            got_pos, got_ori = align_situation(pos, ori, center, align)
            np.testing.assert_allclose(got_pos, want_pos, atol=1e-9)
            # quaternion double cover: q and -q are the same rotation
            if np.dot(got_ori, want_ori) < 0:
                got_ori = -got_ori
            np.testing.assert_allclose(got_ori, want_ori, atol=1e-7)

    def test_align_accepts_dict_inputs(self):
        pos = {"x": 1.0, "y": 2.0, "z": 0.5}
        ori = {"_x": 0.0, "_y": 0.0, "_z": 0.0, "_w": 1.0}
        got_pos, got_ori = align_situation(pos, ori, np.zeros(3), np.eye(3))
        np.testing.assert_allclose(got_pos, [1.0, 2.0, 0.5])

    def test_instance_recoloring_shape(self):
        labels = np.array([-100, 0, 0, 3, 7])
        rgb = instance_recoloring(labels)
        assert rgb.shape == (5, 3)
        np.testing.assert_array_equal(rgb[1], rgb[2])  # same instance → same color


class TestRender:
    def test_smoke_png(self, tmp_path):
        rng = np.random.default_rng(0)
        points = rng.normal(size=(500, 3))
        colors = rng.uniform(-1, 1, size=(500, 3))
        labels = rng.integers(0, 5, size=500)
        out = visualize_situation(
            points, colors, labels,
            location=[0, 0, 0], orientation=[0, 0, 0, 1],
            situation="standing in the test scene",
            out_path=str(tmp_path / "viz.png"),
        )
        assert (tmp_path / "viz.png").stat().st_size > 1000
        out2 = visualize_situation(
            points, colors, labels, out_path=str(tmp_path / "inst.png"),
            color_by_instance=True,
        )
        assert (tmp_path / "inst.png").exists()
