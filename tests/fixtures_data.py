"""Test-side alias for the synthetic data builders (product module:
msr3d_tpu/data/synthetic.py)."""

from msr3d_tpu.data.synthetic import (  # noqa: F401
    build_arkit_tree,
    build_full_tree,
    build_msnn_annotations,
    build_msqa_annotations,
    build_rscan_tree,
    build_scannet_tree,
    full_config_dict,
    make_scene_pcd,
)
