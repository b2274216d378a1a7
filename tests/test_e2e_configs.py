"""End-to-end CLI smokes for the BASELINE task configs beyond MSQA:
MSNN next-step navigation (config #4) and SQA3D situated QA (config #2)
run from YAML through launch.py semantics on the synthetic data tree —
train one debug epoch, then eval with the task's evaluator."""

import json
import os
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def data_tree(tmp_path_factory):
    from msr3d_tpu.data.synthetic import build_full_tree

    root = tmp_path_factory.mktemp("synth")
    build_full_tree(root, np.random.default_rng(7))
    return root


def _run_config(config, data_tree, tmp_path):
    import run as run_mod

    cwd = os.getcwd()
    overrides = [
        f"base_dir={tmp_path}/out",
        f"data.scan_family_base={data_tree}/scan_family",
        f"data.rscan_base={data_tree}/rscan",
        f"data.ARkit_base={data_tree}/arkit",
        f"data.msr3d_base={data_tree}/msr3d",
        f"data.msnn_base={data_tree}/msnn",
    ]
    run_mod.main(["--config", config] + overrides)
    out_root = Path(f"{tmp_path}/out")
    metrics = list(out_root.rglob("metrics.jsonl"))
    assert metrics, f"no metrics.jsonl under {out_root}"
    records = [json.loads(l) for l in metrics[0].read_text().splitlines()]
    assert os.getcwd() == cwd
    return records


def test_msnn_config_end_to_end(data_tree, tmp_path):
    records = _run_config("configs/debug_synthetic_msnn.yaml", data_tree, tmp_path)
    # a train step happened and the nav evaluator reported accuracy
    assert any(any("loss" in k for k in r) for r in records)
    eval_recs = [r for r in records if any("accuracy" in k for k in r)]
    assert eval_recs, records[-3:]


def test_sqa3d_config_end_to_end(data_tree, tmp_path):
    records = _run_config("configs/debug_synthetic_sqa3d.yaml", data_tree, tmp_path)
    assert any(any("loss" in k for k in r) for r in records)
    eval_recs = [
        r for r in records if any(("em" in k.lower() or "acc" in k.lower()) for k in r)
    ]
    assert eval_recs, records[-3:]


def test_mix3_config_end_to_end(data_tree, tmp_path):
    """BASELINE config #5 analog: MSR3DMix over all three scan domains."""
    records = _run_config("configs/debug_synthetic_mix3.yaml", data_tree, tmp_path)
    assert any(any("loss" in k for k in r) for r in records)
    eval_recs = [r for r in records if any("acc" in k.lower() for k in r)]
    assert eval_recs, records[-3:]


def test_leo_pure_txt_config_end_to_end(data_tree, tmp_path):
    """BASELINE config #1 analog: LEO anchor-as-object, pure-text
    situations, 3-domain mix."""
    records = _run_config("configs/debug_synthetic_leo.yaml", data_tree, tmp_path)
    assert any(any("loss" in k for k in r) for r in records)
