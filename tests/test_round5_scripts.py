"""Round-5 artifact scripts stay runnable: the 7B learning-closure and
non-echo speculative-acceptance scripts' --quick modes (tiny LLM, CPU)
exercise the full path — real LeoTrainer overfit, greedy + quantized
prefix-pool EM gates, spec-vs-T=1 token identity — end to end.

Slow-marked: each run is ~1.5-2.5 min on one CPU core."""

import json
import subprocess
import sys

import pytest


@pytest.mark.slow
def test_overfit_script_quick(tmp_path):
    out = tmp_path / "learning.json"
    res = subprocess.run(
        [sys.executable, "scripts/overfit_7b.py", "--quick",
         "--out", str(out)],
        capture_output=True, text=True, timeout=900,
    )
    assert res.returncode == 0, res.stdout[-2000:] + res.stderr[-2000:]
    rec = json.loads(out.read_text())
    assert rec["em_greedy_bf16"] == 1.0
    assert rec["em_pool_int8kv8"] == 1.0
    assert rec["phase_b"]["converged"]
    assert rec["quick"] is True


@pytest.mark.slow
def test_spec_nonecho_script_quick(tmp_path):
    out = tmp_path / "spec.json"
    res = subprocess.run(
        [sys.executable, "scripts/spec_nonecho.py", "--quick",
         "--out", str(out)],
        capture_output=True, text=True, timeout=900,
    )
    assert res.returncode == 0, res.stdout[-2000:] + res.stderr[-2000:]
    rec = json.loads(out.read_text())
    assert rec["token_mismatch_rows"] == 0
    # the learned checkpoint echoes its prompt spans and speculation
    # turns that into multi-token verify calls
    assert rec["call_ratio"] > 1.5
    assert rec["echo_exact"].split("/")[0] == rec["echo_exact"].split("/")[1]
