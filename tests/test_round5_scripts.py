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
def test_open_loop_latency_quick():
    # the Poisson-arrival latency mode (bench_serve --open-loop,
    # VERDICT r4 #4) end to end on the tiny LLM: closed-loop capacity,
    # one load arm, TTFT/e2e/TPOT percentiles all populated, every
    # request completed
    import bench_serve

    rec = bench_serve.run_open_loop(bench_serve.parse_args(
        ["--quick", "--open-loop", "--requests", "12", "--slots", "4",
         "--refill-group", "2", "--chunk-steps", "4", "--max-new", "16",
         "--load-fractions", "0.8"]
    ))
    assert rec["capacity_qa_per_sec_closed_loop"] > 0
    assert rec["streaming_ttft"] is True
    (arm,) = rec["arms"]
    assert arm["load_fraction"] == 0.8
    for k in ("ttft_s_p50", "ttft_s_p95", "e2e_s_p50", "e2e_s_p95"):
        assert arm[k] > 0
    # open-loop at 0.8x capacity must complete everything it was offered
    assert arm["achieved_qa_per_sec"] > 0


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
