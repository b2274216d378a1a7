"""End-to-end parity gate: the reference torch MSR3D (its own forward /
generate code, CPU-shimmed CUDA kernels) vs our full stack on identical
weights + tokenizer. See scripts/e2e_parity.py; the checked-in report is
PARITY_E2E.json."""

import json
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


@pytest.mark.slow
@pytest.mark.parity
def test_e2e_reference_parity(tmp_path):
    if not Path("/root/reference/model/msr3d/msr3d.py").exists():
        pytest.skip("reference not mounted")
    out = tmp_path / "parity.json"
    proc = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "e2e_parity.py"),
         "--batch", "2", "--max-new", "8", "--out", str(out)],
        capture_output=True, text=True, timeout=1500, cwd=str(REPO),
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    rep = json.loads(out.read_text())
    assert rep["tokenization_exact"] is True
    assert rep["loss_max_rel_diff"] < 1e-4, rep
    assert rep["greedy_token_match"] >= 0.95, rep
    assert rep["beam5_token_match"] >= 0.95, rep
