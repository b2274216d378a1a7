"""Exercises the submitit SLURM launch path (launch.py:47-80) with a fake
submitit module: executor parameters (the reference's retry/signal
settings, common/launch_utils.py:83-97), the per-node env contract, and
the callback into run.main."""

import sys
import types

import pytest

import launch


class _FakeJobEnvironment:
    hostnames = ["node-a", "node-b"]
    num_nodes = 2
    node = 1  # we are the second node


class _FakeExecutor:
    instances = []

    def __init__(self, folder):
        self.folder = folder
        self.params = None
        self.submitted = []
        _FakeExecutor.instances.append(self)

    def update_parameters(self, **kw):
        self.params = kw

    def submit(self, fn, *a, **kw):
        self.submitted.append(fn)


@pytest.fixture
def fake_submitit(monkeypatch):
    mod = types.ModuleType("submitit")
    mod.AutoExecutor = _FakeExecutor
    mod.JobEnvironment = _FakeJobEnvironment
    monkeypatch.setitem(sys.modules, "submitit", mod)
    _FakeExecutor.instances.clear()
    return mod


def test_submitit_launch_contract(fake_submitit, monkeypatch, tmp_path):
    calls = {}

    import run as run_mod

    monkeypatch.setattr(run_mod, "main", lambda argv: calls.setdefault("run_argv", argv))

    from msr3d_tpu.parallel import mesh

    monkeypatch.setattr(
        mesh, "initialize_distributed_from_env",
        lambda: calls.setdefault("dist_init", True),
    )

    cfg = tmp_path / "c.yaml"
    cfg.write_text("name: x\n")
    launch.main([
        "--mode", "submitit", "--config", str(cfg),
        "--partition", "HGX", "--num_nodes", "2", "--port", "23456",
        "trainer=LeoTrainer",
    ])

    (ex,) = _FakeExecutor.instances
    # reference SLURM settings (launch_utils.py:83-97)
    assert ex.params["nodes"] == 2
    assert ex.params["tasks_per_node"] == 1
    assert ex.params["slurm_partition"] == "HGX"
    assert ex.params["slurm_max_num_timeout"] == 30
    assert ex.params["slurm_signal_delay_s"] == 120

    # run the captured per-node job and check the env contract
    (job,) = ex.submitted
    job()
    import os

    assert os.environ["JAX_COORDINATOR_ADDRESS"] == "node-a:23456"
    assert os.environ["JAX_NUM_PROCESSES"] == "2"
    assert os.environ["JAX_PROCESS_ID"] == "1"
    assert calls["dist_init"] is True
    assert calls["run_argv"] == ["--config", str(cfg), "trainer=LeoTrainer"]


def test_submitit_missing_is_actionable(monkeypatch, tmp_path):
    monkeypatch.setitem(sys.modules, "submitit", None)
    cfg = tmp_path / "c.yaml"
    cfg.write_text("name: x\n")
    with pytest.raises(SystemExit, match="submitit not installed"):
        launch.main(["--mode", "submitit", "--config", str(cfg)])
