"""Two-process jax.distributed test on CPU: covers the launch.py submitit
env contract (initialize_distributed_from_env) and the multihost branch of
process_allgather_objects — both had zero coverage in round 1 (VERDICT
missing #6). Each worker is a real separate process coordinating over
localhost, the same topology a 2-node SLURM job would see."""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent

WORKER = r"""
import json
import os
import sys

sys.path.insert(0, os.environ["MSR3D_REPO"])

import jax

jax.config.update("jax_platforms", "cpu")

from msr3d_tpu.parallel.mesh import (
    DATA_AXIS,
    MeshConfig,
    initialize_distributed_from_env,
    make_mesh,
    process_allgather_objects,
)

assert initialize_distributed_from_env(), "env contract not detected"
pid = jax.process_index()
n = jax.process_count()
assert n == 2, n

# 1. multihost object gather (different payload sizes per process)
objs = [{"proc": pid, "items": ["x"] * (pid + 1)}]
gathered = process_allgather_objects(objs)

# 2. a dp-sharded computation over the global mesh (XLA collective over
#    the 2-process "ICI"): global mean of per-process shards
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

mesh = make_mesh(MeshConfig(dp=-1, tp=1))
sharding = NamedSharding(mesh, P(DATA_AXIS))
local = np.full((2, 4), float(pid + 1), np.float32)
garr = jax.make_array_from_process_local_data(sharding, local)

@jax.jit
def global_mean(x):
    return jax.numpy.mean(x)

mean = float(global_mean(garr))

print(json.dumps({
    "pid": pid,
    "gathered": gathered,
    "mean": mean,
    "n_global_devices": len(jax.devices()),
}))
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_gather_and_collective(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.pop("PYTHONPATH", None)
        env.update(
            MSR3D_REPO=str(REPO),
            JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
            XLA_FLAGS="--xla_force_host_platform_device_count=1",
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, str(worker)], env=env,
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            )
        )
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, err[-4000:]
        outs.append(json.loads(out.strip().splitlines()[-1]))

    for rec in outs:
        assert rec["n_global_devices"] == 2
        # gather returns BOTH processes' objects, process-major order
        assert [g["proc"] for g in rec["gathered"]] == [0, 1]
        assert [len(g["items"]) for g in rec["gathered"]] == [1, 2]
        # shards: proc0 contributes 1.0s, proc1 contributes 2.0s → mean 1.5
        assert abs(rec["mean"] - 1.5) < 1e-6
