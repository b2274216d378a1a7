"""Device mesh + sharding plumbing.

The reference scales with DDP/NCCL via HF Accelerate
(trainer/leo_trainer.py:50-52, common/misc.py:134-243). TPU-native
equivalent: one ``jax.sharding.Mesh`` with named axes and XLA-inserted
collectives over ICI. Axes:

  - ``dp``: data parallel (batch dimension)            — DDP analog
  - ``tp``: tensor parallel (LLM hidden/heads)         — spare axis for 7B+
  - ``pp``: pipeline stages (GPipe over the LLM blocks, parallel/llm_pp.py)
  - ``sp``: sequence parallel (ring attention inside LlamaAttention)

The mesh is global per-process; models receive ``PartitionSpec`` trees via
``shard_params`` rules rather than hand-written collectives: XLA lowers
``jit``-with-shardings to ICI all-reduce/all-gather (scaling-book recipe).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "dp"
MODEL_AXIS = "tp"
PIPELINE_AXIS = "pp"
SEQUENCE_AXIS = "sp"


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    dp: int = -1  # -1: infer (all remaining devices)
    tp: int = 1
    pp: int = 1
    sp: int = 1

    def resolve(self, n_devices: int) -> Tuple[int, int, int, int]:
        tp, pp, sp = self.tp, self.pp, self.sp
        dp = self.dp
        if dp == -1:
            assert n_devices % (tp * pp * sp) == 0, (
                f"{n_devices} devices not divisible by tp*pp*sp={tp * pp * sp}"
            )
            dp = n_devices // (tp * pp * sp)
        assert dp * tp * pp * sp == n_devices, (
            f"mesh {dp}x{tp}x{pp}x{sp} != {n_devices} devices"
        )
        return dp, tp, pp, sp


def make_mesh(
    mesh_config: Optional[MeshConfig] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    cfg = mesh_config or MeshConfig()
    dp, tp, pp, sp = cfg.resolve(len(devices))
    dev_array = np.array(devices).reshape(dp, tp, pp, sp)
    return Mesh(
        dev_array,
        axis_names=(DATA_AXIS, MODEL_AXIS, PIPELINE_AXIS, SEQUENCE_AXIS),
    )


def ambient_mesh() -> Mesh:
    """The mesh from the active ``with mesh:`` context.

    Lets modules deep inside a jitted forward (e.g. ring attention in
    ``LlamaAttention``) reach the mesh without threading it through every
    config: callers wrap apply/jit in ``with mesh:`` (the trainer and
    dryrun already do)."""
    from jax._src.mesh import thread_resources

    mesh = thread_resources.env.physical_mesh
    if mesh.empty:
        raise RuntimeError(
            "no active mesh context — wrap the model call in `with mesh:` "
            "(required when LlamaConfig.sp_axis is set)"
        )
    return mesh


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard leading (batch) dim over dp; replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_spec() -> P:
    return P(DATA_AXIS)


def shard_batch(mesh: Mesh, batch):
    """Device-put a pytree of host arrays with batch dim sharded over dp."""
    sharding = batch_sharding(mesh)

    def put(x):
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, batch)


def pad_to_multiple(n: int, multiple: int) -> int:
    return int(math.ceil(n / multiple) * multiple)


def initialize_distributed_from_env() -> bool:
    """Initialize multi-process JAX from the launcher's env contract
    (launch.py submitit path: JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    JAX_PROCESS_ID — the analog of the reference's accelerate rendezvous,
    common/launch_utils.py:45-60). Returns True when initialized."""
    import os

    addr = os.environ.get("JAX_COORDINATOR_ADDRESS", "")
    if not addr:
        return False
    jax.distributed.initialize(
        coordinator_address=addr,
        num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
        process_id=int(os.environ["JAX_PROCESS_ID"]),
    )
    return True


def globalize_replicated(mesh: Mesh, tree):
    """Host-local pytree → globally-replicated jax arrays over ``mesh``.

    Multi-process jit requires every input to be a global array; model
    params initialized per-process (identical values by shared seed) are
    assembled into replicated global arrays here. PRNG key arrays are
    handled via their raw key data. No-op copy under one process."""
    from jax.sharding import NamedSharding

    rep = NamedSharding(mesh, P())

    def put(x):
        if isinstance(x, jax.Array) and jnp_is_key(x):
            data = jax.random.key_data(x)
            g = jax.make_array_from_process_local_data(rep, np.asarray(data))
            return jax.random.wrap_key_data(g, impl=jax.random.key_impl(x))
        return jax.make_array_from_process_local_data(rep, np.asarray(x))

    return jax.tree_util.tree_map(put, tree)


def jnp_is_key(x) -> bool:
    import jax.dtypes

    dt = getattr(x, "dtype", None)
    return dt is not None and jax.dtypes.issubdtype(dt, jax.dtypes.prng_key)


def process_allgather_objects(objs: list) -> list:
    """Multi-host gather of non-tensor python objects.

    Reference analog: ``CustomAccelerator.gather_object`` via
    ``torch.distributed.all_gather_object`` (common/misc.py:88-126) — which
    raises NotImplementedError on TPU. Here: single-process returns as-is;
    multi-process JAX uses ``multihost_utils`` broadcast-based gather.
    """
    if jax.process_count() == 1:
        return list(objs)
    from jax.experimental import multihost_utils
    import pickle

    payload = pickle.dumps(objs)
    buf = np.frombuffer(payload, dtype=np.uint8)
    # pad to the global max length so all hosts contribute equal-size arrays
    local_len = np.array([buf.size], dtype=np.int32)
    all_lens = multihost_utils.process_allgather(local_len).reshape(-1)
    max_len = int(all_lens.max())
    padded = np.zeros(max_len, dtype=np.uint8)
    padded[: buf.size] = buf
    gathered = multihost_utils.process_allgather(padded)
    out: list = []
    for row, ln in zip(np.asarray(gathered).reshape(jax.process_count(), -1), all_lens):
        out.extend(pickle.loads(row[:ln].tobytes()))
    return out
