"""dp-sharded serving (MSR3D.shard_for_serving): generation over the
8-device virtual mesh must produce the same tokens as single-device."""

import numpy as np
import pytest

import jax
from jax.sharding import Mesh

from tests.test_msr3d import tiny_data_dict


@pytest.mark.slow  # recompiles generate for the sharded layout
def test_sharded_generate_matches_single_device(tiny_msr3d, rng, cpu_devices):
    model = tiny_msr3d
    data = tiny_data_dict(rng, b=2)
    # 8 rows = 4 copies of the 2-row fixture → divisible by dp=8
    data8 = {
        k: (list(v) * 4 if isinstance(v, list) else np.concatenate([v] * 4))
        for k, v in data.items()
    }
    data8.pop("text_output", None)

    base = model.generate(dict(data8), use_beam=False, max_new_tokens=5)

    mesh = Mesh(np.array(cpu_devices).reshape(8), ("dp",))
    model.shard_for_serving(mesh)
    sharded = model.generate(dict(data8), use_beam=False, max_new_tokens=5)

    np.testing.assert_array_equal(base["output_tokens"], sharded["output_tokens"])
    assert base["output_text"] == sharded["output_text"]

    # params actually live on the mesh
    leaf = jax.tree_util.tree_leaves(model.params)[0]
    assert set(leaf.sharding.mesh.axis_names) == {"dp"}


@pytest.mark.slow
def test_tensor_parallel_generate_matches_single_device(tiny_msr3d, rng, cpu_devices):
    """dp=2 × tp=4: megatron-sharded LLM weights, batch over dp — same
    tokens as single-device."""
    from msr3d_tpu.parallel.mesh import MeshConfig, make_mesh

    model = tiny_msr3d
    data = tiny_data_dict(rng, b=2)
    data.pop("text_output", None)

    base = model.generate(dict(data), use_beam=False, max_new_tokens=5)

    mesh = make_mesh(MeshConfig(dp=2, tp=4), devices=cpu_devices)
    model.shard_for_serving(mesh, tensor_parallel=True)
    sharded = model.generate(dict(data), use_beam=False, max_new_tokens=5)

    np.testing.assert_array_equal(base["output_tokens"], sharded["output_tokens"])
    # an LLM kernel must actually be tp-distributed
    qk = model.params["params"]["llm"]["layer_0"]["attn"]["q_proj"]["kernel"]
    assert not qk.sharding.is_fully_replicated
