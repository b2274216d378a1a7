"""Test harness: run everything on a virtual 8-device CPU mesh.

Must set XLA flags before jax is imported anywhere (standard JAX
fake-multi-device trick, SURVEY.md §4c).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
prev = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in prev:
    os.environ["XLA_FLAGS"] = (prev + " --xla_force_host_platform_device_count=8").strip()

import jax

# The hosting environment's TPU plugin may force jax_platforms programmatically
# (overriding the env var), so pin it at config level too.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def cpu_devices():
    devs = jax.devices()
    assert len(devs) == 8, f"expected 8 fake CPU devices, got {devs}"
    return devs


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture(scope="session")
def shared_tiny_msr3d():
    """One tiny MSR3D built+initialized for the whole session (~25 s);
    consumers restore pristine params per test. The jitted loss/generate
    caches take params as arguments, so reuse across tests is sound."""
    from tests.test_msr3d import tiny_data_dict, tiny_model

    srng = np.random.default_rng(7)
    model = tiny_model()
    data = tiny_data_dict(srng)
    prompts = model.build_text_prompt(data)
    ii, am = model._encode_prompts(prompts)
    oi, om = model._encode_answers(data["text_output"])
    batch = model._scene_batch(data)
    batch.update(input_ids=ii, attention_mask=am, output_ids=oi, output_mask=om)
    model.init_params(batch)
    pristine = jax.tree_util.tree_map(lambda x: x, model.params)
    return model, pristine


@pytest.fixture
def tiny_msr3d(shared_tiny_msr3d):
    model, pristine = shared_tiny_msr3d
    model.params = jax.tree_util.tree_map(lambda x: x, pristine)
    model.compact_transfer = False
    model.spec_k = 0
    model.beam_ancestry = True  # constructor default (ancestry beam KV)
    model.layered_gen_cache = False
    if getattr(model, "_serving_mesh", None) is not None:
        # a prior test sharded the model: drop mesh state and the
        # sharded-layout compiled fns
        model._serving_mesh = None
        model._generate_cache = {}
    return model
