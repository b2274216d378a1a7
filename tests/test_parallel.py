"""Parallelism tests on the 8-fake-device CPU mesh: dp-sharded training,
tp-sharded LLM, dp+tp combined step, gradient-sync equivalence."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from msr3d_tpu.config import config_from_dict
from msr3d_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS, MeshConfig, make_mesh
from msr3d_tpu.parallel.sharding import network_param_specs, shard_variables


def _solver_cfg():
    return config_from_dict(
        {
            "solver": {
                "grad_norm": 5.0,
                "optim": {"name": "AdamW", "args": {"lr": 1e-3, "betas": [0.9, 0.999], "weight_decay": 0.0}},
                "sched": {"name": "warmup_cosine", "args": {"warmup_steps": 1}},
            }
        }
    )


class TestShardingSpecs:
    def test_llama_param_specs(self):
        from msr3d_tpu.parallel.sharding import llama_param_spec

        assert llama_param_spec("['params']['llm']['layer_0']['attn']['q_proj']['kernel']") == P(None, MODEL_AXIS)
        assert llama_param_spec("['params']['llm']['layer_0']['attn']['o_proj']['kernel']") == P(MODEL_AXIS, None)
        assert llama_param_spec("['params']['llm']['layer_0']['mlp']['down_proj']['kernel']") == P(MODEL_AXIS, None)
        assert llama_param_spec("['params']['llm']['embed_tokens']['embedding']") == P(MODEL_AXIS, None)
        assert llama_param_spec("['params']['llm']['layer_0']['input_norm']['scale']") == P()
        # LoRA follows the base layout
        assert llama_param_spec("['params']['llm']['layer_0']['attn']['q_proj']['lora_b']") == P(None, MODEL_AXIS)
        assert llama_param_spec("['params']['llm']['layer_0']['attn']['o_proj']['lora_a']") == P(MODEL_AXIS, None)


class TestDataParallelStep:
    def test_dp_sharded_step_equals_single_device(self, cpu_devices, rng):
        """dp-sharded batch must produce the same update as unsharded
        (XLA's all-reduce == explicit mean)."""
        from msr3d_tpu.optim.build import build_optim
        from msr3d_tpu.trainer.train_state import TrainState, make_train_step

        w0 = jnp.asarray(rng.normal(size=(8, 4)).astype(np.float32))
        variables = {"params": {"w": w0}}
        x = rng.normal(size=(16, 8)).astype(np.float32)
        y = rng.normal(size=(16, 4)).astype(np.float32)

        def apply_fn(vars_, batch, rng_):
            pred = batch["x"] @ vars_["params"]["w"]
            return jnp.mean((pred - batch["y"]) ** 2)

        opt, _ = build_optim(_solver_cfg(), total_steps=10)
        step = make_train_step(apply_fn, opt, accum_steps=1, donate=False)

        # single device
        s1 = TrainState.create(variables, opt)
        s1, m1 = step(s1, {"x": jnp.asarray(x), "y": jnp.asarray(y)}, jax.random.key(0))

        # dp-sharded over 8 devices
        mesh = make_mesh(MeshConfig(dp=8, tp=1))
        batch_sh = NamedSharding(mesh, P(DATA_AXIS))
        s2 = TrainState.create(variables, opt)
        xs = jax.device_put(jnp.asarray(x), batch_sh)
        ys = jax.device_put(jnp.asarray(y), batch_sh)
        s2, m2 = step(s2, {"x": xs, "y": ys}, jax.random.key(0))

        np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(s1.params["params"]["w"]),
            np.asarray(s2.params["params"]["w"]),
            atol=1e-6,
        )


class TestTensorParallelLLM:
    @pytest.fixture(scope="class")
    def setup(self):
        from msr3d_tpu.models.llm.llama import LlamaConfig, LlamaModel

        cfg = LlamaConfig.tiny(
            vocab_size=256, hidden_size=64, intermediate_size=128, dtype=jnp.float32
        )
        model = LlamaModel(cfg)
        rng = np.random.default_rng(0)
        ids = rng.integers(5, 250, size=(4, 12)).astype(np.int32)
        mask = np.ones((4, 12), np.int32)
        embeds_fn = lambda v, i: model.apply(v, i, method=model.embed_tokens)

        def init_all(mod, ids_, mask_):
            # touch both the embedding and the decoder so init creates all params
            e = mod.embed_tokens(ids_)
            return mod(e, mask_)

        variables = model.init(
            jax.random.key(0), jnp.asarray(ids), jnp.asarray(mask), method=init_all
        )
        return model, variables, ids, mask, embeds_fn

    def test_tp_sharded_forward_matches_replicated(self, cpu_devices, setup):
        model, variables, ids, mask, embeds_fn = setup
        mesh = make_mesh(MeshConfig(dp=2, tp=4))
        with mesh:
            # sharding rules key on the MSR3DNetwork 'llm' prefix; wrap the
            # standalone LlamaModel tree accordingly, then unwrap
            wrapped = shard_variables(mesh, {"params": {"llm": variables["params"]}})
            inner = {"params": wrapped["params"]["llm"]}
            # verify a projection kernel is genuinely tp-sharded
            qk = inner["params"]["layer_0"]["attn"]["q_proj"]["kernel"]
            assert not qk.sharding.is_fully_replicated

            embeds = embeds_fn(variables, jnp.asarray(ids))

            @jax.jit
            def fwd(v, e, m):
                logits, _, _ = model.apply(v, e, m)
                return logits

            sharded_logits = fwd(inner, embeds, jnp.asarray(mask))
            plain_logits = fwd(variables, embeds, jnp.asarray(mask))
            np.testing.assert_allclose(
                np.asarray(sharded_logits), np.asarray(plain_logits), atol=2e-4
            )


@pytest.mark.slow
class TestDryrunEntry:
    def test_dryrun_multichip_8(self, cpu_devices):
        import sys
        from pathlib import Path

        sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
        import __graft_entry__ as ge

        ge.dryrun_multichip(8)


class TestTrainerSharding:
    def test_trainer_shard_layouts(self, cpu_devices):
        """LeoTrainer._shard places the batch axis on dp (axis 1 under grad
        accumulation) and replicates non-divisible leaves."""
        import types

        import numpy as np
        from msr3d_tpu.trainer.leo_trainer import LeoTrainer

        t = types.SimpleNamespace(mesh=make_mesh(MeshConfig(dp=8, tp=1)), accum_steps=2)
        batch = {
            "big": np.ones((2, 16, 4), np.float32),   # divisible by dp on axis 1
            "small": np.ones((2, 3, 4), np.float32),  # not divisible → replicated
        }
        out = LeoTrainer._shard(t, batch)
        assert not out["big"].sharding.is_fully_replicated
        assert out["small"].sharding.is_fully_replicated

        t2 = types.SimpleNamespace(mesh=t.mesh, accum_steps=1)
        out2 = LeoTrainer._shard(t2, {"x": np.ones((16, 4), np.float32)})
        assert not out2["x"].sharding.is_fully_replicated
