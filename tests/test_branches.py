"""Coverage for secondary config branches: loc encodings, spatial dims,
non-spatial encoder, vertical_bottom geometry, AttFlat glimpses, color
encoder, few-shot context prompts, warmup_exp, predict_answers edges."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from msr3d_tpu.models.ose3d_situation import OSE3DConfig, OSE3DSituation, SpatialEncoderConfig
from tests.test_ose3d_situation import TINY, make_batch


class TestSpatialEncoderVariants:
    # flagship default (same_all, configs/msr3d.yaml) stays in the fast
    # gate; the other variants each compile a fresh encoder (~20 s) and
    # run in the complete suite
    @pytest.mark.parametrize(
        "obj_loc_encoding",
        [pytest.param("same_0", marks=pytest.mark.slow), "same_all",
         pytest.param("diff_all", marks=pytest.mark.slow)],
    )
    def test_loc_encodings(self, rng, obj_loc_encoding):
        cfg = dataclasses.replace(
            TINY,
            situation_type="as_object",
            spatial_encoder=dataclasses.replace(
                TINY.spatial_encoder, obj_loc_encoding=obj_loc_encoding, num_layers=2
            ),
        )
        model = OSE3DSituation(cfg)
        batch = make_batch(rng)
        variables = model.init(jax.random.key(0), **batch)
        # diff_all needs one loc layer per spatial layer
        n_loc = sum(1 for k in variables["params"] if k.startswith("loc_layer_"))
        assert n_loc == (2 if obj_loc_encoding == "diff_all" else 1)
        out = model.apply(variables, **batch)
        assert np.isfinite(np.asarray(out["obj_tokens"])).all()

    # 5 is the flagship default (spatial_dim, configs/msr3d.yaml); 1/4
    # variants compile separately and run in the complete suite
    @pytest.mark.parametrize(
        "spatial_dim",
        [pytest.param(1, marks=pytest.mark.slow),
         pytest.param(4, marks=pytest.mark.slow), 5],
    )
    def test_spatial_dims(self, rng, spatial_dim):
        cfg = dataclasses.replace(
            TINY,
            spatial_encoder=dataclasses.replace(
                TINY.spatial_encoder, spatial_dim=spatial_dim
            ),
        )
        model = OSE3DSituation(cfg)
        batch = make_batch(rng)
        variables = model.init(jax.random.key(0), **batch)
        out = model.apply(variables, **batch)
        assert np.isfinite(np.asarray(out["obj_tokens"])).all()

    def test_no_spatial_attention(self, rng):
        cfg = dataclasses.replace(TINY, use_spatial_attn=False)
        model = OSE3DSituation(cfg)
        batch = make_batch(rng)
        variables = model.init(jax.random.key(0), **batch)
        out = model.apply(variables, **batch)
        assert np.isfinite(np.asarray(out["obj_tokens"])).all()

    def test_vertical_bottom_pairwise(self, rng):
        from msr3d_tpu.ops.geometry import calc_pairwise_locs

        centers = rng.normal(size=(2, 6, 3)).astype(np.float32)
        whls = np.abs(rng.normal(size=(2, 6, 3))).astype(np.float32)
        out = np.asarray(
            calc_pairwise_locs(
                jnp.asarray(centers), jnp.asarray(whls),
                pairwise_rel_type="vertical_bottom",
            )
        )
        assert out.shape == (2, 6, 6, 5)
        assert np.isfinite(out).all()

    def test_no_orientation_no_anchor(self, rng):
        cfg = dataclasses.replace(
            TINY, use_anchor=False, use_orientation=False,
            situation_type="as_object",
        )
        model = OSE3DSituation(cfg)
        batch = make_batch(rng)
        variables = model.init(jax.random.key(0), **batch)
        out = model.apply(variables, **batch)
        # no anchor prepended
        assert out["obj_tokens"].shape[1] == batch["obj_fts"].shape[1]


class TestLayers:
    def test_attflat_multi_glimpse(self, rng):
        from msr3d_tpu.nn.layers import AttFlat

        mod = AttFlat(flat_mlp_size=16, flat_glimpses=3, flat_out_size=24)
        x = jnp.asarray(rng.normal(size=(2, 7, 8)).astype(np.float32))
        mask = jnp.asarray(np.array([[False] * 7, [False] * 5 + [True] * 2]))
        variables = mod.init(jax.random.key(0), x, mask)
        pooled, att = mod.apply(variables, x, mask)
        assert pooled.shape == (2, 24)
        assert att.shape == (2, 7, 3)
        # masked positions get ~zero attention
        assert float(np.abs(np.asarray(att)[1, 5:]).sum()) < 1e-6

    def test_obj_color_encoder(self, rng):
        from msr3d_tpu.nn.layers import ObjColorEncoder

        mod = ObjColorEncoder(hidden_size=16)
        colors = jnp.asarray(rng.random((2, 5, 3, 4)).astype(np.float32))
        variables = mod.init(jax.random.key(0), colors)
        out = mod.apply(variables, colors)
        assert out.shape == (2, 5, 16)


class TestDataBranches:
    def test_few_shot_context_prompt(self, tmp_path, rng):
        from msr3d_tpu.config import config_from_dict
        from msr3d_tpu.data.datasets.msr3d import MSQAScanNet
        from msr3d_tpu.data.synthetic import build_scannet_tree, build_msqa_annotations, full_config_dict

        build_scannet_tree(tmp_path, rng)
        build_msqa_annotations(tmp_path, ["scene0000_00"], n=6)
        cfg_dict = full_config_dict(tmp_path, debug_size=6)
        cfg_dict["data"]["msqa_scannet"]["args"]["few_shot_num"] = 2
        cfg = config_from_dict(cfg_dict)
        ds = MSQAScanNet(cfg, "train")
        ctx = ds._get_context_prompt(ds.data[0], ds.data[0]["scan_id"])
        # 2 in-context QA pairs from the same scene/type
        assert ctx.count("USER:") == 2
        assert ctx.count("ASSISTANT:") == 2

    def test_warmup_exp_schedule(self):
        from msr3d_tpu.optim.build import make_schedule

        sched = make_schedule("warmup_exp", 1e-3, 10, 100, gamma=0.9)
        assert float(sched(jnp.float32(5))) == pytest.approx(1e-3 * 0.5)
        # decay after warmup
        assert float(sched(jnp.float32(50))) < float(sched(jnp.float32(20)))


@pytest.mark.slow
class TestPredictAnswersEdges:
    def test_candidates_clamped_to_list(self, rng):
        from tests.test_msr3d import tiny_data_dict, tiny_model

        model = tiny_model()
        data = tiny_data_dict(rng)
        prompts = model.build_text_prompt(data)
        ii, am = model._encode_prompts(prompts)
        oi, om = model._encode_answers(data["text_output"])
        batch = model._scene_batch(data)
        batch.update(input_ids=ii, attention_mask=am, output_ids=oi, output_mask=om)
        model.init_params(batch)
        # ask for more candidates than answers exist
        out = model.predict_answers(dict(data), ["yes", "no"], num_ans_candidates=99)
        assert all(a in ("yes", "no") for a in out["answers"])
