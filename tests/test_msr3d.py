"""End-to-end MSR3D model tests (tiny config, byte tokenizer, CPU)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from msr3d_tpu.models.llm.llama import LlamaConfig
from msr3d_tpu.models.llm.tokenizer import ByteTokenizer, SCENE_PLACEHOLDER, IMAGE_PLACEHOLDER
from msr3d_tpu.models.msr3d import (
    MSR3D,
    MSR3DNetwork,
    MSR3DNetworkConfig,
    splice_embeddings,
)
from msr3d_tpu.models.ose3d_situation import OSE3DConfig, SpatialEncoderConfig

TINY_PROMPTER = OSE3DConfig(
    hidden_size=32,
    spatial_encoder=SpatialEncoderConfig(
        num_attention_heads=4, dim_feedforward=64, dropout=0.0, num_layers=1
    ),
    sa_n_points=(8, 4, None),
    sa_n_samples=(8, 8, None),
    sa_radii=(0.4, 0.8, None),
    sa_mlps=((3, 8, 8, 16), (16, 16, 16, 32), (32, 32, 32, 64)),
    obj_encoder_dtype="float32",  # bit-parity vs fp32 torch reference
)


def tiny_model(scene_token_len=5, **kw):
    tok = ByteTokenizer()
    cfg = MSR3DNetworkConfig(
        prompter=TINY_PROMPTER,
        llm=LlamaConfig.tiny(vocab_size=tok.vocab_size, dtype=jnp.float32),
        backbone_name="convnext_test",
    )
    return MSR3D(
        cfg, tok, scene_token_len=scene_token_len, max_out_len=16,
        num_beams=2, repetition_penalty=1.5, **kw,
    )


def tiny_data_dict(rng, b=2, n_obj=6, n_pts=32, n_img=2, scene_token_len=5):
    return {
        "msr3d_prompt": [
            f"You are in a scene: {SCENE_PLACEHOLDER}. Image: {IMAGE_PLACEHOLDER}. What do you see?",
            f"Scene {SCENE_PLACEHOLDER} here. {IMAGE_PLACEHOLDER} go north?",
        ][:b],
        "text_output": ["a chair", "yes"][:b],
        "obj_fts": (rng.normal(size=(b, n_obj, n_pts, 6)) * 0.3).astype(np.float32),
        "obj_masks": np.ones((b, n_obj), bool),
        "obj_locs": rng.normal(size=(b, n_obj, 6)).astype(np.float32),
        "anchor_locs": rng.normal(size=(b, 3)).astype(np.float32),
        "anchor_orientation": (lambda q: q / np.linalg.norm(q, axis=-1, keepdims=True))(
            rng.normal(size=(b, 4))
        ).astype(np.float32),
        "msr3d_imgs": rng.normal(size=(b, n_img, 32, 32, 3)).astype(np.float32),
        "msr3d_img_masks": np.array([[1, 0], [1, 1]][:b], bool),
    }


class TestSplice:
    def test_rank_gather_matches_scatter(self, rng):
        b, t, n, d = 2, 12, 4, 8
        ids = np.full((b, t), 7, np.int32)
        # row 0: placeholders at 2,3,4,5 ; row 1: at 0,1,8,9
        ids[0, 2:6] = 99
        ids[1, [0, 1, 8, 9]] = 99
        tok_embeds = rng.normal(size=(b, t, d)).astype(np.float32)
        ins = rng.normal(size=(b, n, d)).astype(np.float32)
        ins_mask = np.array([[1, 1, 0, 0], [1, 1, 1, 0]], bool)
        attn = np.ones((b, t), np.int32)

        embeds, new_attn = splice_embeddings(
            jnp.asarray(tok_embeds), jnp.asarray(ids), 99,
            jnp.asarray(ins), jnp.asarray(ins_mask), jnp.asarray(attn),
        )
        embeds, new_attn = np.asarray(embeds), np.asarray(new_attn)

        # reference semantics: k-th placeholder gets ins[row, k]
        want = tok_embeds.copy()
        want_attn = attn.copy()
        for row in range(b):
            k = 0
            for pos in range(t):
                if ids[row, pos] == 99:
                    want[row, pos] = ins[row, k]
                    want_attn[row, pos] = ins_mask[row, k]
                    k += 1
        np.testing.assert_allclose(embeds, want, atol=1e-6)
        np.testing.assert_array_equal(new_attn, want_attn)


class TestMSR3DEndToEnd:
    @pytest.fixture(scope="class")
    def model_and_data(self):
        rng = np.random.default_rng(0)
        model = tiny_model()
        data = tiny_data_dict(rng)
        prompts = model.build_text_prompt(data)
        # placeholder expansion check
        assert prompts[0].count(SCENE_PLACEHOLDER) == 5
        assert prompts[0].count(IMAGE_PLACEHOLDER) == 1
        input_ids, attn = model._encode_prompts(prompts)
        output_ids, output_mask = model._encode_answers(data["text_output"])
        batch = model._scene_batch(data)
        batch.update(
            input_ids=input_ids, attention_mask=attn,
            output_ids=output_ids, output_mask=output_mask,
        )
        model.init_params(batch)
        return model, data

    def test_forward_loss(self, model_and_data):
        model, data = model_and_data
        out = model.forward(dict(data))
        loss = np.asarray(out["loss"])
        assert loss.shape == (2,)
        assert np.isfinite(loss).all()
        assert (loss > 0).all()

    def test_loss_only_covers_answer_tokens(self, model_and_data):
        """Changing the prompt must not change the number of loss tokens;
        longer answers → different loss."""
        model, data = model_and_data
        short = model.forward(dict(data))["loss"]
        data2 = dict(data)
        data2["text_output"] = ["a chair", "yes definitely, go north past the table"]
        long = model.forward(data2)["loss"]
        # row 0 unchanged answer → same loss
        np.testing.assert_allclose(
            np.asarray(short)[0], np.asarray(long)[0], atol=1e-4
        )
        assert abs(float(short[1]) - float(long[1])) > 1e-6

    def test_generate_greedy(self, model_and_data):
        model, data = model_and_data
        out = model.generate(dict(data), use_beam=False, max_new_tokens=6)
        toks = out["output_tokens"]
        assert toks.shape == (2, 6)
        assert "output_text" in out and len(out["output_text"]) == 2

    def test_generate_beam(self, model_and_data):
        model, data = model_and_data
        out = model.generate(dict(data), use_beam=True, max_new_tokens=6)
        assert out["output_tokens"].shape == (2, 6)

    def test_trainable_mask(self, model_and_data):
        model, data = model_and_data
        mask = model.get_opt_params_mask()
        leaves = jax.tree_util.tree_flatten_with_path(mask)[0]
        trainable = [jax.tree_util.keystr(p) for p, v in leaves if v]
        frozen = [jax.tree_util.keystr(p) for p, v in leaves if not v]
        # projections + scene encoder trainable
        assert any("llm_proj" in p for p in trainable)
        assert any("spatial_layer" in p for p in trainable)
        # LLM base + image encoder + frozen pointnet are not
        assert not any(
            "['llm']" in p and "lora" not in p for p in trainable
        )
        assert not any("image_encoder" in p for p in trainable)
        assert not any("obj_encoder" in p for p in trainable)
        assert len(frozen) > 0


@pytest.mark.slow
class TestPredictAnswers:
    def test_ranks_trained_answer_highest(self, rng):
        """predict_answers should prefer candidates whose LM loss is lowest;
        sanity: it returns valid indices and consistent answers."""
        model = tiny_model()
        data = tiny_data_dict(rng)
        prompts = model.build_text_prompt(data)
        ii, am = model._encode_prompts(prompts)
        oi, om = model._encode_answers(data["text_output"])
        batch = model._scene_batch(data)
        batch.update(input_ids=ii, attention_mask=am, output_ids=oi, output_mask=om)
        model.init_params(batch)

        answers = ["a chair", "yes", "the red table", "two"]
        out = model.predict_answers(dict(data), answers, num_ans_candidates=4, chunk_size=2)
        assert out["answers_id"].shape == (2,)
        assert all(a in answers for a in out["answers"])
        assert out["answers"][0] == answers[int(out["answers_id"][0])]


class TestOSE3DAliases:
    def test_registry_names(self):
        from msr3d_tpu.models.build import MODEL_REGISTRY
        from msr3d_tpu.config import config_from_dict

        for name in ("OSE3DSituation", "OSE3D", "OSE3DORIG"):
            assert name in MODEL_REGISTRY
        cfg = config_from_dict({"model": {
            "hidden_size": 32, "situation_type": "as_transform_for_objects",
            "use_spatial_attn": True, "use_anchor": True, "use_orientation": True,
            "fourier_size": 84, "loc_fourier_dim": 63,
            "attn_flat": {"use_attn_flat": False, "mcan_flat_mlp_size": 512,
                          "mcan_flat_glimpses": 1, "mcan_flat_out_size": 1024},
            "vision": {"name": "PcdObjEncoder", "args": {
                "sa_n_points": [8, 4, None], "sa_n_samples": [8, 8, None],
                "sa_radii": [0.4, 0.8, None],
                "sa_mlps": [[3, 8, 8, 16], [16, 16, 16, 32], [32, 32, 32, 64]],
                "freeze": True}},
            "spatial_encoder": {"dim_loc": 6, "num_attention_heads": 4,
                "dim_feedforward": 64, "dropout": 0.0, "activation": "gelu",
                "spatial_multihead": True, "spatial_dim": 5,
                "spatial_dist_norm": True, "spatial_attn_fusion": "cond",
                "num_layers": 1, "obj_loc_encoding": "same_all",
                "pairwise_rel_type": "center"},
        }})
        leo = MODEL_REGISTRY.get("OSE3D")(cfg)
        assert leo.cfg.situation_type == "as_object"
        msr = MODEL_REGISTRY.get("OSE3DSituation")(cfg)
        assert msr.cfg.situation_type == "as_transform_for_objects"

    def test_vision_registry(self):
        from msr3d_tpu.nn import build as _vb  # registration side effects
        from msr3d_tpu.registry import VISION_REGISTRY, build_module
        from msr3d_tpu.config import config_from_dict

        for name in ("PcdObjEncoder", "PointBERTPcdObjEncoder", "Backbone2D"):
            assert name in VISION_REGISTRY
        cfg = config_from_dict({"name": "Backbone2D", "freeze": True,
                                "args": {"backbone_name": "convnext_test", "pooling": "avg"}})
        mod = build_module("vision", cfg)
        assert mod.out_channels == 64


@pytest.mark.slow
class TestLeoFormatPath:
    def test_leo_prompt_parts_with_single_image(self, rng):
        """LEO-format data (prompt parts + single img_fts) flows through the
        1-图 prompt with masked image attention."""
        model = tiny_model()
        b = 2
        data = {
            "prompt_before_obj": ["You are an assistant."] * b,
            "prompt_middle_1": ["Ego-view image:"] * b,
            "prompt_middle_2": ["Objects in the scene:"] * b,
            "prompt_after_obj": ["USER: what do you see? ASSISTANT:"] * b,
            "text_output": ["a chair", "a desk"],
            "obj_fts": (rng.normal(size=(b, 6, 32, 6)) * 0.3).astype(np.float32),
            "obj_masks": np.ones((b, 6), bool),
            "obj_locs": rng.normal(size=(b, 6, 6)).astype(np.float32),
            "anchor_locs": rng.normal(size=(b, 3)).astype(np.float32),
            "anchor_orientation": np.tile(np.array([0, 0, 0, 1], np.float32), (b, 1)),
            "img_fts": rng.normal(size=(b, 32, 32, 3)).astype(np.float32),
            "img_masks": np.array([[1], [0]], bool),
        }
        prompts = model.build_text_prompt(data)
        assert prompts[0].count(IMAGE_PLACEHOLDER) == 1
        assert prompts[0].count(SCENE_PLACEHOLDER) == 5

        ii, am = model._encode_prompts(prompts)
        oi, om = model._encode_answers(data["text_output"])
        batch = model._scene_batch(data)
        assert batch["images"].shape == (b, 1, 32, 32, 3)
        assert batch["image_masks"].tolist() == [[True], [False]]
        batch.update(input_ids=ii, attention_mask=am, output_ids=oi, output_mask=om)
        model.init_params(batch)
        out = model.forward(dict(data))
        assert np.isfinite(np.asarray(out["loss"])).all()


def test_answer_window_loss_equals_full(tiny_msr3d):
    """answer_window_loss computes CE from answer-window logits only —
    bit-equal per-sequence loss (prompt targets are all -100), with the
    fp32 logits buffer shrunk T→T_out (the training-memory cap)."""
    import dataclasses

    import jax.numpy as jnp

    model = tiny_msr3d
    rng = np.random.default_rng(11)
    data = tiny_data_dict(rng)
    prompts = model.build_text_prompt(data)
    ii, am = model._encode_prompts(prompts)
    oi, om = model._encode_answers(data["text_output"])
    batch = model._scene_batch(data)
    batch.update(input_ids=ii, attention_mask=am, output_ids=oi, output_mask=om)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}

    out_full = model.network.apply(model.params, **jb)
    net_w = MSR3DNetwork(dataclasses.replace(model.cfg, answer_window_loss=True))
    out_win = net_w.apply(model.params, **jb)
    np.testing.assert_allclose(
        np.asarray(out_win["loss"]), np.asarray(out_full["loss"]), rtol=1e-6
    )
    assert out_win["logits"].shape[1] == oi.shape[1] == om.shape[1]
