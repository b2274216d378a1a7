"""Ancestry-indirected beam KV: token parity vs the reorder path.

The standard beam step physically gathers the generated cache on every
re-rank; ancestry mode keeps rows fixed and reads the generated segment
as a (K·S) pair segment through a (B·K, S) ancestor map. Identical math
— these tests pin token equality on the plain beam path, the grouped
beam path (suffix slots in the generated segment), and under int8 KV.
"""

import dataclasses

import numpy as np
import pytest

from tests.test_msr3d import tiny_data_dict, tiny_model
from tests.test_scene_group import SCENE_KEYS, _group_dict, _tiled_dict


@pytest.mark.slow  # beam compiles on the tiny model
def test_ancestry_beam_matches_reorder_beam(tiny_msr3d, rng):
    data = tiny_data_dict(rng)
    tiny_msr3d.beam_ancestry = False  # reorder-path control arm
    base = tiny_msr3d.generate(dict(data), use_beam=True, max_new_tokens=6)

    tiny_msr3d.beam_ancestry = True
    anc = tiny_msr3d.generate(dict(data), use_beam=True, max_new_tokens=6)
    np.testing.assert_array_equal(anc["output_tokens"], base["output_tokens"])
    assert anc["output_text"] == base["output_text"]


@pytest.mark.slow
def test_ancestry_grouped_beam_matches(tiny_msr3d, rng):
    """Grouped beam + ancestry: suffix slots live in the generated
    segment (gen_base > 0) and must stay visible through the ancestor
    map across beam re-ranks."""
    questions = ["What do you see?", "Is there a chair by the window?"]
    group = _group_dict(rng, questions)
    tiny_msr3d.beam_ancestry = False  # reorder-path control arm
    plain = tiny_msr3d.generate(
        _tiled_dict(group), use_beam=True, max_new_tokens=6
    )
    tiny_msr3d.beam_ancestry = True
    out = tiny_msr3d.generate_scene_group(
        dict(group), use_beam=True, max_new_tokens=6
    )
    np.testing.assert_array_equal(out["output_tokens"], plain["output_tokens"])
    assert out["output_text"] == plain["output_text"]


def test_layered_greedy_matches_stacked(tiny_msr3d, rng):
    """layered_gen_cache (per-layer gen-KV tuple) greedy decode is
    token-identical to the stacked layout."""
    data = tiny_data_dict(rng)
    base = tiny_msr3d.generate(dict(data), use_beam=False, max_new_tokens=6)
    tiny_msr3d.layered_gen_cache = True
    lay = tiny_msr3d.generate(dict(data), use_beam=False, max_new_tokens=6)
    np.testing.assert_array_equal(lay["output_tokens"], base["output_tokens"])


def test_layered_grouped_greedy_matches(tiny_msr3d, rng):
    """Grouped greedy with the layered layout: the suffix window pass
    writes into the per-layer tuple and the loop continues on it."""
    questions = ["What do you see?", "Color?"]
    group = _group_dict(rng, questions)
    base = tiny_msr3d.generate_scene_group(
        dict(group), use_beam=False, max_new_tokens=6
    )
    tiny_msr3d.layered_gen_cache = True
    lay = tiny_msr3d.generate_scene_group(
        dict(group), use_beam=False, max_new_tokens=6
    )
    np.testing.assert_array_equal(lay["output_tokens"], base["output_tokens"])


@pytest.mark.slow
def test_ancestry_beam_matches_under_int8_kv(rng):
    """int8 KV cache: the pair segment's scale-outside dequant must
    follow the reshaped (K·S) layout exactly."""
    import jax

    model = tiny_model()
    model.cfg = dataclasses.replace(
        model.cfg, llm=dataclasses.replace(model.cfg.llm, kv_quantize=True)
    )
    from msr3d_tpu.models.msr3d import MSR3DNetwork

    model.network = MSR3DNetwork(model.cfg)
    data = tiny_data_dict(rng)
    prompts = model.build_text_prompt(data)
    ii, am = model._encode_prompts(prompts)
    oi, om = model._encode_answers(data["text_output"])
    batch = model._scene_batch(data)
    batch.update(input_ids=ii, attention_mask=am, output_ids=oi, output_mask=om)
    model.init_params(batch)
    pristine = jax.tree_util.tree_map(lambda x: x, model.params)

    model.beam_ancestry = False  # reorder-path control arm
    base = model.generate(dict(data), use_beam=True, max_new_tokens=5)
    model.params = pristine
    model.beam_ancestry = True
    anc = model.generate(dict(data), use_beam=True, max_new_tokens=5)
    np.testing.assert_array_equal(anc["output_tokens"], base["output_tokens"])
