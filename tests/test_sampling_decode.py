"""Sampling decode (do_sample + temperature/top-k/top-p warpers).

The reference's generate is beam-only (model/msr3d/msr3d.py:449-513);
sampling is a standard serving capability implemented on the greedy
split-cache loop: one categorical draw per step over HF-warper-filtered
logits, rng carried in the while_loop state.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from msr3d_tpu.models.llm.sampling import sample_filter_logits
from tests.test_serving import _requests


def _np_filter(logits, temperature=1.0, top_k=0, top_p=1.0):
    """NumPy oracle of the HF warper chain (value-threshold form)."""
    logits = logits / max(temperature, 1e-6)
    out = logits.copy()
    if top_k:
        kth = np.sort(logits, axis=-1)[:, -top_k][:, None]
        out = np.where(logits < kth, -np.inf, out)
    if top_p < 1.0:
        srt = np.sort(out, axis=-1)[:, ::-1]
        e = np.exp(srt - srt.max(axis=-1, keepdims=True))
        probs = e / e.sum(axis=-1, keepdims=True)
        cum = np.cumsum(probs, axis=-1)
        keep = (cum - probs) < top_p
        thresh = np.min(np.where(keep, srt, np.inf), axis=-1, keepdims=True)
        out = np.where(out < thresh, -np.inf, out)
    return out


class TestWarpers:
    @pytest.mark.parametrize(
        "kw",
        [
            dict(temperature=0.7),
            dict(top_k=5),
            dict(top_p=0.9),
            dict(temperature=1.3, top_k=8, top_p=0.85),
        ],
    )
    def test_matches_numpy_oracle(self, rng, kw):
        logits = rng.normal(size=(4, 37)).astype(np.float32) * 3
        got = np.asarray(sample_filter_logits(jnp.asarray(logits), **kw))
        want = _np_filter(logits, **kw)
        finite = np.isfinite(want)
        np.testing.assert_array_equal(np.isfinite(got), finite)
        np.testing.assert_allclose(got[finite], want[finite], rtol=1e-6)

    def test_top_k1_keeps_only_argmax(self, rng):
        logits = rng.normal(size=(3, 11)).astype(np.float32)
        got = np.asarray(sample_filter_logits(jnp.asarray(logits), top_k=1))
        assert (np.isfinite(got).sum(axis=-1) == 1).all()
        np.testing.assert_array_equal(
            np.argmax(got, axis=-1), np.argmax(logits, axis=-1)
        )

    def test_top_p_always_keeps_argmax(self, rng):
        logits = rng.normal(size=(5, 23)).astype(np.float32) * 5
        got = np.asarray(
            sample_filter_logits(jnp.asarray(logits), top_p=0.01)
        )
        # tiny top_p → exactly the most-probable token survives
        assert (np.isfinite(got).sum(axis=-1) == 1).all()
        np.testing.assert_array_equal(
            np.argmax(got, axis=-1), np.argmax(logits, axis=-1)
        )

    def test_top_p_mass_covers_threshold(self, rng):
        logits = rng.normal(size=(6, 50)).astype(np.float32) * 2
        p = 0.8
        got = np.asarray(sample_filter_logits(jnp.asarray(logits), top_p=p))
        e = np.exp(logits - logits.max(axis=-1, keepdims=True))
        probs = e / e.sum(axis=-1, keepdims=True)
        kept_mass = np.where(np.isfinite(got), probs, 0).sum(axis=-1)
        assert (kept_mass >= p - 1e-6).all()  # smallest covering prefix


class TestSampleGenerate:
    def _setup(self, model, **kw):
        saved = {
            k: getattr(model, k)
            for k in ("do_sample", "temperature", "top_k", "top_p",
                      "sample_seed", "_sample_calls", "num_beams")
        }
        model.num_beams = 1
        model.do_sample = True
        model._sample_calls = 0
        for k, v in kw.items():
            setattr(model, k, v)
        return saved

    def _restore(self, model, saved):
        for k, v in saved.items():
            setattr(model, k, v)

    def test_near_zero_temperature_matches_greedy(self, tiny_msr3d, rng):
        from msr3d_tpu.serving import _collate

        reqs = _requests(rng, 3)
        batch = _collate(reqs)
        greedy = tiny_msr3d.generate(
            dict(batch), use_beam=False, max_new_tokens=8
        )["output_tokens"]
        saved = self._setup(tiny_msr3d, temperature=1e-6)
        try:
            sampled = tiny_msr3d.generate(
                dict(batch), use_beam=False, max_new_tokens=8
            )["output_tokens"]
        finally:
            self._restore(tiny_msr3d, saved)
        np.testing.assert_array_equal(np.asarray(sampled), np.asarray(greedy))

    def test_top_k1_matches_greedy(self, tiny_msr3d, rng):
        from msr3d_tpu.serving import _collate

        reqs = _requests(rng, 2)
        batch = _collate(reqs)
        greedy = tiny_msr3d.generate(
            dict(batch), use_beam=False, max_new_tokens=6
        )["output_tokens"]
        saved = self._setup(tiny_msr3d, top_k=1)
        try:
            sampled = tiny_msr3d.generate(
                dict(batch), use_beam=False, max_new_tokens=6
            )["output_tokens"]
        finally:
            self._restore(tiny_msr3d, saved)
        np.testing.assert_array_equal(np.asarray(sampled), np.asarray(greedy))

    def test_seed_determinism_and_per_call_variation(self, tiny_msr3d, rng):
        from msr3d_tpu.serving import _collate

        reqs = _requests(rng, 2)
        batch = _collate(reqs)
        saved = self._setup(tiny_msr3d, temperature=1.5, sample_seed=7)
        try:
            a = tiny_msr3d.generate(
                dict(batch), use_beam=False, max_new_tokens=8
            )["output_tokens"]
            # same seed, call counter reset → identical draw
            tiny_msr3d._sample_calls = 0
            b = tiny_msr3d.generate(
                dict(batch), use_beam=False, max_new_tokens=8
            )["output_tokens"]
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
            # successive call folds the counter → fresh randomness
            c = tiny_msr3d.generate(
                dict(batch), use_beam=False, max_new_tokens=8
            )["output_tokens"]
            assert not np.array_equal(np.asarray(a), np.asarray(c))
        finally:
            self._restore(tiny_msr3d, saved)

    def test_sample_rejects_beam_and_spec(self, tiny_msr3d, rng):
        from msr3d_tpu.serving import _collate

        batch = _collate(_requests(rng, 2))
        saved = self._setup(tiny_msr3d)
        try:
            tiny_msr3d.num_beams = 2
            with pytest.raises(ValueError, match="greedy path"):
                tiny_msr3d.generate(dict(batch), max_new_tokens=4)
        finally:
            self._restore(tiny_msr3d, saved)

        from msr3d_tpu.models.msr3d import MSR3D

        with pytest.raises(ValueError, match="mutually exclusive"):
            MSR3D(
                tiny_msr3d.cfg, tiny_msr3d.tokenizer,
                do_sample=True, spec_k=2, repetition_penalty=1.0,
            )
