"""Evaluator tests: clean_answer/EM-R parity, caption-metric parity vs the
reference's vendored pycocoevalcap scorers, evaluator contracts."""

import importlib.util
import sys
import types
from pathlib import Path

import numpy as np
import pytest

from msr3d_tpu.evaluator.capeval import BleuScorer, CiderScorer, RougeScorer
from msr3d_tpu.evaluator.msqa_eval import MSQAEval
from msr3d_tpu.evaluator.one_step_eval import OneStepNavInstructionEval
from msr3d_tpu.evaluator.sqa3d_eval import SQA3DInstructionEval
from msr3d_tpu.evaluator.text_utils import answer_match, clean_answer


def _load_ref_capeval():
    root = Path("/root/reference/evaluator/capeval")
    if not root.exists():
        return None
    pkg = types.ModuleType("ref_capeval")
    pkg.__path__ = [str(root)]
    sys.modules["ref_capeval"] = pkg
    for sub in ["bleu", "cider", "rouge"]:
        sp = types.ModuleType(f"ref_capeval.{sub}")
        sp.__path__ = [str(root / sub)]
        sys.modules[f"ref_capeval.{sub}"] = sp

    def load(name, path):
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    load("ref_capeval.bleu.bleu_scorer", root / "bleu/bleu_scorer.py")
    bleu = load("ref_capeval.bleu.bleu", root / "bleu/bleu.py")
    load("ref_capeval.cider.cider_scorer", root / "cider/cider_scorer.py")
    cider = load("ref_capeval.cider.cider", root / "cider/cider.py")
    rouge = load("ref_capeval.rouge.rouge", root / "rouge/rouge.py")
    return bleu.Bleu, cider.Cider, rouge.Rouge


class TestCleanAnswer:
    def test_matches_reference_regexes(self):
        cases = [
            ("The RED Chair.", "red chair"),
            ("  3 chairs  ", "three chairs"),
            ("go letf then rigth", "go left then right"),
            ("none", "zero"),
            ("10 o clock", "ten o clock"),
            ("a table", "table"),
            ("the mat2", "mat"),
            ("backwards", "backward"),
            ("it's 23", "it's twenty-three"),
        ]
        for raw, want in cases:
            assert clean_answer(raw) == want, raw

    @pytest.mark.parity
    def test_parity_with_reference_clean_answer(self):
        """Literal comparison against the reference's own clean_answer."""
        path = Path("/root/reference/data/data_utils.py")
        if not path.exists():
            pytest.skip("reference not mounted")
        src = path.read_text()
        # extract just the clean_answer function into a sandbox namespace
        start = src.index("def clean_answer")
        end = src.index("def find_subsequence")
        ns = {"re": __import__("re")}
        exec(src[start:end], ns)
        ref_clean = ns["clean_answer"]
        samples = [
            "The RED Chair.", "3 chairs", "go letf then rigth", "none",
            "10 o clock", "a table near an window", "the mat2", "backwards",
            "NO", "yes, it's 23 meters", "TV on the wall", "2 o' clock",
            "washing machine ç", "behine you", "12345", "zero 0 none",
        ]
        for s in samples:
            assert clean_answer(s) == ref_clean(s), s


class TestAnswerMatch:
    def test_em_r_semantics(self):
        assert answer_match("red chair", ["red chair"])
        assert answer_match("chair", ["red chair"])  # pred ⊂ gt
        assert answer_match("the red chair", ["red chair"])  # gt ⊂ pred
        assert not answer_match("table", ["red chair"])
        assert answer_match("redchair", ["red chair"])  # whitespace-stripped


@pytest.mark.parity
class TestCaptionMetricParity:
    @pytest.fixture(scope="class")
    def scorers(self):
        loaded = _load_ref_capeval()
        if loaded is None:
            pytest.skip("reference capeval not mounted")
        return loaded

    @pytest.fixture(scope="class")
    def corpus(self):
        gts = {
            0: ["the red chair is on the left", "red chair on the left side"],
            1: ["two"],
            2: ["walk forward and turn right at the table"],
            3: ["a wooden desk next to the window", "wooden desk by window"],
        }
        res = {
            0: ["the red chair is left"],
            1: ["two chairs"],
            2: ["walk forward then turn right"],
            3: ["a wooden desk near the window"],
        }
        return gts, res

    def test_bleu_parity(self, scorers, corpus):
        Bleu, _, _ = scorers
        gts, res = corpus
        want = Bleu(4).compute_score(gts, res)[0]
        got = BleuScorer(4).compute_score(gts, res)[0]
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_cider_parity(self, scorers, corpus):
        _, Cider, _ = scorers
        gts, res = corpus
        want = Cider().compute_score(gts, res)[0]
        got = CiderScorer().compute_score(gts, res)[0]
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_rouge_parity(self, scorers, corpus):
        _, _, Rouge = scorers
        gts, res = corpus
        want = Rouge().compute_score(gts, res)[0]
        got = RougeScorer().compute_score(gts, res)[0]
        np.testing.assert_allclose(got, want, atol=1e-6)


class TestMSQAEval:
    def test_update_record_flow(self, tmp_path):
        ev = MSQAEval(None, task_name="msqa", save_dir=tmp_path)
        ev.update(
            {
                "output_text": ["red chair", "table"],
                "answer_list": ["the red chair", "two[answer_seq]three"],
            }
        )
        ev.update(
            {"output_text": ["3"], "answer_list": ["three"]}
        )
        is_best, results = ev.record("val")
        assert is_best
        # 2 of 3 correct: "red chair"⊂"the red chair" ✓, "table"≠ ✗, "3"→"three" ✓
        np.testing.assert_allclose(results["ans1_acc_llm"], 2 / 3)
        assert "cider" in results and "bleu" in results
        assert (tmp_path / "results.json").exists()

    def test_reset(self, tmp_path):
        ev = MSQAEval(None, task_name="msqa", save_dir=tmp_path)
        ev.update({"output_text": ["x"], "answer_list": ["x"]})
        ev.reset()
        assert ev.total_count == 0


class TestSQA3DEval:
    def test_strict_match_and_types(self, tmp_path):
        qa_pool = {7: {"answers": ["red"]}, 8: {"answers": ["two", "2"]}}
        ev = SQA3DInstructionEval(None, task_name="sqa", save_dir=tmp_path, qa_pool=qa_pool)
        ev.update(
            {
                "output_text": ["red", "three"],
                "data_idx": np.array([7, 8]),
                "sqa_type": np.array([0, 2]),
            }
        )
        is_best, results = ev.record("val")
        np.testing.assert_allclose(results["ans1_acc_llm"], 0.5)
        np.testing.assert_allclose(results["type0_acc_llm"], 1.0)
        np.testing.assert_allclose(results["type2_acc_llm"], 0.0)
        # strict: containment does NOT count
        ev.reset()
        ev.update(
            {"output_text": ["red chair"], "data_idx": np.array([7]),
             "sqa_type": np.array([0])}
        )
        _, results = ev.record("val")
        np.testing.assert_allclose(results["ans1_acc_llm"], 0.0)


class TestSQA3DVocabEval:
    """Answer-vocabulary EM@1/EM@10 evaluator vs the reference
    implementation (evaluator/sqa3d_eval.py:13-152), run on canned
    predictions."""

    A = 31  # vocab size (includes the 'u' unknown token)
    B = 6

    def _canned(self, seed):
        rng = np.random.default_rng(seed)
        scores = rng.normal(size=(self.B, self.A)).astype(np.float32)
        labels = np.zeros((self.B, self.A), np.int64)
        for i in range(self.B):
            labels[i, rng.choice(self.A, size=3, replace=False)] = 1
        types = rng.integers(0, 6, size=(self.B,))
        n_obj = 8
        obj = {
            f"obj_cls_{k}_logits": rng.normal(size=(self.B, n_obj, 5)).astype(
                np.float32
            )
            for k in ("raw", "pre", "post")
        }
        return dict(
            answer_scores=scores,
            answer_label=labels,
            sqa_type=types,
            obj_labels=rng.integers(0, 5, size=(self.B, n_obj)),
            obj_masks=rng.random((self.B, n_obj)) > 0.3,
            **obj,
        )

    def _ref_evaluator(self, tmp_path):
        import json as _json
        import sys
        import types as _types

        import torch  # noqa: F401  (reference evaluator needs it)

        from msr3d_tpu.evaluator.text_utils import clean_answer as _ca
        from ref_loader import load_ref_file

        # minimal shims for the reference module's imports (data_utils pulls
        # in open3d/cv2/quaternion/trimesh, absent in this image)
        missing = {}
        import importlib.machinery as _machinery

        for name in ("open3d", "cv2", "quaternion", "trimesh"):
            if name not in sys.modules:
                stub = _types.ModuleType(name)
                stub.__spec__ = _machinery.ModuleSpec(name, None)
                missing[name] = stub
                sys.modules[name] = stub
        try:
            ref_du = load_ref_file("data/data_utils.py", "ref_data_utils_sqa")
        finally:
            for name in missing:
                sys.modules.pop(name, None)
        dpkg = _types.ModuleType("data")
        ddu = _types.ModuleType("data.data_utils")
        ddu.SQA3DAnswer = ref_du.SQA3DAnswer
        ddu.clean_answer = _ca
        sys.modules["data"] = dpkg
        sys.modules["data.data_utils"] = ddu
        epkg = _types.ModuleType("evaluator")
        ebuild = _types.ModuleType("evaluator.build")

        class _Reg:
            def register(self, *a, **k):
                return lambda cls: cls

        ebuild.EVALUATOR_REGISTRY = _Reg()
        sys.modules["evaluator"] = epkg
        sys.modules["evaluator.build"] = ebuild
        try:
            mod = load_ref_file("evaluator/sqa3d_eval.py", "ref_sqa3d_eval")
        finally:
            for name in ("data", "data.data_utils", "evaluator", "evaluator.build"):
                sys.modules.pop(name, None)
        if mod is None:
            return None

        anno = tmp_path / "fam" / "annotations" / "sqa_task"
        anno.mkdir(parents=True, exist_ok=True)
        # sorted vocab of A entries including the required 'u' token
        names = sorted(["u"] + [f"ans{i:02d}" for i in range(self.A - 1)])
        with open(anno / "answer_dict.json", "w") as f:
            _json.dump([{n: i for i, n in enumerate(names)}], f)
        cfg = _types.SimpleNamespace(
            data=_types.SimpleNamespace(scan_family_base=str(tmp_path / "fam")),
            eval=_types.SimpleNamespace(save=False),
            exp_dir=str(tmp_path),
        )
        return mod.SQA3DEval(cfg, "sqa")

    def test_parity_with_reference(self, tmp_path):
        import torch

        from msr3d_tpu.evaluator.sqa3d_eval import SQA3DEval

        ref = self._ref_evaluator(tmp_path)
        ours = SQA3DEval(None, task_name="sqa", save_dir=tmp_path / "ours")

        for seed in (0, 1):
            d = self._canned(seed)
            ours.update(d)
            ref.update(
                {
                    **{k: torch.as_tensor(np.asarray(v)) for k, v in d.items()},
                }
            )
        _, ours_rec = ours.record("val")
        _, ref_rec = ref.record("val")
        for key in (
            "ans1_acc", "ans10_acc", "target_metric",
            "obj_cls_raw_acc", "obj_cls_pre_acc", "obj_cls_post_acc",
            *[f"type{t}_acc" for t in range(6)],
        ):
            np.testing.assert_allclose(
                ours_rec[key], ref_rec[key], atol=1e-6, err_msg=key
            )

    def test_em10_semantics(self, tmp_path):
        from msr3d_tpu.evaluator.sqa3d_eval import SQA3DEval

        ev = SQA3DEval(None, task_name="sqa", save_dir=tmp_path)
        scores = np.zeros((1, 20), np.float32)
        scores[0, 5] = 10.0  # argmax wrong
        scores[0, 7] = 9.0  # rank 2 — inside top-10
        labels = np.zeros((1, 20), np.int64)
        labels[0, 7] = 1
        ev.update(
            {"answer_scores": scores, "answer_label": labels,
             "sqa_type": np.array([0])}
        )
        _, rec = ev.record("val")
        assert rec["ans1_acc"] == 0.0
        assert rec["ans10_acc"] == 1.0


class TestOneStepEval:
    def test_accuracy_and_invalid(self):
        ev = OneStepNavInstructionEval(None, task_name="msnn")
        ev.update(
            {
                "output_text": ["给", "弘", "hello"],
                "text_output": ["给", "收", "给"],
            }
        )
        is_best, results = ev.record()
        np.testing.assert_allclose(results["accuracy"], 1 / 3)
        np.testing.assert_allclose(results["invalid"], 1 / 3)


class TestOfflineMSQA:
    def test_score_results_merged_categories(self):
        from msr3d_tpu.evaluator.offline_msqa import score_results

        results = {
            "scannet": [
                {"response_pred": "three", "response_gt": ["3"], "type": "counting"},
                {"response_pred": "no", "response_gt": ["yes"], "type": "existence"},
                {"response_pred": "red", "response_gt": ["the red one"], "type": "attribute-color"},
                {"response_pred": "left", "response_gt": ["left"], "type": "spatial relationship"},
            ],
            "rscan": [
                {"response_pred": "turn right", "response_gt": ["turn right"], "type": "navigation"},
                {"response_pred": "sofa", "response_gt": ["couch"], "type": "refer"},
            ],
        }
        out = score_results(results)
        assert out["EM-R_counting"] == 1.0       # "3"→"three" via clean_answer
        assert out["EM-R_existence"] == 0.0
        assert out["EM-R_attribute_description"] == 1.0  # containment
        assert out["EM-R_navigation"] == 1.0
        # spatial_refer merges spatial relationship (1) + refer (0) = 0.5
        assert out["EM-R_spatial_refer"] == 0.5
        # overall weighted: 4/6 correct
        np.testing.assert_allclose(out["EM-R_overall"], 4 / 6)
        # strict EM differs where only containment matched
        assert out["EM_attribute_description"] == 0.0

    def test_cli_roundtrip(self, tmp_path):
        import json

        from msr3d_tpu.evaluator.offline_msqa import evaluate_results_files

        p = tmp_path / "results.json"
        json.dump(
            [{"response_pred": "two", "response_gt": ["2"], "type": "counting"}],
            open(p, "w"),
        )
        out = evaluate_results_files({"scannet": p})
        assert out["EM-R_overall"] == 1.0


class TestGPTBaseline:
    def test_prompt_and_cache_flow(self, tmp_path):
        from msr3d_tpu.tools.gpt_baseline import run_baseline

        annotations = [
            {"scan_id": "s1", "question": "What color is the chair?",
             "answers": ["red"], "location": [1.0, 2.0, 0.0],
             "orientation": [1.0, 0.0, 0.0], "situation": "You face a chair.",
             "type": "attribute-color", "index": 0},
        ]
        scene_infos = {"s1": {"3": {"inst_name": "chair", "center": [1, 2, 0], "size": [0.5, 0.5, 1.0]}}}
        attr_infos = {"s1": {"3": {"color": "red", "material": "wood"}}}

        calls = []

        def fake_client(prompt):
            calls.append(prompt)
            assert "chair" in prompt and "USER: What color is the chair?" in prompt
            assert "angle 0.0" in prompt
            return "Answer: red"

        results = run_baseline(annotations, scene_infos, attr_infos, fake_client,
                               cache_dir=tmp_path / "cache")
        assert results[0]["response_pred"] == "red"
        assert len(calls) == 1
        # second run hits the disk cache — no new client calls
        run_baseline(annotations, scene_infos, attr_infos, fake_client,
                     cache_dir=tmp_path / "cache")
        assert len(calls) == 1

        # results feed the offline scorer
        from msr3d_tpu.evaluator.offline_msqa import score_results
        out = score_results({"scannet": results})
        assert out["EM-R_overall"] == 1.0

    def test_gpt_judge_scorer_plumbing(self):
        """make_gpt_scorer mirrors the reference judge protocol
        (evaluate_msqa.py:44-57): question extracted from the USER:/
        ASSISTANT: instruction, Question/Answer/Ground Truth user
        message appended to the prompt messages, first integer of the
        reply parsed, (score−1)·25 rescale applied by score_results."""
        from msr3d_tpu.evaluator.offline_msqa import (
            extract_number,
            extract_question,
            make_gpt_scorer,
            score_results,
        )

        assert extract_question("xx USER: How many chairs? ASSISTANT: 3") == (
            "How many chairs?"
        )
        assert extract_question("no markers") is None
        assert extract_number("I'd rate this 4 out of 5") == 4
        assert extract_number("no digits") is None

        seen = []

        def chat_fn(messages):
            seen.append(messages)
            assert messages[0]["role"] == "system"
            assert messages[-1]["content"] == (
                "Question: How many chairs?\nAnswer: three\nGround Truth: 3"
            )
            return "Score: 5"

        scorer = make_gpt_scorer(
            chat_fn, [{"role": "system", "content": "You are a judge."}]
        )
        raw = scorer("USER: How many chairs? ASSISTANT:", "three", "3")
        assert raw == 5.0 and len(seen) == 1

        out = score_results(
            {"scannet": [{
                "response_pred": "three", "response_gt": ["3"],
                "type": "counting",
                "instruction": "USER: How many chairs? ASSISTANT:",
            }]},
            gpt_scorer=scorer,
        )
        assert out["GPT-Score_overall"] == (5 - 1) * 25


class TestGenerationEval:
    def test_sentence_sim_target(self, tmp_path):
        from msr3d_tpu.evaluator.msqa_eval import GenerationEvalFull
        from msr3d_tpu.registry import EVALUATOR_REGISTRY

        assert EVALUATOR_REGISTRY.get("GenerationEval") is GenerationEvalFull
        ev = GenerationEvalFull(None, task_name="gen", save_dir=tmp_path)
        ev.update(
            {
                "output_text": ["a red chair", "two tables"],
                "text_output": ["a red chair", "a blue window"],
            }
        )
        is_best, rec = ev.record("val")
        # identical sentence scores 1.0; disjoint ~0 -> mean in (0.4, 0.75)
        assert rec["target_metric"] == rec["sentence_sim"]
        assert 0.4 < rec["sentence_sim"] < 0.75
        assert "cider" in rec and "rouge" in rec

    def test_hashing_encoder_properties(self):
        from msr3d_tpu.evaluator.sentence_sim import (
            HashingSentenceEncoder,
            sentence_cos_sim,
        )

        enc = HashingSentenceEncoder()
        sims = sentence_cos_sim(
            enc,
            ["the chair is red", "nothing here", "table by window"],
            ["the chair is red", "completely disjoint words", "a table near the window"],
        )
        np.testing.assert_allclose(sims[0], 1.0, atol=1e-6)
        assert sims[1] < 0.1
        assert 0.2 < sims[2] < 0.9
