"""SQA3D evaluators (reference evaluator/sqa3d_eval.py:155-240)."""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict

from msr3d_tpu.evaluator.build import BaseEvaluator
from msr3d_tpu.evaluator.text_utils import clean_answer
from msr3d_tpu.registry import EVALUATOR_REGISTRY

NUM_SQA_TYPES = 6  # what/is/how/can/which/others (data/data_utils.py:367-380)


@EVALUATOR_REGISTRY.register(name="SQA3DInstructionEval")
class SQA3DInstructionEval(BaseEvaluator):
    """Generation-mode SQA3D eval: strict EM over the per-question answer
    pool + per-question-type accuracy."""

    def __init__(self, cfg=None, task_name: str = "", save_dir=".", qa_pool=None):
        # qa_pool: {question_id: {"answers": [str, ...]}} — loaded from the
        # balanced SQA3D annotation jsons when available
        self.qa_pool = qa_pool or {}
        if not self.qa_pool and cfg is not None:
            base = cfg.get("data", {}).get("scan_family_base", "")
            if base:
                self._load_qa_pool(base)
        super().__init__(cfg, task_name, save_dir)

    def _load_qa_pool(self, base_dir: str) -> None:
        anno = Path(base_dir) / "annotations" / "sqa_task" / "balanced"
        for split in ("val", "test"):
            qf = anno / f"v1_balanced_questions_{split}_scannetv2.json"
            af = anno / f"v1_balanced_sqa_annotations_{split}_scannetv2.json"
            if not (qf.exists() and af.exists()):
                continue
            with open(qf, encoding="utf-8") as f:
                for q in json.load(f)["questions"]:
                    self.qa_pool.setdefault(q["question_id"], {})["question"] = q[
                        "question"
                    ]
            with open(af, encoding="utf-8") as f:
                for a in json.load(f)["annotations"]:
                    self.qa_pool.setdefault(a["question_id"], {})["answers"] = [
                        t["answer"]
                        for t in a["answers"]
                        if t.get("answer_confidence") == "yes"
                    ]

    def reset(self) -> None:
        self.eval_dict: Dict[str, list] = {"target_metric": [], "ans1_acc_llm": []}
        for t in range(NUM_SQA_TYPES):
            self.eval_dict[f"type{t}_acc_llm"] = []
        self.total_count = 0
        self.eval_results = []
        self._type_correct = [0] * NUM_SQA_TYPES
        self._type_count = [0] * NUM_SQA_TYPES

    @staticmethod
    def answer_match(pred: str, gts) -> bool:
        # strict EM for SQA3D (containment variants commented out in the
        # reference, sqa3d_eval.py:194-202)
        return any(pred == gt for gt in gts)

    def update(self, data_dict: Dict[str, Any]) -> None:
        preds = data_dict["output_text"]
        n = len(preds)
        correct = 0
        for i in range(n):
            pred = clean_answer(preds[i])
            q_id = int(_item(data_dict["data_idx"][i]))
            gts = [clean_answer(a) for a in self.qa_pool.get(q_id, {}).get("answers", [])]
            sqa_type = int(_item(data_dict["sqa_type"][i]))
            hit = self.answer_match(pred, gts)
            if hit:
                correct += 1
                self._type_correct[sqa_type] += 1
            self._type_count[sqa_type] += 1
            if self.save:
                self.eval_results.append(
                    {"question_id": q_id, "pred": preds[i], "gt": gts, "correct": hit,
                     "sqa_type": sqa_type}
                )
        self.total_count += n
        acc = correct / n if n else 0.0
        self.eval_dict["ans1_acc_llm"].append(acc * n)
        self.eval_dict["target_metric"].append(acc * n)

    def record(self, split: str = "val"):
        results = {
            "ans1_acc_llm": sum(self.eval_dict["ans1_acc_llm"]) / self.total_count
            if self.total_count
            else 0.0,
        }
        results["target_metric"] = results["ans1_acc_llm"]
        for t in range(NUM_SQA_TYPES):
            results[f"type{t}_acc_llm"] = (
                self._type_correct[t] / self._type_count[t]
                if self._type_count[t]
                else 0.0
            )
        is_best = results["target_metric"] > self.best_result
        if is_best:
            self.best_result = results["target_metric"]
        if self.save and (is_best or split == "test"):
            self.save_dir.mkdir(parents=True, exist_ok=True)
            with open(self.save_dir / "results.json", "w") as f:
                json.dump(self.eval_results, f, default=str)
        return is_best, results


# also registered under the retrieval-mode name for config compatibility
EVALUATOR_REGISTRY.register(SQA3DInstructionEval, name="SQA3DEval")


def _item(x):
    return x.item() if hasattr(x, "item") else x
