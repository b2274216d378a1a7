"""Every shipped config must load and resolve all its registry names —
the string→class contract the reference routes everything through
(trainer/model/dataset/wrapper/evaluator; SURVEY.md §5 'registry names
identical'). Catches config drift without building 7B models."""

import glob

import pytest

# populate registries
import msr3d_tpu.models.build  # noqa: F401
import msr3d_tpu.nn.build  # noqa: F401
import msr3d_tpu.data.datasets.msr3d  # noqa: F401
import msr3d_tpu.data.datasets.one_step_navi  # noqa: F401
import msr3d_tpu.data.datasets.sqa3d  # noqa: F401
import msr3d_tpu.data.datasets.scannet_legacy  # noqa: F401
import msr3d_tpu.trainer.leo_trainer  # noqa: F401
import msr3d_tpu.evaluator.msqa_eval  # noqa: F401
import msr3d_tpu.evaluator.one_step_eval  # noqa: F401
import msr3d_tpu.evaluator.sqa3d_eval  # noqa: F401
from msr3d_tpu.config import cfg2dict, load_config
from msr3d_tpu.registry import (
    DATASET_REGISTRY,
    EVALUATOR_REGISTRY,
    MODEL_REGISTRY,
    TRAINER_REGISTRY,
    VISION_REGISTRY,
)

CONFIGS = sorted(glob.glob("configs/*.yaml"))


@pytest.mark.parametrize("path", CONFIGS, ids=[c.split("/")[-1] for c in CONFIGS])
def test_config_loads_and_registry_names_resolve(path):
    cfg = load_config(path)
    d = cfg2dict(cfg)

    TRAINER_REGISTRY.get(d["trainer"])
    MODEL_REGISTRY.get(d["model"]["name"])
    prompter = d["model"].get("prompter") or {}
    prompter = prompter.get("model", prompter)  # reference nests under .model
    if prompter.get("name"):
        MODEL_REGISTRY.get(prompter["name"])
    vision = prompter.get("vision") or {}
    if vision.get("name"):
        VISION_REGISTRY.get(vision["name"])
    vision_2d = d["model"].get("vision_2d") or {}
    if vision_2d.get("name"):
        VISION_REGISTRY.get(vision_2d["name"])

    for task_name, task in (d.get("task") or {}).items():
        if not isinstance(task, dict):
            continue
        if task.get("dataset"):
            DATASET_REGISTRY.get(task["dataset"])
        if task.get("evaluator"):
            EVALUATOR_REGISTRY.get(task["evaluator"])


def test_reference_yaml_loads_unchanged():
    """The reference's own msr3d.yaml must parse through our config
    stack (BASELINE.json requirement: YAMLs run unchanged)."""
    cfg = load_config("/root/reference/configs/msr3d.yaml")
    d = cfg2dict(cfg)
    assert d["trainer"] == "LeoTrainer"
    assert d["model"]["name"] == "MSR3D"
    TRAINER_REGISTRY.get(d["trainer"])
    MODEL_REGISTRY.get(d["model"]["name"])
