"""Registry-diff test (VERDICT r3 #4): every `@*_REGISTRY.register()`-
decorated class/function name in the reference tree must resolve in the
matching msr3d_tpu registry, so registry parity can never silently drift.
"""

from __future__ import annotations

import re
from pathlib import Path

import pytest

REFERENCE = Path("/root/reference")

# reference registry variable -> msr3d_tpu registry object (same names,
# msr3d_tpu/registry.py:62-71)
_REGISTRY_NAMES = [
    "VISION_REGISTRY",
    "LANGUAGE_REGISTRY",
    "GROUNDING_REGISTRY",
    "HEADS_REGISTRY",
    "MODEL_REGISTRY",
    "DATASET_REGISTRY",
    "DATASETWRAPPER_REGISTRY",
    "EVALUATOR_REGISTRY",
    "TRAINER_REGISTRY",
    "LOSS_REGISTRY",
]

_DECORATED = re.compile(
    r"@(\w+_REGISTRY)\.register\(\)\s*\r?\n\s*(?:class|def)\s+(\w+)"
)


def collect_reference_registrations():
    """(registry_var, name, file) triples from the reference tree."""
    found = []
    for path in sorted(REFERENCE.rglob("*.py")):
        try:
            text = path.read_text(encoding="utf-8", errors="replace")
        except OSError:  # pragma: no cover
            continue
        for m in _DECORATED.finditer(text):
            found.append((m.group(1), m.group(2), str(path.relative_to(REFERENCE))))
    return found


@pytest.fixture(scope="module")
def repo_registries():
    import msr3d_tpu.registry as reg

    # trigger all registration side effects
    from msr3d_tpu.data.build import _register_optional_datasets
    import msr3d_tpu.data.datasets.dataset_wrapper  # noqa: F401
    import msr3d_tpu.evaluator.capeval  # noqa: F401
    import msr3d_tpu.evaluator.msqa_eval  # noqa: F401
    import msr3d_tpu.evaluator.one_step_eval  # noqa: F401
    import msr3d_tpu.evaluator.sqa3d_eval  # noqa: F401
    import msr3d_tpu.models.blip2  # noqa: F401
    import msr3d_tpu.models.build  # noqa: F401
    import msr3d_tpu.nn.build  # noqa: F401
    import msr3d_tpu.nn.grounding  # noqa: F401
    import msr3d_tpu.nn.pcd_tokenize  # noqa: F401
    import msr3d_tpu.nn.srt  # noqa: F401
    import msr3d_tpu.nn.swin3d  # noqa: F401
    import msr3d_tpu.optim.losses  # noqa: F401
    import msr3d_tpu.trainer.leo_trainer  # noqa: F401

    _register_optional_datasets()
    return {name: getattr(reg, name) for name in _REGISTRY_NAMES}


pytestmark = pytest.mark.skipif(
    not REFERENCE.exists(),
    reason="reference tree not mounted (these are parity tests against "
    "/root/reference; absence is an environment gap, not a regression)",
)


def test_reference_tree_scanned():
    regs = collect_reference_registrations()
    # the reference has 50 decorated registrations (r3 census); allow the
    # scan to find at least that many so a silently-broken regex fails loud
    assert len(regs) >= 50, len(regs)


def test_every_reference_registration_resolves(repo_registries):
    missing = []
    for registry_var, name, path in collect_reference_registrations():
        registry = repo_registries.get(registry_var)
        assert registry is not None, registry_var
        if name not in registry:
            missing.append(f"{registry_var}:{name} ({path})")
    assert not missing, "unported reference registrations:\n" + "\n".join(missing)


def test_round3_gap_classes_present(repo_registries):
    """The five classes VERDICT r3 flagged as absent, pinned individually."""
    assert "SRTEncoder" in repo_registries["VISION_REGISTRY"]
    assert "NMRMVRecon" in repo_registries["DATASET_REGISTRY"]
    assert "ScanNetSQA3DInstruction" in repo_registries["DATASET_REGISTRY"]
    assert "UnifiedSpatialCrossEncoderV2" in repo_registries["GROUNDING_REGISTRY"]
    assert "DefaultDataset" in repo_registries["DATASET_REGISTRY"]
