"""msr3d_tpu: TPU-native (JAX/XLA/Pallas) framework with MSR3D's capabilities.

Rebuilt from scratch against the structural analysis in SURVEY.md; the
reference's registries and YAML configs are preserved at the boundary while
the compute path is pure JAX (pjit/shard_map over a named device mesh,
Pallas kernels for point-cloud ops, XLA-compiled LLM prefill/decode).
"""

__version__ = "0.1.0"

from msr3d_tpu.config import Config, cfg2dict, config_from_dict, load_config
from msr3d_tpu.registry import (
    DATASET_REGISTRY,
    DATASETWRAPPER_REGISTRY,
    EVALUATOR_REGISTRY,
    MODEL_REGISTRY,
    TRAINER_REGISTRY,
    VISION_REGISTRY,
    build_module,
)
