"""Load individual reference torch files for parity testing (test-only).

The reference package __init__ pulls in unavailable deps (fvcore, timm),
so files are loaded path-wise with minimal dependency shims.
"""

import importlib.util
import sys
import types
from pathlib import Path

REF_ROOT = Path("/root/reference")


def _ensure_shims():
    import torch.nn.functional as F

    if "modules.utils" not in sys.modules:
        mu = types.ModuleType("modules.utils")
        mu.get_activation_fn = lambda a: getattr(F, a)
        mpkg = types.ModuleType("modules")
        mpkg.utils = mu
        sys.modules.setdefault("modules", mpkg)
        sys.modules["modules.utils"] = mu

    # Conv1D & friends moved out of transformers.modeling_utils in newer
    # versions; the reference file imports them from the old location (they
    # are only used by its vendored dead-code GPT-2).
    import transformers.modeling_utils as tmu

    if not hasattr(tmu, "Conv1D"):
        from transformers.pytorch_utils import (
            Conv1D,
            find_pruneable_heads_and_indices,
            prune_conv1d_layer,
        )

        tmu.Conv1D = Conv1D
        tmu.find_pruneable_heads_and_indices = find_pruneable_heads_and_indices
        tmu.prune_conv1d_layer = prune_conv1d_layer


def load_ref_file(rel_path: str, module_name: str):
    path = REF_ROOT / rel_path
    if not path.exists():
        return None
    _ensure_shims()
    spec = importlib.util.spec_from_file_location(module_name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod
