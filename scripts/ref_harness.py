"""Load the reference MSR3D (torch) on CPU for end-to-end parity testing.

The reference stack needs CUDA pointnet2 kernels plus several packages
absent from this image (fvcore, timm, easydict, clip, hydra, open3d, ...).
This harness imports the REAL reference sources from /root/reference with
minimal stand-ins:

  - ``pointnet2._ext``: torch-CPU reimplementation of the 6 CUDA ops with
    the exact kernel semantics (FPS pad-skip ``‖p‖²≤1e-3``
    sampling_gpu.cu:100-101; ball-query first-k + slot-0 backfill
    ball_query_gpu.cu:33-41) so the real PointnetSAModule/PcdObjEncoder
    code runs unmodified.
  - missing third-party packages: inert module stubs (their symbols are
    never exercised on the parity path — images masked off, CLIP fusion
    off, DiT mode unused).
  - ``LlamaTokenizer``: the slow sentencepiece tokenizer is replaced by a
    PreTrainedTokenizerFast built from a character-level vocab that BOTH
    frameworks load, so tokenization is identical by construction.

Everything else — OSE3DSituation, spatial transformer, MSR3D forward /
generate, HF LlamaForCausalLM — is the reference's own code.
"""

from __future__ import annotations

import importlib.machinery
import importlib.util
import sys
import types
from pathlib import Path

import numpy as np

REF = Path("/root/reference")


# ---------------------------------------------------------------------------
# torch-CPU pointnet2._ext with CUDA-kernel semantics
# ---------------------------------------------------------------------------


def _make_ext_module():
    import torch

    ext = types.ModuleType("pointnet2._ext")

    def furthest_point_sampling(xyz, npoint):
        # sampling_gpu.cu:69-229: seed index 0; at each round pick the point
        # with max running min-distance; points with ‖p‖² ≤ 1e-3 are treated
        # as padding (their distance never updates temp)
        b, n, _ = xyz.shape
        idxs = torch.zeros(b, npoint, dtype=torch.int32)
        temp = torch.full((b, n), 1e10)
        mag = (xyz ** 2).sum(-1)  # (B, N)
        valid = mag > 1e-3
        last = torch.zeros(b, dtype=torch.long)
        for j in range(1, npoint + 1):
            cur = xyz[torch.arange(b), last]  # (B, 3)
            d = ((xyz - cur[:, None]) ** 2).sum(-1)
            temp = torch.where(valid, torch.minimum(temp, d), temp)
            if j == npoint:
                break
            # padding points never participate in the argmax either — the
            # kernel's k-loop `continue`s them before the best-reduction
            # (sampling_gpu.cu:100-101), so they can never be selected
            cand = torch.where(valid, temp, torch.full_like(temp, -1e30))
            nxt = cand.argmax(dim=1)
            idxs[:, j] = nxt.int()
            last = nxt
        return idxs

    def gather_points(points, idx):
        # (B, C, N), (B, M) -> (B, C, M)
        b, c, n = points.shape
        m = idx.shape[1]
        gather_idx = idx.long()[:, None, :].expand(b, c, m)
        return torch.gather(points, 2, gather_idx).contiguous()

    def ball_query(new_xyz, xyz, radius, nsample):
        # binding order per pointnet2_utils.py:279
        # ball_query_gpu.cu:9-54: first nsample indices with d² < r²; the
        # FIRST in-radius index backfills all remaining slots
        b, m, _ = new_xyz.shape
        n = xyz.shape[1]
        d2 = ((new_xyz[:, :, None, :] - xyz[:, None, :, :]) ** 2).sum(-1)
        inside = d2 < radius * radius  # (B, M, N)
        idx = torch.zeros(b, m, nsample, dtype=torch.int32)
        for bi in range(b):
            for mi in range(m):
                hits = torch.nonzero(inside[bi, mi], as_tuple=False).flatten()
                if len(hits) == 0:
                    continue
                k = min(nsample, len(hits))
                idx[bi, mi, :] = hits[0].int()  # slot-0 backfill
                idx[bi, mi, :k] = hits[:k].int()
        return idx

    def group_points(points, idx):
        # (B, C, N), (B, M, S) -> (B, C, M, S)
        b, c, n = points.shape
        m, s = idx.shape[1], idx.shape[2]
        flat = idx.long().reshape(b, 1, m * s).expand(b, c, m * s)
        return torch.gather(points, 2, flat).reshape(b, c, m, s).contiguous()

    def group_points_grad(grad_out, idx, n):
        b, c, m, s = grad_out.shape
        grad = torch.zeros(b, c, n, dtype=grad_out.dtype)
        flat = idx.long().reshape(b, 1, m * s).expand(b, c, m * s)
        grad.scatter_add_(2, flat, grad_out.reshape(b, c, m * s))
        return grad

    def gather_points_grad(grad_out, idx, n):
        b, c, m = grad_out.shape
        grad = torch.zeros(b, c, n, dtype=grad_out.dtype)
        grad.scatter_add_(2, idx.long()[:, None, :].expand(b, c, m), grad_out)
        return grad

    def three_nn(unknown, known):
        d2 = ((unknown[:, :, None, :] - known[:, None, :, :]) ** 2).sum(-1)
        dist2, idx = torch.topk(d2, 3, dim=2, largest=False)
        return torch.sqrt(dist2), idx.int()

    def three_interpolate(points, idx, weight):
        b, c, m = points.shape
        n = idx.shape[1]
        gathered = torch.gather(
            points[:, :, :, None].expand(b, c, m, 3).reshape(b, c, -1), 2,
            (idx.long() * 3 + torch.arange(3))[:, None].expand(b, c, n, 3).reshape(b, c, -1),
        )
        # simpler path: gather per-neighbor then weight
        out = torch.zeros(b, c, n)
        for k in range(3):
            sel = torch.gather(points, 2, idx[:, :, k].long()[:, None, :].expand(b, c, n))
            out += sel * weight[:, None, :, k]
        return out

    def three_interpolate_grad(grad_out, idx, weight, m):
        b, c, n = grad_out.shape
        grad = torch.zeros(b, c, m, dtype=grad_out.dtype)
        for k in range(3):
            grad.scatter_add_(
                2, idx[:, :, k].long()[:, None, :].expand(b, c, n),
                grad_out * weight[:, None, :, k],
            )
        return grad

    ext.furthest_point_sampling = furthest_point_sampling
    ext.gather_points = gather_points
    ext.gather_points_grad = gather_points_grad
    ext.ball_query = ball_query
    ext.group_points = group_points
    ext.group_points_grad = group_points_grad
    ext.three_nn = three_nn
    ext.three_interpolate = three_interpolate
    ext.three_interpolate_grad = three_interpolate_grad
    return ext


# ---------------------------------------------------------------------------
# module stubs
# ---------------------------------------------------------------------------


def _stub(name, **attrs):
    mod = types.ModuleType(name)
    mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def _fake_pkg(name, path):
    pkg = types.ModuleType(name)
    pkg.__path__ = [str(path)]
    pkg.__spec__ = importlib.machinery.ModuleSpec(name, None, is_package=True)
    sys.modules[name] = pkg
    return pkg


class _Registry:
    """Minimal fvcore.common.registry.Registry."""

    def __init__(self, name):
        self._name = name
        self._map = {}

    def register(self, obj=None, name=None):
        if obj is None:
            def deco(o):
                self._map[name or o.__name__] = o
                return o
            return deco
        self._map[name or obj.__name__] = obj
        return obj

    def get(self, name):
        return self._map[name]


class EasyDict(dict):
    """Attribute-access dict (the easydict package, reimplemented)."""

    def __init__(self, d=None, **kw):
        super().__init__()
        d = dict(d or {}, **kw)
        for k, v in d.items():
            self[k] = v

    def __setitem__(self, k, v):
        if isinstance(v, dict) and not isinstance(v, EasyDict):
            v = EasyDict(v)
        elif isinstance(v, (list, tuple)):
            v = type(v)(EasyDict(x) if isinstance(x, dict) else x for x in v)
        super().__setitem__(k, v)
        super().__setattr__(k, v)

    __setattr__ = __setitem__

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e


def _cfg2dict(cfg):
    if isinstance(cfg, dict):
        return {k: _cfg2dict(v) for k, v in cfg.items()}
    if isinstance(cfg, (list, tuple)):
        return [_cfg2dict(v) for v in cfg]
    return cfg


def install_stubs():
    """Populate sys.modules so the reference sources import cleanly."""
    import torch.nn as nn

    if "modules" in sys.modules and hasattr(sys.modules["modules"], "__ref_harness__"):
        return  # already installed

    # inert third-party stubs
    for name in ("open3d", "cv2", "quaternion", "trimesh", "hydra", "IPython"):
        if name not in sys.modules:
            _stub(name, embed=lambda *a, **k: None)
    _stub("easydict", EasyDict=EasyDict)

    # timm: only DiT.py's vision_transformer symbols are imported
    timm = _stub("timm")
    _stub("timm.models")
    _stub(
        "timm.models.vision_transformer",
        PatchEmbed=object, Attention=nn.Module, Mlp=_TimmMlp(),
    )
    timm.models = sys.modules["timm.models"]

    # clip: loaded but never run (clip_fusion off)
    class _NullCLIP(nn.Module):
        def forward(self, *a, **k):
            raise RuntimeError("CLIP stub should not be executed")

    _stub("clip", load=lambda *a, **k: (_NullCLIP(), None))

    # fvcore registry
    _stub("fvcore")
    _stub("fvcore.common")
    _stub("fvcore.common.registry", Registry=_Registry)

    # reference top-level packages WITHOUT running their __init__ imports
    for pkg in ("modules", "model", "common", "optim", "evaluator"):
        _fake_pkg(pkg, REF / pkg)
    _fake_pkg("model.msr3d", REF / "model" / "msr3d")
    _fake_pkg("modules.layers", REF / "modules" / "layers")
    _fake_pkg("modules.vision", REF / "modules" / "vision")
    _fake_pkg("modules.third_party", REF / "modules" / "third_party")
    _fake_pkg(
        "modules.third_party.pointnet2", REF / "modules" / "third_party" / "pointnet2"
    )
    _fake_pkg("data", REF / "data")
    _fake_pkg("optim.loss", REF / "optim" / "loss")
    sys.modules["modules"].__ref_harness__ = True

    # common.type_utils without omegaconf
    _stub("common.type_utils", cfg2dict=_cfg2dict)

    # CUDA extension → torch-CPU implementation
    pn2 = _fake_pkg("pointnet2", REF / "modules" / "third_party" / "pointnet2")
    ext = _make_ext_module()
    sys.modules["pointnet2._ext"] = ext
    pn2._ext = ext

    # transformers.modeling_utils.Conv1D moved in newer versions
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

    if str(REF) not in sys.path:
        sys.path.insert(0, str(REF))


def _TimmMlp():
    import torch.nn as nn

    class Mlp(nn.Module):
        def __init__(self, in_features, hidden_features, act_layer=None, drop=0.0):
            super().__init__()
            self.fc1 = nn.Linear(in_features, hidden_features)
            self.act = act_layer() if act_layer else nn.GELU()
            self.fc2 = nn.Linear(hidden_features, in_features)

        def forward(self, x):
            return self.fc2(self.act(self.fc1(x)))

    return Mlp


# ---------------------------------------------------------------------------
# shared character-level tokenizer
# ---------------------------------------------------------------------------


def build_char_tokenizer(out_dir: Path):
    """Character-level PreTrainedTokenizerFast with Llama special-token
    layout, saved so both frameworks load the identical vocabulary."""
    from tokenizers import Tokenizer, pre_tokenizers, processors
    from tokenizers.models import WordLevel
    from transformers import PreTrainedTokenizerFast

    chars = [chr(c) for c in range(32, 127)] + ["\n"]
    vocab = {"<unk>": 0, "<s>": 1, "</s>": 2}
    for ch in chars:
        vocab[ch] = len(vocab)
    tk = Tokenizer(WordLevel(vocab, unk_token="<unk>"))
    tk.pre_tokenizer = pre_tokenizers.Split("", "isolated")
    tk.post_processor = processors.TemplateProcessing(
        single="<s> $A", pair="<s> $A $B", special_tokens=[("<s>", 1)]
    )
    fast = PreTrainedTokenizerFast(
        tokenizer_object=tk,
        bos_token="<s>", eos_token="</s>", unk_token="<unk>",
    )
    out_dir.mkdir(parents=True, exist_ok=True)
    fast.save_pretrained(str(out_dir))
    return fast


class FakeLlamaTokenizer:
    """Stands in for ``LlamaTokenizer.from_pretrained`` (the slow
    sentencepiece tokenizer is unavailable) — returns the shared fast
    tokenizer instead."""

    @staticmethod
    def from_pretrained(path, use_fast=False, truncation_side="right", **kw):
        from transformers import AutoTokenizer

        tok = AutoTokenizer.from_pretrained(path, truncation_side=truncation_side)
        return tok


# ---------------------------------------------------------------------------
# reference model construction
# ---------------------------------------------------------------------------


def make_ref_cfg(llm_path: str, *, hidden_size=32, scene_token_len=5,
                 sa_cfg=None, num_layers=1, num_heads=4, dim_ff=64,
                 situation_type="as_transform_for_objects"):
    sa_cfg = sa_cfg or dict(
        sa_n_points=[8, 4, None],
        sa_n_samples=[8, 8, None],
        sa_radii=[0.4, 0.8, None],
        sa_mlps=[[3, 8, 8, 16], [16, 16, 16, 32], [32, 32, 32, 64]],
    )
    return EasyDict(
        {
            "model": {
                "name": "MSR3D",
                "prompter": {
                    "model": {
                        "name": "OSE3DSituation",
                        "vision_backbone_name": "gtpcd",
                        "hidden_size": hidden_size,
                        "use_spatial_attn": True,
                        "use_anchor": True,
                        "use_orientation": True,
                        "fourier_size": 84,
                        "loc_fourier_dim": 63,
                        "situation_type": situation_type,
                        "scene_token_len": scene_token_len,
                        "mixup_strategy": None,
                        "vision": {
                            "name": "PcdObjEncoder",
                            "args": dict(sa_cfg, dropout=0.1, path=None, freeze=True),
                        },
                        "spatial_encoder": {
                            "dim_loc": 6,
                            "num_attention_heads": num_heads,
                            "dim_feedforward": dim_ff,
                            "dropout": 0.0,
                            "activation": "gelu",
                            "spatial_multihead": True,
                            "spatial_dim": 5,
                            "spatial_dist_norm": True,
                            "spatial_attn_fusion": "cond",
                            "num_layers": num_layers,
                            "obj_loc_encoding": "same_all",
                            "pairwise_rel_type": "center",
                        },
                        "attn_flat": {
                            "use_attn_flat": False,
                            "mcan_flat_mlp_size": 512,
                            "mcan_flat_glimpses": 1,
                            "mcan_flat_out_size": 1024,
                        },
                    },
                },
                "llm": {
                    "name": "Vicuna7B",
                    "cfg_path": llm_path,
                    "truncation_side": "right",
                    "max_context_len": 256,
                    "max_out_len": 64,
                    "prompt": "",
                    "clip_fusion": False,
                    "lora": {
                        "flag": False, "rank": 4, "alpha": 16,
                        "target_modules": ["q_proj", "v_proj"], "dropout": 0.0,
                    },
                },
                "vision_2d": {
                    "name": "Backbone2D",
                    "freeze": True,
                    "args": {"backbone_name": "stub", "flat_output": True},
                },
            },
        }
    )


def build_ref_msr3d(cfg, tokenizer_dir: str):
    """Instantiate the reference MSR3D on CPU (fp32)."""
    install_stubs()
    import torch
    import torch.nn as nn

    # real reference modules (exec'd from /root/reference)
    import modules.build as mbuild  # noqa: F401
    import modules.vision.pcd_pointnet_encoder  # noqa: F401 (registers PcdObjEncoder)
    import model.build as ref_model_build
    import model.ose3d_situation  # noqa: F401 (registers OSE3DSituation)
    import model.msr3d.msr3d as ref_msr3d_mod

    # stub image tower registered under the config's name
    class Backbone2D(nn.Module):
        def __init__(self, cfg, backbone_name="stub", flat_output=True, **kw):
            super().__init__()
            self.out_channels = 8
            self.proj = nn.Linear(3, self.out_channels)

        def forward(self, x):
            # (B, 3, W, H) or (N, W, H, 3) → (B, out_channels)
            flat = x.reshape(x.shape[0], -1, 3).mean(1)
            return self.proj(flat)

    if "Backbone2D" not in mbuild.VISION_REGISTRY._map:
        mbuild.VISION_REGISTRY.register(Backbone2D, name="Backbone2D")

    # the slow sentencepiece tokenizer → shared fast tokenizer
    ref_msr3d_mod.LlamaTokenizer = FakeLlamaTokenizer
    cfg.model.llm.cfg_path = cfg.model.llm.cfg_path  # weights dir
    # tokenizer files live beside the weights
    model = ref_msr3d_mod.MSR3D(cfg)
    model = model.float().eval()
    return model
