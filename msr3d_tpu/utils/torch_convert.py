"""torch state-dict → flax param-tree conversion.

Used to (a) import the reference's pretrained weights (PointNet++
``pointnetpp.pt``, scene-encoder ``best.pth``, HF Vicuna, PEFT LoRA) and
(b) drive layer-level parity tests against reference torch modules.

Conventions:
  torch Linear  weight (out,in)        → flax Dense kernel (in,out) = W.T
  torch Conv2d 1×1 weight (out,in,1,1) → flax Dense kernel (in,out)
  torch LayerNorm/BatchNorm weight/bias → flax scale/bias (+ BN running stats
  into the ``batch_stats`` collection: mean/var)
  torch nn.MultiheadAttention packed in_proj_weight (3d,d) → split q/k/v
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def t2n(t) -> np.ndarray:
    """torch tensor → numpy (accepts numpy passthrough)."""
    if isinstance(t, np.ndarray):
        return t
    return t.detach().cpu().float().numpy()


def linear(sd: Dict[str, Any], name: str) -> Dict[str, np.ndarray]:
    out = {"kernel": t2n(sd[f"{name}.weight"]).T}
    if f"{name}.bias" in sd:
        out["bias"] = t2n(sd[f"{name}.bias"])
    return out


def conv1x1(sd: Dict[str, Any], name: str) -> Dict[str, np.ndarray]:
    w = t2n(sd[f"{name}.weight"])  # (out, in, 1, 1)
    out = {"kernel": w[:, :, 0, 0].T}
    if f"{name}.bias" in sd:
        out["bias"] = t2n(sd[f"{name}.bias"])
    return out


def layernorm(sd: Dict[str, Any], name: str) -> Dict[str, np.ndarray]:
    return {"scale": t2n(sd[f"{name}.weight"]), "bias": t2n(sd[f"{name}.bias"])}


def batchnorm(sd: Dict[str, Any], name: str):
    params = {"scale": t2n(sd[f"{name}.weight"]), "bias": t2n(sd[f"{name}.bias"])}
    stats = {"mean": t2n(sd[f"{name}.running_mean"]), "var": t2n(sd[f"{name}.running_var"])}
    return params, stats


def embedding(sd: Dict[str, Any], name: str) -> Dict[str, np.ndarray]:
    return {"embedding": t2n(sd[f"{name}.weight"])}


def torch_mha(sd: Dict[str, Any], name: str) -> Dict[str, Dict[str, np.ndarray]]:
    """torch nn.MultiheadAttention → our MultiHeadAttention params."""
    if f"{name}.in_proj_weight" in sd:
        w = t2n(sd[f"{name}.in_proj_weight"])  # (3d, d)
        b = t2n(sd[f"{name}.in_proj_bias"])
        d = w.shape[1]
        wq, wk, wv = w[:d], w[d : 2 * d], w[2 * d :]
        bq, bk, bv = b[:d], b[d : 2 * d], b[2 * d :]
    else:
        wq = t2n(sd[f"{name}.q_proj_weight"])
        wk = t2n(sd[f"{name}.k_proj_weight"])
        wv = t2n(sd[f"{name}.v_proj_weight"])
        b = t2n(sd[f"{name}.in_proj_bias"])
        d = wq.shape[0]
        bq, bk, bv = b[:d], b[d : 2 * d], b[2 * d :]
    return {
        "q_proj": {"kernel": wq.T, "bias": bq},
        "k_proj": {"kernel": wk.T, "bias": bk},
        "v_proj": {"kernel": wv.T, "bias": bv},
        "out_proj": linear(sd, f"{name}.out_proj"),
    }


def spatial_attention(sd: Dict[str, Any], prefix: str = "") -> Dict[str, Any]:
    """Reference MultiHeadAttentionSpatial → our params."""
    p = {
        "w_qs": linear(sd, f"{prefix}w_qs"),
        "w_ks": linear(sd, f"{prefix}w_ks"),
        "w_vs": linear(sd, f"{prefix}w_vs"),
        "fc": linear(sd, f"{prefix}fc"),
        "layer_norm": layernorm(sd, f"{prefix}layer_norm"),
    }
    if f"{prefix}lang_cond_fc.weight" in sd:
        p["lang_cond_fc"] = linear(sd, f"{prefix}lang_cond_fc")
    if f"{prefix}pairwise_loc_fc.weight" in sd:
        p["pairwise_loc_fc"] = linear(sd, f"{prefix}pairwise_loc_fc")
    return p


def spatial_encoder_layer(sd: Dict[str, Any], prefix: str = "") -> Dict[str, Any]:
    """Reference TransformerSpatialEncoderLayer → our params."""
    return {
        "self_attn": spatial_attention(sd, f"{prefix}self_attn."),
        "ffn": {
            "linear1": linear(sd, f"{prefix}linear1"),
            "linear2": linear(sd, f"{prefix}linear2"),
        },
        "norm1": layernorm(sd, f"{prefix}norm1"),
        "norm2": layernorm(sd, f"{prefix}norm2"),
    }


def cross_attention_layer(sd: Dict[str, Any], prefix: str = "") -> Dict[str, Any]:
    return {
        "multihead_attn": torch_mha(sd, f"{prefix}multihead_attn"),
        "ffn": {
            "linear1": linear(sd, f"{prefix}linear1"),
            "linear2": linear(sd, f"{prefix}linear2"),
        },
        "norm1": layernorm(sd, f"{prefix}norm1"),
        "norm3": layernorm(sd, f"{prefix}norm3"),
    }


def shared_mlp(sd: Dict[str, Any], prefix: str, n_layers: int):
    """Reference SharedMLP (Conv2d+BN2d stack, pytorch_utils.py:11-36).

    Torch naming: ``{prefix}layer{i}.conv/bn``; returns (params, batch_stats).
    """
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    for i in range(n_layers):
        params[f"dense_{i}"] = conv1x1(sd, f"{prefix}layer{i}.conv")
        bn_p, bn_s = batchnorm(sd, f"{prefix}layer{i}.bn.bn")
        params[f"bn_{i}"] = bn_p
        stats[f"bn_{i}"] = bn_s
    return params, stats


def pointnetpp(sd: Dict[str, Any], sa_mlps, prefix: str = "") -> Dict[str, Any]:
    """Reference PointNetPP (modules/layers/pointnet.py:22-63) → our params.

    Torch naming: ``{prefix}encoder.{i}.mlps.0.layer{j}...`` + ``{prefix}fc``.
    Returns {"params": ..., "batch_stats": ...}.
    """
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    for i, mlp in enumerate(sa_mlps):
        n_layers = len(mlp) - 1  # hidden widths
        p, s = shared_mlp(sd, f"{prefix}encoder.{i}.mlps.0.", n_layers)
        params[f"sa_{i}"] = {"mlp": p}
        stats[f"sa_{i}"] = {"mlp": s}
    params["fc"] = linear(sd, f"{prefix}fc")
    return {"params": params, "batch_stats": stats}


def pcd_obj_encoder(sd: Dict[str, Any], sa_mlps, prefix: str = "") -> Dict[str, Any]:
    """Reference PcdObjEncoder → our params (+ sem-cls head).

    Torch head naming (get_mlp_head): ``obj3d_clf_pre_head.{0,2,4}``
    = Linear, LayerNorm, Linear.
    """
    inner = pointnetpp(sd, sa_mlps, prefix=f"{prefix}pcd_net.")
    params: Dict[str, Any] = {"pcd_net": inner["params"]}
    stats: Dict[str, Any] = {"pcd_net": inner["batch_stats"]}
    head_prefix = f"{prefix}obj3d_clf_pre_head"
    if f"{head_prefix}.0.weight" in sd:
        params["sem_head"] = {
            "fc1": linear(sd, f"{head_prefix}.0"),
            "norm": layernorm(sd, f"{head_prefix}.2"),
            "fc2": linear(sd, f"{head_prefix}.4"),
        }
    return {"params": params, "batch_stats": stats}


def to_jax_tree(tree):
    """numpy tree → jax arrays (lazy import to keep this torch-side-safe)."""
    import jax.numpy as jnp

    import jax

    return jax.tree_util.tree_map(jnp.asarray, tree)
