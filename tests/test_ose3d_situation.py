"""OSE3DSituation tests: all situation modes + full-module torch parity.

The parity test loads the reference's own ose3d_situation.py with its heavy
deps stubbed (easydict/timm/fvcore/pointnet-CUDA), replaces the point-cloud
encoder with a feature stub on BOTH sides, and compares the entire
situation-conditioned spatial encoding stack with converted weights.
"""

import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from msr3d_tpu.models.ose3d_situation import (
    OSE3DConfig,
    OSE3DSituation,
    SpatialEncoderConfig,
)
from msr3d_tpu.utils import torch_convert as tc

from tests.ref_loader import load_ref_file

TINY = OSE3DConfig(
    hidden_size=32,
    spatial_encoder=SpatialEncoderConfig(
        num_attention_heads=4, dim_feedforward=64, dropout=0.0, num_layers=2
    ),
    sa_n_points=(8, 4, None),
    sa_n_samples=(8, 8, None),
    sa_radii=(0.4, 0.8, None),
    sa_mlps=((3, 8, 8, 16), (16, 16, 16, 32), (32, 32, 32, 64)),
    obj_encoder_dtype="float32",  # bit-parity vs fp32 torch reference
)


def make_batch(rng, b=2, n=7, p=64):
    return dict(
        obj_fts=jnp.asarray((rng.normal(size=(b, n, p, 6)) * 0.3).astype(np.float32)),
        obj_masks=jnp.asarray(
            np.array([[1] * n, [1] * (n - 2) + [0, 0]], dtype=bool)
        ),
        obj_locs=jnp.asarray(rng.normal(size=(b, n, 6)).astype(np.float32)),
        anchor_locs=jnp.asarray(rng.normal(size=(b, 3)).astype(np.float32)),
        anchor_orientation=jnp.asarray(
            (lambda q: q / np.linalg.norm(q, axis=-1, keepdims=True))(
                rng.normal(size=(b, 4))
            ).astype(np.float32)
        ),
    )


@pytest.mark.parametrize(
    "situation_type",
    [
        "as_object",
        "as_object_add_loc",
        "as_embedding",
        "as_transform_for_objects",
        "as_cross_attention",
        "as_dit_attention",
    ],
)
def test_all_situation_modes_forward(rng, situation_type):
    import dataclasses

    cfg = dataclasses.replace(TINY, situation_type=situation_type)
    model = OSE3DSituation(cfg)
    batch = make_batch(rng)
    variables = model.init(jax.random.key(0), **batch)
    out = model.apply(variables, **batch)

    n_expected = 8 if situation_type in ("as_object", "as_object_add_loc") else 7
    assert out["obj_tokens"].shape == (2, n_expected, 32)
    assert out["obj_masks"].shape == (2, n_expected)
    assert not np.isnan(np.asarray(out["obj_tokens"])).any()
    # mask round-trip: padded objects stay masked-out (valid-convention)
    np.testing.assert_array_equal(
        np.asarray(out["obj_masks"][1, -2:]), [False, False]
    )
    if situation_type in ("as_object", "as_object_add_loc"):
        assert bool(out["obj_masks"][0, 0])  # anchor token always valid


def test_attn_flat_pooling(rng):
    import dataclasses

    cfg = dataclasses.replace(TINY, use_attn_flat=True, attn_flat_out_size=48)
    model = OSE3DSituation(cfg)
    batch = make_batch(rng)
    variables = model.init(jax.random.key(0), **batch)
    out = model.apply(variables, **batch)
    assert out["obj_tokens"].shape == (2, 48)
    assert "oatt" in out


# --------------------------------------------------------------------------
# Full-module torch parity
# --------------------------------------------------------------------------


def _load_ref_ose3d():
    """Load reference ose3d_situation.py with dependency stubs."""
    import torch
    import torch.nn as tnn

    # easydict
    if "easydict" not in sys.modules:
        ed = types.ModuleType("easydict")

        class EasyDict(dict):
            def __getattr__(self, k):
                try:
                    v = self[k]
                except KeyError as e:
                    raise AttributeError(k) from e
                return EasyDict(v) if isinstance(v, dict) and not isinstance(v, EasyDict) else v

            __setattr__ = dict.__setitem__

            def get(self, k, default=None):
                v = dict.get(self, k, default)
                return EasyDict(v) if isinstance(v, dict) and not isinstance(v, EasyDict) else v

        ed.EasyDict = EasyDict
        sys.modules["easydict"] = ed

    # model.build: registry decorator + BaseModel
    mb = types.ModuleType("model.build")

    class _Registry:
        def register(self):
            return lambda cls: cls

    mb.MODEL_REGISTRY = _Registry()

    class BaseModel(tnn.Module):
        def __init__(self, cfg):
            super().__init__()

    mb.BaseModel = BaseModel
    mpkg = types.ModuleType("model")
    mpkg.build = mb
    sys.modules["model"] = mpkg
    sys.modules["model.build"] = mb

    # modules.build: build_module returns a feature stub (set per-test)
    modb = types.ModuleType("modules.build")

    class _StubObjEncoder(tnn.Module):
        def __init__(self):
            super().__init__()
            self.features = None

        def forward(self, obj_fts):
            return self.features, None

    modb._stub = _StubObjEncoder

    def build_module(kind, cfg):
        return _StubObjEncoder()

    modb.build_module = build_module
    sys.modules["modules.build"] = modb

    # modules.layers.DiT: stub (we skip dit parity; timm unavailable)
    dit = types.ModuleType("modules.layers.DiT")

    class DiTBlock(tnn.Module):
        def __init__(self, hidden_size, num_heads):
            super().__init__()

    dit.DiTBlock = DiTBlock
    sys.modules["modules.layers.DiT"] = dit

    # real reference files for utils/weights/transformers
    mu = load_ref_file("modules/utils.py", "ref_modules_utils_full")
    sys.modules["modules.utils"] = mu
    sys.modules["modules"].utils = mu
    tf = load_ref_file("modules/layers/transformers.py", "ref_tf_full")
    layers_pkg = types.ModuleType("modules.layers")
    layers_pkg.transformers = tf
    sys.modules["modules.layers"] = layers_pkg
    sys.modules["modules.layers.transformers"] = tf
    mw = load_ref_file("modules/weights.py", "ref_weights")
    sys.modules["modules.weights"] = mw

    ou = types.ModuleType("optim.utils")
    ou.no_decay_param_group = lambda *a, **k: []
    opkg = types.ModuleType("optim")
    opkg.utils = ou
    sys.modules["optim"] = opkg
    sys.modules["optim.utils"] = ou

    return load_ref_file("model/ose3d_situation.py", "ref_ose3d")


def _ref_cfg(situation_type, hidden=32, layers=2):
    from easydict import EasyDict

    return EasyDict(
        {
            "model": {
                "vision_backbone_name": "gtpcd",
                "use_spatial_attn": True,
                "use_anchor": True,
                "use_orientation": True,
                "hidden_size": hidden,
                "fourier_size": 84,
                "loc_fourier_dim": 63,
                "label_size": 300,
                "situation_type": situation_type,
                "vision": {
                    "name": "PcdObjEncoder",
                    "args": {"sa_mlps": [[3, 8, 8, 16], [16, 16, 16, 32], [32, 32, 32, 64]]},
                },
                "spatial_encoder": {
                    "dim_loc": 6,
                    "num_attention_heads": 4,
                    "dim_feedforward": 64,
                    "dropout": 0.0,
                    "activation": "gelu",
                    "spatial_multihead": True,
                    "spatial_dim": 5,
                    "spatial_dist_norm": True,
                    "spatial_attn_fusion": "cond",
                    "num_layers": layers,
                    "obj_loc_encoding": "same_all",
                    "pairwise_rel_type": "center",
                },
                "attn_flat": {"use_attn_flat": False},
            }
        }
    )


def _convert_ose3d_weights(tmod, situation_type, num_layers):
    """Reference OSE3DSituation state dict → our flax params (encoder stubbed)."""
    sd = {k: v for k, v in tmod.state_dict().items()}
    params = {
        "obj_linear_projection": tc.linear(sd, "obj_linear_projection"),
        "object_type_embedding": tc.embedding(sd, "object_type_embedding"),
        "object_orientation_feat": tc.t2n(sd["object_orientation_feat"]),
        "orientation_encoder": tc.linear(sd, "orientation_encoder"),
    }
    if "anchor_feat" in sd:
        params["anchor_feat"] = tc.t2n(sd["anchor_feat"])
        params["anchor_size"] = tc.t2n(sd["anchor_size"])
    # loc layers: reference names loc_layers.{i}.{0,1}
    i = 0
    while f"loc_layers.{i}.0.weight" in sd:
        params[f"loc_layer_{i}"] = {
            "dense": tc.linear(sd, f"loc_layers.{i}.0"),
            "norm": tc.layernorm(sd, f"loc_layers.{i}.1"),
        }
        i += 1
    if "loc_embedding_encoder.0.weight" in sd:
        params["loc_embedding_encoder"] = {
            "dense": tc.linear(sd, "loc_embedding_encoder.0"),
            "norm": tc.layernorm(sd, "loc_embedding_encoder.1"),
        }
        params["size_embedding_encoder"] = {
            "dense": tc.linear(sd, "size_embedding_encoder.0"),
            "norm": tc.layernorm(sd, "size_embedding_encoder.1"),
        }
    for i in range(num_layers):
        params[f"spatial_layer_{i}"] = tc.spatial_encoder_layer(
            sd, f"spatial_encoder.{i}."
        )
        if situation_type == "as_cross_attention":
            params[f"situation_condition_{i}"] = tc.cross_attention_layer(
                sd, f"situation_condition_layer.{i}."
            )
    return params


@pytest.mark.parity
@pytest.mark.parametrize(
    "situation_type",
    ["as_object", "as_object_add_loc", "as_embedding", "as_transform_for_objects",
     "as_cross_attention"],
)
def test_full_module_parity(rng, situation_type):
    import dataclasses

    import torch

    ref = _load_ref_ose3d()
    if ref is None:
        pytest.skip("reference tree not mounted")

    num_layers = 2
    tmod = ref.OSE3DSituation(_ref_cfg(situation_type, layers=num_layers)).eval()

    b, n = 2, 7
    feats = rng.normal(size=(b, n, 64)).astype(np.float32)
    tmod.obj_encoder.features = torch.from_numpy(feats)

    batch_np = dict(
        obj_fts=np.zeros((b, n, 8, 6), np.float32),  # unused (encoder stubbed)
        obj_masks=np.array([[1] * n, [1] * (n - 2) + [0, 0]], dtype=bool),
        obj_locs=rng.normal(size=(b, n, 6)).astype(np.float32),
        anchor_locs=rng.normal(size=(b, 3)).astype(np.float32),
        anchor_orientation=(lambda q: q / np.linalg.norm(q, axis=-1, keepdims=True))(
            rng.normal(size=(b, 4))
        ).astype(np.float32),
    )

    tdict = {
        "obj_fts": torch.from_numpy(batch_np["obj_fts"]),
        "obj_masks": torch.from_numpy(batch_np["obj_masks"]),
        "obj_locs": torch.from_numpy(batch_np["obj_locs"]),
        "anchor_locs": torch.from_numpy(batch_np["anchor_locs"]),
        "anchor_orientation": torch.from_numpy(batch_np["anchor_orientation"]),
    }
    with torch.no_grad():
        tout = tmod(dict(tdict))
    want_tokens = tout["obj_tokens"].numpy()
    want_masks = tout["obj_masks"].numpy()

    cfg = dataclasses.replace(TINY, situation_type=situation_type)
    jmod = OSE3DSituation(cfg)
    params = _convert_ose3d_weights(tmod, situation_type, num_layers)
    out = jmod.apply(
        {"params": tc.to_jax_tree(params)},
        jnp.asarray(batch_np["obj_fts"]),
        jnp.asarray(batch_np["obj_masks"]),
        jnp.asarray(batch_np["obj_locs"]),
        jnp.asarray(batch_np["anchor_locs"]),
        jnp.asarray(batch_np["anchor_orientation"]),
        precomputed_obj_embeds=jnp.asarray(feats),
    )

    np.testing.assert_array_equal(np.asarray(out["obj_masks"]), want_masks)
    got = np.asarray(out["obj_tokens"])
    # compare only valid tokens: padded rows are garbage in both
    valid = want_masks.astype(bool)
    np.testing.assert_allclose(got[valid], want_tokens[valid], atol=2e-4)
