"""2D image backbone (ConvNeXt) in flax — the reference's ``Backbone2D``.

The reference builds a timm ``convnext_base`` pretrained on laion2b with
avg pooling (modules/vision/timm.py:70-110, configs/msr3d.yaml:222-226) and
projects pooled features into the LLM (msr3d.py:98-100; 1 token per image
with avg pooling, msr3d.py:308).

Here ConvNeXt is implemented natively (depthwise 7×7 + LN + pointwise MLP
blocks; stages 3/3/27/3, dims 128/256/512/1024 for -base) with NHWC layout
(TPU-native; XLA maps depthwise+pointwise convs onto the MXU). Pretrained
weights convert from a timm/open-clip checkpoint via
``convert_convnext_state_dict`` when a file is provided; otherwise random
init (tests, debug configs).
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

CONVNEXT_SPECS = {
    # name: (depths, dims)
    "convnext_tiny": ((3, 3, 9, 3), (96, 192, 384, 768)),
    "convnext_small": ((3, 3, 27, 3), (96, 192, 384, 768)),
    "convnext_base": ((3, 3, 27, 3), (128, 256, 512, 1024)),
    "convnext_large": ((3, 3, 27, 3), (192, 384, 768, 1536)),
    # tiny config for tests
    "convnext_test": ((1, 1, 1, 1), (8, 16, 32, 64)),
}


class ConvNeXtBlock(nn.Module):
    dim: int
    layer_scale_init: float = 1e-6

    @nn.compact
    def __call__(self, x):  # x: (B, H, W, C)
        residual = x
        x = nn.Conv(
            self.dim, (7, 7), padding=3, feature_group_count=self.dim, name="dwconv"
        )(x)
        x = nn.LayerNorm(epsilon=1e-6, name="norm")(x)
        x = nn.Dense(4 * self.dim, name="pwconv1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(self.dim, name="pwconv2")(x)
        gamma = self.param(
            "gamma",
            nn.initializers.constant(self.layer_scale_init),
            (self.dim,),
        )
        return residual + gamma * x


class ConvNeXt(nn.Module):
    depths: Sequence[int] = (3, 3, 27, 3)
    dims: Sequence[int] = (128, 256, 512, 1024)

    @nn.compact
    def __call__(self, x):  # x: (B, H, W, 3) → (B, H/32, W/32, dims[-1])
        x = nn.Conv(self.dims[0], (4, 4), strides=4, name="stem_conv")(x)
        x = nn.LayerNorm(epsilon=1e-6, name="stem_norm")(x)
        for stage in range(4):
            if stage > 0:
                x = nn.LayerNorm(epsilon=1e-6, name=f"downsample_norm_{stage}")(x)
                x = nn.Conv(
                    self.dims[stage], (2, 2), strides=2, name=f"downsample_conv_{stage}"
                )(x)
            for blk in range(self.depths[stage]):
                x = ConvNeXtBlock(self.dims[stage], name=f"stage_{stage}_block_{blk}")(x)
        return x


class Backbone2D(nn.Module):
    """Image backbone + pooling (modules/vision/timm.py:70-110 semantics).

    Input images NHWC float (already normalized by the data pipeline,
    scan_data_loader.py:196-204). Output: (B, out_channels) for ``avg``
    pooling (1 token/image) or (B, H'·W', out_channels) for ``none``.
    """

    backbone_name: str = "convnext_base"
    pooling: str = "avg"  # avg | conv | attn | none
    freeze: bool = True

    @property
    def out_channels(self) -> int:
        c = CONVNEXT_SPECS[self.backbone_name][1][-1]
        if self.pooling == "conv":
            return 32 * 7 * 7  # reference hard-codes 7×7 maps (timm.py:86-87)
        return c

    @nn.compact
    def __call__(self, images: jax.Array) -> jax.Array:
        depths, dims = CONVNEXT_SPECS[self.backbone_name]
        feats = ConvNeXt(depths, dims, name="backbone")(images)  # (B,H,W,C)
        if self.freeze:
            feats = jax.lax.stop_gradient(feats)
        if self.pooling == "avg":
            return jnp.mean(feats, axis=(1, 2))
        if self.pooling == "conv":
            # 1×1 conv stack then flatten (timm.py:78-87)
            h = nn.Dense(64, name="pool_conv1")(feats)
            h = nn.relu(h)
            h = nn.Dense(32, name="pool_conv2")(h)
            return h.reshape(h.shape[0], -1)
        if self.pooling in ("attn", "attention"):
            # channel-wise attention pooling (timm.py:88-104; note the
            # reference einsums x with itself after computing attn — the
            # intended attn-weighted pool is used here)
            attn = nn.Dense(dims[-1], name="attn_conv1")(feats)
            attn = nn.relu(attn)
            attn = nn.Dense(dims[-1], name="attn_conv2")(attn)
            b, h, w, c = feats.shape
            attn = jax.nn.softmax(attn.reshape(b, h * w, c), axis=1)
            return jnp.einsum("bnc,bnc->bc", feats.reshape(b, h * w, c), attn)
        if self.pooling == "none":
            b, h, w, c = feats.shape
            return feats.reshape(b, h * w, c)
        raise NotImplementedError(f"pooling {self.pooling!r}")


def convert_convnext_state_dict(
    sd: Dict[str, Any], depths: Sequence[int]
) -> Dict[str, Any]:
    """timm ConvNeXt state dict → our flax params.

    timm names: stem.0/stem.1, stages.{s}.blocks.{b}.{conv_dw,norm,mlp.fc1,
    mlp.fc2,gamma}, stages.{s}.downsample.{0,1}.
    torch conv weight (O,I,kh,kw) → flax (kh,kw,I,O); depthwise (O,1,kh,kw)
    → flax (kh,kw,1,O).
    """

    def _np(t):
        if isinstance(t, np.ndarray):
            return t
        return t.detach().cpu().float().numpy()

    def conv(name):
        w = _np(sd[f"{name}.weight"])
        out = {"kernel": np.transpose(w, (2, 3, 1, 0))}
        if f"{name}.bias" in sd:
            out["bias"] = _np(sd[f"{name}.bias"])
        return out

    def ln(name):
        return {"scale": _np(sd[f"{name}.weight"]), "bias": _np(sd[f"{name}.bias"])}

    def dense(name):
        return {"kernel": _np(sd[f"{name}.weight"]).T, "bias": _np(sd[f"{name}.bias"])}

    params: Dict[str, Any] = {
        "stem_conv": conv("stem.0"),
        "stem_norm": ln("stem.1"),
    }
    for s in range(4):
        if s > 0:
            params[f"downsample_norm_{s}"] = ln(f"stages.{s}.downsample.0")
            params[f"downsample_conv_{s}"] = conv(f"stages.{s}.downsample.1")
        for b in range(depths[s]):
            base = f"stages.{s}.blocks.{b}"
            # timm names the depthwise conv conv_dw; some checkpoints use dwconv
            dw = "conv_dw" if f"{base}.conv_dw.weight" in sd else "dwconv"
            mlp1 = "mlp.fc1" if f"{base}.mlp.fc1.weight" in sd else "pwconv1"
            mlp2 = "mlp.fc2" if f"{base}.mlp.fc2.weight" in sd else "pwconv2"
            params[f"stage_{s}_block_{b}"] = {
                "dwconv": conv(f"{base}.{dw}"),
                "norm": ln(f"{base}.norm"),
                "pwconv1": dense(f"{base}.{mlp1}"),
                "pwconv2": dense(f"{base}.{mlp2}"),
                "gamma": _np(sd[f"{base}.gamma"]),
            }
    return {"backbone": params}
