"""PointNet++ set-abstraction encoder (flax.linen, channels-last).

Composition parity with the reference
(modules/third_party/pointnet2/pointnet2_modules.py:26-161,
modules/layers/pointnet.py:22-63, modules/vision/pcd_pointnet_encoder.py:11-74):
FPS → gather → ball-query → group → shared-MLP (1×1 conv ≡ Dense on the MXU)
→ max-pool per group, stacked per SA stage, then flatten + fc.

Default hyperparameters follow configs/msr3d.yaml:198-201:
  sa_n_points [32,16,None], sa_n_samples [32,32,None],
  sa_radii [0.2,0.4,None], sa_mlps [[3,64,64,128],[128,...,256],[256,...,768]]
(with use_xyz the first width of each MLP gets +3).

BatchNorm: the encoder is frozen in every shipped config
(configs/msr3d.yaml:203), so BN runs in inference mode by default
(running stats → affine); training-mode BN with batch_stats is supported
for from-scratch runs.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from msr3d_tpu.ops.pointnet2 import (
    fps,
    gather_points,
    group_all,
    query_and_group,
)


class SharedMLP(nn.Module):
    """Per-point Dense+BN+ReLU stack ≡ the reference's 1×1 Conv2d stack
    (pytorch_utils.py:11-36), operating on the trailing channel dim."""

    widths: Sequence[int]
    bn: bool = True
    dtype: Any = jnp.float32  # compute dtype; fp32 params (autocast semantics)

    @nn.compact
    def __call__(self, x, *, use_running_average: bool = True):
        x = x.astype(self.dtype)
        for i, w in enumerate(self.widths):
            x = nn.Dense(w, use_bias=not self.bn, dtype=self.dtype, name=f"dense_{i}")(x)
            if self.bn:
                x = nn.BatchNorm(
                    use_running_average=use_running_average,
                    momentum=0.9,
                    epsilon=1e-5,
                    dtype=self.dtype,
                    name=f"bn_{i}",
                )(x)
            x = nn.relu(x)
        return x


class PointnetSAModule(nn.Module):
    """Single-scale set abstraction stage."""

    npoint: Optional[int]
    nsample: Optional[int]
    radius: Optional[float]
    mlp: Sequence[int]  # hidden widths AFTER the input width
    use_xyz: bool = True
    bn: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        xyz: jax.Array,
        features: Optional[jax.Array],
        *,
        use_running_average: bool = True,
    ) -> Tuple[Optional[jax.Array], jax.Array]:
        """xyz (B,N,3), features (B,N,C) or None →
        (new_xyz (B,npoint,3) or None, pooled (B, npoint or 1, mlp[-1]))."""
        if self.npoint is not None:
            idx = fps(xyz, self.npoint)
            new_xyz = gather_points(xyz, idx)
            grouped = query_and_group(
                xyz, new_xyz, features, radius=self.radius, nsample=self.nsample,
                use_xyz=self.use_xyz,
            )  # (B, npoint, nsample, C_in)
        else:
            new_xyz = None
            grouped = group_all(xyz, features, use_xyz=self.use_xyz)  # (B,1,N,C_in)

        h = SharedMLP(self.mlp, bn=self.bn, dtype=self.dtype, name="mlp")(
            grouped, use_running_average=use_running_average
        )
        pooled = jnp.max(h, axis=2)  # max over the group (nsample) axis
        return new_xyz, pooled


class PointNetPP(nn.Module):
    """Stacked SA stages + flatten + fc (modules/layers/pointnet.py:22-63)."""

    sa_n_points: Sequence[Optional[int]]
    sa_n_samples: Sequence[Optional[int]]
    sa_radii: Sequence[Optional[float]]
    sa_mlps: Sequence[Sequence[int]]
    bn: bool = True
    use_xyz: bool = True
    dtype: Any = jnp.float32  # MLP compute dtype (reference runs the pcd
    # encoder under bf16 autocast, modules/utils.py:39-54; FPS/ball-query
    # geometry stays fp32 so sampled indices are dtype-independent)

    @nn.compact
    def __call__(self, pc: jax.Array, *, use_running_average: bool = True) -> jax.Array:
        """pc (B, P, 3+C) → (B, sa_mlps[-1][-1])."""
        n_sa = len(self.sa_n_points)
        assert n_sa == len(self.sa_n_samples) == len(self.sa_radii) == len(self.sa_mlps)

        xyz = pc[..., :3]
        features = pc[..., 3:] if pc.shape[-1] > 3 else None
        for i in range(n_sa):
            # reference (pointnet2_modules.py:120-122): with use_xyz the
            # declared input width gains +3; channels-last makes the input
            # width implicit, so only the hidden widths matter here.
            hidden = list(self.sa_mlps[i][1:])
            xyz, features = PointnetSAModule(
                npoint=self.sa_n_points[i],
                nsample=self.sa_n_samples[i],
                radius=self.sa_radii[i],
                mlp=hidden,
                use_xyz=self.use_xyz,
                bn=self.bn,
                dtype=self.dtype,
                name=f"sa_{i}",
            )(xyz, features, use_running_average=use_running_average)

        flat = features.reshape(features.shape[0], -1)
        return nn.Dense(self.sa_mlps[-1][-1], name="fc")(flat).astype(jnp.float32)


class PcdObjEncoder(nn.Module):
    """Object-centric point-cloud encoder
    (modules/vision/pcd_pointnet_encoder.py:11-74).

    (B, O, P, 6) object point clouds → (obj_embeds (B, O, D),
    obj_sem_cls (B, O, 607)). ``freeze`` stops gradients and pins BN to
    inference mode, mirroring the reference's no_grad + BN-eval freeze.
    """

    sa_n_points: Sequence[Optional[int]] = (32, 16, None)
    sa_n_samples: Sequence[Optional[int]] = (32, 32, None)
    sa_radii: Sequence[Optional[float]] = (0.2, 0.4, None)
    sa_mlps: Sequence[Sequence[int]] = (
        (3, 64, 64, 128),
        (128, 128, 128, 256),
        (256, 256, 512, 768),
    )
    dropout: float = 0.1
    freeze: bool = True
    num_semantic_classes: int = 607
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, obj_pcds: jax.Array, *, deterministic: bool = True):
        from msr3d_tpu.nn.layers import MLPHead

        b, o, p, d = obj_pcds.shape
        flat = obj_pcds.reshape(b * o, p, d)
        embeds = PointNetPP(
            sa_n_points=self.sa_n_points,
            sa_n_samples=self.sa_n_samples,
            sa_radii=self.sa_radii,
            sa_mlps=self.sa_mlps,
            dtype=self.compute_dtype,
            name="pcd_net",
        )(flat, use_running_average=self.freeze or deterministic)
        embeds = embeds.reshape(b, o, -1)
        if self.freeze:
            embeds = jax.lax.stop_gradient(embeds)
        sem_cls = MLPHead(384, self.num_semantic_classes, dropout=0.3, name="sem_head")(
            embeds, deterministic=deterministic
        )
        return embeds, sem_cls
