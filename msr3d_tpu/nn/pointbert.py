"""PointBERT (PointTransformer) object encoder — alternative vision encoder.

Reference: modules/third_party/pointbert/{pointbert,dvae,misc}.py +
modules/vision/pcd_pointbert_encoder.py:10-68. Pipeline: FPS centers →
kNN grouping (center-relative xyz ‖ rgb) → mini-PointNet group embedding
(conv1d stack, global-max concat trick) → ViT blocks with per-layer
additive positional embedding from group centers → ``[cls ‖ max-pool]``
(2·trans_dim output).

Note: the reference's PointBERT FPS seeds from a random index
(pointbert/misc.py:33) — a train-time augmentation detail; here the
deterministic index-0 seed is used (matching the main FPS op).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from msr3d_tpu.ops.pointnet2 import fps, gather_points, group_points


def knn_point(k: int, xyz: jax.Array, centers: jax.Array) -> jax.Array:
    """k nearest neighbors of each center. xyz (B,N,3), centers (B,G,3) →
    (B,G,k) int32 indices."""
    d2 = jnp.sum(
        jnp.square(centers[:, :, None, :] - xyz[:, None, :, :]), axis=-1
    )  # (B, G, N)
    _, idx = jax.lax.top_k(-d2, k)
    return idx.astype(jnp.int32)


class GroupDivider(nn.Module):
    """FPS centers + kNN neighborhoods, center-relative xyz (dvae.py:47-91)."""

    num_group: int
    group_size: int

    def __call__(self, pts: jax.Array):
        xyz = pts[..., :3]
        rgb = pts[..., 3:] if pts.shape[-1] > 3 else None
        center_idx = fps(xyz, self.num_group)
        centers = gather_points(xyz, center_idx)  # (B, G, 3)
        idx = knn_point(self.group_size, xyz, centers)  # (B, G, k)
        nb_xyz = group_points(xyz, idx) - centers[:, :, None, :]
        if rgb is not None:
            nb_rgb = group_points(rgb, idx)
            return jnp.concatenate([nb_xyz, nb_rgb], axis=-1), centers
        return nb_xyz, centers


class MiniPointNet(nn.Module):
    """Group embedding (dvae.py:93-125): conv stack → max → concat → conv
    stack → max."""

    encoder_channel: int

    @nn.compact
    def __call__(self, groups: jax.Array) -> jax.Array:
        # groups: (B, G, k, C) → (B, G, encoder_channel)
        b, g, k, c = groups.shape
        h = groups.reshape(b * g, k, c)
        h = nn.Dense(128, name="conv1a")(h)
        h = nn.BatchNorm(use_running_average=True, name="bn1")(h)
        h = nn.relu(h)
        h = nn.Dense(256, name="conv1b")(h)
        global_feat = jnp.max(h, axis=1, keepdims=True)  # (BG, 1, 256)
        h = jnp.concatenate([jnp.broadcast_to(global_feat, h.shape), h], axis=-1)
        h = nn.Dense(512, name="conv2a")(h)
        h = nn.BatchNorm(use_running_average=True, name="bn2")(h)
        h = nn.relu(h)
        h = nn.Dense(self.encoder_channel, name="conv2b")(h)
        return jnp.max(h, axis=1).reshape(b, g, self.encoder_channel)


class ViTBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        from msr3d_tpu.nn.transformers import MultiHeadAttention

        h = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        h, _ = MultiHeadAttention(self.dim, self.num_heads, dropout=0.0, name="attn")(
            h, h, h, deterministic=deterministic
        )
        x = x + h
        h = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        h = nn.Dense(int(self.dim * self.mlp_ratio), name="fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, name="fc2")(h)
        return x + h


class PointTransformer(nn.Module):
    """pointbert.py:101-208."""

    trans_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    group_size: int = 32
    num_group: int = 64
    encoder_dims: int = 256
    add_rgb: bool = True

    @nn.compact
    def __call__(self, pts: jax.Array, *, deterministic: bool = True) -> jax.Array:
        """pts (B, P, 3 or 6) → (B, 2·trans_dim)."""
        groups, centers = GroupDivider(self.num_group, self.group_size)(pts)
        if not self.add_rgb:
            groups = groups[..., :3]
        tokens = MiniPointNet(self.encoder_dims, name="encoder")(groups)
        tokens = nn.Dense(self.trans_dim, name="reduce_dim")(tokens)

        b = tokens.shape[0]
        cls_token = self.param(
            "cls_token", nn.initializers.zeros, (1, 1, self.trans_dim)
        )
        cls_pos = self.param(
            "cls_pos", nn.initializers.normal(1.0), (1, 1, self.trans_dim)
        )
        pos = nn.Dense(128, name="pos_embed_fc1")(centers)
        pos = nn.gelu(pos, approximate=False)
        pos = nn.Dense(self.trans_dim, name="pos_embed_fc2")(pos)

        x = jnp.concatenate(
            [jnp.broadcast_to(cls_token, (b, 1, self.trans_dim)), tokens], axis=1
        )
        pos = jnp.concatenate(
            [jnp.broadcast_to(cls_pos, (b, 1, self.trans_dim)), pos], axis=1
        )
        for i in range(self.depth):
            # per-layer additive pos embedding (pointbert.py:95-98)
            x = ViTBlock(self.trans_dim, self.num_heads, name=f"block_{i}")(
                x + pos, deterministic=deterministic
            )
        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        return jnp.concatenate([x[:, 0], jnp.max(x[:, 1:], axis=1)], axis=-1)


class PointBERTPcdObjEncoder(nn.Module):
    """Object-batched wrapper (pcd_pointbert_encoder.py:10-68)."""

    trans_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    group_size: int = 32
    num_group: int = 64
    encoder_dims: int = 256
    add_rgb: bool = True
    freeze: bool = False

    @nn.compact
    def __call__(self, obj_pcds: jax.Array, *, deterministic: bool = True):
        b, o, p, d = obj_pcds.shape
        flat = obj_pcds.reshape(b * o, p, d)
        embeds = PointTransformer(
            trans_dim=self.trans_dim, depth=self.depth, num_heads=self.num_heads,
            group_size=self.group_size, num_group=self.num_group,
            encoder_dims=self.encoder_dims, add_rgb=self.add_rgb,
            name="pcd_encoder",
        )(flat, deterministic=deterministic)
        embeds = embeds.reshape(b, o, -1)
        if self.freeze:
            embeds = jax.lax.stop_gradient(embeds)
        return embeds, embeds
