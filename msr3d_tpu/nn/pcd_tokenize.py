"""PointTokenizeEncoder — GloVe-tokenized object encoder with mixup
curriculum (reference modules/vision/pcd_tokenize_encoder.py:17-140,
modules/utils.py:141-190).

PointNet++ features are "tokenized" through a frozen 607-way classifier:
the (softmaxed, optionally label-mixed) class distribution indexes a GloVe
table (cat2glove42b.json, 607×300) whose embedding is added back to the
object feature; masked objects get a learned mask embedding; 4 spatial
attention layers reason over the result. Mixup curriculum: ``all_mixup``
replaces predictions with gold one-hots; ``linear_decay`` anneals the
replacement probability 1→0 between two schedule points.

TPU-native notes: the reference's per-element Python loops become masked
``where``s; the gather-by-argmax path and the matmul-label path are both
expressed through the (607, 300) table resident on device. The GloVe table
ships as a constructor argument (numpy array) so the encoder stays usable
in zero-egress environments — pass the parsed cat2glove42b.json when the
data tree provides it.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from msr3d_tpu.nn.layers import MLPHead
from msr3d_tpu.nn.pointnet import PointNetPP
from msr3d_tpu.nn.transformers import TransformerSpatialEncoderLayer
from msr3d_tpu.ops.geometry import calc_pairwise_locs
from msr3d_tpu.registry import VISION_REGISTRY


def all_mixup(obj_sem_cls_pred, obj_labels):
    """Gold one-hots wherever a label exists (utils.py:152-162)."""
    valid = obj_labels >= 0
    onehot = jax.nn.one_hot(
        jnp.maximum(obj_labels, 0), obj_sem_cls_pred.shape[-1],
        dtype=obj_sem_cls_pred.dtype,
    )
    return jnp.where(valid[..., None], onehot, jnp.zeros_like(obj_sem_cls_pred))


def linear_decay_mixup(
    obj_sem_cls_pred, obj_labels, cur_step, total_steps, stage1: float, stage2: float,
    rng: jax.Array,
):
    """Per-object stochastic gold replacement with ratio 1→0 annealed between
    ``stage1``·T and ``stage2``·T (utils.py:165-190)."""
    t1 = total_steps * stage1
    t2 = total_steps * stage2
    ratio = jnp.clip((t2 - cur_step) / jnp.maximum(t2 - t1, 1e-6), 0.0, 1.0)
    ratio = jnp.where(cur_step < t1, 1.0, ratio)
    rand = jax.random.uniform(rng, obj_labels.shape)
    replace = (rand < ratio) & (obj_labels >= 0)
    onehot = jax.nn.one_hot(
        jnp.maximum(obj_labels, 0), obj_sem_cls_pred.shape[-1],
        dtype=obj_sem_cls_pred.dtype,
    )
    return jnp.where(replace[..., None], onehot, obj_sem_cls_pred)


@VISION_REGISTRY.register(name="PointTokenizeEncoder")
class PointTokenizeEncoder(nn.Module):
    hidden_size: int = 768
    num_attention_heads: int = 12
    spatial_dim: int = 5
    num_layers: int = 4
    dim_loc: int = 6
    pairwise_rel_type: str = "center"
    freeze: bool = False
    use_matmul_label: bool = False
    mixup_strategy: Optional[str] = None  # None | 'all_mixup' | 'linear_decay'
    mixup_stage1: float = 0.0
    mixup_stage2: float = 0.0
    num_semantic_classes: int = 607
    glove_dim: int = 300
    # PointNet++ spec (reference hard-codes these, :26-31); the last MLP
    # width must equal hidden_size
    sa_mlps: tuple = (
        (3, 64, 64, 128), (128, 128, 128, 256), (256, 256, 512, 768),
    )
    # (607, 300) cat→GloVe table (annotations/meta_data/cat2glove42b.json);
    # None → learned-from-init table (zero-egress fallback)
    cat2vec: Optional[np.ndarray] = None

    @nn.compact
    def __call__(
        self,
        obj_pcds,  # (B, O, P, 6)
        obj_locs,  # (B, O, 6)
        obj_masks,  # (B, O) 1 = valid
        obj_sem_masks,  # (B, O) 1 = semantics visible
        obj_labels=None,  # (B, O) int labels or None
        cur_step=None,
        max_steps=None,
        *,
        deterministic: bool = True,
    ):
        b, o = obj_pcds.shape[:2]
        assert self.sa_mlps[-1][-1] == self.hidden_size, (
            "PointNetPP output width must equal hidden_size"
        )
        feats = PointNetPP(
            sa_n_points=(32, 16, None),
            sa_n_samples=(32, 32, None),
            sa_radii=(0.2, 0.4, None),
            sa_mlps=self.sa_mlps,
            name="point_feature_extractor",
        )(obj_pcds.reshape(b * o, *obj_pcds.shape[2:]))
        obj_embeds = feats.reshape(b, o, -1)
        obj_embeds = nn.Dropout(0.1)(obj_embeds, deterministic=deterministic)
        if self.freeze:
            obj_embeds = jax.lax.stop_gradient(obj_embeds)

        # frozen tokenizer head: softmax class distribution (detached)
        sem_logits = MLPHead(
            self.hidden_size // 2, self.num_semantic_classes, dropout=0.3,
            name="point_cls_head",
        )(obj_embeds, deterministic=deterministic)
        obj_sem_cls = jax.lax.stop_gradient(jax.nn.softmax(sem_logits, axis=2))

        if self.mixup_strategy is None:
            mixed = obj_sem_cls
        elif self.mixup_strategy == "all_mixup":
            mixed = all_mixup(obj_sem_cls, obj_labels)
        elif self.mixup_strategy == "linear_decay":
            mixed = linear_decay_mixup(
                obj_sem_cls, obj_labels, cur_step, max_steps,
                self.mixup_stage1, self.mixup_stage2,
                self.make_rng("mixup"),
            )
        else:
            raise NotImplementedError(self.mixup_strategy)

        if self.cat2vec is not None:
            int2mat = jnp.asarray(self.cat2vec, jnp.float32)
        else:
            int2mat = self.param(
                "int2mat", nn.initializers.normal(0.02),
                (self.num_semantic_classes, self.glove_dim),
            )
        if self.use_matmul_label:
            sem_embeds = mixed @ int2mat  # (B, O, 300)
        else:
            sem_embeds = int2mat[jnp.argmax(mixed, axis=2)]
        sem_embeds = nn.Dense(self.hidden_size, name="sem_cls_fc")(sem_embeds)
        sem_embeds = nn.LayerNorm(epsilon=1e-5, name="sem_cls_norm")(sem_embeds)
        sem_embeds = nn.Dropout(0.1)(sem_embeds, deterministic=deterministic)
        obj_embeds = obj_embeds + sem_embeds

        # semantic masking: masked objects carry only the mask embedding
        vis = obj_sem_masks.astype(bool)[..., None]
        mask_embed = nn.Embed(1, self.hidden_size, name="sem_mask_embeddings")(
            jnp.zeros((b, o), jnp.int32)
        )
        obj_embeds = jnp.where(vis, obj_embeds, 0.0) + jnp.where(vis, 0.0, mask_embed)

        obj_embeds_pre = obj_embeds

        pairwise_locs = calc_pairwise_locs(
            obj_locs[:, :, :3], obj_locs[:, :, 3:],
            pairwise_rel_type=self.pairwise_rel_type,
            spatial_dist_norm=True, spatial_dim=self.spatial_dim,
        )
        loc_fc = nn.Dense(self.hidden_size, name="loc_fc")
        loc_norm = nn.LayerNorm(epsilon=1e-5, name="loc_norm")
        for i in range(self.num_layers):
            obj_embeds = obj_embeds + loc_norm(loc_fc(obj_locs))
            obj_embeds, _ = TransformerSpatialEncoderLayer(
                self.hidden_size, self.num_attention_heads,
                dim_feedforward=2048, dropout=0.1, activation="gelu",
                spatial_dim=self.spatial_dim, spatial_attn_fusion="cond",
                name=f"spatial_layer_{i}",
            )(
                obj_embeds, pairwise_locs,
                tgt_key_padding_mask=~obj_masks.astype(bool),
                deterministic=deterministic,
            )
        return obj_embeds, obj_embeds_pre, obj_sem_cls


def load_cat2vec(scan_family_base: str) -> Optional[np.ndarray]:
    """(607, 300) GloVe table from the data tree's cat2glove42b.json
    (pcd_tokenize_encoder.py:53-59); None when absent."""
    import json
    from pathlib import Path

    base = Path(scan_family_base) / "annotations" / "meta_data"
    cats_f = base / "scannetv2_raw_categories.json"
    glove_f = base / "cat2glove42b.json"
    if not (cats_f.exists() and glove_f.exists()):
        return None
    cats = json.load(open(cats_f, encoding="utf-8"))
    cat2vec = json.load(open(glove_f, encoding="utf-8"))
    return np.asarray([cat2vec[c] for c in cats], np.float32)
