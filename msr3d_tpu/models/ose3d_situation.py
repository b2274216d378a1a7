"""OSE3DSituation — object-centric spatial encoder with situation modeling.

Re-implements the reference scene prompter (model/ose3d_situation.py:157-454)
as a flax module over fixed-shape arrays:

  object pcds (B,N,P,6) ──PcdObjEncoder──▶ features ──┐
  anchor loc/ori ──Fourier──▶ situation conditioning ──┼─▶ 3× spatial layers
  obj locs ──calc_pairwise_locs──▶ 5-d pairwise geometry┘       │
                                                      obj_tokens (B,N',256)

Situation-type modes (forward behavior, :384-429):
  - ``as_object``             anchor token prepended as an extra object
  - ``as_object_add_loc``     + Fourier loc/size embedding per layer
  - ``as_embedding``          situation loc/ori Fourier added to every object
  - ``as_transform_for_objects`` (MSR3D default, configs/msr3d.yaml:177):
    object centers transformed into the agent frame, then Fourier-embedded
  - ``as_cross_attention``    CrossAttentionLayer per block conditioning on
    situation features
  - ``as_dit_attention``      DiTBlock adaLN conditioning per block.
    NOTE: the reference *registers* this under ``as_dit_attention`` (:273)
    but its forward guard checks ``as_DiT_attention`` (:423) — a case
    mismatch that makes the branch dead in the reference. We implement the
    intended behavior (the conditioning layer runs).

Masks: inputs use valid-convention (1 = real object, matching the dataset
contract); internally flipped to pad-convention for the attention layers.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from msr3d_tpu.nn.layers import AttFlat, bert_kernel_init
from msr3d_tpu.nn.pointnet import PcdObjEncoder
from msr3d_tpu.nn.transformers import (
    CrossAttentionLayer,
    DiTBlock,
    TransformerEncoderLayer,
    TransformerSpatialEncoderLayer,
)
from msr3d_tpu.ops.geometry import (
    calc_pairwise_locs,
    generate_fourier_features,
    transform_to_agent_coor,
)

SITUATION_TYPES = (
    "as_object",
    "as_object_add_loc",
    "as_embedding",
    "as_transform_for_objects",
    "as_cross_attention",
    "as_dit_attention",
)


@dataclasses.dataclass(frozen=True)
class SpatialEncoderConfig:
    dim_loc: int = 6
    num_attention_heads: int = 8
    dim_feedforward: int = 2048
    dropout: float = 0.1
    activation: str = "gelu"
    spatial_multihead: bool = True
    spatial_dim: int = 5
    spatial_dist_norm: bool = True
    spatial_attn_fusion: str = "cond"
    num_layers: int = 3
    obj_loc_encoding: str = "same_all"  # same_0 | same_all | diff_all
    pairwise_rel_type: str = "center"


@dataclasses.dataclass(frozen=True)
class OSE3DConfig:
    hidden_size: int = 256
    situation_type: str = "as_transform_for_objects"
    use_spatial_attn: bool = True
    use_anchor: bool = True
    use_orientation: bool = True
    fourier_size: int = 84  # quaternion (4) fourier dim
    loc_fourier_dim: int = 63  # xyz (3) fourier dim
    spatial_encoder: SpatialEncoderConfig = SpatialEncoderConfig()
    # vision encoder (PcdObjEncoder) settings
    sa_n_points: Tuple[Optional[int], ...] = (32, 16, None)
    sa_n_samples: Tuple[Optional[int], ...] = (32, 32, None)
    sa_radii: Tuple[Optional[float], ...] = (0.2, 0.4, None)
    sa_mlps: Tuple[Tuple[int, ...], ...] = (
        (3, 64, 64, 128),
        (128, 128, 128, 256),
        (256, 256, 512, 768),
    )
    vision_dropout: float = 0.1
    vision_freeze: bool = True
    # compute dtype of the frozen PointNet++ MLPs. The reference runs its
    # encoders under torch.autocast(bf16) (modules/utils.py:39-54) while the
    # spatial encoder is forced fp32 (ose3d_situation.py:377) — mirrored
    # here: bf16 object encoder (2x MXU rate), fp32 spatial attention.
    # Parity tests pin "float32" to compare bit-for-bit against fp32 torch.
    obj_encoder_dtype: str = "bfloat16"
    use_attn_flat: bool = False
    attn_flat_mlp_size: int = 512
    attn_flat_glimpses: int = 1
    attn_flat_out_size: int = 1024

    @staticmethod
    def from_config(cfg) -> "OSE3DConfig":
        """Build from the reference YAML's ``model.prompter.model`` node."""
        se = cfg.spatial_encoder
        vision_args = cfg.vision.args
        return OSE3DConfig(
            hidden_size=cfg.hidden_size,
            situation_type=cfg.get("situation_type", "as_object"),
            use_spatial_attn=cfg.use_spatial_attn,
            use_anchor=cfg.use_anchor,
            use_orientation=cfg.use_orientation,
            fourier_size=cfg.fourier_size,
            loc_fourier_dim=cfg.get("loc_fourier_dim", 63),
            spatial_encoder=SpatialEncoderConfig(
                dim_loc=se.dim_loc,
                num_attention_heads=se.num_attention_heads,
                dim_feedforward=se.dim_feedforward,
                dropout=se.dropout,
                activation=se.activation,
                spatial_multihead=se.spatial_multihead,
                spatial_dim=se.spatial_dim,
                spatial_dist_norm=se.spatial_dist_norm,
                spatial_attn_fusion=se.spatial_attn_fusion,
                num_layers=se.num_layers,
                obj_loc_encoding=se.obj_loc_encoding,
                pairwise_rel_type=se.pairwise_rel_type,
            ),
            sa_n_points=tuple(vision_args.sa_n_points),
            sa_n_samples=tuple(vision_args.sa_n_samples),
            sa_radii=tuple(vision_args.sa_radii),
            sa_mlps=tuple(tuple(m) for m in vision_args.sa_mlps),
            vision_dropout=vision_args.get("dropout", 0.1),
            vision_freeze=vision_args.get("freeze", True),
            use_attn_flat=cfg.attn_flat.use_attn_flat,
            attn_flat_mlp_size=cfg.attn_flat.mcan_flat_mlp_size,
            attn_flat_glimpses=cfg.attn_flat.mcan_flat_glimpses,
            attn_flat_out_size=cfg.attn_flat.mcan_flat_out_size,
        )


class LocLayer(nn.Module):
    """Linear + LayerNorm location embedding (ose3d_situation.py:228-231)."""

    hidden_size: int

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden_size, kernel_init=bert_kernel_init, name="dense")(x)
        return nn.LayerNorm(epsilon=1e-5, name="norm")(x)


class OSE3DSituation(nn.Module):
    cfg: OSE3DConfig

    @nn.compact
    def __call__(
        self,
        obj_fts: jax.Array,  # (B, N, P, 6) object point clouds
        obj_masks: jax.Array,  # (B, N) bool, 1 = valid
        obj_locs: jax.Array,  # (B, N, 6) center ‖ size
        anchor_locs: Optional[jax.Array] = None,  # (B, 3)
        anchor_orientation: Optional[jax.Array] = None,  # (B, 4) xyzw
        precomputed_obj_embeds: Optional[jax.Array] = None,  # (B, N, D) skips encoder
        *,
        deterministic: bool = True,
    ) -> Dict[str, jax.Array]:
        cfg = self.cfg
        se = cfg.spatial_encoder
        H = cfg.hidden_size

        # ---- object features (frozen PointNet++ + projection) -------------
        if precomputed_obj_embeds is not None:
            # frozen-encoder features can be precomputed/cached by the caller
            obj_embeds = precomputed_obj_embeds
        else:
            obj_embeds, _ = PcdObjEncoder(
                sa_n_points=cfg.sa_n_points,
                sa_n_samples=cfg.sa_n_samples,
                sa_radii=cfg.sa_radii,
                sa_mlps=cfg.sa_mlps,
                dropout=cfg.vision_dropout,
                freeze=cfg.vision_freeze,
                compute_dtype=jnp.dtype(cfg.obj_encoder_dtype),
                name="obj_encoder",
            )(obj_fts, deterministic=deterministic)
        object_feat = nn.Dense(H, name="obj_linear_projection")(obj_embeds)
        object_pad = ~obj_masks.astype(bool)  # pad-convention internally

        b, n = object_feat.shape[:2]

        # ---- per-object additive embeddings -------------------------------
        type_embedding = nn.Embed(
            2, H, embedding_init=nn.initializers.normal(0.02),
            name="object_type_embedding",
        )
        object_type_embed = type_embedding(jnp.zeros((b, n), jnp.int32))

        if cfg.use_orientation:
            object_orientation_feat = self.param(
                "object_orientation_feat", nn.initializers.zeros, (1, 1, H)
            )
            orientation_encoder = nn.Dense(H, name="orientation_encoder")
            obj_ori_feat = jnp.broadcast_to(object_orientation_feat, (b, n, H))

        # ---- anchor token (as_object modes only) --------------------------
        prepend_anchor = cfg.use_anchor and cfg.situation_type in (
            "as_object",
            "as_object_add_loc",
        )
        if prepend_anchor:
            anchor_feat = self.param(
                "anchor_feat", nn.initializers.normal(0.02), (1, 1, H)
            )
            anchor_size = self.param(
                "anchor_size", nn.initializers.ones, (1, 1, 3)
            )
            anchor_token = jnp.broadcast_to(anchor_feat, (b, 1, H))
            anchor_pad = jnp.zeros((b, 1), bool)
            anchor_loc6 = jnp.concatenate(
                [
                    anchor_locs[:, None, :],
                    jnp.broadcast_to(jax.lax.stop_gradient(anchor_size), (b, 1, 3)),
                ],
                axis=-1,
            )
            anchor_type_embed = type_embedding(jnp.ones((b, 1), jnp.int32))

            all_feat = jnp.concatenate([anchor_token, object_feat], axis=1)
            all_pad = jnp.concatenate([anchor_pad, object_pad], axis=1)
            all_loc = jnp.concatenate([anchor_loc6, obj_locs], axis=1)
            all_type = jnp.concatenate([anchor_type_embed, object_type_embed], axis=1)
            if cfg.use_orientation:
                anchor_ori_feat = orientation_encoder(
                    generate_fourier_features(anchor_orientation[:, None, :])
                )
                all_ori = jnp.concatenate([anchor_ori_feat, obj_ori_feat], axis=1)
        else:
            all_feat, all_pad, all_loc, all_type = (
                object_feat, object_pad, obj_locs, object_type_embed,
            )
            if cfg.use_orientation:
                all_ori = obj_ori_feat

        if cfg.use_orientation:
            all_feat = all_feat + all_ori + all_type
        else:
            all_feat = all_feat + all_type

        # ---- pairwise geometry --------------------------------------------
        if cfg.use_spatial_attn:
            pairwise_locs = calc_pairwise_locs(
                all_loc[:, :, :3],
                all_loc[:, :, 3:],
                pairwise_rel_type=se.pairwise_rel_type,
                spatial_dist_norm=se.spatial_dist_norm,
                spatial_dim=se.spatial_dim,
            )

        # ---- situation embedding helpers ----------------------------------
        needs_loc_embed = cfg.situation_type in (
            "as_object_add_loc",
            "as_embedding",
            "as_transform_for_objects",
            "as_cross_attention",
            "as_dit_attention",
        )
        if needs_loc_embed:
            loc_embedding_encoder = LocLayer(H, name="loc_embedding_encoder")
            size_embedding_encoder = LocLayer(H, name="size_embedding_encoder")

        def situation_feature():
            n_all = all_loc.shape[1]
            sit_loc = jnp.broadcast_to(anchor_locs[:, None, :], (b, n_all, 3))
            sit_loc_feat = loc_embedding_encoder(generate_fourier_features(sit_loc))
            sit_ori = jnp.broadcast_to(
                anchor_orientation[:, None, :], (b, n_all, 4)
            )
            sit_ori_feat = orientation_encoder(generate_fourier_features(sit_ori))
            return sit_loc_feat + sit_ori_feat

        # ---- spatial encoder stack ----------------------------------------
        num_loc_layers = (
            se.num_layers if se.obj_loc_encoding == "diff_all" else 1
        )
        loc_layers = [
            LocLayer(H, name=f"loc_layer_{i}") for i in range(num_loc_layers)
        ]

        if cfg.situation_type == "as_cross_attention":
            cond_layers = [
                CrossAttentionLayer(
                    H, se.num_attention_heads, se.dim_feedforward, se.dropout,
                    se.activation, name=f"situation_condition_{i}",
                )
                for i in range(se.num_layers)
            ]
        elif cfg.situation_type == "as_dit_attention":
            cond_layers = [
                DiTBlock(H, se.num_attention_heads, name=f"situation_condition_{i}")
                for i in range(se.num_layers)
            ]

        obj_embeds_seq = all_feat
        attn_out = None
        for i in range(se.num_layers):
            if se.obj_loc_encoding == "diff_all":
                query_pos = loc_layers[i](all_loc)
                obj_embeds_seq = obj_embeds_seq + query_pos
            else:
                if cfg.situation_type == "as_object_add_loc":
                    query_pos = loc_embedding_encoder(
                        generate_fourier_features(all_loc[:, :, :3])
                    ) + size_embedding_encoder(all_loc[:, :, 3:])
                elif cfg.situation_type == "as_embedding":
                    query_pos = (
                        loc_embedding_encoder(
                            generate_fourier_features(all_loc[:, :, :3])
                        )
                        + size_embedding_encoder(all_loc[:, :, 3:])
                        + situation_feature()
                    )
                elif cfg.situation_type == "as_transform_for_objects":
                    transformed = transform_to_agent_coor(
                        all_loc[:, :, :3], anchor_locs, anchor_orientation
                    )
                    query_pos = loc_embedding_encoder(
                        generate_fourier_features(transformed)
                    ) + size_embedding_encoder(all_loc[:, :, 3:])
                else:
                    query_pos = loc_layers[0](all_loc)

                if se.obj_loc_encoding == "same_all" or i == 0:
                    obj_embeds_seq = obj_embeds_seq + query_pos

            if cfg.situation_type == "as_cross_attention":
                obj_embeds_seq, _ = cond_layers[i](
                    obj_embeds_seq, situation_feature(),
                    tgt_key_padding_mask=all_pad, deterministic=deterministic,
                )
            elif cfg.situation_type == "as_dit_attention":
                obj_embeds_seq = cond_layers[i](
                    obj_embeds_seq, situation_feature(), deterministic=deterministic
                )

            if cfg.use_spatial_attn:
                obj_embeds_seq, attn_out = TransformerSpatialEncoderLayer(
                    H,
                    se.num_attention_heads,
                    dim_feedforward=se.dim_feedforward,
                    dropout=se.dropout,
                    activation=se.activation,
                    spatial_multihead=se.spatial_multihead,
                    spatial_dim=se.spatial_dim,
                    spatial_attn_fusion=se.spatial_attn_fusion,
                    name=f"spatial_layer_{i}",
                )(
                    obj_embeds_seq, pairwise_locs, all_pad,
                    deterministic=deterministic,
                )
            else:
                obj_embeds_seq, attn_out = TransformerEncoderLayer(
                    H,
                    se.num_attention_heads,
                    dim_feedforward=se.dim_feedforward,
                    dropout=se.dropout,
                    activation=se.activation,
                    name=f"spatial_layer_{i}",
                )(obj_embeds_seq, all_pad, deterministic=deterministic)

        out: Dict[str, jax.Array] = {}
        if cfg.use_attn_flat:
            pooled, oatt = AttFlat(
                cfg.attn_flat_mlp_size,
                cfg.attn_flat_glimpses,
                cfg.attn_flat_out_size,
                pdrop=0.1,
                name="attflat_visual",
            )(obj_embeds_seq, all_pad, deterministic=deterministic)
            out["obj_tokens"] = pooled
            out["oatt"] = oatt
        else:
            out["obj_tokens"] = obj_embeds_seq
        out["obj_masks"] = ~all_pad  # back to valid-convention
        return out
