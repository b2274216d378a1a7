"""Vision-registry adapters: reference config names → flax module builders.

``build_module('vision', cfg)`` (modules/build.py:6-22) resolves these by
``cfg.name``; each adapter maps the reference YAML args onto the flax
module's fields.
"""

from __future__ import annotations

from msr3d_tpu.nn.pointbert import PointBERTPcdObjEncoder as _PointBERT
from msr3d_tpu.nn.pointnet import PcdObjEncoder as _PcdObjEncoder
from msr3d_tpu.models.vision2d import Backbone2D as _Backbone2D
from msr3d_tpu.registry import VISION_REGISTRY


@VISION_REGISTRY.register(name="PcdObjEncoder")
def build_pcd_obj_encoder(cfg):
    args = cfg.args
    return _PcdObjEncoder(
        sa_n_points=tuple(args.sa_n_points),
        sa_n_samples=tuple(args.sa_n_samples),
        sa_radii=tuple(args.sa_radii),
        sa_mlps=tuple(tuple(m) for m in args.sa_mlps),
        dropout=args.get("dropout", 0.1),
        freeze=args.get("freeze", True),
    )


@VISION_REGISTRY.register(name="PointBERTPcdObjEncoder")
def build_pointbert_encoder(cfg):
    args = cfg.args
    return _PointBERT(
        trans_dim=args.trans_dim,
        depth=args.depth,
        num_heads=args.num_heads,
        group_size=args.group_size,
        num_group=args.num_group,
        encoder_dims=args.encoder_dims,
        add_rgb=args.get("add_RGB", True),
        freeze=args.get("freeze", False),
    )


@VISION_REGISTRY.register(name="PCDSwin3DEncoder")
def build_swin3d_encoder(cfg):
    """Sparse-voxel Swin3D UNet (reference pcd_swin3d_encoder.py:18-52)."""
    from msr3d_tpu.nn.swin3d import PCDSwin3DEncoder

    args = cfg.args
    return PCDSwin3DEncoder(
        depths=tuple(args.depths),
        channels=tuple(args.channels),
        num_heads=tuple(args.num_heads),
        window_sizes=tuple(args.window_sizes),
        up_k=args.get("up_k", 3),
        quant_size=args.get("quant_size", 4),
        num_layers=args.get("num_layers", 4),
        num_classes=args.get("num_classes", 13),
        stem_transformer=args.get("stem_transformer", False),
        upsample=args.get("upsample", "deconv"),
        down_stride=args.get("down_stride", 2),
        signal=args.get("signal", True),
        in_channels=args.get("in_channels", 6),
        use_offset=args.get("use_offset", False),
    )


@VISION_REGISTRY.register(name="Backbone2D")
def build_backbone2d(cfg):
    args = cfg.args
    return _Backbone2D(
        backbone_name=args.get("backbone_name", "convnext_base"),
        pooling=args.get("pooling", "avg"),
        freeze=cfg.get("freeze", True),
    )
