"""OccupancyFormer: top-level detector assembling the full pipeline.

Reference: projects/mmdet3d_plugin/occformer/detectors/occupancyformer.py:14-237
(on the BEVDepth bases, detectors/bevdepth.py).  One jittable function:
multi-camera images + geometry -> image encoder -> LSS lift/splat ->
dual-path 3D encoder -> deformable pixel decoder -> Mask2Former head.

Construction is config-driven through the same ``dict(type=..., ...)`` trees
the reference uses; `translate_cfg` adapts nested mmcv bricks (encoder /
transformer_decoder dicts) to module fields.
"""
from __future__ import annotations

import copy
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..registry import BACKBONES, DETECTORS, HEADS, NECKS


def _strip(cfg: Dict, drop=("type", "pretrained", "init_cfg", "norm_cfg",
                            "norm_eval", "style", "num_stages", "frozen_stages")) -> Dict:
    return {k: v for k, v in cfg.items() if k not in drop}


def _to_plain(obj):
    """Recursively convert Mapping-likes (incl. flax FrozenDict) to dicts."""
    from collections.abc import Mapping

    if isinstance(obj, Mapping):
        return {k: _to_plain(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return type(obj)(_to_plain(v) for v in obj)
    return obj


def translate_cfg(cfg: Dict, train: bool, dtype) -> Tuple[Any, Dict]:
    """Map an mmdet-style component config onto our module class + kwargs."""
    cfg = _to_plain(cfg)
    t = cfg.pop("type")
    kwargs: Dict[str, Any] = {}

    if t == "ResNet":
        dcn = cfg.get("dcn")
        stage_with_dcn = cfg.get("stage_with_dcn", (False, False, True, True))
        kwargs = dict(
            depth=cfg.get("depth", 50),
            out_indices=tuple(cfg.get("out_indices", (0, 1, 2, 3))),
            norm_eval=cfg.get("norm_eval", False),
            dcn_stages=tuple(i for i, f in enumerate(stage_with_dcn) if f) if dcn else (),
            style=cfg.get("style", "pytorch"),
            with_cp=cfg.get("with_cp", False),
            frozen_stages=cfg.get("frozen_stages", -1),
        )
        from .resnet import ResNet
        return ResNet, kwargs
    if t == "CustomEfficientNet":
        from .efficientnet import CustomEfficientNet
        kwargs = dict(
            arch=cfg.get("arch", "b0"),
            out_indices=tuple(cfg.get("out_indices", (6,))),
            drop_path_rate=cfg.get("drop_path_rate", 0.0),
            with_cp=cfg.get("with_cp", True),
        )
        return CustomEfficientNet, kwargs
    if t == "SECONDFPN":
        from .second_fpn import SECONDFPN
        kwargs = dict(
            in_channels=tuple(cfg["in_channels"]),
            out_channels=tuple(cfg["out_channels"]),
            upsample_strides=tuple(cfg["upsample_strides"]),
        )
        return SECONDFPN, kwargs
    if t == "ViewTransformerLiftSplatShootVoxel":
        from .lss import ViewTransformerLiftSplatShootVoxel
        kwargs = dict(
            grid_config=dict(cfg["grid_config"]),
            data_config=dict(cfg["data_config"]),
            numC_input=cfg.get("numC_input", 512),
            numC_Trans=cfg.get("numC_Trans", 128),
            downsample=cfg.get("downsample", 16),
            cam_channels=cfg.get("cam_channels", 27),
            loss_depth_weight=cfg.get("loss_depth_weight", 1.0),
            loss_depth_type=cfg.get("loss_depth_type", "bce"),
            point_cloud_range=tuple(cfg["point_cloud_range"]) if cfg.get("point_cloud_range") else None,
        )
        return ViewTransformerLiftSplatShootVoxel, kwargs
    if t == "OccupancyEncoder":
        from .occnet import OccupancyEncoder
        kwargs = dict(
            in_channels=cfg.get("in_channels", 128),
            num_stage=cfg.get("num_stage", 4),
            block_numbers=tuple(cfg.get("block_numbers", (2, 2, 2, 2))),
            block_inplanes=tuple(cfg.get("block_inplanes", (128, 256, 512, 1024))),
            block_strides=tuple(cfg.get("block_strides", (1, 2, 2, 2))),
            out_indices=tuple(cfg.get("out_indices", (0, 1, 2, 3))),
            num_groups=cfg.get("norm_cfg", {}).get("num_groups", 32) if isinstance(cfg.get("norm_cfg"), dict) else 32,
            with_cp=cfg.get("with_cp", True),
        )
        return OccupancyEncoder, kwargs
    if t == "MSDeformAttnPixelDecoder3D":
        from .pixel_decoder import MSDeformAttnPixelDecoder3D
        enc = cfg.get("encoder", {}) or {}
        attn = (enc.get("transformerlayers", {}) or {}).get("attn_cfgs", {}) or {}
        kwargs = dict(
            in_channels=tuple(cfg["in_channels"]),
            strides=tuple(cfg.get("strides", (4, 8, 16, 32))),
            feat_channels=cfg.get("feat_channels", 256),
            out_channels=cfg.get("out_channels", 256),
            num_encoder_levels=attn.get("num_levels", 3),
            num_encoder_layers=enc.get("num_layers", 6),
            num_heads=attn.get("num_heads", 8),
            num_points=attn.get("num_points", 4),
            feedforward_channels=(enc.get("transformerlayers", {}) or {}).get("feedforward_channels"),
            pos_num_feats=int(cfg.get("positional_encoding", {}).get("num_feats", 0)) or None,
            num_groups=(cfg.get("norm_cfg") or {}).get("num_groups", 32),
            query_chunks=cfg.get("query_chunks", 1),
            gather_impl=cfg.get("gather_impl", "auto"),
        )
        return MSDeformAttnPixelDecoder3D, kwargs
    if t in ("Mask2FormerOccHead", "Mask2FormerNuscOccHead",
             "Mask2FormerNuscPanopticOccHead"):
        from .mask2former_head import (
            Mask2FormerNuscOccHead,
            Mask2FormerNuscPanopticOccHead,
            Mask2FormerOccHead,
        )
        dec = cfg.get("transformer_decoder", {}) or {}
        attn = (dec.get("transformerlayers", {}) or {}).get("attn_cfgs", {}) or {}
        kwargs = dict(
            feat_channels=cfg["feat_channels"],
            out_channels=cfg["out_channels"],
            num_occupancy_classes=cfg.get("num_occupancy_classes", 20),
            num_queries=cfg.get("num_queries", 100),
            num_heads=attn.get("num_heads", 8),
            num_decoder_layers=dec.get("num_layers", 9),
            feedforward_channels=(dec.get("transformerlayers", {}) or {}).get("feedforward_channels"),
            pooling_attn_mask=cfg.get("pooling_attn_mask", True),
            pos_num_feats=int(cfg.get("positional_encoding", {}).get("num_feats", 0)) or None,
            point_cloud_range=tuple(cfg["point_cloud_range"]) if cfg.get("point_cloud_range") else None,
            sample_weight_gamma=cfg.get("sample_weight_gamma", 0.25),
            loss_cls=dict(cfg.get("loss_cls") or {}),
            loss_mask=dict(cfg.get("loss_mask") or {}),
            loss_dice=dict(cfg.get("loss_dice") or {}),
        )
        if t == "Mask2FormerNuscPanopticOccHead":
            kwargs.update(
                stuff_indices=cfg.get("stuff_indices"),
                thing_indices=cfg.get("thing_indices"),
            )
            return Mask2FormerNuscPanopticOccHead, kwargs
        cls = Mask2FormerNuscOccHead if t == "Mask2FormerNuscOccHead" else Mask2FormerOccHead
        return cls, kwargs
    raise KeyError(f"no translation for component type {t}")


@DETECTORS.register_module()
class OccupancyFormer(nn.Module):
    """Full model.  ``__call__(batch)`` -> dict of outputs.

    batch keys: imgs [B,N,H,W,3], rots/trans/intrins/post_rots/post_trans,
    bda.  Output: cls_preds [L+1,B,Q,C+1], mask_embeds [L+1,B,Q,Cout],
    mask_feature [B,X,Y,Z,Cout] (mask logits = embed . feature, recomputed
    where needed), depth_prob [B*N,fH,fW,D].
    """

    img_backbone: Dict
    img_neck: Dict
    img_view_transformer: Dict
    img_bev_encoder_backbone: Dict
    img_bev_encoder_neck: Dict
    pts_bbox_head: Dict
    train_cfg: Any = None
    test_cfg: Any = None
    train: bool = False
    dtype: Any = jnp.float32
    # Opt-in replication of the reference's fp32 islands: @force_fp32 pins
    # the 3D encoder/neck (occupancyformer.py:37) and the view transformer's
    # splat + depth ops (ViewTransformerLSSVoxel.py:53,67) to fp32 even under
    # fp16.  Default False keeps bf16 through those stages (the TPU-native
    # choice); tests/test_fp32_islands.py bounds the numeric delta.
    force_fp32_islands: bool = False
    # Optional mesh axis name for spatially sharding the voxel volume (its X
    # axis) across chips — the SP/TP-style extension SURVEY.md §5 sketches
    # for grids that outgrow one chip's HBM.  GSPMD inserts the halo
    # exchanges for the 3D convs and the resharding around window attention.
    spatial_shard_axis: Any = None

    def setup(self):
        island = jnp.float32 if self.force_fp32_islands else self.dtype

        def build(cfg, dtype):
            cls, kwargs = translate_cfg(cfg, self.train, dtype)
            return cls(train=self.train, dtype=dtype, **kwargs)

        self.backbone = build(self.img_backbone, self.dtype)
        self.neck = build(self.img_neck, self.dtype)
        self.view_transformer = build(self.img_view_transformer, island)
        self.bev_backbone = build(self.img_bev_encoder_backbone, island)
        cls, kwargs = translate_cfg(self.img_bev_encoder_neck, self.train, island)
        self.bev_neck = cls(dtype=island, **kwargs)
        cls, kwargs = translate_cfg(self.pts_bbox_head, self.train, self.dtype)
        self.head = cls(dtype=self.dtype, **kwargs)

    def image_encoder(self, imgs):
        """[B, N, H, W, 3] -> [B, N, fH, fW, C] (reference :22-35)."""
        B, N, H, W, _ = imgs.shape
        x = imgs.reshape(B * N, H, W, 3)
        feats = self.backbone(x)
        x = self.neck(list(feats))
        fH, fW, C = x.shape[1:]
        return x.reshape(B, N, fH, fW, C)

    def _shard_volume(self, v):
        if self.spatial_shard_axis is None:
            return v
        from jax.sharding import PartitionSpec as P

        # [B(, ...), X, Y, Z, C]: batch over "data", X over the model axis
        spec = ("data", self.spatial_shard_axis) + (None,) * (v.ndim - 2)
        return jax.lax.with_sharding_constraint(v, P(*spec))

    def extract_feat(self, batch):
        x = self.image_encoder(batch["imgs"].astype(self.dtype))
        volume, depth_prob = self.view_transformer(
            x, batch["rots"], batch["trans"], batch["intrins"],
            batch["post_rots"], batch["post_trans"], batch["bda"],
        )
        # the reference forces the 3D encoder to fp32 (@force_fp32 :37); by
        # default we keep the compute dtype and rely on fp32 islands in the
        # losses, with `force_fp32_islands` restoring reference semantics
        scales = self.bev_backbone(
            self._shard_volume(volume.astype(self.bev_backbone.dtype)))
        voxel_feats = self.bev_neck([self._shard_volume(s) for s in scales])
        return voxel_feats, depth_prob

    def __call__(self, batch):
        voxel_feats, depth_prob = self.extract_feat(batch)
        cls_preds, mask_embeds, mask_feature = self.head(voxel_feats)
        return {
            "cls_preds": cls_preds,
            "mask_embeds": mask_embeds,
            "mask_feature": mask_feature,
            "depth_prob": depth_prob,
        }

    def depth_loss(self, gt_depth, depth_prob):
        return self.view_transformer.get_depth_loss(gt_depth, depth_prob)


@DETECTORS.register_module()
class OccupancyFormer4D(OccupancyFormer):
    """2-frame temporal variant (reference occupancyformer.py:256-312).

    The batch carries 2N cameras ([cur, prev] interleaved on the camera
    axis); each frame runs the image encoder + view transformer (the previous
    frame under stop_gradient), and the two voxel volumes concatenate on
    channels before the 3D encoder.  The reference quirk of feeding the key
    frame's sensor2ego into both frames' camera embeddings (:293-294) is kept.
    """

    def extract_feat(self, batch):
        imgs = batch["imgs"]
        B, N2, H, W, _ = imgs.shape
        N = N2 // 2
        imgs = imgs.reshape(B, N, 2, H, W, 3)

        def frame(i, stop_grad):
            sl = lambda a: a.reshape(B, N, 2, *a.shape[2:])[:, :, i]
            x = self.image_encoder(imgs[:, :, i].astype(self.dtype))
            volume, depth = self.view_transformer(
                x, sl(batch["rots"]), sl(batch["trans"]), sl(batch["intrins"]),
                sl(batch["post_rots"]), sl(batch["post_trans"]), batch["bda"],
            )
            if stop_grad:
                volume = jax.lax.stop_gradient(volume)
                depth = jax.lax.stop_gradient(depth)
            return volume, depth

        vol_cur, depth_cur = frame(0, stop_grad=False)
        vol_prev, _ = frame(1, stop_grad=True)
        volume = jnp.concatenate([vol_cur, vol_prev], axis=-1)
        scales = self.bev_backbone(volume.astype(self.bev_backbone.dtype))
        voxel_feats = self.bev_neck(scales)
        return voxel_feats, depth_cur
