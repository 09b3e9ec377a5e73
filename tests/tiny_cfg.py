"""Tiny model/config fixtures shared by tests (CPU-sized OccupancyFormer)."""
import numpy as np

POINT_CLOUD_RANGE = [-8.0, -8.0, -2.0, 8.0, 8.0, 2.0]
OCC_SIZE = [32, 32, 16]  # full-resolution gt grid
VOXEL_GRID = [16, 16, 8]  # LSS volume (= occ / 2)
NUM_CLASSES = 5
INPUT_SIZE = (32, 64)
NUM_CAMS = 2
DOWNSAMPLE = 8

GRID_CONFIG = {
    "xbound": [-8.0, 8.0, 1.0],
    "ybound": [-8.0, 8.0, 1.0],
    "zbound": [-2.0, 2.0, 0.5],
    "dbound": [1.0, 9.0, 1.0],  # D = 8
}
DATA_CONFIG = {"input_size": INPUT_SIZE, "Ncams": NUM_CAMS}

NUMC_TRANS = 32
VOXEL_CHANNELS = [32, 32, 64, 64]
VOXEL_OUT = 48  # divisible by 3 (pos enc) and by 8 (GN groups below)
NUM_GROUPS = 8


def model_cfg():
    return dict(
        type="OccupancyFormer",
        img_backbone=dict(type="ResNet", depth=18, out_indices=(0, 1, 2, 3)),
        img_neck=dict(
            type="SECONDFPN",
            in_channels=[64, 128, 256, 512],
            upsample_strides=[0.5, 1, 2, 4],
            out_channels=[16, 16, 16, 16],
        ),
        img_view_transformer=dict(
            type="ViewTransformerLiftSplatShootVoxel",
            loss_depth_weight=1.0,
            grid_config=GRID_CONFIG,
            data_config=DATA_CONFIG,
            numC_input=64,
            numC_Trans=NUMC_TRANS,
            downsample=DOWNSAMPLE,
            point_cloud_range=POINT_CLOUD_RANGE,
        ),
        img_bev_encoder_backbone=dict(
            type="OccupancyEncoder",
            num_stage=4,
            in_channels=NUMC_TRANS,
            block_numbers=[1, 1, 1, 1],
            block_inplanes=VOXEL_CHANNELS,
            block_strides=[1, 2, 2, 2],
            out_indices=(0, 1, 2, 3),
            norm_cfg=dict(type="GN", num_groups=NUM_GROUPS),
            with_cp=False,
        ),
        img_bev_encoder_neck=dict(
            type="MSDeformAttnPixelDecoder3D",
            strides=[2, 4, 8, 16],
            in_channels=VOXEL_CHANNELS,
            feat_channels=VOXEL_OUT,
            out_channels=VOXEL_OUT,
            norm_cfg=dict(type="GN", num_groups=NUM_GROUPS),
            encoder=dict(
                num_layers=2,
                transformerlayers=dict(
                    attn_cfgs=dict(num_heads=4, num_levels=3, num_points=2),
                    feedforward_channels=VOXEL_OUT * 2,
                ),
            ),
            positional_encoding=dict(num_feats=VOXEL_OUT // 3),
        ),
        pts_bbox_head=dict(
            type="Mask2FormerNuscOccHead",
            feat_channels=VOXEL_OUT,
            out_channels=VOXEL_OUT,
            num_queries=8,
            num_occupancy_classes=NUM_CLASSES,
            pooling_attn_mask=True,
            point_cloud_range=POINT_CLOUD_RANGE,
            transformer_decoder=dict(
                num_layers=3,
                transformerlayers=dict(
                    attn_cfgs=dict(num_heads=4),
                    feedforward_channels=VOXEL_OUT * 2,
                ),
            ),
            positional_encoding=dict(num_feats=VOXEL_OUT // 3),
            loss_cls=dict(class_weight=[1.0] * NUM_CLASSES + [0.1], loss_weight=2.0),
            loss_mask=dict(loss_weight=5.0),
            loss_dice=dict(loss_weight=5.0, eps=1.0),
        ),
    )


def make_batch(rng, B=1):
    N = NUM_CAMS
    H, W = INPUT_SIZE
    intrins = np.tile(np.eye(3, dtype=np.float32), (B, N, 1, 1))
    intrins[..., 0, 0] = 30.0
    intrins[..., 1, 1] = 30.0
    intrins[..., 0, 2] = W / 2
    intrins[..., 1, 2] = H / 2
    rots = np.tile(np.eye(3, dtype=np.float32), (B, N, 1, 1))
    return {
        "imgs": rng.randn(B, N, H, W, 3).astype(np.float32),
        "rots": rots,
        "trans": rng.uniform(-1, 1, (B, N, 3)).astype(np.float32),
        "intrins": intrins,
        "post_rots": np.tile(np.eye(3, dtype=np.float32), (B, N, 1, 1)),
        "post_trans": np.zeros((B, N, 3), np.float32),
        "bda": np.tile(np.eye(3, dtype=np.float32), (B, 1, 1)),
    }
