"""KITTI-style end-to-end smoke: EfficientNet backbone, mono camera, 3x4
projective intrinsics, 4x4 BDA (translation about the range center), KITTI
Mask2Former head — assembled through OccupancyFormer exactly like the
occformer_kitti config (reference projects/configs/occformer_kitti/
occformer_kitti.py:64-120), at tiny spatial sizes.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from occformer_tpu.models.detector import OccupancyFormer

import tiny_cfg

INPUT = (64, 64)
D = 8


def _kitti_model_cfg():
    cfg = tiny_cfg.model_cfg()
    cfg["img_backbone"] = dict(type="CustomEfficientNet", arch="b0",
                               out_indices=(2, 3, 4, 5, 6))
    # b0 channels at (2,3,4,5,6): 24, 40, 112, 320, 1280; strides 4/8/16/32/32
    cfg["img_neck"] = dict(
        type="SECONDFPN",
        in_channels=[24, 40, 112, 320, 1280],
        upsample_strides=[0.25, 0.5, 1, 2, 2],
        out_channels=[16] * 5,
    )
    vt = cfg["img_view_transformer"]
    vt["numC_input"] = 80
    vt["downsample"] = 16
    vt["data_config"] = {"input_size": INPUT, "Ncams": 1}
    cfg["pts_bbox_head"]["type"] = "Mask2FormerOccHead"
    return cfg


def _kitti_batch(rng, B=1):
    H, W = INPUT
    # homogeneous 3x4 projection (P2-style): K [3x3] + shift column
    intrins = np.zeros((B, 1, 3, 4), np.float32)
    intrins[..., 0, 0] = 40.0
    intrins[..., 1, 1] = 40.0
    intrins[..., 0, 2] = W / 2
    intrins[..., 1, 2] = H / 2
    intrins[..., 2, 2] = 1.0
    intrins[..., 0, 3] = 2.0  # stereo baseline shift
    bda = np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))
    bda[:, 0, 0] = -1.0  # x-flip about the range center
    bda[:, 0, 3] = 0.5
    return {
        "imgs": rng.randn(B, 1, H, W, 3).astype(np.float32),
        "rots": np.tile(np.eye(3, dtype=np.float32), (B, 1, 1, 1)),
        "trans": rng.uniform(-1, 1, (B, 1, 3)).astype(np.float32),
        "intrins": intrins,
        "post_rots": np.tile(np.eye(3, dtype=np.float32), (B, 1, 1, 1)),
        "post_trans": np.zeros((B, 1, 3), np.float32),
        "bda": bda,
    }


@pytest.mark.slow
@pytest.mark.quick
def test_kitti_style_forward():
    cfg = _kitti_model_cfg()
    model = OccupancyFormer(
        **{k: cfg[k] for k in (
            "img_backbone", "img_neck", "img_view_transformer",
            "img_bev_encoder_backbone", "img_bev_encoder_neck", "pts_bbox_head",
        )},
        train=False,
    )
    batch = _kitti_batch(np.random.RandomState(0))
    variables = model.init(jax.random.PRNGKey(0), batch)
    out = model.apply(variables, batch)

    X, Y, Z = tiny_cfg.VOXEL_GRID
    nq = cfg["pts_bbox_head"]["num_queries"]
    ncls = tiny_cfg.NUM_CLASSES
    assert out["cls_preds"].shape == (4, 1, nq, ncls + 1)
    assert out["mask_feature"].shape[1:4] == (X, Y, Z)
    assert out["depth_prob"].shape == (1, INPUT[0] // 16, INPUT[1] // 16, D)
    for k in ("cls_preds", "mask_embeds", "mask_feature", "depth_prob"):
        assert np.all(np.isfinite(np.asarray(out[k], np.float32))), k
