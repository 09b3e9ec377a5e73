"""End-to-end forward smoke test on a tiny OccupancyFormer (CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from occformer_tpu.models.detector import OccupancyFormer

import tiny_cfg


@pytest.fixture(scope="module")
def model_and_params():
    cfg = tiny_cfg.model_cfg()
    model = OccupancyFormer(
        img_backbone=cfg["img_backbone"],
        img_neck=cfg["img_neck"],
        img_view_transformer=cfg["img_view_transformer"],
        img_bev_encoder_backbone=cfg["img_bev_encoder_backbone"],
        img_bev_encoder_neck=cfg["img_bev_encoder_neck"],
        pts_bbox_head=cfg["pts_bbox_head"],
    )
    batch = tiny_cfg.make_batch(np.random.RandomState(0))
    variables = model.init(jax.random.PRNGKey(0), batch)
    return model, variables, batch


@pytest.mark.quick
def test_forward_shapes(model_and_params):
    model, variables, batch = model_and_params
    out = jax.jit(lambda v, b: model.apply(v, b))(variables, batch)
    X, Y, Z = tiny_cfg.VOXEL_GRID
    L = 3 + 1  # decoder layers + initial proposal
    Q = 8
    C = tiny_cfg.NUM_CLASSES
    VOUT = tiny_cfg.VOXEL_OUT
    assert out["cls_preds"].shape == (L, 1, Q, C + 1)
    assert out["mask_embeds"].shape == (L, 1, Q, VOUT)
    assert out["mask_feature"].shape == (1, X, Y, Z, VOUT)
    from occformer_tpu.models.mask2former_head import mask_logits_from_embeds
    masks = mask_logits_from_embeds(out["mask_embeds"], out["mask_feature"])
    assert masks.shape == (L, 1, Q, X, Y, Z)
    D = 8
    fH, fW = (s // tiny_cfg.DOWNSAMPLE for s in tiny_cfg.INPUT_SIZE)
    assert out["depth_prob"].shape == (tiny_cfg.NUM_CAMS, fH, fW, D)
    for k, v in out.items():
        assert np.isfinite(np.asarray(v)).all(), k
    # depth distribution sums to one
    np.testing.assert_allclose(
        np.asarray(out["depth_prob"]).sum(-1), 1.0, rtol=1e-5
    )


def test_format_results_prob_simplex(model_and_params):
    from occformer_tpu.models.mask2former_head import (
        format_results, mask_logits_from_embeds,
    )

    model, variables, batch = model_and_params
    out = model.apply(variables, batch)
    final = mask_logits_from_embeds(out["mask_embeds"][-1], out["mask_feature"])
    voxels = format_results(out["cls_preds"][-1], final)
    X, Y, Z = tiny_cfg.VOXEL_GRID
    assert voxels.shape == (1, X, Y, Z, tiny_cfg.NUM_CLASSES)
    assert np.isfinite(np.asarray(voxels)).all()


def test_resnet_dcn_stages_forward():
    """R101-DCN path: DCNv2 stages produce the same shapes as plain convs."""
    from occformer_tpu.models.resnet import ResNet

    m = ResNet(depth=18, dcn_stages=(2, 3))
    x = jnp.zeros((1, 32, 64, 3))
    v = m.init(jax.random.PRNGKey(0), x)
    outs = m.apply(v, x)
    assert outs[2].shape == (1, 2, 4, 256)
    assert outs[3].shape == (1, 1, 2, 512)
    # DCN params present in stages 3-4 only
    p = v["params"]
    assert "conv_offset" in p["layer3_0"]["conv2"]
    assert "conv_offset" not in p["layer1_0"].get("conv2", {})
