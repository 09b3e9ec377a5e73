"""Temporal-capability tests: shift_feature alignment + 4D detector forward."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from occformer_tpu.models.lss import shift_feature

import tiny_cfg


@pytest.mark.quick
def test_shift_feature_identity():
    rng = np.random.RandomState(0)
    feat = jnp.asarray(rng.randn(1, 8, 8, 4).astype(np.float32))
    eye = jnp.eye(4)[None]
    bx = np.array([-3.5, -3.5])
    dx = np.array([1.0, 1.0])
    out = shift_feature(feat, eye, bx, dx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(feat), atol=1e-5)


def test_shift_feature_translation():
    rng = np.random.RandomState(0)
    feat = jnp.asarray(rng.randn(1, 8, 8, 2).astype(np.float32))
    # previous frame shifted one cell in +x: sampling position x+1
    t = jnp.eye(4).at[0, 3].set(1.0)[None]
    bx = np.array([0.0, 0.0])
    dx = np.array([1.0, 1.0])
    out = np.asarray(shift_feature(feat, t, bx, dx))
    # out[x] should equal feat[x+1] away from the border
    np.testing.assert_allclose(out[0, :7], np.asarray(feat)[0, 1:], atol=1e-5)


@pytest.mark.slow
def test_occupancyformer4d_forward():
    from occformer_tpu.models.detector import OccupancyFormer4D

    cfg = tiny_cfg.model_cfg()
    # 2 frames x 2 cams = 4 camera slots; encoder in_channels doubles
    cfg["img_bev_encoder_backbone"]["in_channels"] = 2 * tiny_cfg.NUMC_TRANS
    model = OccupancyFormer4D(
        **{k: cfg[k] for k in (
            "img_backbone", "img_neck", "img_view_transformer",
            "img_bev_encoder_backbone", "img_bev_encoder_neck", "pts_bbox_head",
        )}
    )
    rng = np.random.RandomState(0)
    b1 = tiny_cfg.make_batch(rng)
    batch = {
        k: np.concatenate([v, v], axis=1) if k != "bda" else v
        for k, v in b1.items()
    }
    variables = model.init(jax.random.PRNGKey(0), batch)
    out = model.apply(variables, batch)
    X, Y, Z = tiny_cfg.VOXEL_GRID
    assert out["mask_feature"].shape[1:4] == (X, Y, Z)
    assert np.isfinite(np.asarray(out["cls_preds"])).all()
