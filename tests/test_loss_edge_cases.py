"""Edge cases for the mask2former loss: zero-match, missing classes, panoptic."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from occformer_tpu.losses.mask2former_loss import (
    MaskLossConfig,
    mask2former_loss,
    preprocess_gt,
)


def _cfg(num_classes=4, use_lidar=True):
    return MaskLossConfig(
        num_classes=num_classes,
        num_points=16,
        oversample_ratio=2.0,
        class_weight=tuple([1.0] * num_classes + [0.1]),
        sample_weights=None if use_lidar else tuple([1.0] * num_classes),
        use_lidar_points=use_lidar,
        align_corners=not use_lidar,
    )


def _outputs(rng, L=2, B=1, Q=6, C=4, vol=(8, 8, 4), cout=12):
    cls = jnp.asarray(rng.randn(L, B, Q, C + 1).astype(np.float32))
    emb = jnp.asarray(rng.randn(L, B, Q, cout).astype(np.float32) * 0.1)
    feat = jnp.asarray(rng.randn(B, *vol, cout).astype(np.float32) * 0.1)
    return cls, emb, feat


def test_zero_match_all_invalid_gt(rng):
    """gt all 255 -> no valid slots -> mask/dice losses are exactly 0
    (reference zero-match branch, mask2former_occ.py:403-407)."""
    cfg = _cfg()
    cls, emb, feat = _outputs(rng)
    gt = jnp.full((1, 16, 16, 8), 255, jnp.int32)
    lidar = jnp.asarray(rng.rand(1, 32, 3).astype(np.float32))
    valid = jnp.ones((1, 32), bool)
    losses = mask2former_loss(jax.random.PRNGKey(0), cls, emb, feat, gt, cfg,
                              lidar_xyz=lidar, lidar_valid=valid)
    assert float(losses["loss_mask"]) == 0.0
    assert float(losses["loss_dice"]) == 0.0
    assert np.isfinite(float(losses["loss_cls"]))
    # with no matches every query is background; cls loss = weighted bg CE
    assert float(losses["loss_cls"]) > 0


def test_loss_finite_kitti_path(rng):
    cfg = _cfg(use_lidar=False)
    cls, emb, feat = _outputs(rng)
    gt = jnp.asarray(rng.randint(0, 4, (1, 8, 8, 4)).astype(np.int32))
    losses = mask2former_loss(jax.random.PRNGKey(0), cls, emb, feat, gt, cfg)
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    assert float(losses["loss_dice"]) > 0


def test_missing_classes_are_masked(rng):
    """A grid containing only class 1 must yield exactly one valid slot."""
    gt = jnp.ones((1, 8, 8, 4), jnp.int32)
    masks, labels, valid = preprocess_gt(gt, 4)
    np.testing.assert_array_equal(np.asarray(valid)[0], [False, True, False, False])
    assert float(jnp.asarray(masks, jnp.float32)[0, 1].sum()) == 8 * 8 * 4


def test_deterministic_given_rng(rng):
    cfg = _cfg()
    cls, emb, feat = _outputs(rng)
    gt = jnp.asarray(rng.randint(0, 4, (1, 16, 16, 8)).astype(np.int32))
    lidar = jnp.asarray(rng.rand(1, 32, 3).astype(np.float32))
    valid = jnp.ones((1, 32), bool)
    l1 = mask2former_loss(jax.random.PRNGKey(7), cls, emb, feat, gt, cfg,
                          lidar_xyz=lidar, lidar_valid=valid)
    l2 = mask2former_loss(jax.random.PRNGKey(7), cls, emb, feat, gt, cfg,
                          lidar_xyz=lidar, lidar_valid=valid)
    for k in l1:
        assert float(l1[k]) == float(l2[k]), k


def test_gt_chunks_bit_transparent(rng):
    """gt_chunks is a pure remat/memory lever: losses AND gradients are
    identical to the unchunked path (the random-fill coords are pre-drawn
    for all slots, so chunking never changes an rng draw)."""
    import dataclasses

    cfg1 = _cfg(use_lidar=True)
    cfg3 = dataclasses.replace(cfg1, gt_chunks=3)
    cls, emb, feat = _outputs(rng)
    gt = jnp.asarray(rng.randint(0, 4, (1, 16, 16, 8)).astype(np.int32))
    lidar = jnp.asarray(rng.rand(1, 32, 3).astype(np.float32))
    valid = jnp.ones((1, 32), bool)

    def run(cfg, emb_, feat_):
        return mask2former_loss(jax.random.PRNGKey(3), cls, emb_, feat_, gt,
                                cfg, lidar_xyz=lidar, lidar_valid=valid)

    l1 = run(cfg1, emb, feat)
    l3 = run(cfg3, emb, feat)
    assert set(l1) == set(l3)
    for k in l1:
        np.testing.assert_allclose(float(l1[k]), float(l3[k]), rtol=1e-6,
                                   err_msg=k)

    def total(cfg):
        def f(args):
            emb_, feat_ = args
            return sum(run(cfg, emb_, feat_).values())
        return jax.grad(f)((emb, feat))

    g1 = total(cfg1)
    g3 = total(cfg3)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g3)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
