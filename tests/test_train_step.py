"""One full training step on the tiny model: losses finite, params update."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from occformer_tpu.engine.optim import build_optimizer, step_lr_schedule
from occformer_tpu.engine.train import (
    TrainState,
    build_loss_cfg,
    build_train_step,
    init_train_state,
)
from occformer_tpu.models.detector import OccupancyFormer

import tiny_cfg


def _train_batch(rng):
    batch = tiny_cfg.make_batch(rng)
    B = 1
    N, (H, W) = tiny_cfg.NUM_CAMS, tiny_cfg.INPUT_SIZE
    X, Y, Z = tiny_cfg.OCC_SIZE
    gt_occ = rng.randint(0, tiny_cfg.NUM_CLASSES, size=(B, X, Y, Z)).astype(np.int32)
    gt_occ[0, :2] = 255  # some invalid voxels
    depth = rng.uniform(0, 10, size=(B, N, H, W)).astype(np.float32)
    depth[depth < 3] = 0.0  # sparse
    P = 128
    lidar = rng.uniform(0, 1, size=(B, P, 3)).astype(np.float32)
    lidar_valid = np.ones((B, P), bool)
    lidar_valid[:, 100:] = False
    lidar_label = rng.randint(
        0, tiny_cfg.NUM_CLASSES, size=(B, P)).astype(np.int32)
    batch.update(gt_occ=gt_occ, gt_depth=depth, lidar_xyz=lidar,
                 lidar_valid=lidar_valid, lidar_label=lidar_label)
    return batch


@pytest.mark.slow
@pytest.mark.quick
def test_train_step_updates_params():
    cfg = tiny_cfg.model_cfg()
    model = OccupancyFormer(
        **{k: cfg[k] for k in (
            "img_backbone", "img_neck", "img_view_transformer",
            "img_bev_encoder_backbone", "img_bev_encoder_neck", "pts_bbox_head",
        )},
        train=True,
    )
    loss_cfg = build_loss_cfg(
        cfg["pts_bbox_head"],
        dict(num_points=64, oversample_ratio=2.0, importance_sample_ratio=0.75),
    )
    batch = _train_batch(np.random.RandomState(0))

    lr = step_lr_schedule(1e-4, steps_per_epoch=10, milestones_epochs=[20, 23])
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng, "dropout": rng}, batch)
    tx = build_optimizer(variables["params"], lr=lr, grad_clip=5.0)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
    )
    train_step = build_train_step(model, tx, loss_cfg)
    step = jax.jit(train_step)
    new_state, metrics = step(state, batch, jax.random.PRNGKey(1))

    for k, v in metrics.items():
        assert np.isfinite(np.asarray(v)), f"{k} not finite: {v}"
    assert float(metrics["total_loss"]) > 0
    # every loss key present (3 intermediate layers + final + depth)
    assert {"loss_cls", "loss_mask", "loss_dice", "loss_depth"} <= set(metrics)
    assert "d0.loss_cls" in metrics
    # train-time metric (reference point_mean_iou), logged but NOT summed
    assert "point_mean_iou" in metrics
    assert 0.0 <= float(metrics["point_mean_iou"]) <= 1.0
    loss_sum = sum(float(v) for k, v in metrics.items()
                   if "loss" in k and k != "total_loss")
    np.testing.assert_allclose(float(metrics["total_loss"]), loss_sum,
                               rtol=1e-5)
    # params actually moved
    diff = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), state.params, new_state.params
    )
    assert max(jax.tree_util.tree_leaves(diff)) > 0

    # second step runs from the new state (shapes stable, no recompile error)
    new_state2, metrics2 = step(new_state, batch, jax.random.PRNGKey(1))
    assert int(new_state2.step) == 2


@pytest.mark.slow
def test_train_step_gradient_accumulation():
    """accum_steps=2 on a duplicated-sample B=2 batch: runs under jit,
    produces finite averaged losses, updates params, and is deterministic."""
    cfg = tiny_cfg.model_cfg()
    model = OccupancyFormer(
        **{k: cfg[k] for k in (
            "img_backbone", "img_neck", "img_view_transformer",
            "img_bev_encoder_backbone", "img_bev_encoder_neck", "pts_bbox_head",
        )},
        train=True,
    )
    loss_cfg = build_loss_cfg(
        cfg["pts_bbox_head"],
        dict(num_points=64, oversample_ratio=2.0, importance_sample_ratio=0.75),
    )
    b1 = _train_batch(np.random.RandomState(0))
    batch = {k: np.concatenate([b1[k], b1[k]], axis=0) for k in b1}

    lr = step_lr_schedule(1e-4, steps_per_epoch=10, milestones_epochs=[20, 23])
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng, "dropout": rng}, b1)
    tx = build_optimizer(variables["params"], lr=lr, grad_clip=5.0)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
    )
    step = jax.jit(build_train_step(model, tx, loss_cfg, accum_steps=2))
    new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
    for k, v in metrics.items():
        assert np.isfinite(np.asarray(v)), f"{k} not finite: {v}"
    diff = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), state.params,
        new_state.params)
    assert max(jax.tree_util.tree_leaves(diff)) > 0
    # deterministic
    new_state2, metrics2 = step(state, batch, jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(metrics["total_loss"]),
                               float(metrics2["total_loss"]), rtol=0, atol=0)


@pytest.mark.slow
def test_training_memorizes_fixed_batch():
    """End-to-end learning signal: ~100 steps on one fixed batch must reduce
    the total loss clearly (gradients correctly wired through every branch:
    depth BCE, matching, CE/dice on sampled points, BN/dropout rngs)."""
    cfg = tiny_cfg.model_cfg()
    model = OccupancyFormer(
        **{k: cfg[k] for k in (
            "img_backbone", "img_neck", "img_view_transformer",
            "img_bev_encoder_backbone", "img_bev_encoder_neck", "pts_bbox_head",
        )},
        train=True,
    )
    loss_cfg = build_loss_cfg(
        cfg["pts_bbox_head"],
        dict(num_points=64, oversample_ratio=2.0, importance_sample_ratio=0.75),
    )
    batch = _train_batch(np.random.RandomState(0))
    lr = step_lr_schedule(3e-4, steps_per_epoch=1000, milestones_epochs=[900])
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng, "dropout": rng}, batch)
    tx = build_optimizer(variables["params"], lr=lr, grad_clip=5.0)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
    )
    step = jax.jit(build_train_step(model, tx, loss_cfg))
    losses = []
    key = jax.random.PRNGKey(3)
    for _ in range(100):
        state, metrics = step(state, batch, key)
        losses.append(float(metrics["total_loss"]))
    first = np.mean(losses[:10])
    last = np.mean(losses[-10:])
    assert np.isfinite(last)
    assert last < 0.8 * first, f"no learning: first10={first:.3f} last10={last:.3f}"


@pytest.mark.slow
def test_train_step_panoptic():
    """Panoptic head: GT slots come from the padded panoptic_ids table
    (class*1000+instance), wired via loss_cfg.panoptic -> gt_override."""
    cfg = tiny_cfg.model_cfg()
    head = dict(cfg["pts_bbox_head"])
    head["type"] = "Mask2FormerNuscPanopticOccHead"
    cfg["pts_bbox_head"] = head
    model = OccupancyFormer(
        **{k: cfg[k] for k in (
            "img_backbone", "img_neck", "img_view_transformer",
            "img_bev_encoder_backbone", "img_bev_encoder_neck", "pts_bbox_head",
        )},
        train=True,
    )
    loss_cfg = build_loss_cfg(
        head, dict(num_points=64, oversample_ratio=2.0))
    assert loss_cfg.panoptic

    rng = np.random.RandomState(0)
    batch = _train_batch(rng)
    X, Y, Z = tiny_cfg.OCC_SIZE
    # panoptic voxel ids: a few class*1000+instance objects + empty(0)/noise
    ids = np.array([1001, 1002, 2001, 3001], np.int32)
    gt = np.zeros((1, X, Y, Z), np.int32)
    flat = rng.randint(0, len(ids) + 1, size=gt.size)
    gt.reshape(-1)[flat > 0] = ids[flat[flat > 0] - 1]
    gt[0, 0, 0, :] = 65535  # noise -> ignored
    pad = np.full((1, 8), -1, np.int64)
    pad[0, : len(ids)] = ids
    batch["gt_occ"] = gt
    batch["panoptic_ids"] = pad

    lr = step_lr_schedule(1e-4, steps_per_epoch=10, milestones_epochs=[20, 23])
    key = jax.random.PRNGKey(0)
    variables = model.init({"params": key, "dropout": key}, batch)
    tx = build_optimizer(variables["params"], lr=lr, grad_clip=5.0)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
    )
    step = jax.jit(build_train_step(model, tx, loss_cfg))
    new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
    for k, v in metrics.items():
        assert np.isfinite(np.asarray(v)), f"{k} not finite: {v}"
    assert float(metrics["total_loss"]) > 0
    diff = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), state.params,
        new_state.params)
    assert max(jax.tree_util.tree_leaves(diff)) > 0


def test_train_step_production_kernels_interpret():
    """E2E train step with the PRODUCTION Pallas kernels in interpret mode
    (VERDICT r4 #6): gather_impl='mxu_interpret' through the pixel decoder
    (fused multi-level trilerp) + mxu_readout='interpret' through the loss
    (all-layer batched volume readout).  The exact code path that runs on
    the chip executes in-graph off-TPU: losses finite and equal to the XLA
    path's within f32 reassociation tolerance."""
    cfg = tiny_cfg.model_cfg()
    cfg["img_bev_encoder_neck"]["gather_impl"] = "mxu_interpret"
    cfg["pts_bbox_head"]["mxu_readout"] = "interpret"
    cfg_x = tiny_cfg.model_cfg()

    def run(cfg_i):
        model = OccupancyFormer(
            **{k: cfg_i[k] for k in (
                "img_backbone", "img_neck", "img_view_transformer",
                "img_bev_encoder_backbone", "img_bev_encoder_neck",
                "pts_bbox_head",
            )},
            train=True,
        )
        loss_cfg = build_loss_cfg(
            cfg_i["pts_bbox_head"],
            dict(num_points=64, oversample_ratio=2.0,
                 importance_sample_ratio=0.75),
        )
        batch = _train_batch(np.random.RandomState(0))
        lr = step_lr_schedule(1e-4, steps_per_epoch=10,
                              milestones_epochs=[20, 23])
        rng = jax.random.PRNGKey(0)
        variables = model.init({"params": rng, "dropout": rng}, batch)
        tx = build_optimizer(variables["params"], lr=lr, grad_clip=5.0)
        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(variables["params"]),
        )
        step = jax.jit(build_train_step(model, tx, loss_cfg))
        new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
        return state, new_state, metrics

    state, new_state, metrics = run(cfg)
    for k, v in metrics.items():
        assert np.isfinite(np.asarray(v)), f"{k} not finite: {v}"
    diff = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), state.params,
        new_state.params)
    assert max(jax.tree_util.tree_leaves(diff)) > 0

    # kernel path == XLA path at the loss level (same rng, same batch);
    # the deform-attn gather difference is f32 accumulation order only.
    # grad_norm aggregates every parameter's reassociation noise through
    # a square-root of squares, so it gets a looser bound (0.6% observed).
    _, _, metrics_x = run(cfg_x)
    for k in metrics_x:
        tol = 2e-2 if k == "grad_norm" else 5e-3
        np.testing.assert_allclose(
            float(metrics[k]), float(metrics_x[k]), rtol=tol, atol=1e-4,
            err_msg=k)
