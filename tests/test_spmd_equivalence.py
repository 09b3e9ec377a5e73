"""SPMD semantics check: a data-parallel-sharded train step must produce the
same updated parameters as the identical step on one device.

GSPMD partitioning is semantics-preserving by construction; what this guards
is OUR wiring — ``shard_batch`` slicing the right axis, params actually
replicated, the implicit gradient all-reduce, and global-batch BatchNorm
statistics (SyncBN parity) — on the 8-device virtual CPU mesh from conftest.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from occformer_tpu.engine.optim import build_optimizer, step_lr_schedule
from occformer_tpu.engine.train import TrainState, build_loss_cfg, build_train_step
from occformer_tpu.models.detector import OccupancyFormer
from occformer_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicate_sharding,
    shard_batch,
)

import tiny_cfg
from test_train_step import _train_batch


def _stack_batches(b1, b2):
    return {k: np.concatenate([b1[k], b2[k]], axis=0) for k in b1}


@pytest.mark.slow
@pytest.mark.quick
def test_dp_sharded_step_matches_single_device():
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
    batch = _stack_batches(_train_batch(np.random.RandomState(0)),
                           _train_batch(np.random.RandomState(1)))

    lr = step_lr_schedule(1e-4, steps_per_epoch=10, milestones_epochs=[20, 23])
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng, "dropout": rng}, batch)
    tx = build_optimizer(variables["params"], lr=lr, grad_clip=5.0)

    def fresh_state():
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(variables["params"]),
        )

    train_step = build_train_step(model, tx, loss_cfg)
    key = jax.random.PRNGKey(7)

    # single device
    ref_state, ref_metrics = jax.jit(train_step)(fresh_state(), batch, key)

    # 2-device data mesh
    mesh = make_mesh(("data",), devices=jax.devices()[:2])
    rep = replicate_sharding(mesh)
    with mesh:
        state = jax.device_put(fresh_state(), rep)
        sharded = shard_batch(batch, mesh)
        step_fn = jax.jit(train_step,
                          in_shardings=(rep, batch_sharding(mesh), rep))
        dp_state, dp_metrics = step_fn(state, sharded, key)

    np.testing.assert_allclose(float(ref_metrics["total_loss"]),
                               float(dp_metrics["total_loss"]),
                               rtol=1e-4, atol=1e-5)
    ref_leaves = jax.tree_util.tree_leaves_with_path(ref_state.params)
    dp_params = dp_state.params
    for path, leaf in ref_leaves:
        other = dp_params
        for p in path:
            other = other[p.key]
        # Adam's first update is ~sign(g)*lr, so fp-reassociation noise in a
        # near-zero gradient can flip a coordinate by up to 2*lr = 2e-4;
        # anything beyond that means real divergence (wrong slicing/psum).
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(other), rtol=0, atol=2.5e-4,
            err_msg=jax.tree_util.keystr(path))
    # batch_stats (SyncBN parity): global-batch statistics must match too
    if ref_state.batch_stats:
        ref_bs = jax.tree_util.tree_leaves_with_path(ref_state.batch_stats)
        for path, leaf in ref_bs:
            other = dp_state.batch_stats
            for p in path:
                other = other[p.key]
            np.testing.assert_allclose(
                np.asarray(leaf), np.asarray(other), rtol=1e-4, atol=1e-5,
                err_msg="batch_stats" + jax.tree_util.keystr(path))


@pytest.mark.slow
def test_spatial_model_axis_matches_single_device():
    """2-D (data x model) mesh with the voxel volume spatially sharded over
    the model axis (detector.spatial_shard_axis): forward logits must match
    the unsharded single-device forward — GSPMD halo exchanges and the
    resharding around window attention are semantics-preserving, and our
    constraint wiring must not change the math."""
    cfg = tiny_cfg.model_cfg()
    kw = {k: cfg[k] for k in (
        "img_backbone", "img_neck", "img_view_transformer",
        "img_bev_encoder_backbone", "img_bev_encoder_neck", "pts_bbox_head",
    )}
    batch = {k: np.concatenate([v, v], 0)
             for k, v in tiny_cfg.make_batch(np.random.RandomState(0)).items()}

    ref_model = OccupancyFormer(**kw, train=False)
    variables = ref_model.init(jax.random.PRNGKey(0), batch)
    ref_out = jax.jit(ref_model.apply)(variables, batch)

    sharded_model = OccupancyFormer(**kw, train=False,
                                    spatial_shard_axis="model")
    mesh = make_mesh(("data", "model"), shape=(2, 4),
                     devices=jax.devices()[:8])
    rep = replicate_sharding(mesh)
    with mesh:
        v = jax.device_put(variables, rep)
        b = shard_batch(batch, mesh)
        out = jax.jit(sharded_model.apply,
                      in_shardings=(rep, batch_sharding(mesh)))(v, b)

    for k in ("cls_preds", "mask_feature", "depth_prob"):
        np.testing.assert_allclose(
            np.asarray(ref_out[k], np.float32), np.asarray(out[k], np.float32),
            rtol=2e-4, atol=2e-4, err_msg=k)
