"""Training step: one jittable function over a data-parallel mesh.

Replaces the reference's EpochBasedRunner + MMDistributedDataParallel stack
(apis/mmdet_train.py:29-199): the train step is a pure function
(params, batch, rng) -> (params', metrics) compiled once by XLA; data
parallelism is expressed by sharding the batch over the mesh's ``data`` axis
(jax.sharding) — gradient all-reduce is inserted by the SPMD partitioner, the
ICI replacement for NCCL DDP (SURVEY.md §2.5).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import flax
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..losses.mask2former_loss import (
    MaskLossConfig, mask2former_loss, preprocess_panoptic_gt,
)
from ..models.lss import depth_bce_loss
from ..utils.semkitti import kitti_class_weights, kitti_sample_weights


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def build_loss_cfg(head_cfg: Dict, train_cfg: Dict) -> MaskLossConfig:
    """Derive the static loss config from the model config dicts.

    Mirrors the head __init__ bookkeeping: KITTI heads replace the config
    class_weight with 1/log(freq) weights (mask2former_occ.py:133-142); nusc
    heads keep the config list (mask2former_nusc_occ.py:134).
    """
    head_cfg = dict(head_cfg)
    train_cfg = dict(train_cfg or {})
    num_classes = head_cfg.get("num_occupancy_classes", 20)
    is_nusc = head_cfg.get("type", "").startswith("Mask2FormerNusc")
    loss_cls = dict(head_cfg.get("loss_cls") or {})
    if is_nusc:
        class_weight = tuple(loss_cls.get("class_weight", (1.0,) * num_classes + (0.1,)))
        sample_weights = None
    else:
        bg = loss_cls.get("class_weight", [1.0] * num_classes + [0.1])[-1]
        class_weight = tuple(kitti_class_weights(bg).tolist())
        sample_weights = tuple(kitti_sample_weights().tolist())

    assigner = dict(train_cfg.get("assigner") or {})
    return MaskLossConfig(
        num_classes=num_classes,
        num_points=train_cfg.get("num_points", 12544),
        oversample_ratio=train_cfg.get("oversample_ratio", 3.0),
        importance_sample_ratio=train_cfg.get("importance_sample_ratio", 0.75),
        cls_loss_weight=loss_cls.get("loss_weight", 2.0),
        mask_loss_weight=(head_cfg.get("loss_mask") or {}).get("loss_weight", 5.0),
        dice_loss_weight=(head_cfg.get("loss_dice") or {}).get("loss_weight", 5.0),
        cls_cost_weight=(assigner.get("cls_cost") or {}).get("weight", 2.0),
        mask_cost_weight=(assigner.get("mask_cost") or {}).get("weight", 5.0),
        dice_cost_weight=(assigner.get("dice_cost") or {}).get("weight", 5.0),
        dice_eps=(head_cfg.get("loss_dice") or {}).get("eps", 1.0),
        align_corners=not is_nusc,  # see MaskLossConfig docstring
        class_weight=class_weight,
        sample_weights=sample_weights,
        sample_weight_gamma=head_cfg.get("sample_weight_gamma", 0.25),
        use_lidar_points=is_nusc,
        point_cloud_range=tuple(head_cfg["point_cloud_range"])
        if head_cfg.get("point_cloud_range") else None,
        panoptic=head_cfg.get("type") == "Mask2FormerNuscPanopticOccHead",
        # panoptic pads to ~100 gt slots (vs 17 semantic class slots); chunk
        # the supervision sampling so its temps stay at semantic scale
        # (2 chunks measured best: more unrolled chunks inflate generated
        # code, which counts against the same 15.75G HBM as the temps)
        gt_chunks=int(head_cfg.get(
            "gt_chunks",
            2 if head_cfg.get("type") == "Mask2FormerNuscPanopticOccHead"
            else 1)),
        # optional matching-point cap (detached cost only; see
        # MaskLossConfig.match_num_points) — safe-mode lever for the axon
        # panoptic exec-2 instability at [G~100, P~50k]
        match_num_points=train_cfg.get("match_num_points"),
        # chunk the differentiated supervision readout over the point axis
        # (numerically identical; keeps each backward trilinear-scatter
        # inside the axon-stable [G~100, P<~40k] envelope — see
        # MaskLossConfig.point_chunks)
        point_chunks=int(head_cfg.get("point_chunks", 1)),
        # feature-space point readout (lidar heads): sample the single
        # [X, Y, Z, C] feature volume and contract with the embeds instead
        # of forming per-query/per-slot mask volumes — exact identity, no
        # [G, P] backward trilinear-scatter family (MaskLossConfig docs).
        # Default ON for lidar heads since round 4: together with
        # shared_candidate_readout it removes the dominant per-slot loss
        # gathers (.probe_loss_gathers.json) — the volume path stays as the
        # reference-shaped fallback (feature_readout=False in the config).
        feature_readout=bool(head_cfg.get("feature_readout", is_nusc)),
        shared_candidate_readout=bool(
            head_cfg.get("shared_candidate_readout", True)),
        # all-layer batched MXU volume readout (round 5): 'auto' resolves
        # per backend in _resolve_mxu_readout; configs may force
        # 'on'/'off'/'interpret' (the latter = CPU kernel coverage)
        mxu_readout=str(head_cfg.get("mxu_readout", "auto")),
    )


def _train_point_miou_device(out, batch, num_classes: int) -> jnp.ndarray:
    """Device-side train-time LiDAR-seg mean IoU on the current batch.

    The reference logs ``point_mean_iou`` every iteration
    (mask2former_nusc_occ.py:524-540: final-layer formatted voxels, trilinear
    readout at the LiDAR points with align_corners=True/border, argmax over
    fg classes, fast_hist_crop to classes 1..16, nanmean per-class IoU); it
    is a metric only — mmcv sums only dict keys containing 'loss'.
    """
    from ..models.mask2former_head import format_results, mask_logits_from_embeds
    from ..ops.sampling import grid_sample_3d

    voxels = format_results(
        out["cls_preds"][-1],
        mask_logits_from_embeds(out["mask_embeds"][-1], out["mask_feature"]))
    coords = jnp.asarray(batch["lidar_xyz"]) * 2.0 - 1.0
    logits = grid_sample_3d(voxels, coords, align_corners=True,
                            padding_mode="border")
    pred = jnp.argmax(logits[..., 1:], axis=-1) + 1
    label = jnp.asarray(batch["lidar_label"])
    lv = jnp.asarray(batch["lidar_valid"]) & (label > 0) & (label < num_classes)
    n = num_classes
    idx = jnp.where(lv, label * n + pred, n * n)
    cm = jnp.bincount(idx.reshape(-1), length=n * n + 1)[:-1]
    cm = cm.reshape(n, n)[1:, 1:].astype(jnp.float32)
    tp = jnp.diagonal(cm)
    denom = cm.sum(0) + cm.sum(1) - tp
    iou = jnp.where(denom > 0, tp / jnp.maximum(denom, 1), jnp.nan)
    return jnp.nanmean(iou)


def build_train_step(
    model,
    tx: optax.GradientTransformation,
    loss_cfg: MaskLossConfig,
    accum_steps: int = 1,
) -> Callable:
    """Returns train_step(state, batch, rng) -> (state, metrics).

    batch: imgs/rots/trans/intrins/post_rots/post_trans/bda (+ gt_depth
    [B,N,H,W], gt_occ [B,X,Y,Z] int, optional lidar_xyz [B,P,3] in [0,1] and
    lidar_valid [B,P]).

    ``accum_steps > 1`` enables gradient accumulation: the batch's leading
    axis (must be ``accum_steps * micro_B``) is split into microbatches,
    gradients are averaged over a ``lax.scan`` before ONE optimizer update —
    the effective-batch scaling path when one sample already fills a chip's
    HBM (the flagship train step OOMs at B=2 per chip, NOTES.md).  BatchNorm
    statistics thread through the scan, so each microbatch updates the
    running stats exactly as ``accum_steps`` sequential B=micro_B steps would.
    """

    def loss_fn(params, batch_stats, batch, rng):
        variables = {"params": params, "batch_stats": batch_stats}
        drop_rng, loss_rng = jax.random.split(rng)
        out, mutated = model.apply(
            variables, batch, mutable=["batch_stats"], rngs={"dropout": drop_rng}
        )
        gt_override = None
        if loss_cfg.panoptic:
            # voxel ids are class*1000+instance; the padded per-sample
            # unique-id table comes from the data pipeline
            # (LoadNuscPanopticOccupancyAnnotations)
            gt_override = preprocess_panoptic_gt(
                batch["gt_occ"], batch["panoptic_ids"], loss_cfg.num_classes)
        losses = mask2former_loss(
            loss_rng,
            out["cls_preds"],
            out["mask_embeds"],
            out["mask_feature"],
            batch["gt_occ"],
            loss_cfg,
            lidar_xyz=batch.get("lidar_xyz"),
            lidar_valid=batch.get("lidar_valid"),
            gt_override=gt_override,
        )
        vt_cfg = dict(model.img_view_transformer)
        losses["loss_depth"] = depth_bce_loss(
            batch["gt_depth"], out["depth_prob"],
            dict(vt_cfg["grid_config"]), vt_cfg.get("downsample", 16),
            vt_cfg.get("loss_depth_weight", 1.0),
        )
        # mmcv _parse_losses semantics: only keys containing 'loss' are
        # summed; other entries (point_mean_iou) are logged-only metrics
        total = sum(v for k, v in losses.items() if "loss" in k)
        if loss_cfg.use_lidar_points and "lidar_label" in batch \
                and not loss_cfg.panoptic:
            losses["point_mean_iou"] = _train_point_miou_device(
                jax.lax.stop_gradient(out), batch, loss_cfg.num_classes)
        return total, (losses, mutated["batch_stats"])

    def train_step(state: TrainState, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        if accum_steps == 1:
            (total, (losses, new_bs)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params, state.batch_stats, batch, rng)
        else:
            def split_micro(x):
                B = x.shape[0]
                assert B % accum_steps == 0, (
                    f"batch {B} not divisible by accum_steps {accum_steps}")
                return x.reshape(accum_steps, B // accum_steps, *x.shape[1:])

            micro = {k: split_micro(v) for k, v in batch.items()}

            def body(carry, xs):
                bs, grad_sum, loss_sum, total_sum = carry
                mb, mrng = xs
                (tot, (ls, new_bs)), g = jax.value_and_grad(
                    loss_fn, has_aux=True
                )(state.params, bs, mb, mrng)
                grad_sum = jax.tree_util.tree_map(jnp.add, grad_sum, g)
                loss_sum = jax.tree_util.tree_map(jnp.add, loss_sum, ls)
                return (new_bs, grad_sum, loss_sum, total_sum + tot), None

            zero_grads = jax.tree_util.tree_map(
                lambda p: jnp.zeros(p.shape, jnp.promote_types(p.dtype, jnp.float32)),
                state.params)
            # trace once to get the loss-dict structure for the accumulator
            zero_losses = jax.eval_shape(
                lambda: loss_fn(state.params, state.batch_stats,
                                {k: v[0] for k, v in micro.items()}, rng)[1][0])
            zero_losses = jax.tree_util.tree_map(
                lambda s: jnp.zeros(s.shape, s.dtype), zero_losses)
            rngs = jax.random.split(rng, accum_steps)
            (new_bs, grad_sum, loss_sum, total_sum), _ = jax.lax.scan(
                body, (state.batch_stats, zero_grads, zero_losses,
                       jnp.zeros((), jnp.float32)), (micro, rngs))
            inv = 1.0 / accum_steps
            grads = jax.tree_util.tree_map(lambda g: g * inv, grad_sum)
            losses = jax.tree_util.tree_map(lambda l: l * inv, loss_sum)
            total = total_sum * inv
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = dict(losses)
        metrics["total_loss"] = total
        metrics["grad_norm"] = optax.global_norm(grads)
        return (
            TrainState(step=state.step + 1, params=new_params,
                       batch_stats=new_bs, opt_state=new_opt),
            metrics,
        )

    return train_step


def init_train_state(model, tx, batch, rng) -> TrainState:
    variables = model.init(rng, batch)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
    )
