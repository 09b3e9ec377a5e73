"""Evaluation loops: LiDAR-seg confusion matrices + SSC metrics, on device.

Replaces the reference's custom_single/multi_gpu_test
(apis/test.py:22-105,107-212): the per-sample forward, the point readout and
the confusion-matrix accumulation are one jitted function; cross-device
reduction is a psum over the data axis instead of dist.all_reduce
(apis/test.py:209).  Host code only aggregates numpy scalars.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.mask2former_head import format_results, mask_logits_from_embeds
from ..ops.sampling import grid_sample_3d, resize_trilinear
from ..utils.metrics import SSCMetrics, cm_to_ious


def lidarseg_point_logits(
    voxel_scores: jnp.ndarray,   # [B, X, Y, Z, C] class scores (pred grid)
    lidar_xyz01: jnp.ndarray,    # [B, P, 3] normalized to pc_range [0, 1]
    align_corners: bool = True,
) -> jnp.ndarray:
    """Trilinear per-point readout (mask2former_nusc_occ.py:505-542):
    border padding keeps out-of-range returns usable."""
    coords = lidar_xyz01 * 2.0 - 1.0
    return grid_sample_3d(voxel_scores, coords, align_corners=align_corners,
                          padding_mode="border")


def build_eval_step(model, occ_size: Tuple[int, int, int],
                    num_classes: int) -> Callable:
    """Returns jitted eval_step(variables, batch) -> dict.

    Outputs: voxel class scores upsampled to occ_size (argmax'ed), per-point
    predicted labels, and the 17x17 lidarseg confusion-matrix contribution
    (device-side; rows/cols 1..16 are the fg classes).
    """

    def eval_step(variables, batch):
        out = model.apply(variables, batch)
        final_mask = mask_logits_from_embeds(out["mask_embeds"][-1],
                                             out["mask_feature"])
        voxels = format_results(out["cls_preds"][-1], final_mask)
        result = {}
        # voxel semantics at full occ resolution (simple_test :688-694,
        # detector :227-235: trilinear, align_corners=True)
        up = resize_trilinear(voxels, tuple(occ_size), align_corners=True)
        result["voxel_pred"] = jnp.argmax(up, axis=-1).astype(jnp.uint8)

        if "lidar_xyz" in batch:
            logits = lidarseg_point_logits(voxels, batch["lidar_xyz"])
            pts_pred = jnp.argmax(logits[..., 1:], axis=-1) + 1  # skip empty
            result["point_pred"] = pts_pred.astype(jnp.int32)
            if "lidar_label" in batch:
                label = batch["lidar_label"]
                valid = batch["lidar_valid"]
                n = num_classes
                idx = label * n + pts_pred
                idx = jnp.where(valid, idx, n * n)
                cm = jnp.bincount(idx.reshape(-1), length=n * n + 1)[:-1]
                result["confusion"] = cm.reshape(n, n)
        return result

    return jax.jit(eval_step)


def evaluate(
    model,
    variables,
    loader,
    occ_size,
    num_classes: int,
    class_names=None,
    compute_ssc: bool = False,
    invalid_label: int = 255,
    save_cb=None,
) -> Dict[str, Any]:
    """Full-split evaluation: lidarseg IoU table and/or SSC metrics.

    ``save_cb(out, meta_list, batch)`` runs per batch on host — used by the
    submission writers (reference apis/test.py:161-167)."""
    step = build_eval_step(model, occ_size, num_classes)
    cm = np.zeros((num_classes, num_classes), np.int64)
    ssc = SSCMetrics(num_classes) if compute_ssc else None

    for batch in loader:
        gt_occ = batch.pop("gt_occ", None)
        meta = batch.pop("_meta", None)
        out = step(variables, batch)
        if save_cb is not None:
            save_cb(out, meta, batch)
        if "confusion" in out:
            cm += np.asarray(out["confusion"])
        if ssc is not None and gt_occ is not None:
            ssc.update(np.asarray(out["voxel_pred"]), np.asarray(gt_occ),
                       invalid_label)

    results: Dict[str, Any] = {}
    if cm.sum() > 0:
        fg = cm[1:, 1:]  # crop the empty/noise row+col (fast_hist_crop)
        ious = cm_to_ious(fg)
        names = class_names or [str(i) for i in range(num_classes)]
        for i, iou in enumerate(ious):
            results[f"nuScenes_lidarseg_{names[i + 1]}"] = float(iou)
        results["nuScenes_lidarseg_mean"] = float(np.nanmean(ious))
    if ssc is not None:
        m = ssc.compute()
        results["semkitti_SC_IoU"] = float(m["sc_iou"])
        results["semkitti_SSC_mIoU"] = float(m["ssc_miou"])
        results["SSC_precision"] = float(m["precision"])
        results["SSC_recall"] = float(m["recall"])
    return results


def train_point_miou(cls_preds, mask_embeds, mask_feature, batch,
                     num_classes: int) -> float:
    """Train-time LiDAR-seg mean IoU on the current batch (host-side).

    Mirrors the reference's ``point_mean_iou`` training metric
    (mask2former_nusc_occ.py:524-540): readout of the fused voxel logits at
    the LiDAR points, argmax over foreground classes, nanmean per-class IoU.
    """
    from .eval import lidarseg_point_logits  # self-import safe
    from ..utils.metrics import per_class_iou

    voxels = format_results(
        cls_preds[-1], mask_logits_from_embeds(mask_embeds[-1], mask_feature))
    logits = lidarseg_point_logits(voxels, jnp.asarray(batch["lidar_xyz"]))
    pred = np.asarray(jnp.argmax(logits[..., 1:], axis=-1) + 1)
    label = np.asarray(batch["lidar_label"])
    valid = np.asarray(batch["lidar_valid"]) & (label > 0)
    n = num_classes
    cm = np.bincount(
        (label[valid] * n + pred[valid]).reshape(-1), minlength=n * n
    ).reshape(n, n)[1:, 1:]
    return float(np.nanmean(per_class_iou(cm)))


def format_iou_table(results: Dict[str, float]) -> str:
    """PrettyTable-style text report (utils/formating.py:14-47)."""
    lines = ["| metric | value |", "|---|---|"]
    for k, v in results.items():
        lines.append(f"| {k} | {v:.4f} |")
    return "\n".join(lines)
