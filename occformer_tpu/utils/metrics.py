"""Evaluation metrics: lidarseg confusion matrix / IoU and SSC metrics.

Reference: projects/mmdet3d_plugin/utils/{metric_util.py:8-23, ssc_metric.py:14-169}.
Device-side confusion matrices are plain bincounts (psum-able across a mesh);
the numpy variants mirror the reference for host-side evaluation loops.
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np

try:
    import jax
    import jax.numpy as jnp
except Exception:  # pragma: no cover
    jax = None


def fast_hist(pred: np.ndarray, label: np.ndarray, max_label: int) -> np.ndarray:
    """Confusion matrix over labels [0, max_label) (metric_util.py:8-13)."""
    pred = np.asarray(pred).reshape(-1)
    label = np.asarray(label).reshape(-1)
    k = (label >= 0) & (label < max_label)
    bin_count = np.bincount(
        max_label * label[k].astype(int) + pred[k], minlength=max_label ** 2
    )
    return bin_count[: max_label ** 2].reshape(max_label, max_label)


def fast_hist_crop(pred: np.ndarray, label: np.ndarray, unique_label: np.ndarray) -> np.ndarray:
    """Reference metric_util.py:16-20: histogram cropped to unique_label+2."""
    hist = fast_hist(pred.flatten(), label.flatten(), np.max(unique_label) + 2)
    return hist[unique_label + 1, :][:, unique_label + 1]


def per_class_iou(hist: np.ndarray) -> np.ndarray:
    with np.errstate(divide="ignore", invalid="ignore"):
        return np.diag(hist) / (hist.sum(1) + hist.sum(0) - np.diag(hist))


def cm_to_ious(cm: np.ndarray) -> np.ndarray:
    mean_ious = []
    cm = cm.astype(np.float64)
    for i in range(cm.shape[0]):
        tp = cm[i, i]
        p = cm[:, i].sum()
        g = cm[i, :].sum()
        union = p + g - tp
        mean_ious.append(tp / union if union > 0 else np.nan)
    return np.array(mean_ious)


def confusion_matrix_device(pred, label, num_classes: int):
    """jnp confusion matrix (sums under psum across a data mesh)."""
    k = (label >= 0) & (label < num_classes)
    idx = jnp.where(k, num_classes * label + pred, num_classes * num_classes)
    counts = jnp.bincount(idx.reshape(-1), length=num_classes * num_classes + 1)
    return counts[:-1].reshape(num_classes, num_classes)


class SSCMetrics:
    """Semantic-scene-completion metrics accumulator (ssc_metric.py:14-169).

    States are plain integer arrays (summable across hosts): per-class
    tp/fp/fn plus binary-occupancy (SC) tp/fp/fn.
    """

    def __init__(self, num_classes: int):
        self.n = num_classes
        self.reset()

    def reset(self):
        self.tps = np.zeros(self.n, np.int64)
        self.fps = np.zeros(self.n, np.int64)
        self.fns = np.zeros(self.n, np.int64)
        self.sc_tp = 0
        self.sc_fp = 0
        self.sc_fn = 0

    def update(self, pred: np.ndarray, target: np.ndarray, invalid_label: int = 255):
        """pred/target: int voxel labels, same shape; 255 = invalid/ignored."""
        mask = target != invalid_label
        p = pred[mask]
        t = target[mask]
        # completion (binary occupancy)
        p_occ = p > 0
        t_occ = t > 0
        self.sc_tp += int(np.sum(p_occ & t_occ))
        self.sc_fp += int(np.sum(p_occ & ~t_occ))
        self.sc_fn += int(np.sum(~p_occ & t_occ))
        # per-class
        for c in range(self.n):
            self.tps[c] += int(np.sum((p == c) & (t == c)))
            self.fps[c] += int(np.sum((p == c) & (t != c)))
            self.fns[c] += int(np.sum((p != c) & (t == c)))

    def state(self) -> Dict[str, np.ndarray]:
        """Counters as summable arrays (cross-host reduction boundary)."""
        return {
            "ssc_tps": self.tps.copy(),
            "ssc_fps": self.fps.copy(),
            "ssc_fns": self.fns.copy(),
            "ssc_sc": np.array([self.sc_tp, self.sc_fp, self.sc_fn], np.int64),
        }

    def set_state(self, s: Dict[str, np.ndarray]):
        self.tps = np.asarray(s["ssc_tps"], np.int64)
        self.fps = np.asarray(s["ssc_fps"], np.int64)
        self.fns = np.asarray(s["ssc_fns"], np.int64)
        self.sc_tp, self.sc_fp, self.sc_fn = (int(x) for x in s["ssc_sc"])

    def merge(self, other: "SSCMetrics"):
        self.tps += other.tps
        self.fps += other.fps
        self.fns += other.fns
        self.sc_tp += other.sc_tp
        self.sc_fp += other.sc_fp
        self.sc_fn += other.sc_fn

    def compute(self) -> Dict[str, np.ndarray]:
        denom = self.sc_tp + self.sc_fp + self.sc_fn
        sc_iou = self.sc_tp / denom if denom > 0 else 0.0
        union = self.tps + self.fps + self.fns
        with np.errstate(divide="ignore", invalid="ignore"):
            iou = np.where(union > 0, self.tps / union, np.nan)
        # SSC mIoU excludes the empty class 0 (reference convention)
        return {
            "sc_iou": sc_iou,
            "iou_per_class": iou,
            "ssc_miou": float(np.nanmean(iou[1:])),
            "precision": self.sc_tp / max(self.sc_tp + self.sc_fp, 1),
            "recall": self.sc_tp / max(self.sc_tp + self.sc_fn, 1),
        }
