"""Segmentation losses: naive dice, BCE-with-logits, weighted softmax CE.

Reference formulas: projects/mmdet3d_plugin/occformer/mask2former/losses/dice_loss.py:8-61
(naive_dice variant, eps 1.0 in configs) and mmdet CrossEntropyLoss with
class_weight + avg_factor semantics (config occformer_nusc_r50_256x704.py:170-189).
All losses are fp32 (the reference wraps them in @force_fp32).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def dice_loss(
    pred_logits: jnp.ndarray,
    target: jnp.ndarray,
    weight: Optional[jnp.ndarray] = None,
    avg_factor: Optional[jnp.ndarray] = None,
    eps: float = 1.0,
    activate: bool = True,
) -> jnp.ndarray:
    """Naive dice loss over rows ``[N, P]`` with per-row weights ``[N]``."""
    pred = jax.nn.sigmoid(pred_logits.astype(jnp.float32)) if activate else pred_logits
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    a = jnp.sum(pred * target, axis=-1)
    b = jnp.sum(pred, axis=-1)
    c = jnp.sum(target, axis=-1)
    loss = 1.0 - (2 * a + eps) / (b + c + eps)
    if weight is not None:
        loss = loss * weight.astype(jnp.float32)
    total = jnp.sum(loss)
    if avg_factor is None:
        return jnp.mean(loss)
    return total / jnp.maximum(avg_factor, jnp.finfo(jnp.float32).eps)


def binary_cross_entropy_with_logits(
    logits: jnp.ndarray,
    target: jnp.ndarray,
    weight: Optional[jnp.ndarray] = None,
    avg_factor: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Elementwise BCE-with-logits, weighted sum / avg_factor."""
    logits = logits.astype(jnp.float32)
    target = target.astype(jnp.float32)
    # numerically-stable formulation (== torch binary_cross_entropy_with_logits)
    loss = jnp.maximum(logits, 0) - logits * target + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    if weight is not None:
        loss = loss * weight.astype(jnp.float32)
    total = jnp.sum(loss)
    if avg_factor is None:
        return jnp.mean(loss)
    return total / jnp.maximum(avg_factor, jnp.finfo(jnp.float32).eps)


def softmax_cross_entropy(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    class_weight: Optional[jnp.ndarray] = None,
    label_weights: Optional[jnp.ndarray] = None,
    avg_factor: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Per-class-weighted CE matching torch ``F.cross_entropy(weight=...)``.

    loss_i = -class_weight[y_i] * log_softmax(x_i)[y_i]; reduction is
    sum(loss * label_weights) / avg_factor (mmdet avg_factor convention;
    the occ head passes avg_factor = sum(class_weight[labels]),
    mask2former_occ.py:389-394).
    """
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    picked = jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    loss = -picked
    if class_weight is not None:
        loss = loss * class_weight[labels]
    if label_weights is not None:
        loss = loss * label_weights.astype(jnp.float32)
    total = jnp.sum(loss)
    if avg_factor is None:
        return jnp.mean(loss)
    return total / jnp.maximum(avg_factor, jnp.finfo(jnp.float32).eps)
