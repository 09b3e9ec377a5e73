"""Hungarian mask matching with static shapes.

Reference: projects/mmdet3d_plugin/occformer/mask2former/assigners/
{mask_hungarian_assigner.py:12-126, match_costs/match_cost.py:10-130}.
The cost matrix (classification + point-BCE + point-dice) is computed on
device in fp32 as batched matmuls; only the tiny [Q, G] assignment runs on
host via scipy ``linear_sum_assignment`` under ``jax.pure_callback`` — the
exact CPU-sync the reference has (assigner :110-117), but over a fixed-size
buffer so the jitted program keeps static shapes.  A future round can swap in
an on-device auction solver.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

BIG_COST = 1e8


def mask_matching_cost(
    cls_score: jnp.ndarray,     # [Q, num_classes + 1] logits
    mask_points_pred: jnp.ndarray,  # [Q, P] logits at sampled points
    gt_labels: jnp.ndarray,     # [G] int
    gt_points: jnp.ndarray,     # [G, P] {0,1} (or soft after trilinear)
    gt_valid: jnp.ndarray,      # [G] bool
    cls_weight: float = 2.0,
    mask_weight: float = 5.0,
    dice_weight: float = 5.0,
    dice_eps: float = 1.0,
) -> jnp.ndarray:
    """Return [Q, G] cost; invalid gt columns get BIG_COST."""
    cls_score = cls_score.astype(jnp.float32)
    mask_points_pred = mask_points_pred.astype(jnp.float32)
    gt_points = gt_points.astype(jnp.float32)
    P = mask_points_pred.shape[-1]

    # ClassificationCost: -softmax prob of the gt class (mmdet convention)
    probs = jax.nn.softmax(cls_score, axis=-1)
    cls_cost = -probs[:, gt_labels]  # [Q, G]

    # CrossEntropyLossCost (use_sigmoid): mean over points of BCE against
    # all-ones / all-zeros, combined via the gt mask (match_cost.py:92-113)
    x = mask_points_pred
    pos = jnp.maximum(x, 0) - x + jnp.log1p(jnp.exp(-jnp.abs(x)))  # BCE vs 1
    neg = jnp.maximum(x, 0) + jnp.log1p(jnp.exp(-jnp.abs(x)))      # BCE vs 0
    mask_cost = (pos @ gt_points.T + neg @ (1.0 - gt_points).T) / P

    # DiceCost with pred_act=True, naive denominator (match_cost.py:31-66)
    pred = jax.nn.sigmoid(x)
    num = 2.0 * (pred @ gt_points.T)
    den = jnp.sum(pred, -1)[:, None] + jnp.sum(gt_points, -1)[None, :]
    dice_cost = 1.0 - (num + dice_eps) / (den + dice_eps)

    cost = cls_weight * cls_cost + mask_weight * mask_cost + dice_weight * dice_cost
    return jnp.where(gt_valid[None, :], cost, BIG_COST)


def _lsa_host(cost: np.ndarray, valid: np.ndarray) -> np.ndarray:
    """Host callback: assignment over valid columns only; -1 for invalid."""
    from scipy.optimize import linear_sum_assignment

    cost = np.asarray(cost, np.float64)
    valid = np.asarray(valid, bool)
    G = cost.shape[-1]
    out = np.full(cost.shape[:-2] + (G,), -1, np.int32)
    flat_cost = cost.reshape(-1, cost.shape[-2], G)
    flat_valid = valid.reshape(-1, G)
    flat_out = out.reshape(-1, G)
    for i in range(flat_cost.shape[0]):
        cols = np.nonzero(flat_valid[i])[0]
        if cols.size == 0:
            continue
        sub = flat_cost[i][:, cols]
        sub = np.nan_to_num(sub, nan=BIG_COST, posinf=BIG_COST, neginf=-BIG_COST)
        rows, cols_idx = linear_sum_assignment(sub)
        flat_out[i, cols[cols_idx]] = rows.astype(np.int32)
    return out


def auction_match(cost: jnp.ndarray, gt_valid: jnp.ndarray,
                  eps_scale: float = 1e-4, max_iters: int = 5000) -> jnp.ndarray:
    """Device-side assignment via Bertsekas' auction algorithm (pure XLA).

    Replaces the host scipy solve where host callbacks are unavailable (the
    axon PJRT backend rejects pure_callback).  Bidders are the valid GT
    columns (G <= ~100), objects are the queries (Q); with
    eps < min-cost-gap / G the result is the exact optimum, and with the
    default scale it is optimal to ~0.01% of the cost range — well below any
    effect on training (the reference's own CPU float ties are similarly
    arbitrary, mask_hungarian_assigner.py:110-117).

    cost: [Q, G]; gt_valid: [G].  Returns [G] assigned query index (-1 invalid).
    """
    cost = jax.lax.stop_gradient(cost.astype(jnp.float32))
    Q, G = cost.shape
    value = -cost.T  # [G, Q] bidder-major values to maximize
    rng_range = jnp.maximum(
        jnp.max(jnp.where(gt_valid[:, None], value, -jnp.inf))
        - jnp.min(jnp.where(gt_valid[:, None], value, jnp.inf)), 1e-6,
    )
    eps = rng_range * eps_scale / jnp.maximum(G, 1)

    # state: prices [Q], owner [Q] (bidder idx or -1), assign [G] (object or -1)
    def cond(state):
        it, prices, owner, assign = state
        unassigned = (assign < 0) & gt_valid
        return jnp.any(unassigned) & (it < max_iters)

    def body(state):
        it, prices, owner, assign = state
        unassigned = (assign < 0) & gt_valid
        # pick the first unassigned valid bidder
        i = jnp.argmax(unassigned)
        vals = value[i] - prices  # [Q]
        j1 = jnp.argmax(vals)
        v1 = vals[j1]
        vals2 = vals.at[j1].set(-jnp.inf)
        v2 = jnp.max(vals2)
        bid = prices[j1] + (v1 - v2) + eps
        # previous owner of j1 loses it
        prev = owner[j1]
        assign = jnp.where(
            prev >= 0, assign.at[jnp.maximum(prev, 0)].set(-1), assign
        )
        assign = assign.at[i].set(j1)
        owner = owner.at[j1].set(i)
        prices = prices.at[j1].set(bid)
        return it + 1, prices, owner, assign

    init = (
        jnp.zeros((), jnp.int32),
        jnp.zeros((Q,), jnp.float32),
        jnp.full((Q,), -1, jnp.int32),
        jnp.full((G,), -1, jnp.int32),
    )
    _, _, _, assign = jax.lax.while_loop(cond, body, init)
    return jnp.where(gt_valid, assign, -1).astype(jnp.int32)


def hungarian_match(cost: jnp.ndarray, gt_valid: jnp.ndarray) -> jnp.ndarray:
    """[..., Q, G] cost + [..., G] valid -> [..., G] assigned query (-1 invalid).

    The cost is detached first — assignment is non-differentiable, exactly the
    reference's ``cost.detach().cpu()`` (mask_hungarian_assigner.py:111).
    """
    cost = jax.lax.stop_gradient(cost)
    out_shape = jax.ShapeDtypeStruct(cost.shape[:-2] + (cost.shape[-1],), jnp.int32)
    return jax.pure_callback(
        _lsa_host, out_shape, cost, gt_valid, vmap_method="broadcast_all"
    )
