"""Golden tests for losses: matching costs vs torch oracle, Hungarian,
Gumbel sampling, dice/CE reductions."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from occformer_tpu.losses.matching import (
    BIG_COST,
    hungarian_match,
    mask_matching_cost,
)
from occformer_tpu.losses.point_sampling import gumbel_topk_sample
from occformer_tpu.losses.seg_losses import (
    binary_cross_entropy_with_logits,
    dice_loss,
    softmax_cross_entropy,
)


def _torch_cost(cls_score, mask_pred, gt_labels, gt_points, wc=2.0, wm=5.0, wd=5.0, eps=1.0):
    """Oracle re-implementing match_cost.py formulas with torch."""
    cls_score = torch.from_numpy(cls_score)
    mask_pred = torch.from_numpy(mask_pred)
    gt_points = torch.from_numpy(gt_points).float()
    cls_cost = -cls_score.softmax(-1)[:, torch.from_numpy(gt_labels).long()]
    n = mask_pred.shape[1]
    pos = F.binary_cross_entropy_with_logits(mask_pred, torch.ones_like(mask_pred), reduction="none")
    neg = F.binary_cross_entropy_with_logits(mask_pred, torch.zeros_like(mask_pred), reduction="none")
    mask_cost = (torch.einsum("nc,mc->nm", pos, gt_points)
                 + torch.einsum("nc,mc->nm", neg, 1 - gt_points)) / n
    mp = mask_pred.sigmoid()
    num = 2 * torch.einsum("nc,mc->nm", mp, gt_points)
    den = mp.sum(-1)[:, None] + gt_points.sum(-1)[None, :]
    dice_cost = 1 - (num + eps) / (den + eps)
    return (wc * cls_cost + wm * mask_cost + wd * dice_cost).numpy()


@pytest.mark.quick
def test_matching_cost_matches_torch(rng):
    Q, G, P, C = 10, 4, 32, 5
    cls_score = rng.randn(Q, C + 1).astype(np.float32)
    mask_pred = rng.randn(Q, P).astype(np.float32)
    gt_labels = rng.randint(0, C, G)
    gt_points = (rng.rand(G, P) > 0.5).astype(np.float32)
    valid = np.ones(G, bool)

    ours = np.asarray(mask_matching_cost(
        jnp.asarray(cls_score), jnp.asarray(mask_pred),
        jnp.asarray(gt_labels), jnp.asarray(gt_points), jnp.asarray(valid),
    ))
    ref = _torch_cost(cls_score, mask_pred, gt_labels, gt_points)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_matching_cost_invalid_columns(rng):
    cost = mask_matching_cost(
        jnp.asarray(rng.randn(5, 4).astype(np.float32)),
        jnp.asarray(rng.randn(5, 8).astype(np.float32)),
        jnp.asarray(np.arange(3)),
        jnp.asarray((rng.rand(3, 8) > 0.5).astype(np.float32)),
        jnp.asarray(np.array([True, False, True])),
    )
    assert np.all(np.asarray(cost)[:, 1] == BIG_COST)


@pytest.mark.quick
def test_hungarian_matches_scipy(rng):
    from scipy.optimize import linear_sum_assignment

    Q, G = 12, 5
    cost = rng.randn(Q, G).astype(np.float32)
    valid = np.array([True, True, False, True, True])
    assign = np.asarray(hungarian_match(jnp.asarray(cost), jnp.asarray(valid)))
    assert assign[2] == -1
    cols = np.nonzero(valid)[0]
    rows, col_idx = linear_sum_assignment(cost[:, cols].astype(np.float64))
    expected = np.full(G, -1, np.int32)
    expected[cols[col_idx]] = rows
    np.testing.assert_array_equal(assign, expected)


def test_hungarian_under_vmap(rng):
    B, Q, G = 3, 8, 4
    cost = rng.randn(B, Q, G).astype(np.float32)
    valid = np.ones((B, G), bool)
    assign = jax.vmap(hungarian_match)(jnp.asarray(cost), jnp.asarray(valid))
    assign = np.asarray(assign)
    # one-to-one per batch element
    for b in range(B):
        assert len(set(assign[b])) == G


def test_gumbel_topk_without_replacement_distribution():
    key = jax.random.PRNGKey(0)
    weights = jnp.asarray([0.0, 1.0, 1.0, 4.0, 0.0, 2.0])
    counts = np.zeros(6)
    for i in range(300):
        idx = np.asarray(gumbel_topk_sample(jax.random.fold_in(key, i), weights, 3))
        assert len(set(idx.tolist())) == 3  # without replacement
        assert 0 not in idx and 4 not in idx  # zero weight excluded
        counts[idx] += 1
    # heaviest weight sampled most
    assert counts[3] >= counts[1]
    assert counts[3] >= counts[5]


def test_dice_loss_matches_reference_formula(rng):
    pred = rng.randn(4, 50).astype(np.float32)
    target = (rng.rand(4, 50) > 0.5).astype(np.float32)
    weight = np.array([1.0, 0.5, 0.0, 2.0], np.float32)
    ours = float(dice_loss(jnp.asarray(pred), jnp.asarray(target),
                           jnp.asarray(weight), avg_factor=jnp.asarray(3.5), eps=1.0))
    p = torch.from_numpy(pred).sigmoid()
    t = torch.from_numpy(target)
    a = (p * t).sum(1)
    d = (2 * a + 1.0) / (p.sum(1) + t.sum(1) + 1.0)
    ref = float((((1 - d) * torch.from_numpy(weight)).sum() / 3.5))
    assert abs(ours - ref) < 1e-5


def test_bce_matches_torch(rng):
    logits = rng.randn(100).astype(np.float32) * 4
    target = (rng.rand(100) > 0.5).astype(np.float32)
    ours = float(binary_cross_entropy_with_logits(
        jnp.asarray(logits), jnp.asarray(target), avg_factor=jnp.asarray(100.0)))
    ref = float(F.binary_cross_entropy_with_logits(
        torch.from_numpy(logits), torch.from_numpy(target), reduction="sum") / 100.0)
    assert abs(ours - ref) < 1e-5


def test_softmax_ce_with_class_weight_matches_torch(rng):
    C = 6
    logits = rng.randn(20, C).astype(np.float32)
    labels = rng.randint(0, C, 20)
    cw = rng.rand(C).astype(np.float32) + 0.5
    avg = cw[labels].sum()
    ours = float(softmax_cross_entropy(
        jnp.asarray(logits), jnp.asarray(labels), class_weight=jnp.asarray(cw),
        avg_factor=jnp.asarray(avg)))
    ref = F.cross_entropy(torch.from_numpy(logits), torch.from_numpy(labels).long(),
                          weight=torch.from_numpy(cw), reduction="sum") / avg
    assert abs(ours - float(ref)) < 1e-5


def test_auction_matches_scipy_optimal_cost(rng):
    """Auction assignment reaches the scipy-optimal total cost on random
    instances (ties aside, the assignment itself coincides)."""
    from scipy.optimize import linear_sum_assignment

    from occformer_tpu.losses.matching import auction_match

    for trial in range(20):
        r = np.random.RandomState(trial)
        Q, G = 12, 5
        cost = r.randn(Q, G).astype(np.float32) * 3
        valid = r.rand(G) > 0.2
        if not valid.any():
            valid[0] = True
        assign = np.asarray(auction_match(jnp.asarray(cost), jnp.asarray(valid)))
        # validity + one-to-one
        assert (assign[~valid] == -1).all()
        a = assign[valid]
        assert (a >= 0).all() and len(set(a.tolist())) == valid.sum()
        ours = cost[a, np.nonzero(valid)[0]].sum()
        cols = np.nonzero(valid)[0]
        ridx, cidx = linear_sum_assignment(cost[:, cols].astype(np.float64))
        ref = cost[ridx, cols[cidx]].sum()
        assert ours <= ref + 1e-3, (trial, ours, ref)


def test_auction_under_vmap(rng):
    from occformer_tpu.losses.matching import auction_match

    B, Q, G = 4, 10, 4
    cost = jnp.asarray(rng.randn(B, Q, G).astype(np.float32))
    valid = jnp.ones((B, G), bool)
    assign = np.asarray(jax.vmap(auction_match)(cost, valid))
    for b in range(B):
        assert len(set(assign[b].tolist())) == G
