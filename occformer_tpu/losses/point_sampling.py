"""Point sampling for mask supervision, with static shapes and explicit PRNG.

Replaces the reference's data-dependent sampling machinery
(mask2former/base/mmdet_utils.py:92-246): multinomial-without-replacement
becomes Gumbel top-k (Efraimidis–Spirakis: adding Gumbel noise to log-weights
and taking top-k draws without replacement proportionally to the weights);
importance sampling keeps the oversample -> uncertainty-top-k -> random-fill
structure but over fixed-capacity buffers.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def gumbel_topk_sample(rng: jax.Array, weights: jnp.ndarray, k: int) -> jnp.ndarray:
    """Sample ``k`` indices without replacement ∝ weights (zero = excluded).

    weights: [N] nonnegative.  Returns [k] int32 indices.
    """
    logw = jnp.log(jnp.clip(weights.astype(jnp.float32), 1e-30))
    logw = jnp.where(weights > 0, logw, -jnp.inf)
    g = jax.random.gumbel(rng, weights.shape, jnp.float32)
    _, idx = jax.lax.top_k(logw + g, k)
    return idx.astype(jnp.int32)


def unravel_3d(indices: jnp.ndarray, shape: Tuple[int, int, int]) -> jnp.ndarray:
    """Flat voxel index -> (x, y, z) coords (mmdet_utils.py:71-89)."""
    X, Y, Z = shape
    z = indices % Z
    y = (indices // Z) % Y
    x = indices // (Y * Z)
    return jnp.stack([x, y, z], axis=-1)


def sample_with_frequencies(
    rng: jax.Array,
    gt_masks: jnp.ndarray,      # [G, X, Y, Z] {0,1}
    gt_labels: jnp.ndarray,     # [G] int
    gt_valid: jnp.ndarray,      # [G] bool
    sample_weights: jnp.ndarray,  # [num_classes] per-class sampling weight
    num_points: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Frequency-weighted voxel sampling (mmdet_utils.py:92-114).

    Returns (flat indices [num_points], [0,1] coords [num_points, 3] with the
    (idx / (size-1)) normalization the reference uses before align_corners=True
    sampling).
    """
    G = gt_masks.shape[0]
    w = sample_weights[gt_labels] * gt_valid.astype(jnp.float32)  # [G]
    vox_w = jnp.einsum("g,gxyz->xyz", w.astype(jnp.float32),
                       gt_masks.astype(jnp.float32))  # fuses: no f32 copy
    shape = gt_masks.shape[1:]
    idx = gumbel_topk_sample(rng, vox_w.reshape(-1), num_points)
    coords = unravel_3d(idx, shape).astype(jnp.float32)
    norm = jnp.asarray([s - 1 for s in shape], jnp.float32)
    return idx, coords / norm


def uncertainty_topk(
    point_logits: jnp.ndarray,  # [G, S] logits at candidate points
    num_uncertain: int,
) -> jnp.ndarray:
    """Top-k most-uncertain candidate indices per row (−|logit| score,
    mmdet_utils.py:49-69)."""
    score = -jnp.abs(point_logits.astype(jnp.float32))
    _, idx = jax.lax.top_k(score, num_uncertain)
    return idx.astype(jnp.int32)


def uncertainty_sample_coords(
    rng: Optional[jax.Array],
    candidate_coords: jnp.ndarray,  # [G, S, 3] in [0, 1]
    point_logits: jnp.ndarray,      # [G, S]
    num_points: int,
    importance_sample_ratio: float = 0.75,
    rand: Optional[jnp.ndarray] = None,  # pre-drawn [G, n_rand, 3] fill
) -> jnp.ndarray:
    """Oversampled candidates -> uncertainty top-k + uniform-random fill.

    Mirrors get_uncertain_point_coords_3d / get_nusc_lidarseg_point_coords
    (mmdet_utils.py:138-246): take the most-uncertain 75% from candidates and
    fill the rest with fresh uniform coords.  ``rand`` lets the caller
    pre-draw the fill for ALL gt slots so chunked invocations stay
    bit-identical to an unchunked one (mask2former_loss gt_chunks).
    Returns [G, num_points, 3].
    """
    G, S, _ = candidate_coords.shape
    n_unc = int(importance_sample_ratio * num_points)
    n_rand = num_points - n_unc
    idx = uncertainty_topk(point_logits, n_unc)  # [G, n_unc]
    picked = jnp.take_along_axis(candidate_coords, idx[..., None], axis=1)
    if n_rand > 0:
        if rand is None:
            rand = jax.random.uniform(rng, (G, n_rand, 3), jnp.float32)
        picked = jnp.concatenate([picked, rand], axis=1)
    return picked
