"""Static-shape voxel scatter: the TPU-native replacement for CUDA ``bev_pool``.

The reference sorts points by voxel rank and launches one CUDA thread per
(interval, channel) (mmdetection3d/mmdet3d/ops/bev_pool/src/bev_pool_cuda.cu:20-42,
wrapper ops/bev_pool/bev_pool.py:83-97).  On TPU the same sum-by-voxel is a
sorted-segment reduction, which XLA lowers efficiently from
``jax.ops.segment_sum``; invalid points are routed to one extra dummy bin so
shapes stay static (no boolean filtering).  Differentiation falls out of
``segment_sum``'s transpose (a gather), matching bev_pool's backward
(bev_pool_cuda.cu:61-84).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def voxel_scatter(
    feats: jnp.ndarray,
    coords: jnp.ndarray,
    valid: jnp.ndarray,
    nx: Sequence[int],
) -> jnp.ndarray:
    """Sum point features into a dense voxel grid.

    Args:
      feats:  [B, P, C] per-point features
      coords: [B, P, 3] integer voxel indices (x, y, z); may be garbage where
              ``valid`` is False
      valid:  [B, P] bool
      nx:     (X, Y, Z) grid size

    Returns:
      [B, X, Y, Z, C] voxel grid (zeros where no point landed).
    """
    B, P, C = feats.shape
    X, Y, Z = int(nx[0]), int(nx[1]), int(nx[2])
    nvox = X * Y * Z

    coords = jnp.clip(coords, 0, jnp.asarray([X - 1, Y - 1, Z - 1], jnp.int32))
    lin = (coords[..., 0] * Y + coords[..., 1]) * Z + coords[..., 2]  # [B, P]
    batch_off = jnp.arange(B, dtype=jnp.int32)[:, None] * nvox
    seg = jnp.where(valid, lin + batch_off, B * nvox)  # dummy bin for invalid

    out = jax.ops.segment_sum(
        feats.reshape(B * P, C),
        seg.reshape(B * P),
        num_segments=B * nvox + 1,
    )
    return out[: B * nvox].reshape(B, X, Y, Z, C)


def voxel_scatter_lifted(
    depth: jnp.ndarray,
    ctx: jnp.ndarray,
    coords: jnp.ndarray,
    valid: jnp.ndarray,
    nx: Sequence[int],
) -> jnp.ndarray:
    """Fused lift (depth ⊗ context) + scatter, BEVPoolv2-style.

    Instead of materializing the full ``[B, N, D, fH, fW, C]`` outer product
    (reference ViewTransformerLSSVoxel.py:110-115) we weight each point's
    context feature by its depth probability right at the scatter, so the
    lifted volume never hits HBM at full size.

    Args:
      depth:  [B, N, D, fH, fW] softmaxed depth distribution
      ctx:    [B, N, fH, fW, C] context features
      coords: [B, N, D, fH, fW, 3] voxel indices of each frustum point
      valid:  [B, N, D, fH, fW] bool
      nx:     (X, Y, Z)

    Returns [B, X, Y, Z, C].
    """
    B, N, D, fH, fW = depth.shape
    C = ctx.shape[-1]
    X, Y, Z = int(nx[0]), int(nx[1]), int(nx[2])
    nvox = X * Y * Z

    coords = jnp.clip(coords, 0, jnp.asarray([X - 1, Y - 1, Z - 1], jnp.int32))
    lin = (coords[..., 0] * Y + coords[..., 1]) * Z + coords[..., 2]
    batch_off = (jnp.arange(B, dtype=jnp.int32) * nvox).reshape(B, 1, 1, 1, 1)
    seg = jnp.where(valid, lin + batch_off, B * nvox)

    # Scatter camera-by-camera so the weighted point features of ONE camera
    # is the largest transient, not the whole [B, N, D, fH, fW, C] product
    # (a 918M HBM temp at 6x896x1600).  The optimization_barrier ties each
    # camera's lift to the previous accumulation — without it XLA's scheduler
    # hoists all N muls ahead of the scatters and the transients coexist.
    out = jnp.zeros((B * nvox + 1, C), depth.dtype)
    for n in range(N):
        if n:
            out, depth = jax.lax.optimization_barrier((out, depth))
        feats_n = depth[:, n, ..., None] * ctx[:, n, None]  # [B, D, fH, fW, C]
        out = out + jax.ops.segment_sum(
            feats_n.reshape(-1, C), seg[:, n].reshape(-1),
            num_segments=B * nvox + 1,
        )
    return out[: B * nvox].reshape(B, X, Y, Z, C)
