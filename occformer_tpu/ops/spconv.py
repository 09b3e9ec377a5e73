"""Sparse 3D convolution, TPU-idiomatic formulation.

The reference vendors a full gather-scatter spconv library
(mmdetection3d/mmdet3d/ops/spconv, ~5.2k LoC CUDA) for SECOND-style middle
encoders.  On TPU, indice-pair gather-GEMM kernels are a poor fit; the
idiomatic equivalent at these grid sizes is densify -> dense conv (MXU) ->
re-sparsify, with submanifold masking enforced by construction.  Active
sites live in fixed-capacity buffers (features [N, C] + integer coords +
validity), so shapes stay static.

Size envelope: the dense intermediate is [X, Y, Z, C] — fine for
OccFormer-adjacent grids (<=256x256x32 x 128ch bf16 ~ 0.5 GiB) and the
capability-parity tests, but NOT for SECOND-scale detection grids
(41x1600x1408 x 16ch would be ~2.9 GiB *per layer* of intermediates at
~0.1% occupancy, almost all of it multiplying zeros).  If such a workload
ever lands here, the TPU-idiomatic path is gather-GEMM over indice pairs
built at trace time per static rulebook (or a Pallas kernel), not this
densify bridge.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def densify(
    features: jnp.ndarray,   # [N, C]
    coords: jnp.ndarray,     # [N, 3] int
    valid: jnp.ndarray,      # [N]
    grid: Sequence[int],
) -> jnp.ndarray:
    """Scatter active sites into a dense [X, Y, Z, C] grid (last write wins —
    coords are unique by construction for voxel features)."""
    X, Y, Z = grid
    C = features.shape[-1]
    lin = (coords[:, 0] * Y + coords[:, 1]) * Z + coords[:, 2]
    lin = jnp.where(valid, lin, X * Y * Z)
    dense = jnp.zeros((X * Y * Z + 1, C), features.dtype)
    dense = dense.at[lin].set(jnp.where(valid[:, None], features, 0))
    return dense[:-1].reshape(X, Y, Z, C)


def sparsify(dense: jnp.ndarray, coords: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Gather features back at the active coords: [X,Y,Z,C] -> [N, C]."""
    X, Y, Z, C = dense.shape
    lin = (coords[:, 0] * Y + coords[:, 1]) * Z + coords[:, 2]
    lin = jnp.clip(lin, 0, X * Y * Z - 1)
    out = dense.reshape(-1, C)[lin]
    return jnp.where(valid[:, None], out, 0)


class SubMConv3d(nn.Module):
    """Submanifold sparse conv: output only at input active sites.

    Matches spconv SubMConv3d semantics: dense conv over the densified grid,
    then re-sparsify at the ORIGINAL coords (so the active set never grows).
    """

    features: int
    kernel_size: int = 3
    use_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, coords, valid, grid):
        from ..models.layers import Conv

        dense = densify(feats, coords, valid, grid)[None]
        out = Conv(self.features, (self.kernel_size,) * 3, use_bias=self.use_bias,
                   dtype=self.dtype, name="conv")(dense)[0]
        return sparsify(out, coords, valid), coords, valid


class SparseConv3d(nn.Module):
    """Strided sparse conv: the active set becomes every non-empty output cell
    (up to a fixed capacity), like spconv SparseConv3d."""

    features: int
    kernel_size: int = 3
    stride: int = 2
    max_out_sites: int = 20000
    use_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, coords, valid, grid):
        from ..models.layers import Conv

        X, Y, Z = grid
        s = self.stride
        dense = densify(feats, coords, valid, grid)[None]
        occ = densify(valid[:, None].astype(self.dtype), coords, valid, grid)[None]
        out = Conv(self.features, (self.kernel_size,) * 3, strides=(s, s, s),
                   use_bias=self.use_bias, dtype=self.dtype, name="conv")(dense)[0]
        occ_out = jax.lax.reduce_window(
            occ[0, ..., 0], 0.0, jax.lax.add,
            (self.kernel_size,) * 3, (s,) * 3, "SAME",
        )
        oX, oY, oZ = out.shape[:3]
        # new active set: top-K non-empty output cells (static capacity)
        score = (occ_out > 0).astype(jnp.float32).reshape(-1)
        k = min(self.max_out_sites, score.shape[0])
        _, lin = jax.lax.top_k(score + jnp.arange(score.shape[0]) * -1e-9, k)
        new_valid = score[lin] > 0
        z = lin % oZ
        y = (lin // oZ) % oY
        x = lin // (oY * oZ)
        new_coords = jnp.stack([x, y, z], -1).astype(jnp.int32)
        new_feats = out.reshape(-1, self.features)[lin]
        new_feats = jnp.where(new_valid[:, None], new_feats, 0)
        return new_feats, new_coords, new_valid, (oX, oY, oZ)


def sparse_max_pool(feats, coords, valid, grid, kernel: int = 2, stride: int = 2):
    """Sparse max pooling via densify -> reduce_window -> gather at pooled
    coords of the active sites."""
    X, Y, Z = grid
    dense = densify(feats, coords, valid, grid)
    neg = jnp.finfo(dense.dtype).min if jnp.issubdtype(dense.dtype, jnp.floating) else 0
    pooled = jax.lax.reduce_window(
        jnp.where(dense == 0, neg, dense), neg, jax.lax.max,
        (kernel, kernel, kernel, 1), (stride, stride, stride, 1), "VALID",
    )
    pooled = jnp.where(pooled == neg, 0, pooled)
    new_coords = coords // stride
    new_grid = (X // stride, Y // stride, Z // stride)
    return sparsify(pooled, new_coords, valid), new_coords, valid, new_grid


def assign_score_withk(
    scores: jnp.ndarray,     # [B, N, K, M] point-wise kernel scores
    point_feats: jnp.ndarray,  # [B, N, K, M, C] per-kernel features (center)
    center_feats: jnp.ndarray,  # [B, N, K, M, C]
    aggregate: str = "sum",
) -> jnp.ndarray:
    """PAConv weighted kernel assembly (mmdet3d ops/paconv
    assign_score_withk): out[b,n,k] = sum_m scores[b,n,k,m] *
    (point_feats - center_feats)[b,n,k,m]."""
    w = scores[..., None]
    out = w * (point_feats - center_feats)
    if aggregate == "sum":
        return jnp.sum(out, axis=3)
    if aggregate == "avg":
        return jnp.mean(out, axis=3)
    if aggregate == "max":
        return jnp.max(out, axis=3)
    raise ValueError(aggregate)
