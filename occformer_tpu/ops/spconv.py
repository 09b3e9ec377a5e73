"""Sparse 3D convolution, TPU-idiomatic formulation.

The reference vendors a full gather-scatter spconv library
(mmdetection3d/mmdet3d/ops/spconv, ~5.2k LoC CUDA) for SECOND-style middle
encoders.  On TPU, indice-pair gather-GEMM kernels are a poor fit; the
idiomatic equivalent at these grid sizes is densify -> dense conv (MXU) ->
re-sparsify, with submanifold masking enforced by construction.  Active
sites live in fixed-capacity buffers (features [N, C] + integer coords +
validity), so shapes stay static.

Two backends, checkpoint-compatible (identical param trees):

* ``backend="dense"`` — densify -> dense conv -> re-sparsify.  The dense
  intermediate is [X, Y, Z, C]: fine for OccFormer-adjacent grids
  (<=256x256x32 x 128ch bf16 ~ 0.5 GiB) but NOT for SECOND-scale detection
  grids (41x1600x1408 x 16ch would be ~2.9 GiB *per layer* at ~0.1%
  occupancy, almost all of it multiplying zeros).
* ``backend="gather"`` — true sparse gather-GEMM, the TPU-idiomatic
  equivalent of spconv's indice-pair kernels: neighbor indices are resolved
  by one sort of the active linear coords + vectorized binary search
  (``jnp.searchsorted``), then the conv is a single
  ``[N, K*C] @ [K*C, D]`` MXU matmul over the gathered taps.  Memory
  scales with the ACTIVE set ([N, K, C] gathered features), never the
  grid, so SECOND-scale grids are fine at any sparsity.  Cost scales as
  N*K*C*D regardless of occupancy, so below ~a-few-percent occupancy it
  also does strictly less work than the dense bridge.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


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


def lookup_sites(
    coords: jnp.ndarray,   # [N, 3] int, unique where valid
    valid: jnp.ndarray,    # [N]
    grid: Sequence[int],
    query: jnp.ndarray,    # [..., 3] int
    query_ok: jnp.ndarray,  # [...] queries to resolve (others -> -1)
) -> jnp.ndarray:
    """Index of the active site at each query coord, or -1.

    The TPU formulation of spconv's indice-pair hash lookup: one sort of the
    active linear coords, then a vectorized binary search per query
    (``jnp.searchsorted``) — no dense [X*Y*Z] table is ever built, so cost
    and memory scale with the active set, not the grid.
    """
    X, Y, Z = grid
    n_cells = X * Y * Z
    if n_cells + 2 > np.iinfo(np.int32).max:
        # linear indices are int32 on device (jax canonicalizes int64 away
        # when x64 is off) — a larger grid would wrap silently
        raise ValueError(
            f"grid {tuple(grid)} has {n_cells} cells, exceeding the int32 "
            "linear-index range; shard the grid or enable jax x64")
    lin = (coords[:, 0] * Y + coords[:, 1]) * Z + coords[:, 2]
    # invalid sites sort to n_cells; queries use n_cells + 1 so neither can
    # ever match the other
    lin = jnp.where(valid, lin, n_cells)
    order = jnp.argsort(lin)
    lin_sorted = lin[order]
    inb = jnp.all((query >= 0) & (query < jnp.asarray([X, Y, Z])), axis=-1)
    qc = jnp.clip(query, 0, jnp.asarray([X - 1, Y - 1, Z - 1]))
    qlin = (qc[..., 0] * Y + qc[..., 1]) * Z + qc[..., 2]
    qlin = jnp.where(query_ok & inb, qlin, n_cells + 1)
    pos = jnp.clip(jnp.searchsorted(lin_sorted, qlin), 0, coords.shape[0] - 1)
    found = lin_sorted[pos] == qlin
    return jnp.where(found, order[pos], -1)


def build_neighbor_table(coords, valid, grid, kernel_size: int) -> jnp.ndarray:
    """[N, K] index of the active site at each stride-1 kernel tap, or -1.

    The gather backend's analogue of spconv's cached indice pairs: a stack
    of submanifold convs over the SAME active set can build this once and
    pass it to each layer via ``SubMConv3d(...)(..., nbr=table)`` (within
    one jit XLA's CSE usually dedupes the internal rebuilds anyway; the
    explicit table is for cross-jit reuse and clarity).
    """
    taps = _taps(kernel_size) - (kernel_size - 1) // 2
    return lookup_sites(coords, valid, grid,
                        coords[:, None, :] + taps[None], valid[:, None])


def _taps(kernel_size: int) -> jnp.ndarray:
    """Kernel tap offsets [K, 3] in the row-major (tx, ty, tz) order the
    dense conv kernel ``[k, k, k, C, D]`` reshapes to — tap t reads input at
    ``out_pos * stride - (k-1)//2 + t`` (torch-style symmetric padding,
    matching models.layers.Conv)."""
    k = kernel_size
    r = jnp.arange(k)
    tx, ty, tz = jnp.meshgrid(r, r, r, indexing="ij")
    return jnp.stack([tx, ty, tz], axis=-1).reshape(-1, 3)


class _TapGEMM(nn.Module):
    """Kernel/bias params at the dense ``nn.Conv`` shapes, applied as one
    gathered-tap GEMM."""

    features: int
    kernel_size: int
    use_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, gathered: jnp.ndarray) -> jnp.ndarray:  # [N, K, C]
        from ..models.layers import torch_conv_init

        k, C = self.kernel_size, gathered.shape[-1]
        kernel = self.param("kernel", torch_conv_init,
                            (k, k, k, C, self.features), jnp.float32)
        w = kernel.reshape(k ** 3, C, self.features).astype(self.dtype)
        # one [N, K*C] @ [K*C, D] MXU matmul over the gathered taps
        out = jnp.einsum("nkc,kcd->nd", gathered.astype(self.dtype), w)
        if self.use_bias:
            out = out + self.param("bias", nn.initializers.zeros,
                                   (self.features,), jnp.float32).astype(self.dtype)
        return out


class _GatherKernel(nn.Module):
    """The GEMM half of the gather backend.

    Instantiated under the module name ``conv`` with the params nested in a
    child named ``Conv_0`` — the exact tree the dense path's
    ``models.layers.Conv`` wrapper produces (it auto-names its inner
    ``nn.Conv``), so dense and gather backends share checkpoints verbatim.
    """

    features: int
    kernel_size: int
    use_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, gathered: jnp.ndarray) -> jnp.ndarray:  # [N, K, C]
        return _TapGEMM(self.features, self.kernel_size, self.use_bias,
                        self.dtype, name="Conv_0")(gathered)


class SubMConv3d(nn.Module):
    """Submanifold sparse conv: output only at input active sites.

    Matches spconv SubMConv3d semantics: dense conv over the densified grid,
    then re-sparsify at the ORIGINAL coords (so the active set never grows).
    """

    features: int
    kernel_size: int = 3
    use_bias: bool = False
    dtype: Any = jnp.float32
    backend: str = "dense"  # "dense" | "gather" (see module docstring)

    @nn.compact
    def __call__(self, feats, coords, valid, grid, nbr=None):
        from ..models.layers import Conv

        if self.backend == "gather":
            k = self.kernel_size
            if nbr is None:  # [N, K]; precompute via build_neighbor_table
                nbr = build_neighbor_table(coords, valid, grid, k)
            g = jnp.where((nbr >= 0)[..., None],
                          feats[jnp.clip(nbr, 0)], 0)
            out = _GatherKernel(self.features, k, self.use_bias, self.dtype,
                                name="conv")(g)
            return jnp.where(valid[:, None], out, 0), coords, valid
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
    backend: str = "dense"  # "dense" | "gather" (see module docstring)

    @nn.compact
    def __call__(self, feats, coords, valid, grid):
        from ..models.layers import Conv

        X, Y, Z = grid
        k, s = self.kernel_size, self.stride
        p = (k - 1) // 2  # torch-style symmetric padding (models.layers.Conv)
        out_grid = tuple((dim + 2 * p - k) // s + 1 for dim in grid)
        if self.backend == "gather":
            return self._gather(feats, coords, valid, grid, out_grid)
        dense = densify(feats, coords, valid, grid)[None]
        occ = densify(valid[:, None].astype(self.dtype), coords, valid, grid)[None]
        out = Conv(self.features, (self.kernel_size,) * 3, strides=(s, s, s),
                   use_bias=self.use_bias, dtype=self.dtype, name="conv")(dense)[0]
        # occupancy window must use the conv's exact (p, p) padding: "SAME"
        # places its odd padding cell on the high side at even sizes, which
        # shifts the mask one cell off the conv taps and drops active sites
        # whose only contributor sits at the low edge of the window
        occ_out = jax.lax.reduce_window(
            occ[0, ..., 0], 0.0, jax.lax.add,
            (k,) * 3, (s,) * 3, [(p, p)] * 3,
        )
        oX, oY, oZ = out.shape[:3]
        assert (oX, oY, oZ) == out_grid, (out.shape, out_grid)
        # new active set: top-K non-empty output cells (static capacity),
        # lowest linear index first among non-empty (ties broken by -arange)
        score = (occ_out > 0).astype(jnp.float32).reshape(-1)
        cap = min(self.max_out_sites, score.shape[0])
        _, lin = jax.lax.top_k(score + jnp.arange(score.shape[0]) * -1e-9, cap)
        new_valid = score[lin] > 0
        z = lin % oZ
        y = (lin // oZ) % oY
        x = lin // (oY * oZ)
        new_coords = jnp.stack([x, y, z], -1).astype(jnp.int32)
        new_feats = out.reshape(-1, self.features)[lin]
        new_feats = jnp.where(new_valid[:, None], new_feats, 0)
        return new_feats, new_coords, new_valid, (oX, oY, oZ)

    def _gather(self, feats, coords, valid, grid, out_grid):
        """Grid-free strided sparse conv: candidate output sites from the
        active inputs (N*K sort + dedupe-compaction), tap inputs resolved by
        binary search, conv as one gathered-GEMM.  Same active-set semantics
        and capacity policy as the dense path (every output cell whose
        receptive field contains an active input; lowest linear index kept
        on overflow)."""
        k, s = self.kernel_size, self.stride
        p = (k - 1) // 2
        oX, oY, oZ = out_grid
        n_out_cells = oX * oY * oZ
        taps = _taps(k)  # [K, 3]; output o reads input o*s - p + t

        # --- candidate output cells: o = (x + p - t) / s where divisible ---
        cand = coords[:, None, :] + p - taps[None]  # [N, K, 3]
        o = jnp.floor_divide(cand, s)
        ok = (
            valid[:, None]
            & jnp.all(cand == o * s, axis=-1)
            & jnp.all((o >= 0) & (o < jnp.asarray(out_grid)), axis=-1)
        )
        olin = jnp.where(ok, (o[..., 0] * oY + o[..., 1]) * oZ + o[..., 2],
                         n_out_cells).reshape(-1)
        olin = jnp.sort(olin)
        keep = (olin != n_out_cells) & jnp.concatenate(
            [jnp.ones((1,), bool), olin[1:] != olin[:-1]])
        # dedupe-compaction with static capacity: slot index = rank among
        # kept candidates; overflow (and dropped duplicates) land in the
        # scratch slot `cap` and are discarded
        cap = min(self.max_out_sites, n_out_cells)
        rank = jnp.cumsum(keep) - 1
        slot = jnp.where(keep & (rank < cap), rank, cap)
        table = jnp.full((cap + 1,), n_out_cells, olin.dtype).at[slot].set(olin)
        out_lin = table[:cap]
        new_valid = out_lin != n_out_cells
        safe = jnp.where(new_valid, out_lin, 0)
        new_coords = jnp.stack(
            [safe // (oY * oZ), (safe // oZ) % oY, safe % oZ], -1
        ).astype(jnp.int32)

        # --- gather the K input taps of each output site and GEMM ---
        q = new_coords[:, None, :] * s - p + taps[None]  # [cap, K, 3]
        nbr = lookup_sites(coords, valid, grid, q, new_valid[:, None])
        g = jnp.where((nbr >= 0)[..., None], feats[jnp.clip(nbr, 0)], 0)
        out = _GatherKernel(self.features, k, self.use_bias, self.dtype,
                            name="conv")(g)
        out = jnp.where(new_valid[:, None], out, 0)
        return out, new_coords, new_valid, out_grid


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
