"""Pooling ops: torch ``adaptive_max_pool3d`` parity via ``lax.reduce_window``.

The occupancy head downsamples attention masks with *max* pooling rather than
trilinear interpolation so rare-class positives survive
("preserve-pooling", reference mask2former/mask2former_occ.py:477-486).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def adaptive_max_pool3d(x: jnp.ndarray, out_size: Tuple[int, int, int]) -> jnp.ndarray:
    """Adaptive 3D max pool over a channels-last volume ``[B, X, Y, Z, C]``.

    Matches torch ``F.adaptive_max_pool3d`` exactly when each input dim is an
    integer multiple of the output dim (always true for OccFormer's power-of-2
    scale pyramid); otherwise falls back to torch's variable-window formula
    implemented with a gather-free max over the union window plus masking.
    """
    B, X, Y, Z, C = x.shape
    ox, oy, oz = out_size
    if X % ox == 0 and Y % oy == 0 and Z % oz == 0:
        kx, ky, kz = X // ox, Y // oy, Z // oz
        return jax.lax.reduce_window(
            x,
            -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
            jax.lax.max,
            window_dimensions=(1, kx, ky, kz, 1),
            window_strides=(1, kx, ky, kz, 1),
            padding="VALID",
        )

    # general case: torch uses start = floor(i*X/ox), end = ceil((i+1)*X/ox)
    def pool_axis(arr, in_size, out_size_ax, axis):
        starts = (jnp.arange(out_size_ax) * in_size) // out_size_ax
        ends = -((-(jnp.arange(out_size_ax) + 1) * in_size) // out_size_ax)
        max_k = int(jnp.max(ends - starts))
        idx = starts[:, None] + jnp.arange(max_k)[None, :]
        mask = idx < ends[:, None]
        idx = jnp.clip(idx, 0, in_size - 1)
        gathered = jnp.take(arr, idx.reshape(-1), axis=axis)
        new_shape = arr.shape[:axis] + (out_size_ax, max_k) + arr.shape[axis + 1 :]
        gathered = gathered.reshape(new_shape)
        neg = -jnp.inf if jnp.issubdtype(arr.dtype, jnp.floating) else jnp.iinfo(arr.dtype).min
        mshape = [1] * gathered.ndim
        mshape[axis] = out_size_ax
        mshape[axis + 1] = max_k
        gathered = jnp.where(mask.reshape(mshape), gathered, neg)
        return jnp.max(gathered, axis=axis + 1)

    x = pool_axis(x, X, ox, 1)
    x = pool_axis(x, Y, oy, 2)
    x = pool_axis(x, Z, oz, 3)
    return x
