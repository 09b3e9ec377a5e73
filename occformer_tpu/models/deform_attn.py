"""Multi-scale deformable attention over 3D voxel pyramids.

Reference: projects/mmdet3d_plugin/occformer/necks/multi_scale_deform_attn_3d.py
(pure-torch grid_sample formulation, :17-80 and :84-286).  TPU formulation:
per-query 3D sampling offsets and softmax weights come from linear layers
(MXU matmuls); the trilinear sampling itself is expressed with
``grid_sample_3d`` treating (batch × head) as the gather batch, so the whole
op is a handful of fused gathers — no im2col, no CUDA.

Coordinate convention: everything is (x, y, z) indexing the [X, Y, Z] volume
axes in order (the reference uses reversed (z, y, x) to satisfy torch's grid
layout; we have no such constraint).
"""
from __future__ import annotations

import math
from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.sampling import grid_sample_3d, grid_sample_3d_cfirst
from .layers import Linear


def deform_attn_offset_bias_init(num_heads: int, num_levels: int, num_points: int) -> np.ndarray:
    """Radial init of the sampling-offset bias (reference :162-181), (x, y, z)."""
    thetas = np.arange(num_heads, dtype=np.float32) * (2.0 * math.pi / num_heads)
    grid = np.stack([np.cos(thetas), np.sin(thetas),
                     (np.sin(thetas) + np.cos(thetas)) / 2.0], axis=-1)
    grid = grid / np.abs(grid).max(axis=-1, keepdims=True)
    grid = np.tile(grid[:, None, None, :], (1, num_levels, num_points, 1))
    for i in range(num_points):
        grid[:, :, i, :] *= i + 1
    return grid.reshape(-1).astype(np.float32)


class MultiScaleDeformableAttention3D(nn.Module):
    """Batch-first deformable attention: query [B, Nq, C], value [B, Nv, C]."""

    embed_dims: int = 256
    num_heads: int = 8
    num_levels: int = 3
    num_points: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,            # [B, Nq, C]
        value: jnp.ndarray,            # [B, Nv, C] (flattened multi-level)
        reference_points: jnp.ndarray,  # [B, Nq, L, 3] in [0, 1], (x, y, z)
        spatial_shapes: Sequence[Tuple[int, int, int]],  # static python list
        query_pos: jnp.ndarray = None,
        identity: jnp.ndarray = None,
    ) -> jnp.ndarray:
        B, Nq, C = query.shape
        H, L, P = self.num_heads, self.num_levels, self.num_points
        hd = C // H
        if identity is None:
            identity = query
        if query_pos is not None:
            query = query + query_pos

        value = Linear(C, dtype=self.dtype, name="value_proj")(value)
        Nv = value.shape[1]

        offsets = Linear(H * L * P * 3, dtype=self.dtype, name="sampling_offsets")(query)
        offsets = offsets.reshape(B, Nq, H, L, P, 3)
        weights = Linear(H * L * P, dtype=self.dtype, name="attention_weights")(query)
        weights = weights.reshape(B, Nq, H, L * P)
        weights = jax.nn.softmax(weights.astype(jnp.float32), axis=-1).astype(self.dtype)
        weights = weights.reshape(B, Nq, H, L, P)

        normalizer = jnp.asarray(
            [[s[0], s[1], s[2]] for s in spatial_shapes], jnp.float32
        )  # [L, 3]
        locs = (
            reference_points[:, :, None, :, None, :]
            + offsets.astype(jnp.float32) / normalizer[None, None, None, :, None, :]
        )  # [B, Nq, H, L, P, 3] in [0, 1]

        # per level: gather with (batch*head) as gather batch, features-first
        # layout so head_dim (small, e.g. 24) sits in the sublane dim — the
        # channels-last layout padded every corner gather ~5x on TPU
        value_heads = value.reshape(B, Nv, H, hd)
        out = jnp.zeros((B, Nq, H, hd), self.dtype)
        start = 0
        for l, (X, Y, Z) in enumerate(spatial_shapes):
            n = X * Y * Z
            v_l = value_heads[:, start : start + n]  # [B, n, H, hd]
            v_l = v_l.transpose(0, 2, 3, 1).reshape(B * H, hd, n)
            # [0,1] -> [-1,1] with align_corners=False (torch grid_sample parity)
            g = locs[:, :, :, l] * 2.0 - 1.0  # [B, Nq, H, P, 3]
            g = g.transpose(0, 2, 1, 3, 4).reshape(B * H, Nq * P, 3)
            s = grid_sample_3d_cfirst(v_l, (X, Y, Z), g, align_corners=False,
                                      padding_mode="zeros")  # [B*H, hd, Nq*P]
            s = s.reshape(B, H, hd, Nq, P)
            w = weights[:, :, :, l].transpose(0, 2, 1, 3)  # [B, H, Nq, P]
            out = out + jnp.einsum("bhqp,bhdqp->bqhd", w, s).astype(self.dtype)
            start += n

        out = out.reshape(B, Nq, C)
        out = Linear(C, dtype=self.dtype, name="output_proj")(out)
        return out + identity


def init_deform_attn_params(params: dict, num_heads: int, num_levels: int,
                            num_points: int) -> dict:
    """Apply the reference's special init: zero offset weights with radial
    bias, zero attention weights (reference :160-186).  Call on an
    already-initialized param subtree for this module."""
    import jax.tree_util as jtu

    p = dict(params)
    so = dict(p["sampling_offsets"])
    so["kernel"] = jnp.zeros_like(so["kernel"])
    so["bias"] = jnp.asarray(
        deform_attn_offset_bias_init(num_heads, num_levels, num_points)
    )
    p["sampling_offsets"] = so
    aw = dict(p["attention_weights"])
    aw["kernel"] = jnp.zeros_like(aw["kernel"])
    aw["bias"] = jnp.zeros_like(aw["bias"])
    p["attention_weights"] = aw
    return p
