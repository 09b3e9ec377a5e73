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
from jax.ad_checkpoint import checkpoint_name

from ..ops.sampling import grid_sample_3d, grid_sample_3d_cfirst
from ..ops.trilerp import trilerp_gather_slab
from ..ops.trilerp_fused import fused_multilevel_weighted_gather
from .layers import Linear

# remat-policy tag for the fused gather output: the encoder-layer remat
# (pixel_decoder) saves values with this name, so the backward recompute
# SKIPS the forward gather kernels entirely — the custom VJP needs only
# (table, meta), both cheap to rebuild, never the forward output.  Cost:
# one [B*H, hd, Nq] bf16 residual per layer (~14 MB at flagship).
DEFORM_GATHER_CKPT = "deform_gather"


def resolve_gather_impl(gather_impl: str) -> str:
    """'auto' -> the MXU Pallas kernel on TPU, the XLA path elsewhere.

    'mxu' / 'xla' force a path; 'mxu_interpret' runs the Pallas kernel in
    interpreter mode (CPU test coverage of the real hot-path code,
    SURVEY §4 implication (1))."""
    if gather_impl == "auto":
        return "mxu" if jax.default_backend() == "tpu" else "xla"
    # 'skip' (DEBUG ONLY, tools/bench_pixel_decoder.py): replaces the gather
    # with zeros to measure everything-but-the-gather — NEVER a model config
    assert gather_impl in ("mxu", "xla", "mxu_interpret", "skip"), gather_impl
    return gather_impl


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
    # Process queries in this many sequential, individually-rematerialized
    # chunks.  XLA's TPU gather emitter pads the per-head corner gathers to
    # 128 lanes (5.3x for head_dim 24); with chunks > 1 only one chunk's
    # padded temps are live during the backward pass — the lever that lets
    # the R101-DCN 896x1600 config train on a 16G chip.  1 = off.
    query_chunks: int = 1
    # trilinear-gather backend: 'auto' | 'mxu' | 'xla' | 'mxu_interpret'.
    # 'mxu' is the Pallas one-hot kernel (ops/trilerp.py) — the round-4 fix
    # for the serial XLA gather that was 95% of the flagship frame.
    gather_impl: str = "auto"
    # windowed-kernel width: each sample block matmuls a gather_window-row
    # dynamic table slice instead of the full X*Y rows (queries are a
    # flattened grid, so blocks are spatially local; an exact escape pass
    # covers offset outliers).  -1 = measured per-level policy
    # (.probe_trilerp_amortized.json, slope-timed on chip): XY/4 for the
    # 64x64 level (w640 escapes on 88% of blocks — a 2-voxel x-jitter spans
    # >10 rows of Y=64 — while w1024 stays local and runs 2.4x faster than
    # full width), 640 for the 32x32 level, full width below.  An int >= 0
    # forces that window on every level (0 = full-width one-hot).
    gather_window: int = -1
    # Pallas sample-block size.  -1 = measured per-level policy (512 on the
    # 64x64 level, 1024 below — the per-grid-step overhead floor dominates
    # the small levels, so fewer/bigger blocks win there).
    gather_s_block: int = -1
    # Fuse ALL levels' gathers into ONE Pallas call (ops/trilerp_fused.py):
    # removes the per-call dispatch + the per-grid-step overhead floor that
    # dominated the small levels (round-4 map #4).  Applies to the mxu
    # paths only; the window is the largest level's measured policy (its
    # range trivially covers the smaller levels' whole row spans).
    gather_fused: bool = True
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

        # reference init_weights parity (multi_scale_deform_attn_3d.py:160-186):
        # zero offset/weight kernels, radial offset bias, zero weight bias —
        # applied HERE so every init path (train CLI, trials, tests) gets it
        offsets = Linear(
            H * L * P * 3, dtype=self.dtype, name="sampling_offsets",
            kernel_init=nn.initializers.zeros,
            bias_init=lambda key, shape, dtype=jnp.float32: jnp.asarray(
                deform_attn_offset_bias_init(H, L, P), dtype).reshape(shape),
        )(query)
        offsets = offsets.reshape(B, Nq, H, L, P, 3)
        weights = Linear(
            H * L * P, dtype=self.dtype, name="attention_weights",
            kernel_init=nn.initializers.zeros,
        )(query)
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

        impl = resolve_gather_impl(self.gather_impl)
        interp = impl == "mxu_interpret"
        use_mxu = impl in ("mxu", "mxu_interpret")

        # per level: gather with (batch*head) as gather batch.  MXU kernel
        # path: slab layout [B*H, X*Y, Z*hd] (xy rows, z-major lanes).  XLA
        # path: features-first [B*H, hd, n] so head_dim (small, e.g. 24)
        # stays out of the minor (lane) dim.
        value_heads = value.reshape(B, Nv, H, hd)
        v_levels = []
        start = 0
        for (X, Y, Z) in spatial_shapes:
            n = X * Y * Z
            v_l = value_heads[:, start : start + n]  # [B, n, H, hd]
            if use_mxu:
                v_levels.append(
                    v_l.reshape(B, X, Y, Z, H, hd)
                    .transpose(0, 4, 1, 2, 3, 5)
                    .reshape(B * H, X * Y, Z * hd))
            else:
                v_levels.append(v_l.transpose(0, 2, 3, 1).reshape(B * H, hd, n))
            start += n

        def sample(locs_flat, weights_flat):
            """Pure gather+lerp+weighted-sum for a chunk of queries.

            Arguments arrive FLATTENED to [B, nq, H*L*P*3] / [B, nq, H*L*P]:
            they are saved as residuals at the jax.checkpoint boundary, and a
            trailing dim of 3 or 4 pads to 128 lanes (62x) — flat layouts
            keep the residuals dense.  Returns [B, nq, H, hd].
            """
            nq = locs_flat.shape[1]
            locs_c = locs_flat.reshape(B, nq, H, L, P, 3)
            weights_c = weights_flat.reshape(B, nq, H, L, P)
            acc = jnp.zeros((B, nq, H, hd), self.dtype)
            if use_mxu and self.gather_fused:
                coords_l, weights_l = [], []
                for l in range(L):
                    g = locs_c[:, :, :, l] * 2.0 - 1.0  # [B, nq, H, P, 3]
                    coords_l.append(
                        g.transpose(0, 2, 1, 3, 4).reshape(B * H, nq * P, 3))
                    w = weights_c[:, :, :, l]           # [B, nq, H, P]
                    weights_l.append(
                        w.transpose(0, 2, 1, 3).reshape(B * H, nq * P))
                if self.gather_window >= 0:
                    win = [self.gather_window] * L
                else:  # measured per-level policy (attribute doc); the
                    # segmented kernel applies each level's own window
                    win = [xy // 4 if (xy := X * Y) >= 4096 else (
                        640 if xy >= 1024 else 0)
                        for (X, Y, Z) in spatial_shapes]
                sb = self.gather_s_block if self.gather_s_block > 0 else 512
                # weighted fold: the attention-weighted P-sum happens
                # IN-KERNEL; outputs are per-QUERY ([B*H, hd, nq]), so the
                # einsum + [B, H, hd, nq, P] reshape glue disappears
                samples = fused_multilevel_weighted_gather(
                    v_levels, list(spatial_shapes), hd, coords_l, weights_l,
                    P, align_corners=False, s_block=sb, interpret=interp,
                    window=win)  # per level [B*H, hd, nq]
                out_g = sum(samples[1:], samples[0])
                out_g = checkpoint_name(out_g, DEFORM_GATHER_CKPT)
                return jnp.transpose(
                    out_g.reshape(B, H, hd, nq), (0, 3, 1, 2)
                ).astype(self.dtype)
            for l, (X, Y, Z) in enumerate(spatial_shapes):
                # [0,1] -> [-1,1], align_corners=False (torch grid_sample parity)
                g = locs_c[:, :, :, l] * 2.0 - 1.0  # [B, nq, H, P, 3]
                g = g.transpose(0, 2, 1, 3, 4).reshape(B * H, nq * P, 3)
                if impl == "skip":
                    # debug: gather cost ablation — touch the inputs so XLA
                    # cannot DCE the value layout work, but do no gather
                    s = jnp.zeros((B * H, hd, nq * P), self.dtype) \
                        + v_levels[l][:, :hd, :1] * 0 \
                        + g[:, :1, :1].astype(self.dtype) * 0
                elif use_mxu:
                    xy = X * Y
                    if self.gather_window >= 0:
                        win = self.gather_window
                    else:  # measured policy, see attribute doc
                        win = xy // 4 if xy >= 4096 else (
                            640 if xy >= 1024 else 0)
                    sb = self.gather_s_block if self.gather_s_block > 0 \
                        else (512 if xy >= 4096 else 1024)
                    s = trilerp_gather_slab(
                        v_levels[l], (X, Y, Z), hd, g, align_corners=False,
                        interpret=interp, window=win, s_block=sb,
                    )  # [B*H, hd, nq*P]
                else:
                    s = grid_sample_3d_cfirst(
                        v_levels[l], (X, Y, Z), g, align_corners=False,
                        padding_mode="zeros", compute_dtype=self.dtype,
                    )  # [B*H, hd, nq*P]
                s = s.reshape(B, H, hd, nq, P)
                w = weights_c[:, :, :, l].transpose(0, 2, 1, 3)  # [B, H, nq, P]
                # keep the weighted sum in compute dtype: the contraction is
                # only over P (=4) points; default f32 accumulation would
                # materialize a [nq, H, hd, P] f32 temp per layer
                acc = acc + jnp.einsum(
                    "bhqp,bhdqp->bqhd", w, s, preferred_element_type=self.dtype
                ).astype(self.dtype)
            return acc

        K = max(1, min(self.query_chunks, Nq))
        locs_flat = locs.reshape(B, Nq, H * L * P * 3)
        weights_flat = weights.reshape(B, Nq, H * L * P)
        if K == 1:
            out = sample(locs_flat, weights_flat)
        else:
            bounds = [round(i * Nq / K) for i in range(K + 1)]
            chunk_fn = jax.checkpoint(sample)
            chunks = []
            locs_dep = locs_flat
            for s, e in zip(bounds[:-1], bounds[1:]):
                if chunks:
                    # serialize chunks: without the barrier XLA schedules
                    # all chunk forwards concurrently and their padded
                    # gather temps coexist (same pattern as the gt_chunks
                    # and per-camera-scatter levers)
                    locs_dep, _ = jax.lax.optimization_barrier(
                        (locs_dep, chunks[-1]))
                chunks.append(chunk_fn(locs_dep[:, s:e], weights_flat[:, s:e]))
            out = jnp.concatenate(chunks, axis=1)

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
