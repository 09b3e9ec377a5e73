"""MSDeformAttn pixel decoder in 3D: the Mask2Former "neck" over voxel scales.

Reference: projects/mmdet3d_plugin/occformer/necks/multiscale_deformattn_3d.py:21-249.
The 3 coarsest scales are projected, tagged with 3D sine + level embeddings and
run through a 6-layer deformable-attention encoder over their flattened
(x-major) tokens; the finest scale is fused FPN-style with a trilinear
upsample; a 1x1 Conv3d produces the mask feature.

Token counts are tiny on TPU terms (OccFormer nuScenes: 4096 + 512 + 64), so
the encoder is pure MXU work.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..registry import NECKS
from .deform_attn import DEFORM_GATHER_CKPT, MultiScaleDeformableAttention3D
from .layers import Conv, FFN, GroupNorm, LayerNorm
from .pos_embed import sine_positional_encoding_3d


def _gather_saving_policy():
    """Encoder-layer remat policy: save the fused gather outputs
    (checkpoint_name tag in deform_attn) so the backward recompute skips
    the forward gather kernels — their custom VJP needs only (table, meta),
    both cheap to rebuild from the layer input.  ~14 MB/layer of residuals
    buys back the full forward gather cost in every backward."""
    return jax.checkpoint_policies.save_only_these_names(DEFORM_GATHER_CKPT)


def _reference_points(spatial_shapes) -> np.ndarray:
    """Per-level [0,1] grid centers, (x, y, z), flattened x-major.

    Mirrors MlvlPointGenerator.single_level_grid_priors with offset 0.5
    (utils/point_generator.py:77-136) followed by the [0,1] normalization in
    the decoder forward (multiscale_deformattn_3d.py:166-171); the level
    stride cancels in the normalization, so it never appears here.
    """
    pts = []
    for (X, Y, Z) in spatial_shapes:
        xs = (np.arange(X, dtype=np.float32) + 0.5) / X
        ys = (np.arange(Y, dtype=np.float32) + 0.5) / Y
        zs = (np.arange(Z, dtype=np.float32) + 0.5) / Z
        g = np.stack(np.meshgrid(xs, ys, zs, indexing="ij"), axis=-1)
        pts.append(g.reshape(-1, 3))
    return np.concatenate(pts, axis=0)


class DeformableEncoderLayer(nn.Module):
    """self(deform)-attn -> LN -> FFN -> LN (operation_order of the config).

    ``spatial_shapes`` is a static module field (not a call arg) so nn.remat
    never tries to trace it."""

    embed_dims: int
    num_heads: int
    num_levels: int
    num_points: int
    feedforward_channels: int
    spatial_shapes: Any = None
    query_chunks: int = 1
    gather_impl: str = "auto"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, pos, reference_points):
        y = MultiScaleDeformableAttention3D(
            embed_dims=self.embed_dims, num_heads=self.num_heads,
            num_levels=self.num_levels, num_points=self.num_points,
            query_chunks=self.query_chunks, gather_impl=self.gather_impl,
            dtype=self.dtype, name="attn",
        )(x, x, reference_points, self.spatial_shapes, query_pos=pos)
        y = LayerNorm(dtype=self.dtype, name="norm1")(y)
        y = FFN(self.embed_dims, self.feedforward_channels, act=nn.relu,
                dtype=self.dtype, name="ffn")(y)
        return LayerNorm(dtype=self.dtype, name="norm2")(y)


class _ScannedEncoderLayer(nn.Module):
    """nn.scan body: one rematerialized DeformableEncoderLayer per step.

    Param tree: ``layers/layer/...`` with a stacked leading axis of
    num_encoder_layers — HLO contains ONE layer body instead of six
    (round-2's unrolled-layers decision rested on the retracted
    block_until_ready loop-pathology measurement; fetch-forced probes show
    multi-iteration scan over large bodies is fine, NOTES.md)."""

    embed_dims: int
    num_heads: int
    num_levels: int
    num_points: int
    feedforward_channels: int
    spatial_shapes: Any = None
    query_chunks: int = 1
    gather_impl: str = "auto"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, pos, reference_points):
        y = nn.remat(DeformableEncoderLayer, policy=_gather_saving_policy())(
            embed_dims=self.embed_dims, num_heads=self.num_heads,
            num_levels=self.num_levels, num_points=self.num_points,
            feedforward_channels=self.feedforward_channels,
            spatial_shapes=self.spatial_shapes,
            query_chunks=self.query_chunks, gather_impl=self.gather_impl,
            dtype=self.dtype, name="layer",
        )(x, pos, reference_points)
        return y, None


@NECKS.register_module()
class MSDeformAttnPixelDecoder3D(nn.Module):
    """Multi-scale voxel features -> [mask_feat, scale0, scale1, scale2, scale3].

    Input: tuple of channels-last volumes fine -> coarse
    ([B, X_i, Y_i, Z_i, C_i]); output list mirrors the reference's ordering
    (mask feature first, then fine -> coarse encoder outputs).
    """

    in_channels: Sequence[int] = (256, 512, 1024, 2048)
    strides: Sequence[int] = (4, 8, 16, 32)
    feat_channels: int = 256
    out_channels: int = 256
    num_encoder_levels: int = 3
    num_encoder_layers: int = 6
    num_heads: int = 8
    num_points: int = 4
    feedforward_channels: Optional[int] = None
    num_groups: int = 32
    pos_num_feats: Optional[int] = None
    # sequential remat chunks for the deform-attn queries (memory lever for
    # training big configs; see MultiScaleDeformableAttention3D.query_chunks)
    query_chunks: int = 1
    gather_impl: str = "auto"
    # scan-with-stacked-params over the encoder layers (params under
    # layers/layer/* with a stacked leading axis).  False = unrolled
    # per-layer params (layer{i}/*) — kept for the equivalence test.
    scan_layers: bool = True
    dtype: Any = jnp.float32
    # config-parity extras (ignored: structure is derived from them upstream)
    encoder: Any = None
    positional_encoding: Any = None
    norm_cfg: Any = None
    num_outs: int = 3

    @nn.compact
    def __call__(self, feats):
        n_in = len(feats)
        n_enc = self.num_encoder_levels
        C = self.feat_channels
        ffc = self.feedforward_channels or C * 4
        pos_feats = self.pos_num_feats or C // 3
        B = feats[0].shape[0]

        # ---- encoder inputs: coarsest first (reference :151-185) ----
        tokens, poses, shapes = [], [], []
        for i in range(n_enc):
            level_idx = n_in - i - 1
            f = feats[level_idx]
            X, Y, Z = f.shape[1:4]
            proj = Conv(C, (1, 1, 1), use_bias=True, dtype=self.dtype,
                        name=f"input_conv{i}")(f)
            proj = GroupNorm(self.num_groups, dtype=self.dtype,
                             name=f"input_gn{i}")(proj)
            pos = sine_positional_encoding_3d((X, Y, Z), pos_feats)[..., :C]
            tokens.append(proj.reshape(B, X * Y * Z, C))
            poses.append(jnp.asarray(pos.reshape(1, X * Y * Z, -1)))
            shapes.append((X, Y, Z))
        level_embed = self.param(
            "level_encoding", nn.initializers.normal(1.0), (n_enc, C), jnp.float32
        )
        pos_all = jnp.concatenate(
            [p + level_embed[i][None, None, :] for i, p in enumerate(poses)], axis=1
        ).astype(self.dtype)
        x = jnp.concatenate(tokens, axis=1)

        ref = jnp.asarray(_reference_points(tuple(shapes)))
        ref = jnp.broadcast_to(ref[None, :, None, :], (B, ref.shape[0], n_enc, 3))

        layer_kw = dict(
            embed_dims=C, num_heads=self.num_heads, num_levels=n_enc,
            num_points=self.num_points, feedforward_channels=ffc,
            spatial_shapes=tuple(shapes), query_chunks=self.query_chunks,
            gather_impl=self.gather_impl, dtype=self.dtype,
        )
        if self.scan_layers and self.num_encoder_layers > 1:
            stack = nn.scan(
                _ScannedEncoderLayer,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                in_axes=(nn.broadcast, nn.broadcast),
                length=self.num_encoder_layers,
            )
            x, _ = stack(**layer_kw, name="layers")(x, pos_all, ref)
        else:
            for li in range(self.num_encoder_layers):
                # remat: corner-gather buffers are recomputed in backward
                # instead of staying live across all encoder layers (the
                # fused gather OUTPUT is saved via the policy — see
                # _gather_saving_policy)
                x = nn.remat(DeformableEncoderLayer,
                             policy=_gather_saving_policy())(
                    **layer_kw, name=f"layer{li}",
                )(x, pos_all, ref)

        # split back into volumes, coarsest first
        outs = []
        start = 0
        for (X, Y, Z) in shapes:
            n = X * Y * Z
            outs.append(x[:, start : start + n].reshape(B, X, Y, Z, C))
            start += n

        # ---- FPN over the remaining fine levels (reference :228-243) ----
        from ..ops.sampling import resize_trilinear

        for i in range(n_in - n_enc - 1, -1, -1):
            f = feats[i]
            lat = Conv(C, (1, 1, 1), use_bias=False, dtype=self.dtype,
                       name=f"lateral_conv{i}")(f)
            lat = GroupNorm(self.num_groups, dtype=self.dtype,
                            name=f"lateral_gn{i}")(lat)
            up = resize_trilinear(outs[-1], f.shape[1:4], align_corners=False)
            y = lat + up
            y = Conv(C, (3, 3, 3), use_bias=False, dtype=self.dtype,
                     name=f"output_conv{i}")(y)
            y = GroupNorm(self.num_groups, dtype=self.dtype, name=f"output_gn{i}")(y)
            y = nn.relu(y)
            outs.append(y)

        # the finest level becomes the mask feature (reference :245-246
        # replaces outs[-1] in place, so the pre-projection finest map is
        # not returned separately)
        outs[-1] = Conv(self.out_channels, (1, 1, 1), use_bias=True,
                        dtype=self.dtype, name="mask_feature")(outs[-1])
        return outs[::-1]  # [mask_feat, fine, ..., coarse]
