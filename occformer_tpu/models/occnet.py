"""Dual-path 3D occupancy encoder.

Reference: projects/mmdet3d_plugin/occformer/backbones/{occnet.py,dualpath_block.py}.
Each block: 3D conv-in (stride) -> z-mean to the BEV plane -> the BEV map and
all z-slices are concatenated into ONE batch through a *shared* SwinBlock
(local path = per-slice windowed attention, global path = BEV attention) ->
ASPP on the BEV output -> sigmoid-gated fusion -> residual.

TPU notes: volumes are channels-last [B, X, Y, Z, C]; the slice batch is a
reshape (z becomes batch), so the shared SwinBlock runs as one big MXU-friendly
batch of (1 + Z) * B planes; ``jax.checkpoint`` replaces torch checkpointing
per stage (occnet.py:67-68).
"""
from __future__ import annotations

from functools import partial
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..registry import BACKBONES
from .aspp import BottleNeckASPP
from .layers import Conv, GroupNorm
from .swin import SwinBlock


class DualpathTransformerBlock(nn.Module):
    """Reference dualpath_block.py:13-82 re-expressed channels-last."""

    channels: int
    stride: int = 1
    layer_index: int = 0
    num_groups: int = 32
    aspp_drop: float = 0.1
    pack_windows: int = 1
    train: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, X, Y, Z, Cin = x.shape
        s = self.stride
        shift = (self.layer_index % 2) == 1
        num_heads = self.channels // 32

        identity = x
        y = Conv(self.channels, (3, 3, 3), strides=(s, s, s), use_bias=False,
                 dtype=self.dtype, name="input_conv")(x)
        y = GroupNorm(self.num_groups, dtype=self.dtype, name="input_gn")(y)
        y = nn.relu(y)
        _, Xs, Ys, Zs, C = y.shape

        # global path seed: z-mean BEV plane
        y_bev = jnp.mean(y, axis=3)  # [B, Xs, Ys, C]
        # local path: each z-slice is a plane; share one SwinBlock across
        # [BEV] ++ [slices] as a single batch (dualpath_block.py:70-73)
        slices = y.transpose(0, 3, 1, 2, 4).reshape(B * Zs, Xs, Ys, C)
        both = jnp.concatenate([y_bev, slices], axis=0)
        both = SwinBlock(
            embed_dims=C, num_heads=num_heads, feedforward_channels=C,
            window_size=7, shift=shift, drop_path_rate=0.2,
            pack_windows=self.pack_windows,
            train=self.train, dtype=self.dtype, name="bev_encoder",
        )(both)
        y_bev, slices = both[:B], both[B:]
        y = slices.reshape(B, Zs, Xs, Ys, C).transpose(0, 2, 3, 1, 4)

        y_bev = BottleNeckASPP(num_groups=self.num_groups, dtype=self.dtype,
                               name="aspp")(y_bev)

        coeff = Conv(1, (1, 1, 1), use_bias=True, dtype=self.dtype,
                     name="combine_coeff")(y)
        y = y + jax.nn.sigmoid(coeff) * y_bev[:, :, :, None, :]

        if s > 1 or Cin != self.channels:
            identity = Conv(self.channels, (1, 1, 1), strides=(s, s, s),
                            use_bias=False, dtype=self.dtype, name="downsample_conv")(identity)
            identity = GroupNorm(self.num_groups, dtype=self.dtype,
                                 name="downsample_gn")(identity)
        return y + identity


@BACKBONES.register_module()
class OccupancyEncoder(nn.Module):
    """4-stage dual-path encoder returning multi-scale volumes (occnet.py:12-75)."""

    in_channels: int = 128
    num_stage: int = 4
    block_numbers: Sequence[int] = (2, 2, 2, 2)
    block_inplanes: Sequence[int] = (128, 256, 512, 1024)
    block_strides: Sequence[int] = (1, 2, 2, 2)
    out_indices: Sequence[int] = (0, 1, 2, 3)
    num_groups: int = 32
    with_cp: bool = True
    pack_windows: int = 1  # Swin windows per attention row (MXU tiling lever)
    train: bool = False
    dtype: Any = jnp.float32
    norm_cfg: Any = None  # config parity

    @nn.compact
    def __call__(self, x):
        # gradient checkpointing: rematerialize each block's activations on
        # the backward pass (reference occnet.py:67-68 torch cp.checkpoint)
        block_cls = (
            nn.remat(DualpathTransformerBlock)
            if (self.with_cp and self.train)
            else DualpathTransformerBlock
        )
        outs = []
        layer_index = 0
        for i in range(self.num_stage):
            for j in range(self.block_numbers[i]):
                x = block_cls(
                    channels=self.block_inplanes[i],
                    stride=self.block_strides[i] if j == 0 else 1,
                    layer_index=layer_index,
                    num_groups=self.num_groups,
                    pack_windows=self.pack_windows,
                    train=self.train,
                    dtype=self.dtype,
                    name=f"stage{i}_block{j}",
                )(x)
                layer_index += 1
            if i in self.out_indices:
                outs.append(x)
        return tuple(outs)
