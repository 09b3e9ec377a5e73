"""GroupNorm ASPP for the dual-path encoder's global (BEV) path.

Reference: projects/mmdet3d_plugin/occformer/backbones/modules/aspp.py:49-171.
2D, channels-last; norm is GN (the encoder's norm_cfg), with the group count
halved when the reduced channel count is <= num_groups (aspp.py:150-153).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from .layers import Conv, GroupNorm


class ASPP2D(nn.Module):
    """1x1 + dilated 3x3 branches + GAP branch -> concat -> 1x1, residual."""

    mid_channels: Optional[int] = None
    dilations: Sequence[int] = (1, 6, 12, 18)
    num_groups: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        mid = self.mid_channels or C // 2

        def branch(inp, k, dil, name):
            pad = 0 if k == 1 else dil
            y = Conv(mid, (k, k), padding=(pad, pad), dilation=(dil, dil),
                     use_bias=False, dtype=self.dtype, name=f"{name}_conv")(inp)
            y = GroupNorm(self.num_groups, dtype=self.dtype, name=f"{name}_gn")(y)
            return nn.relu(y)

        x1 = branch(x, 1, self.dilations[0], "aspp1")
        x2 = branch(x, 3, self.dilations[1], "aspp2")
        x3 = branch(x, 3, self.dilations[2], "aspp3")
        x4 = branch(x, 3, self.dilations[3], "aspp4")
        g = jnp.mean(x, axis=(1, 2), keepdims=True)
        g = Conv(mid, (1, 1), use_bias=False, dtype=self.dtype, name="gap_conv")(g)
        g = nn.relu(GroupNorm(self.num_groups, dtype=self.dtype, name="gap_gn")(g))
        g = jnp.broadcast_to(g, (B, H, W, mid))

        y = jnp.concatenate([x1, x2, x3, x4, g], axis=-1)
        y = Conv(C, (1, 1), use_bias=False, dtype=self.dtype, name="project_conv")(y)
        y = nn.relu(GroupNorm(self.num_groups, dtype=self.dtype, name="project_gn")(y))
        return x + y


class BottleNeckASPP(nn.Module):
    """1x1 reduce (r=4) -> ASPP -> 1x1 expand, residual (aspp.py:132-171)."""

    reduction: int = 4
    num_groups: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        mid = C // self.reduction
        # reference halves the group count when the reduced width ties the
        # group count (aspp.py:150-153)
        aspp_groups = self.num_groups if mid > self.num_groups else mid // 2

        y = Conv(mid, (1, 1), use_bias=False, dtype=self.dtype, name="input_conv")(x)
        y = nn.relu(GroupNorm(self.num_groups, dtype=self.dtype, name="input_gn")(y))
        y = ASPP2D(mid_channels=mid, num_groups=aspp_groups, dtype=self.dtype,
                   name="aspp")(y)
        y = Conv(C, (1, 1), use_bias=False, dtype=self.dtype, name="output_conv")(y)
        y = nn.relu(GroupNorm(self.num_groups, dtype=self.dtype, name="output_gn")(y))
        return x + y
