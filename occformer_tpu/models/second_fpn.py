"""SECONDFPN image neck: per-scale resize-to-common-stride then concat.

Reference: mmdetection3d/mmdet3d/models/necks/second_fpn.py:12-100.  Each input
level gets a deconv (stride > 1), identity-kernel conv (stride == 1) or a
strided conv (fractional stride), then BN+ReLU; outputs concat on channels.
For OccFormer: in [256,512,1024,2048] @ strides 4/8/16/32, upsample_strides
[0.25, 0.5, 1, 2] -> one [B, H/16, W/16, 512] map.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..registry import NECKS
from .layers import BatchNorm, Conv, ConvTranspose


@NECKS.register_module()
class SECONDFPN(nn.Module):
    in_channels: Sequence[int] = (128, 128, 256)
    out_channels: Sequence[int] = (256, 256, 256)
    upsample_strides: Sequence[float] = (1, 2, 4)
    use_conv_for_no_stride: bool = False
    train: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats):
        assert len(feats) == len(self.in_channels)
        ups = []
        for i, (x, oc, s) in enumerate(zip(feats, self.out_channels, self.upsample_strides)):
            if s > 1 or (s == 1 and not self.use_conv_for_no_stride):
                s_i = int(np.round(s))
                y = ConvTranspose(oc, (s_i, s_i), (s_i, s_i), use_bias=False,
                                  dtype=self.dtype, name=f"deblock{i}_up")(x)
            else:
                s_i = int(np.round(1 / s))
                y = Conv(oc, (s_i, s_i), strides=(s_i, s_i), padding=(0, 0),
                         use_bias=False, dtype=self.dtype, name=f"deblock{i}_conv")(x)
            # reference norm_cfg: BN eps 1e-3, momentum 0.01 (second_fpn.py:31)
            y = BatchNorm(use_running_average=not self.train, eps=1e-3,
                          momentum=0.99, dtype=self.dtype, name=f"deblock{i}_bn")(y)
            ups.append(nn.relu(y))
        if len(ups) > 1:
            return jnp.concatenate(ups, axis=-1)
        return ups[0]
