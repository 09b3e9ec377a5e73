"""ResNet image backbone (channels-last flax), torchvision/mmdet layout.

Replaces the mmdet ResNet used as ``img_backbone`` (reference config
occformer_nusc_r50_256x704.py:66-77; mmdet.models.backbones.resnet).  The
parameter tree is named to mirror torchvision (layer{i}.{j}.conv{k}/bn{k},
downsample.0/1) so the checkpoint converter is a pure name map.

style='pytorch': the stride-2 conv is the 3x3 (torchvision default), matching
the config.  Optional DCNv2 stages cover the R101-DCN variant
(occformer_nusc_r101_896x1600.py diff).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..registry import BACKBONES
from .layers import BatchNorm, Conv
from .dcn import DeformConv2d

ARCH_SETTINGS = {
    18: ("basic", (2, 2, 2, 2)),
    34: ("basic", (3, 4, 6, 3)),
    50: ("bottleneck", (3, 4, 6, 3)),
    101: ("bottleneck", (3, 4, 23, 3)),
    152: ("bottleneck", (3, 8, 36, 3)),
}


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    has_downsample: bool = False
    with_dcn: bool = False
    train: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        identity = x
        y = Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = BatchNorm(use_running_average=not self.train, dtype=self.dtype, name="bn1")(y)
        y = nn.relu(y)
        if self.with_dcn:
            y = DeformConv2d(
                self.planes, kernel_size=3, strides=(self.stride, self.stride),
                modulated=True, dtype=self.dtype, name="conv2",
            )(y)
        else:
            y = Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                     use_bias=False, dtype=self.dtype, name="conv2")(y)
        y = BatchNorm(use_running_average=not self.train, dtype=self.dtype, name="bn2")(y)
        y = nn.relu(y)
        y = Conv(self.planes * 4, (1, 1), use_bias=False, dtype=self.dtype, name="conv3")(y)
        y = BatchNorm(use_running_average=not self.train, dtype=self.dtype, name="bn3")(y)
        if self.has_downsample:
            identity = Conv(self.planes * 4, (1, 1), strides=(self.stride, self.stride),
                            use_bias=False, dtype=self.dtype, name="downsample_conv")(x)
            identity = BatchNorm(use_running_average=not self.train, dtype=self.dtype,
                                 name="downsample_bn")(identity)
        return nn.relu(y + identity)


class BasicResBlock(nn.Module):
    planes: int
    stride: int = 1
    has_downsample: bool = False
    with_dcn: bool = False
    train: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        identity = x
        y = Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                 use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = BatchNorm(use_running_average=not self.train, dtype=self.dtype, name="bn1")(y)
        y = nn.relu(y)
        if self.with_dcn:  # mmdet applies dcn to the second 3x3 of BasicBlock
            y = DeformConv2d(self.planes, kernel_size=3, modulated=True,
                             dtype=self.dtype, name="conv2")(y)
        else:
            y = Conv(self.planes, (3, 3), use_bias=False, dtype=self.dtype,
                     name="conv2")(y)
        y = BatchNorm(use_running_average=not self.train, dtype=self.dtype, name="bn2")(y)
        if self.has_downsample:
            identity = Conv(self.planes, (1, 1), strides=(self.stride, self.stride),
                            use_bias=False, dtype=self.dtype, name="downsample_conv")(x)
            identity = BatchNorm(use_running_average=not self.train, dtype=self.dtype,
                                 name="downsample_bn")(identity)
        return nn.relu(y + identity)


@BACKBONES.register_module()
class ResNet(nn.Module):
    """Channels-last ResNet returning the stages in ``out_indices``.

    Input  [B, H, W, 3]  ->  tuple of [B, H/2^(i+2), W/2^(i+2), C_i].
    """

    depth: int = 50
    out_indices: Sequence[int] = (0, 1, 2, 3)
    dcn_stages: Sequence[int] = ()  # stage idxs (0-based) using DCNv2, e.g. (2, 3)
    frozen_stages: int = -1  # accepted for config parity; freezing is an
    # optimizer concern in this framework (optax mask), not a module one
    norm_eval: bool = False
    train: bool = False
    dtype: Any = jnp.float32
    # accepted-for-parity extras from mmdet configs
    num_stages: int = 4
    style: str = "pytorch"
    pretrained: Optional[str] = None
    norm_cfg: Optional[dict] = None

    @nn.compact
    def __call__(self, x):
        block_type, stage_blocks = ARCH_SETTINGS[self.depth]
        block_cls = Bottleneck if block_type == "bottleneck" else BasicResBlock
        expansion = 4 if block_type == "bottleneck" else 1
        bn_train = self.train and not self.norm_eval

        y = Conv(64, (7, 7), strides=(2, 2), use_bias=False, dtype=self.dtype,
                 name="conv1")(x)
        y = BatchNorm(use_running_average=not bn_train, dtype=self.dtype, name="bn1")(y)
        y = nn.relu(y)
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        outs = []
        planes = 64
        for i, nblocks in enumerate(stage_blocks):
            stride = 1 if i == 0 else 2
            for j in range(nblocks):
                y = block_cls(
                    planes=planes,
                    stride=stride if j == 0 else 1,
                    has_downsample=(j == 0 and (stride != 1 or planes * expansion != y.shape[-1])),
                    with_dcn=(i in self.dcn_stages),
                    train=bn_train,
                    dtype=self.dtype,
                    name=f"layer{i + 1}_{j}",
                )(y)
            if i in self.out_indices:
                outs.append(y)
            planes *= 2
        return tuple(outs)
