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
import jax
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
    style: str = "pytorch"  # 'pytorch': stride on the 3x3; 'caffe': on the 1st 1x1
    train: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        # mmdet Bottleneck stride placement (mmdet.models.backbones.resnet):
        # caffe-style checkpoints (e.g. the FCOS3D-pretrained R101-DCN,
        # occformer_nusc_r101_896x1600.py) stride the first 1x1 conv.
        c1_stride = self.stride if self.style == "caffe" else 1
        c2_stride = 1 if self.style == "caffe" else self.stride
        identity = x
        y = Conv(self.planes, (1, 1), strides=(c1_stride, c1_stride),
                 use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = BatchNorm(use_running_average=not self.train, dtype=self.dtype, name="bn1")(y)
        y = nn.relu(y)
        if self.with_dcn:
            y = DeformConv2d(
                self.planes, kernel_size=3, strides=(c2_stride, c2_stride),
                modulated=True, dtype=self.dtype, name="conv2",
            )(y)
        else:
            y = Conv(self.planes, (3, 3), strides=(c2_stride, c2_stride),
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
    frozen_stages: int = -1  # mmdet semantics: 0 freezes the stem, n freezes
    # stem+layer1..layern.  Parameter freezing itself is an optimizer concern
    # (optim.backbone_freeze_mask); here we additionally stop gradients at the
    # frozen/live boundary in training, like torch's requires_grad=False —
    # XLA then drops the whole backward through the frozen prefix (saves
    # ~1.7G of saved activations for the R101 896x1600 config).
    norm_eval: bool = False
    train: bool = False
    dtype: Any = jnp.float32
    style: str = "pytorch"
    with_cp: bool = False  # rematerialize each block (mmdet with_cp)
    # accepted-for-parity extras from mmdet configs
    num_stages: int = 4
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
        if self.train and self.frozen_stages == 0:
            y = jax.lax.stop_gradient(y)

        outs = []
        planes = 64
        # with_cp = NESTED remat (sqrt-style): the outer checkpoint saves only
        # the 4 stage-boundary activations; inside a stage's backward the
        # recomputed forward checkpoints each BLOCK, so only one block's
        # temps (e.g. the 147M DCNv2 corner gathers of an R101 layer3 block
        # at 6x896x1600) are live at a time.  Either level alone OOMs that
        # config: per-block-only keeps the 275M layer1 block outputs as
        # whole-backward residuals; per-stage-only materializes all 23
        # layer3 DCN backwards at once.  Param names are unchanged (blocks
        # are created inside the rematted method under the same scope).
        if self.with_cp and self.train:
            stage_fn = nn.remat(ResNet._stage, static_argnums=(2, 3, 4, 5, 6))
        else:
            stage_fn = ResNet._stage
        for i, nblocks in enumerate(stage_blocks):
            y = stage_fn(self, y, i, nblocks, planes, block_type, bn_train)
            if self.train and self.frozen_stages == i + 1:
                y = jax.lax.stop_gradient(y)
            if i in self.out_indices:
                outs.append(y)
            planes *= 2
        return tuple(outs)

    def _stage(self, y, i: int, nblocks: int, planes: int, block_type: str,
               bn_train: bool):
        block_cls = Bottleneck if block_type == "bottleneck" else BasicResBlock
        if self.with_cp and self.train:
            block_cls = nn.remat(block_cls)  # inner level of the nested remat
        expansion = 4 if block_type == "bottleneck" else 1
        stride = 1 if i == 0 else 2
        for j in range(nblocks):
            kwargs = dict(
                planes=planes,
                stride=stride if j == 0 else 1,
                has_downsample=(j == 0 and (stride != 1 or planes * expansion != y.shape[-1])),
                with_dcn=(i in self.dcn_stages),
                train=bn_train,
                dtype=self.dtype,
                name=f"layer{i + 1}_{j}",
            )
            if block_type == "bottleneck":
                kwargs["style"] = self.style
            y = block_cls(**kwargs)(y)
        return y
