"""EfficientNet (b0-b8 + edge variants) image backbone, channels-last flax.

Reference: projects/mmdet3d_plugin/occformer/backbones/efficientnet.py
(mmcls-style table + compound scaling, :233-271 model_scaling, :308-349 layer
settings).  KITTI uses b7 with out_indices (2,3,4,5,6)
(occformer_kitti.py:66-75), giving strides (4, 8, 16, 32, 32) and channels
(48, 80, 224, 640, 2560).

Convs use SAME padding (the reference's Conv2dAdaptivePadding); activation is
Swish/SiLU; squeeze-excite reduces by in_channels/4 like the original paper.
"""
from __future__ import annotations

import copy
import math
from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..registry import BACKBONES
from .layers import BatchNorm, DropPath

# block cfg: [kernel, out_channels, se_divisor, stride, expand_ratio, type]
# type: -1 plain conv, 0 inverted-residual (MBConv), 1 edge-residual
LAYER_SETTINGS = {
    "b": [
        [[3, 32, 0, 2, 0, -1]],
        [[3, 16, 4, 1, 1, 0]],
        [[3, 24, 4, 2, 6, 0], [3, 24, 4, 1, 6, 0]],
        [[5, 40, 4, 2, 6, 0], [5, 40, 4, 1, 6, 0]],
        [[3, 80, 4, 2, 6, 0], [3, 80, 4, 1, 6, 0], [3, 80, 4, 1, 6, 0],
         [5, 112, 4, 1, 6, 0], [5, 112, 4, 1, 6, 0], [5, 112, 4, 1, 6, 0]],
        [[5, 192, 4, 2, 6, 0], [5, 192, 4, 1, 6, 0], [5, 192, 4, 1, 6, 0],
         [5, 192, 4, 1, 6, 0], [3, 320, 4, 1, 6, 0]],
        [[1, 1280, 0, 1, 0, -1]],
    ],
    "e": [
        [[3, 32, 0, 2, 0, -1]],
        [[3, 24, 0, 1, 3, 1]],
        [[3, 32, 0, 2, 8, 1], [3, 32, 0, 1, 8, 1]],
        [[3, 48, 0, 2, 8, 1], [3, 48, 0, 1, 8, 1], [3, 48, 0, 1, 8, 1],
         [3, 48, 0, 1, 8, 1]],
        [[5, 96, 0, 2, 8, 0], [5, 96, 0, 1, 8, 0], [5, 96, 0, 1, 8, 0],
         [5, 96, 0, 1, 8, 0], [5, 96, 0, 1, 8, 0], [5, 144, 0, 1, 8, 0],
         [5, 144, 0, 1, 8, 0], [5, 144, 0, 1, 8, 0], [5, 144, 0, 1, 8, 0]],
        [[5, 192, 0, 2, 8, 0], [5, 192, 0, 1, 8, 0]],
        [[1, 1280, 0, 1, 0, -1]],
    ],
}

ARCH_SETTINGS = {
    "b0": (1.0, 1.0), "b1": (1.0, 1.1), "b2": (1.1, 1.2), "b3": (1.2, 1.4),
    "b4": (1.4, 1.8), "b5": (1.6, 2.2), "b6": (1.8, 2.6), "b7": (2.0, 3.1),
    "b8": (2.2, 3.6), "es": (1.0, 1.0), "em": (1.0, 1.1), "el": (1.2, 1.4),
}


def make_divisible(v: float, divisor: int = 8) -> int:
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


def scale_layer_settings(layer_setting, width_mult: float, depth_mult: float):
    """Compound scaling: width (divisible-by-8) then depth, re-grouping stages
    so that stride-1 channel groups merge into the previous stage.

    Re-derivation of the reference's ``model_scaling`` (efficientnet.py:233-271)
    — stages are split at channel changes, depth-scaled by ceil, and merged
    back when a group's first block has stride 1.
    """
    setting = copy.deepcopy(layer_setting)
    for layer in setting:
        for block in layer:
            block[1] = make_divisible(block[1] * width_mult, 8)

    split = [setting[0]]
    for layer in setting[1:-1]:
        cuts = [0]
        for i in range(len(layer) - 1):
            if layer[i + 1][1] != layer[i][1]:
                cuts.append(i + 1)
        cuts.append(len(layer))
        for i in range(len(cuts) - 1):
            split.append(layer[cuts[i] : cuts[i + 1]])
    split.append(setting[-1])

    counts = [len(l) for l in split[1:-1]]
    new_counts = [int(math.ceil(depth_mult * n)) for n in counts]

    merged = [split[0]]
    for i, layer in enumerate(split[1:-1]):
        if new_counts[i] <= counts[i]:
            grp = layer[: new_counts[i]]
        else:
            grp = copy.deepcopy(layer) + [layer[-1]] * (new_counts[i] - counts[i])
        if grp[0][3] == 1 and i != 0:
            merged[-1] = merged[-1] + copy.deepcopy(grp)
        else:
            merged.append(copy.deepcopy(grp))
    merged.append(split[-1])
    return merged


class SqueezeExcite(nn.Module):
    mid_channels: int
    divisor: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        red = int(self.mid_channels / self.divisor)
        g = jnp.mean(x, axis=(1, 2), keepdims=True)
        g = nn.Conv(red, (1, 1), dtype=self.dtype, param_dtype=jnp.float32,
                    name="reduce")(g)
        g = nn.swish(g)
        g = nn.Conv(self.mid_channels, (1, 1), dtype=self.dtype,
                    param_dtype=jnp.float32, name="expand")(g)
        return x * jax.nn.sigmoid(g)


class MBConv(nn.Module):
    """Inverted residual: expand 1x1 -> depthwise kxk -> SE -> project 1x1."""

    out_channels: int
    kernel: int
    stride: int
    expand_ratio: int
    se_divisor: float
    drop_path: float = 0.0
    train: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        mid = int(cin * self.expand_ratio)
        y = x
        if self.expand_ratio != 1:
            y = nn.Conv(mid, (1, 1), use_bias=False, dtype=self.dtype,
                        param_dtype=jnp.float32, name="expand_conv")(y)
            y = BatchNorm(use_running_average=not self.train, eps=1e-3,
                          momentum=0.99, dtype=self.dtype, name="expand_bn")(y)
            y = nn.swish(y)
        y = nn.Conv(mid, (self.kernel, self.kernel), strides=self.stride,
                    padding="SAME", feature_group_count=mid, use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32, name="dw_conv")(y)
        y = BatchNorm(use_running_average=not self.train, eps=1e-3,
                      momentum=0.99, dtype=self.dtype, name="dw_bn")(y)
        y = nn.swish(y)
        if self.se_divisor > 0:
            y = SqueezeExcite(mid, self.se_divisor * self.expand_ratio,
                              dtype=self.dtype, name="se")(y)
        y = nn.Conv(self.out_channels, (1, 1), use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="project_conv")(y)
        y = BatchNorm(use_running_average=not self.train, eps=1e-3,
                      momentum=0.99, dtype=self.dtype, name="project_bn")(y)
        if self.stride == 1 and cin == self.out_channels:
            y = DropPath(self.drop_path, deterministic=not self.train,
                         name="drop_path")(y)
            y = y + x
        return y


class EdgeResidual(nn.Module):
    """Edge-TPU residual: fused expand kxk -> project 1x1 (no depthwise)."""

    out_channels: int
    kernel: int
    stride: int
    expand_ratio: int
    se_divisor: float
    drop_path: float = 0.0
    train: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        mid = int(cin * self.expand_ratio)
        y = nn.Conv(mid, (self.kernel, self.kernel), strides=self.stride,
                    padding="SAME", use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="expand_conv")(x)
        y = BatchNorm(use_running_average=not self.train, eps=1e-3,
                      momentum=0.99, dtype=self.dtype, name="expand_bn")(y)
        y = nn.swish(y)
        if self.se_divisor > 0:
            # reference edge-residual se ratio = se_ratio * expand_ratio on the
            # expanded channels (efficientnet.py:478-486) = in_channels / se
            y = SqueezeExcite(mid, self.se_divisor * self.expand_ratio,
                              dtype=self.dtype, name="se")(y)
        y = nn.Conv(self.out_channels, (1, 1), use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="project_conv")(y)
        y = BatchNorm(use_running_average=not self.train, eps=1e-3,
                      momentum=0.99, dtype=self.dtype, name="project_bn")(y)
        if self.stride == 1 and cin == self.out_channels:
            y = DropPath(self.drop_path, deterministic=not self.train,
                         name="drop_path")(y)
            y = y + x
        return y


@BACKBONES.register_module()
class CustomEfficientNet(nn.Module):
    arch: str = "b0"
    out_indices: Sequence[int] = (6,)
    drop_path_rate: float = 0.0
    train: bool = False
    dtype: Any = jnp.float32
    # config parity
    frozen_stages: int = 0
    norm_eval: bool = False
    with_cp: bool = True
    init_cfg: Any = None

    @nn.compact
    def __call__(self, x):
        width, depth = ARCH_SETTINGS[self.arch]
        setting = scale_layer_settings(LAYER_SETTINGS[self.arch[:1]], width, depth)

        stem_cfg = setting[0][0]
        final_cfg = setting[-1][0]
        stem_ch = make_divisible(stem_cfg[1], 8)

        y = nn.Conv(stem_ch, (stem_cfg[0], stem_cfg[0]), strides=stem_cfg[3],
                    padding="SAME", use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="stem_conv")(x)
        y = BatchNorm(use_running_average=not self.train, eps=1e-3,
                      momentum=0.99, dtype=self.dtype, name="stem_bn")(y)
        y = nn.swish(y)

        total_blocks = sum(len(l) for l in setting[1:-1])
        dprs = [self.drop_path_rate * i / max(total_blocks - 1, 1)
                for i in range(total_blocks)]

        outs = []
        block_idx = 0
        n_layers = len(setting[1:-1])
        for li, layer in enumerate(setting[1:-1]):
            for bi, (k, oc, se, s, e, btype) in enumerate(layer):
                cls = MBConv if btype == 0 else EdgeResidual
                if self.with_cp and self.train:
                    # mmdet with_cp = per-block torch.utils.checkpoint
                    # (efficientnet.py reference); param names unchanged
                    cls = nn.remat(cls)
                y = cls(out_channels=oc, kernel=k, stride=s, expand_ratio=e,
                        se_divisor=se, drop_path=dprs[block_idx],
                        train=self.train, dtype=self.dtype,
                        name=f"layer{li + 1}_block{bi}")(y)
                block_idx += 1
            if li + 1 in self.out_indices:
                outs.append(y)
        # final 1x1 conv layer (index n_layers + 1)
        if (n_layers + 1) in self.out_indices or max(self.out_indices) > n_layers:
            y = nn.Conv(final_cfg[1], (final_cfg[0], final_cfg[0]),
                        strides=final_cfg[3], padding="SAME", use_bias=False,
                        dtype=self.dtype, param_dtype=jnp.float32,
                        name="final_conv")(y)
            y = BatchNorm(use_running_average=not self.train, eps=1e-3,
                          momentum=0.99, dtype=self.dtype, name="final_bn")(y)
            y = nn.swish(y)
            outs.append(y)
        return tuple(outs)
