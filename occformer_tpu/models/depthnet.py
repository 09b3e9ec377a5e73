"""Camera-aware DepthNet: depth distribution + context from image features.

Reference: projects/mmdet3d_plugin/occformer/image2bev/ViewTransformerLSSBEVDepth.py:450-504.
reduce conv -> SE modulation by a camera-parameter MLP embedding (context and
depth branches) -> 3x BasicBlock + ASPP + DCN + 1x1 depth logits.

The 27-dim camera embedding (intrinsics + image-aug homography + BDA +
sensor2ego, get_mlp_input :591-646) is BatchNorm'ed over the B*N axis, exactly
as the reference's ``nn.BatchNorm1d``.
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .dcn import DeformConv2d
from .layers import BasicBlock2D, BatchNorm, Conv, Linear, Mlp, SELayer


class ASPP2D(nn.Module):
    """Atrous spatial pyramid pooling (DepthNet variant).

    1x1 + three dilated 3x3 branches + global-average branch, concat, 1x1.
    The DepthNet ASPP (reference ViewTransformerLSSBEVDepth.py:337-409) has
    NO residual add — unlike the 3D-encoder ASPP (aspp.py:49-130, see
    models/aspp.py) which ends with ``identity + dropout(x)``.  Norm is BN.
    """

    mid_channels: Optional[int] = None
    dilations: tuple = (1, 6, 12, 18)
    residual: bool = False
    train: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        mid = self.mid_channels or C // 2
        bn = lambda name: BatchNorm(use_running_average=not self.train,
                                    dtype=self.dtype, name=name)

        def branch(inp, k, dil, name):
            pad = 0 if k == 1 else dil
            y = Conv(mid, (k, k), padding=(pad, pad), dilation=(dil, dil),
                     use_bias=False, dtype=self.dtype, name=f"{name}_conv")(inp)
            return nn.relu(bn(f"{name}_bn")(y))

        x1 = branch(x, 1, self.dilations[0], "aspp1")
        x2 = branch(x, 3, self.dilations[1], "aspp2")
        x3 = branch(x, 3, self.dilations[2], "aspp3")
        x4 = branch(x, 3, self.dilations[3], "aspp4")
        g = jnp.mean(x, axis=(1, 2), keepdims=True)
        g = Conv(mid, (1, 1), use_bias=False, dtype=self.dtype, name="gap_conv")(g)
        g = nn.relu(bn("gap_bn")(g))
        g = jnp.broadcast_to(g, (B, H, W, mid))

        y = jnp.concatenate([x1, x2, x3, x4, g], axis=-1)
        y = Conv(C, (1, 1), use_bias=False, dtype=self.dtype, name="project_conv")(y)
        y = nn.relu(bn("project_bn")(y))
        return x + y if self.residual else y


class DepthNet(nn.Module):
    """[B*N, fH, fW, Cin] + [B*N, cam] -> depth logits [.., D] ++ context [.., C]."""

    mid_channels: int
    context_channels: int
    depth_channels: int
    cam_channels: int = 27
    use_dcn: bool = True
    train: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mlp_input):
        # BatchNorm1d over the camera-parameter batch (reference :469,495)
        mlp_input = BatchNorm(use_running_average=not self.train,
                              dtype=jnp.float32, name="bn_cam")(mlp_input)
        y = Conv(self.mid_channels, (3, 3), use_bias=True, dtype=self.dtype,
                 name="reduce_conv")(x)
        y = BatchNorm(use_running_average=not self.train, dtype=self.dtype,
                      name="reduce_bn")(y)
        y = nn.relu(y)

        ctx_se = Mlp(self.mid_channels, self.mid_channels, dtype=self.dtype,
                     name="context_mlp")(mlp_input.astype(self.dtype))
        ctx = SELayer(self.mid_channels, dtype=self.dtype, name="context_se")(y, ctx_se)
        ctx = Conv(self.context_channels, (1, 1), dtype=self.dtype,
                   name="context_conv")(ctx)

        dep_se = Mlp(self.mid_channels, self.mid_channels, dtype=self.dtype,
                     name="depth_mlp")(mlp_input.astype(self.dtype))
        dep = SELayer(self.mid_channels, dtype=self.dtype, name="depth_se")(y, dep_se)
        for i in range(3):
            dep = BasicBlock2D(self.mid_channels, train=self.train,
                               dtype=self.dtype, name=f"depth_block{i}")(dep)
        dep = ASPP2D(mid_channels=self.mid_channels, train=self.train,
                     dtype=self.dtype, name="aspp")(dep)
        if self.use_dcn:
            # mmcv DeformConv2d (v1, type='DCN') does not support bias
            dep = DeformConv2d(self.mid_channels, kernel_size=3, padding=1,
                               groups=4, use_bias=False, dtype=self.dtype,
                               name="dcn")(dep)
        dep = Conv(self.depth_channels, (1, 1), dtype=self.dtype,
                   name="depth_pred")(dep)
        return dep, ctx


def get_mlp_input(rots, trans, intrins, post_rots, post_trans, bda):
    """Flatten camera parameters into the DepthNet embedding.

    Reference: ViewTransformerLSSBEVDepth.py:591-646.  nuScenes (3x3 intrins)
    -> 15 + 12 = 27 dims; KITTI (3x4) -> 18(+3 if bda 4x4) + 12 = 30/33 dims.
    """
    B, N = rots.shape[:2]
    if bda.shape[-1] == 4:
        bda_rot = bda[:, :3, :3]
        bda_tran = bda[:, :3, 3]
    else:
        bda_rot = bda
        bda_tran = None
    bda_exp = jnp.broadcast_to(bda_rot[:, None], (B, N, 3, 3))

    if intrins.shape[-1] == 4:
        feats = [
            intrins[:, :, 0, 0], intrins[:, :, 1, 1],
            intrins[:, :, 0, 2], intrins[:, :, 1, 2],
            intrins[:, :, 0, 3], intrins[:, :, 1, 3], intrins[:, :, 2, 3],
            post_rots[:, :, 0, 0], post_rots[:, :, 0, 1], post_trans[:, :, 0],
            post_rots[:, :, 1, 0], post_rots[:, :, 1, 1], post_trans[:, :, 1],
            bda_exp[:, :, 0, 0], bda_exp[:, :, 0, 1],
            bda_exp[:, :, 1, 0], bda_exp[:, :, 1, 1], bda_exp[:, :, 2, 2],
        ]
        mlp = jnp.stack(feats, axis=-1)
        if bda_tran is not None:
            mlp = jnp.concatenate(
                [mlp, jnp.broadcast_to(bda_tran[:, None], (B, N, 3))], axis=-1
            )
    else:
        feats = [
            intrins[:, :, 0, 0], intrins[:, :, 1, 1],
            intrins[:, :, 0, 2], intrins[:, :, 1, 2],
            post_rots[:, :, 0, 0], post_rots[:, :, 0, 1], post_trans[:, :, 0],
            post_rots[:, :, 1, 0], post_rots[:, :, 1, 1], post_trans[:, :, 1],
            bda_exp[:, :, 0, 0], bda_exp[:, :, 0, 1],
            bda_exp[:, :, 1, 0], bda_exp[:, :, 1, 1], bda_exp[:, :, 2, 2],
        ]
        mlp = jnp.stack(feats, axis=-1)

    sensor2ego = jnp.concatenate(
        [rots, trans.reshape(B, N, 3, 1)], axis=-1
    ).reshape(B, N, 12)
    return jnp.concatenate([mlp, sensor2ego], axis=-1)
