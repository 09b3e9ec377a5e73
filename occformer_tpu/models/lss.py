"""Lift-Splat-Shoot voxel view transformer (TPU-native LSS).

Reference: projects/mmdet3d_plugin/occformer/image2bev/ViewTransformerLSSVoxel.py:12-121
on top of ViewTransformerLSSBEVDepth.py:564-725.  The CUDA ``bev_pool`` scatter
becomes the fused depth⊗context segment-sum scatter (ops/scatter.py); point
filtering becomes static-shape masking; the Z axis is preserved, producing a
channels-last ``[B, X, Y, Z, C]`` volume.

Depth supervision: min-pool the sparse LiDAR depth map per downsample cell,
one-hot over D bins, BCE on foreground cells in fp32 (reference :27-75).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.geometry import compute_voxel_coords, create_frustum, gen_dx_bx, get_geometry
from ..ops.scatter import voxel_scatter_lifted
from ..registry import NECKS
from .depthnet import DepthNet, get_mlp_input


class DepthAggregation(nn.Module):
    """Pixel-cloud feature refinement over the lifted volume
    (reference ViewTransformerLSSBEVDepth.py:506-561): reduce conv ->
    residual double conv -> out conv, applied per (n, h) plane over (w, d).
    Only used when ``use_voxel_net`` is set (no released config does)."""

    mid_channels: int
    out_channels: int
    train: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: [N*, W, D, C] planes
        from .layers import BatchNorm, Conv

        y = Conv(self.mid_channels, (3, 3), use_bias=False, dtype=self.dtype,
                 name="reduce_conv")(x)
        y = BatchNorm(use_running_average=not self.train, dtype=self.dtype,
                      name="reduce_bn")(y)
        y = nn.relu(y)
        shortcut = y
        z = Conv(self.mid_channels, (3, 3), use_bias=False, dtype=self.dtype,
                 name="conv1")(y)
        z = BatchNorm(use_running_average=not self.train, dtype=self.dtype,
                      name="bn1")(z)
        z = nn.relu(z)
        z = Conv(self.mid_channels, (3, 3), use_bias=False, dtype=self.dtype,
                 name="conv2")(z)
        z = BatchNorm(use_running_average=not self.train, dtype=self.dtype,
                      name="bn2")(z)
        z = nn.relu(z)
        y = shortcut + z
        return Conv(self.out_channels, (3, 3), use_bias=True, dtype=self.dtype,
                    name="out_conv")(y)


def shift_feature(feat: jnp.ndarray, curr2prev: jnp.ndarray,
                  bx, dx) -> jnp.ndarray:
    """Align a previous-frame BEV feature map to the current ego frame.

    Reference BEVDet4D.shift_feature (detectors/bevdepth.py:180-298): build
    the BEV-plane grid of current-frame cell centers, transform them into the
    previous frame with the 4x4 ``curr2prev`` ego transform, and bilinearly
    resample.  feat: [B, X, Y, C]; bx/dx: first-center and cell size (x, y).
    """
    B, X, Y, C = feat.shape
    xs = jnp.arange(X, dtype=jnp.float32) * dx[0] + bx[0]
    ys = jnp.arange(Y, dtype=jnp.float32) * dx[1] + bx[1]
    gx, gy = jnp.meshgrid(xs, ys, indexing="ij")
    ones = jnp.ones_like(gx)
    pts = jnp.stack([gx, gy, jnp.zeros_like(gx), ones], -1)  # [X, Y, 4]
    prev = jnp.einsum("bij,xyj->bxyi", curr2prev.astype(jnp.float32), pts)
    # back to normalized grid coords (align_corners=True over cell centers)
    u = (prev[..., 0] - bx[0]) / dx[0]
    v = (prev[..., 1] - bx[1]) / dx[1]
    nu = jnp.where(X > 1, u / (X - 1) * 2 - 1, 0.0)
    nv = jnp.where(Y > 1, v / (Y - 1) * 2 - 1, 0.0)
    from ..ops.sampling import grid_sample_2d

    grid = jnp.stack([nu, nv], -1)
    return grid_sample_2d(feat, grid, align_corners=True, padding_mode="zeros")


def downsampled_gt_depth(gt_depths, grid_config, downsample, D):
    """[B, N, H, W] sparse depth -> one-hot [B*N*fH*fW, D] (min-pooled).

    Pure-function twin of the module method (reference
    ViewTransformerLSSVoxel.py:27-52) so the train step can compute the depth
    loss without a second module apply.
    """
    B, N, H, W = gt_depths.shape
    g = gt_depths.reshape(B * N, H // downsample, downsample,
                          W // downsample, downsample)
    g = g.transpose(0, 1, 3, 2, 4).reshape(-1, downsample * downsample)
    g = jnp.where(g == 0.0, 1e5, g)
    g = jnp.min(g, axis=-1)
    d0, _, dstep = grid_config["dbound"]
    g = (g - (d0 - dstep / 2.0)) / dstep
    g = jnp.where((g < D + 1) & (g >= 0.0), g, 0.0)
    return jax.nn.one_hot(g.astype(jnp.int32), D + 1)[:, 1:]


def depth_bce_loss(gt_depths, depth_prob, grid_config, downsample,
                   weight: float = 1.0):
    """BCE depth loss over foreground cells, fp32 (reference :54-75)."""
    D = depth_prob.shape[-1]
    labels = downsampled_gt_depth(gt_depths, grid_config, downsample, D)
    preds = depth_prob.reshape(-1, D).astype(jnp.float32)
    fg = jnp.max(labels, axis=1) > 0.0
    eps = 1e-12
    bce = -(labels * jnp.log(jnp.clip(preds, eps)) +
            (1.0 - labels) * jnp.log(jnp.clip(1.0 - preds, eps)))
    bce = jnp.clip(bce, 0.0, 100.0)
    per_cell = jnp.sum(bce, axis=1) * fg.astype(jnp.float32)
    denom = jnp.maximum(jnp.sum(fg.astype(jnp.float32)), 1.0)
    return weight * jnp.sum(per_cell) / denom


@NECKS.register_module()
class ViewTransformerLiftSplatShootVoxel(nn.Module):
    """Image features + camera geometry -> 3D voxel feature volume.

    __call__ input:
      x:          [B, N, fH, fW, Cin]  image features (post neck)
      rots, trans, intrins, post_rots, post_trans, bda: camera geometry
    returns (volume [B, X, Y, Z, C], depth_prob [B*N, fH, fW, D])
    """

    grid_config: Dict
    data_config: Dict
    numC_input: int = 512
    numC_Trans: int = 128
    downsample: int = 16
    cam_channels: int = 27
    loss_depth_weight: float = 1.0
    loss_depth_type: str = "bce"
    use_dcn: bool = True
    use_voxel_net: bool = False
    train: bool = False
    dtype: Any = jnp.float32
    # accepted for config parity
    point_cloud_range: Optional[tuple] = None
    vp_megvii: bool = False

    def setup(self):
        self.dx, self.bx, self.nx = gen_dx_bx(
            self.grid_config["xbound"],
            self.grid_config["ybound"],
            self.grid_config["zbound"],
        )
        self.frustum = create_frustum(
            self.grid_config, tuple(self.data_config["input_size"]), self.downsample
        )
        self.D = self.frustum.shape[0]
        self.depth_net = DepthNet(
            mid_channels=self.numC_input,
            context_channels=self.numC_Trans,
            depth_channels=self.D,
            cam_channels=self.cam_channels,
            use_dcn=self.use_dcn,
            train=self.train,
            dtype=self.dtype,
            name="depth_net",
        )
        if self.use_voxel_net:
            # reference ViewTransformerLSSBEVDepth.py:574-576
            self.depth_aggregation_net = DepthAggregation(
                mid_channels=self.numC_Trans, out_channels=self.numC_Trans,
                train=self.train, dtype=self.dtype,
                name="depth_aggregation_net")

    def __call__(self, x, rots, trans, intrins, post_rots, post_trans, bda):
        B, N, fH, fW, Cin = x.shape
        mlp_input = get_mlp_input(rots, trans, intrins, post_rots, post_trans, bda)
        mlp_input = mlp_input.reshape(B * N, -1)

        depth_digit, ctx = self.depth_net(x.reshape(B * N, fH, fW, Cin), mlp_input)
        # fp32 island for the depth softmax (reference @force_fp32, SURVEY §2.5)
        depth_prob = jax.nn.softmax(depth_digit.astype(jnp.float32), axis=-1)

        geom = get_geometry(
            jnp.asarray(self.frustum), rots, trans, intrins, post_rots, post_trans, bda
        )  # [B, N, D, fH, fW, 3]
        coords, valid = compute_voxel_coords(geom, self.dx, self.bx, self.nx)

        depth_bn = depth_prob.reshape(B, N, fH, fW, self.D)
        depth_bn = jnp.moveaxis(depth_bn, -1, 2)  # [B, N, D, fH, fW]
        if self.use_voxel_net:
            # Materialize the lifted volume and refine it with DepthAggregation
            # over per-(n, h) planes (reference _forward_voxel_net :578-589:
            # [n, c, d, h, w] -> conv2d over (w, d) planes).  This path trades
            # the fused lift-scatter for the extra refinement convs.
            lifted = depth_bn[..., None] * ctx.reshape(
                B, N, 1, fH, fW, self.numC_Trans).astype(self.dtype)
            planes = jnp.moveaxis(lifted, 2, 4)  # [B, N, fH, fW, D, C]
            planes = planes.reshape(B * N * fH, fW, self.D, self.numC_Trans)
            planes = self.depth_aggregation_net(planes)
            lifted = planes.reshape(B, N, fH, fW, self.D, self.numC_Trans)
            lifted = jnp.moveaxis(lifted, 4, 2)  # [B, N, D, fH, fW, C]
            from ..ops.scatter import voxel_scatter

            P = N * self.D * fH * fW
            volume = voxel_scatter(
                lifted.reshape(B, P, self.numC_Trans),
                coords.reshape(B, P, 3), valid.reshape(B, P), self.nx)
        else:
            volume = voxel_scatter_lifted(
                depth_bn.astype(self.dtype),
                ctx.reshape(B, N, fH, fW, self.numC_Trans),
                coords,
                valid,
                self.nx,
            )
        return volume, depth_prob

    # ---- depth supervision -------------------------------------------------
    def get_downsampled_gt_depth(self, gt_depths: jnp.ndarray) -> jnp.ndarray:
        """[B, N, H, W] sparse depth -> one-hot [B*N*fH*fW, D] (min-pooled).

        Reference: ViewTransformerLSSVoxel.py:27-52 — zeros (no LiDAR return)
        are excluded from the min via a large sentinel; bins outside
        [dbound_lo - step/2, dbound_hi) collapse to "no target" (all-zero row).
        """
        B, N, H, W = gt_depths.shape
        ds = self.downsample
        g = gt_depths.reshape(B * N, H // ds, ds, W // ds, ds)
        g = g.transpose(0, 1, 3, 2, 4).reshape(-1, ds * ds)
        g = jnp.where(g == 0.0, 1e5, g)
        g = jnp.min(g, axis=-1)
        d0, _, dstep = self.grid_config["dbound"]
        g = (g - (d0 - dstep / 2.0)) / dstep
        g = jnp.where((g < self.D + 1) & (g >= 0.0), g, 0.0)
        onehot = jax.nn.one_hot(g.astype(jnp.int32), self.D + 1)[:, 1:]
        return onehot

    def get_depth_loss(self, gt_depths: jnp.ndarray, depth_prob: jnp.ndarray) -> jnp.ndarray:
        """BCE depth loss over foreground cells, fp32 (reference :54-75)."""
        labels = self.get_downsampled_gt_depth(gt_depths)
        preds = depth_prob.reshape(-1, self.D).astype(jnp.float32)
        fg = jnp.max(labels, axis=1) > 0.0
        eps = 1e-12  # torch binary_cross_entropy clamps log at -100
        bce = -(labels * jnp.log(jnp.clip(preds, eps)) +
                (1.0 - labels) * jnp.log(jnp.clip(1.0 - preds, eps)))
        bce = jnp.clip(bce, 0.0, 100.0)
        per_cell = jnp.sum(bce, axis=1) * fg.astype(jnp.float32)
        denom = jnp.maximum(jnp.sum(fg.astype(jnp.float32)), 1.0)
        return self.loss_depth_weight * jnp.sum(per_cell) / denom
