"""BEVStereo view transformer: temporal-stereo EM depth with homography
cost volumes.

Reference: projects/mmdet3d_plugin/occformer/image2bev/ViewTransformerLSSBEVDepth.py:792-1397
(``DepthNetStereo`` :792-891, ``ViewTransformerLSSBEVStereo`` :893-1397).  No
released OccFormer config instantiates it — it is capability surface — so there
is no torch checkpoint to match; what we replicate is the architecture and the
numerics (homography warping, group-correlation cost volume, EM refinement of a
per-range Gaussian depth mixture).

TPU-first design notes:
  * All loops (EM iterations, depth ranges, sweeps) have static trip counts and
    are unrolled at trace time; every tensor is static-shape.
  * The homography warp is a single batched 4x4 matrix chain followed by one
    bilinear ``grid_sample_2d`` over ``[BN, S, H, W]`` sample grids — no
    per-point host work, and the grid math sits under ``stop_gradient`` exactly
    like the reference's ``torch.no_grad()`` block (:1027).
  * The group-correlation cost volume is an einsum over the group/channel
    split, and the 1x1x1 ``similarity_net`` convs are pointwise matmuls that
    XLA fuses into it (MXU-friendly).
"""
from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.geometry import compute_voxel_coords, create_frustum, gen_dx_bx, get_geometry
from ..ops.sampling import grid_sample_2d
from ..ops.scatter import voxel_scatter_lifted
from ..registry import NECKS
from .dcn import DeformConv2d
from .depthnet import ASPP2D
from .layers import BasicBlock2D, BatchNorm, Conv, Linear, Mlp, SELayer


def depth_sampling_k_list(sampling_range: float, num_samples: int) -> np.ndarray:
    """Gaussian-quantile sampling offsets (reference ``depth_sampling`` :966-977).

    Splits the +-sampling_range sigma interval into ``num_samples`` equal-
    probability bins and returns the bin-center z-scores.
    """
    from scipy.special import erf
    from scipy.stats import norm

    p_total = erf(sampling_range / np.sqrt(2))
    idx = np.arange(0, num_samples + 1)
    p = (1 - p_total) / 2 + (idx / num_samples) * p_total
    k = norm.ppf(p)
    return (k[1:] + k[:-1]) / 2


def create_depth_sample_frustum(
    depth_sample: jnp.ndarray, input_size: Tuple[int, int], downsample_factor: int
) -> jnp.ndarray:
    """Pixel-grid frustum for per-sample candidate depths.

    Reference ``create_depth_sample_frustum`` :979-1006.  depth_sample is
    ``[BN, S, fH, fW]``; returns ``[BN, S, fH, fW, 4]`` homogeneous
    (x_pix, y_pix, depth, 1) points in the *full-resolution* augmented image
    plane.
    """
    ogfH, ogfW = input_size
    BN, S, fH, fW = depth_sample.shape
    xs = jnp.linspace(0.0, ogfW - 1, fW, dtype=jnp.float32)
    ys = jnp.linspace(0.0, ogfH - 1, fH, dtype=jnp.float32)
    x = jnp.broadcast_to(xs[None, None, None, :], (BN, S, fH, fW))
    y = jnp.broadcast_to(ys[None, None, :, None], (BN, S, fH, fW))
    ones = jnp.ones_like(depth_sample)
    return jnp.stack([x, y, depth_sample, ones], axis=-1)


def homo_warping(
    stereo_feat: jnp.ndarray,
    key_intrin: jnp.ndarray,
    sweep_intrin: jnp.ndarray,
    sensor2sensor: jnp.ndarray,
    key_ida: jnp.ndarray,
    sweep_ida: jnp.ndarray,
    depth_sample: jnp.ndarray,
    frustum: jnp.ndarray,
    downsample_factor: int,
) -> jnp.ndarray:
    """Warp a sweep-frame feature map onto key-frame depth hypotheses.

    Reference ``homo_warping`` :1008-1098.  All mats are ``[BN, 4, 4]``;
    stereo_feat is channels-last ``[BN, Hs, Ws, C]`` at 1/downsample_factor of
    the augmented image; depth_sample ``[BN, S, fH, fW]``; frustum from
    :func:`create_depth_sample_frustum`.  Returns ``[BN, S, fH, fW, C]``.

    The chain (undo key IDA -> scale by depth -> key cam -> sweep cam -> sweep
    pixel -> sweep IDA) and the mixed normalization convention (align_corners
    style divide by (size-1)/2, then grid_sample with align_corners=False) are
    replicated exactly.
    """
    BN, Hs, Ws, C = stereo_feat.shape
    S = depth_sample.shape[1]

    pts = frustum.reshape(BN, -1, 4).astype(jnp.float32)
    # z := 1 so IDA (a pixel-plane homography) applies to (x, y) only.
    pts = pts.at[..., 2].set(1.0)
    pts = jnp.einsum("bij,bpj->bpi", jnp.linalg.inv(key_ida.astype(jnp.float32)), pts)
    depth_flat = depth_sample.reshape(BN, -1, 1).astype(jnp.float32)
    pts = pts.at[..., :3].multiply(depth_flat)
    pts = jnp.einsum("bij,bpj->bpi", jnp.linalg.inv(key_intrin.astype(jnp.float32)), pts)
    pts = jnp.einsum("bij,bpj->bpi", sensor2sensor.astype(jnp.float32), pts)
    pts = jnp.einsum("bij,bpj->bpi", sweep_intrin.astype(jnp.float32), pts)
    z = pts[..., 2:3]
    pts = pts.at[..., :2].divide(z)
    pts = jnp.einsum("bij,bpj->bpi", sweep_ida.astype(jnp.float32), pts)

    # Points behind the sweep camera are pushed off-image (reference :1063-1067).
    full_w = Ws * downsample_factor
    full_h = Hs * downsample_factor
    neg = pts[..., 2] < 1e-3
    px = jnp.where(neg, float(full_w), pts[..., 0])
    py = jnp.where(neg, float(full_h), pts[..., 1])
    nx = px / ((full_w - 1) / 2.0) - 1.0
    ny = py / ((full_h - 1) / 2.0) - 1.0

    # grid_sample_2d wants (row, col) = (y, x) normalized coords.
    grid = jnp.stack([ny, nx], axis=-1).reshape(BN, S, -1, 2)
    grid = jax.lax.stop_gradient(grid)
    warped = grid_sample_2d(stereo_feat, grid, align_corners=False,
                            padding_mode="zeros")
    return warped.reshape(BN, S, frustum.shape[2], frustum.shape[3], C)


class DepthNetStereo(nn.Module):
    """Stereo DepthNet head (reference :792-891).

    ``[BN, fH, fW, Cin] + [BN, cam]`` -> (reduced feat, context, mu, sigma,
    range_score, mono_depth).  mu/sigma/range_score come out of a 4x-upsampling
    deconv stack, i.e. at stereo (1/4) resolution; mono_depth stays at feature
    (1/16) resolution.
    """

    mid_channels: int
    context_channels: int
    depth_channels: int
    cam_channels: int = 27
    num_ranges: int = 4
    train: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mlp_input):
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
        for i in range(2):
            dep = BasicBlock2D(self.mid_channels, train=self.train,
                               dtype=self.dtype, name=f"depth_block{i}")(dep)
        dep = ASPP2D(mid_channels=self.mid_channels, train=self.train,
                     dtype=self.dtype, name="aspp")(dep)
        dep = DeformConv2d(self.mid_channels, kernel_size=3, padding=1,
                           groups=4, use_bias=False, dtype=self.dtype,
                           name="dcn")(dep)
        mono = BasicBlock2D(self.mid_channels, train=self.train,
                            dtype=self.dtype, name="mono_block")(dep)
        mono = Conv(self.depth_channels, (1, 1), dtype=self.dtype,
                    name="mono_pred")(mono)

        mss = BasicBlock2D(self.mid_channels, train=self.train,
                           dtype=self.dtype, name="msr_block")(dep)
        for i in range(2):
            mss = nn.ConvTranspose(self.mid_channels, (3, 3), strides=(2, 2),
                                   padding="SAME", dtype=self.dtype,
                                   param_dtype=jnp.float32,
                                   name=f"msr_up{i}")(mss)
            mss = BatchNorm(use_running_average=not self.train,
                            dtype=self.dtype, name=f"msr_up_bn{i}")(mss)
            mss = nn.relu(mss)
        mss = Conv(self.num_ranges * 3, (1, 1), dtype=self.dtype,
                   name="msr_pred")(mss)

        mu = mss[..., : self.num_ranges]
        sigma = mss[..., self.num_ranges: 2 * self.num_ranges]
        range_score = mss[..., 2 * self.num_ranges: 3 * self.num_ranges]
        sigma = nn.elu(sigma.astype(jnp.float32)) + 1.0 + 1e-10
        return y, ctx, mu.astype(jnp.float32), sigma, \
            range_score.astype(jnp.float32), mono


@NECKS.register_module()
class ViewTransformerLSSBEVStereo(nn.Module):
    """Temporal-stereo LSS view transformer (reference :893-1397).

    ``__call__`` performs the lift-splat with an externally supplied depth
    distribution (reference ``forward`` :1359-1397 takes ``depth_prob`` as
    input — the stereo/mono fusion is the caller's job);
    :meth:`forward_stereo` produces the stereo depth score + mask from
    per-sweep features, and :meth:`fuse_depth` provides the standard
    BEVStereo-style combination.
    """

    grid_config: Dict
    data_config: Dict
    numC_input: int = 512
    numC_Trans: int = 128
    downsample: int = 16
    cam_channels: int = 27
    num_ranges: int = 4
    range_list: Optional[Sequence[Sequence[float]]] = (
        (2.0, 8.0), (8.0, 16.0), (16.0, 28.0), (28.0, 58.0))
    em_iteration: int = 3
    sampling_range: float = 3.0
    num_samples: int = 3
    k_list: Optional[Sequence[float]] = None
    min_sigma: float = 1.0
    num_groups: int = 8
    stereo_downsample_factor: int = 4
    use_mask: bool = True
    train: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        self.dx, self.bx, self.nx = gen_dx_bx(
            self.grid_config["xbound"], self.grid_config["ybound"],
            self.grid_config["zbound"])
        self.frustum = create_frustum(
            self.grid_config, tuple(self.data_config["input_size"]),
            self.downsample)
        self.D = self.frustum.shape[0]
        d0, d1, dstep = self.grid_config["dbound"]
        if self.range_list is None:
            span = (d1 - d0) / self.num_ranges
            ranges = [(d0 + span * i, d0 + span * (i + 1))
                      for i in range(self.num_ranges)]
        else:
            assert len(self.range_list) == self.num_ranges
            ranges = [tuple(r) for r in self.range_list]
        self.ranges = ranges
        if self.k_list is None:
            self.ks = tuple(float(k) for k in depth_sampling_k_list(
                self.sampling_range, self.num_samples))
        else:
            self.ks = tuple(float(k) for k in self.k_list)

        self.depth_net = DepthNetStereo(
            mid_channels=self.numC_input, context_channels=self.numC_Trans,
            depth_channels=self.D, cam_channels=self.cam_channels,
            num_ranges=self.num_ranges, train=self.train, dtype=self.dtype,
            name="depth_net")
        # similarity_net: ConvBnReLU3D(G->16) -> ConvBnReLU3D(16->8) -> Conv3d(8->1),
        # all 1x1x1 (reference :915-930) = pointwise over the group-corr channel.
        self.sim_conv1 = Conv(16, (1, 1, 1), use_bias=False, dtype=self.dtype,
                              name="sim_conv1")
        self.sim_bn1 = BatchNorm(use_running_average=not self.train,
                                 dtype=self.dtype, name="sim_bn1")
        self.sim_conv2 = Conv(8, (1, 1, 1), use_bias=False, dtype=self.dtype,
                              name="sim_conv2")
        self.sim_bn2 = BatchNorm(use_running_average=not self.train,
                                 dtype=self.dtype, name="sim_bn2")
        self.sim_out = Conv(1, (1, 1, 1), use_bias=True, dtype=self.dtype,
                            name="sim_out")
        # depth_downsample_net (reference :932-940): stereo (1/4) -> feature (1/16).
        self.dds_conv1 = Conv(256, (3, 3), strides=(2, 2), dtype=self.dtype,
                              name="dds_conv1")
        self.dds_bn1 = BatchNorm(use_running_average=not self.train,
                                 dtype=self.dtype, name="dds_bn1")
        self.dds_conv2 = Conv(256, (3, 3), strides=(2, 2), dtype=self.dtype,
                              name="dds_conv2")
        self.dds_bn2 = BatchNorm(use_running_average=not self.train,
                                 dtype=self.dtype, name="dds_bn2")
        self.dds_out = Conv(self.D, (1, 1), dtype=self.dtype, name="dds_out")
        if self.use_mask:
            self.mask_conv = Conv(64, (3, 3), use_bias=True, dtype=self.dtype,
                                  name="mask_conv")
            self.mask_bn = BatchNorm(use_running_average=not self.train,
                                     dtype=self.dtype, name="mask_bn")
            self.mask_block0 = BasicBlock2D(64, train=self.train,
                                            dtype=self.dtype, name="mask_block0")
            self.mask_block1 = BasicBlock2D(64, train=self.train,
                                            dtype=self.dtype, name="mask_block1")
            self.mask_out = Conv(1, (1, 1), use_bias=True, dtype=self.dtype,
                                 name="mask_out")

    # -- submodule drivers ---------------------------------------------------
    def _similarity(self, feat_cost):
        y = nn.relu(self.sim_bn1(self.sim_conv1(feat_cost)))
        y = nn.relu(self.sim_bn2(self.sim_conv2(y)))
        return self.sim_out(y)[..., 0]

    def _mask_net(self, x):
        y = nn.relu(self.mask_bn(self.mask_conv(x)))
        y = self.mask_block1(self.mask_block0(y))
        return jax.nn.sigmoid(self.mask_out(y))

    def depth_downsample(self, stereo_depth):
        """[BN, Hs, Ws, D] stereo-res depth score -> feature-res [BN, fH, fW, D]."""
        y = nn.relu(self.dds_bn1(self.dds_conv1(stereo_depth)))
        y = nn.relu(self.dds_bn2(self.dds_conv2(y)))
        return self.dds_out(y)

    def _warp_from_sweep(self, feat, mats, key_idx, src_idx, depth_sample,
                         frustum):
        return homo_warping(
            feat,
            mats["intrin_mats"][:, key_idx], mats["intrin_mats"][:, src_idx],
            mats["sensor2sensor_mats"][:, src_idx],
            mats["ida_mats"][:, key_idx], mats["ida_mats"][:, src_idx],
            depth_sample, frustum, self.stereo_downsample_factor)

    def _generate_cost_volume(self, sweep_index, stereo_feats, mats,
                              depth_sample, frustum):
        """Group-correlation cost volume averaged over other sweeps
        (reference :1150-1218).  Returns ``[BN, S, Hs, Ws]``."""
        BN, Hs, Ws, C = stereo_feats[0].shape
        G = self.num_groups
        ref = stereo_feats[sweep_index].reshape(BN, Hs, Ws, G, C // G)
        scores = []
        for idx in range(len(stereo_feats)):
            if idx == sweep_index:
                continue
            warped = self._warp_from_sweep(stereo_feats[idx], mats,
                                           sweep_index, idx, depth_sample,
                                           frustum)
            warped = warped.reshape(BN, -1, Hs, Ws, G, C // G)
            cost = jnp.mean(ref[:, None] * warped, axis=-1)  # [BN,S,Hs,Ws,G]
            scores.append(self._similarity(cost))
        return jnp.mean(jnp.stack(scores), axis=0)

    def _forward_mask(self, sweep_index, mono_depths, mats, depth_sample,
                      frustum):
        """Cross-sweep mono-depth consistency mask (reference :1100-1148)."""
        masks = []
        for idx in range(len(mono_depths)):
            if idx == sweep_index:
                continue
            warped = homo_warping(
                mono_depths[idx],
                mats["intrin_mats"][:, sweep_index], mats["intrin_mats"][:, idx],
                mats["sensor2sensor_mats"][:, idx],
                mats["ida_mats"][:, sweep_index], mats["ida_mats"][:, idx],
                depth_sample, frustum, self.downsample)
            pair = jnp.concatenate(
                [jax.lax.stop_gradient(mono_depths[sweep_index]),
                 jax.lax.stop_gradient(jnp.mean(warped, axis=1))], axis=-1)
            masks.append(self._mask_net(pair))
        return jnp.mean(jnp.stack(masks), axis=0)

    def forward_stereo(self, sweep_index, stereo_feats, mono_depths, mats,
                       mus, sigmas, range_scores):
        """EM-refined per-range Gaussian stereo depth (reference :1220-1357).

        Args (lists are indexed by sweep; all static length):
          stereo_feats: ``[BN, Hs, Ws, C]`` stereo-resolution features.
          mono_depths:  ``[BN, fH, fW, D]`` mono depth logits.
          mats: dict of ``[BN, n_sweeps, 4, 4]`` ``intrin_mats`` / ``ida_mats``
            / ``sensor2sensor_mats`` (key-frame -> sweep).
          mus, sigmas, range_scores: DepthNetStereo outputs,
            ``[BN, Hs, Ws, num_ranges]``.
        Returns ``(stereo_depth [BN, Hs, Ws, D], mask_score [BN, fH, fW, D])``
        (mask_score only when ``use_mask``).
        """
        BN, Hs, Ws, _ = stereo_feats[0].shape
        fH = Hs * self.stereo_downsample_factor // self.downsample
        fW = Ws * self.stereo_downsample_factor // self.downsample
        d0, d1, dstep = self.grid_config["dbound"]
        d_coords = jnp.arange(d0, d1, dstep, dtype=jnp.float32)

        stereo_depth = jnp.zeros((BN, Hs, Ws, self.D), jnp.float32)
        mask_score = jnp.zeros((BN, fH, fW, self.D), jnp.float32)
        range_prob = jax.nn.softmax(range_scores[sweep_index], axis=-1)

        for r, (lo, hi) in enumerate(self.ranges):
            off = int((lo - d0) // dstep)
            length = int((hi - lo) // dstep)
            mu = jax.nn.sigmoid(mus[sweep_index][..., r:r + 1]) * (hi - lo) + lo
            sigma = sigmas[sweep_index][..., r:r + 1]

            for _ in range(self.em_iteration):
                # [BN, S, Hs, Ws] candidate depths around the current mean
                ds = jnp.concatenate(
                    [jnp.moveaxis(mu + sigma * k, -1, 1) for k in self.ks], 1)
                frustum = create_depth_sample_frustum(
                    ds, tuple(self.data_config["input_size"]),
                    self.stereo_downsample_factor)
                score = self._generate_cost_volume(
                    sweep_index, stereo_feats, mats, ds, frustum)
                score = jax.nn.softmax(score.astype(jnp.float32), axis=1)
                center = score[:, self.num_samples // 2: self.num_samples // 2 + 1]
                scale = jnp.clip(0.5 / (1e-4 + center), 0.1, 10.0)
                sigma = jnp.clip(sigma * jnp.moveaxis(scale, 1, -1), 0.1, 10.0)
                mu = jnp.sum(ds * score, axis=1)[..., None]

            mu = jnp.clip(mu, lo, hi)
            if self.use_mask:
                pool = self.downsample // self.stereo_downsample_factor
                mu_pooled = nn.avg_pool(mu, (pool, pool), strides=(pool, pool))
                ds_m = jnp.moveaxis(mu_pooled, -1, 1)
                frustum_m = create_depth_sample_frustum(
                    ds_m, tuple(self.data_config["input_size"]), self.downsample)
                mask = self._forward_mask(sweep_index, mono_depths, mats,
                                          ds_m, frustum_m)
                mask_score = mask_score.at[..., off:off + length].add(mask)

            sigma = jnp.maximum(sigma, self.min_sigma)
            d_slice = d_coords[off:off + length]
            z = (d_slice[None, None, None, :] - mu) / jnp.sqrt(sigma)
            score_r = jnp.exp(-0.5 * z * z) / (sigma * math.sqrt(2 * math.pi) + 1e-6)
            stereo_depth = stereo_depth.at[..., off:off + length].set(
                score_r * range_prob[..., r:r + 1])

        if self.use_mask:
            return stereo_depth, mask_score
        return stereo_depth

    def fuse_depth(self, mono_depth, stereo_depth, mask_score=None):
        """Standard BEVStereo fusion: mono logits + masked downsampled stereo
        score -> depth probability.  The reference leaves this orchestration to
        the (unreleased) detector; provided here as the canonical combination.
        """
        stereo_ds = self.depth_downsample(stereo_depth.astype(self.dtype))
        logits = mono_depth.astype(jnp.float32) + stereo_ds.astype(jnp.float32) \
            * (mask_score if mask_score is not None else 1.0)
        return jax.nn.softmax(logits, axis=-1)

    # -- lift-splat (reference forward :1359-1397) ---------------------------
    def __call__(self, img_feat, depth_prob, rots, trans, intrins, post_rots,
                 post_trans, bda):
        """img_feat ``[B, N, fH, fW, C]`` + depth_prob ``[B*N, fH, fW, D]`` ->
        voxel volume ``[B, X, Y, Z, C]`` (Z-preserving splat)."""
        B, N, fH, fW, Cin = img_feat.shape
        geom = get_geometry(jnp.asarray(self.frustum), rots, trans, intrins,
                            post_rots, post_trans, bda)
        coords, valid = compute_voxel_coords(geom, self.dx, self.bx, self.nx)
        depth_bn = depth_prob.reshape(B, N, fH, fW, self.D)
        depth_bn = jnp.moveaxis(depth_bn, -1, 2)
        return voxel_scatter_lifted(
            depth_bn.astype(self.dtype), img_feat, coords, valid, self.nx)
