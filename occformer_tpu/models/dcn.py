"""Deformable convolution v1/v2 as bilinear gather + einsum (TPU-native).

Replaces mmcv's CUDA deform-conv used in two reference hot paths: DepthNet's
DCN block (ViewTransformerLSSBEVDepth.py:479-487, type='DCN', groups=4) and
the R101-DCN backbone stages (occformer_nusc_r101_896x1600.py, type='DCNv2').

Formulation: an offset conv predicts per-tap (dy, dx) displacements (and a
modulation gate for v2); each of the K*K taps becomes one bilinear
``grid_sample_2d`` gather over the input, and the weighted sum over taps and
input channels is a single einsum that lands on the MXU.  No im2col, no
scalar loops, static shapes throughout.
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.sampling import grid_sample_2d
from .layers import Conv


class DeformConv2d(nn.Module):
    """Deformable 2D conv, channels-last ``[B, H, W, C] -> [B, H', W', F]``.

    v1 (``modulated=False``): offsets only (mmcv type='DCN').
    v2 (``modulated=True``): offsets + sigmoid modulation (mmcv type='DCNv2').
    """

    features: int
    kernel_size: int = 3
    strides: Tuple[int, int] = (1, 1)
    padding: int = 1
    deform_groups: int = 1
    groups: int = 1
    modulated: bool = False
    use_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, Cin = x.shape
        K = self.kernel_size
        sh, sw = self.strides
        G = self.deform_groups
        oh = (H + 2 * self.padding - K) // sh + 1
        ow = (W + 2 * self.padding - K) // sw + 1

        n_off = G * K * K * (3 if self.modulated else 2)
        off = Conv(
            n_off, (K, K), strides=self.strides, padding=(self.padding,) * 2,
            use_bias=True, dtype=self.dtype, name="conv_offset",
        )(x)
        if self.modulated:
            off = off.reshape(B, oh, ow, G, 3, K * K)
            dy, dx = off[..., 0, :], off[..., 1, :]
            gate = jax.nn.sigmoid(off[..., 2, :])  # [B, oh, ow, G, K*K]
        else:
            off = off.reshape(B, oh, ow, G, 2, K * K)
            dy, dx = off[..., 0, :], off[..., 1, :]
            gate = None

        # base sampling positions of each tap (torch deform_conv semantics):
        # p0 + p_k + offset, where p0 = out_idx * stride - pad
        ky, kx = jnp.meshgrid(jnp.arange(K, dtype=jnp.float32),
                              jnp.arange(K, dtype=jnp.float32), indexing="ij")
        ky = ky.reshape(-1)
        kx = kx.reshape(-1)
        base_y = (jnp.arange(oh, dtype=jnp.float32) * sh - self.padding)[:, None, None]
        base_x = (jnp.arange(ow, dtype=jnp.float32) * sw - self.padding)[None, :, None]
        py = base_y + ky[None, None, :]  # [oh, ow, K*K]
        px = base_x + kx[None, None, :]
        py = py[None, :, :, None, :] + dy.astype(jnp.float32)  # [B, oh, ow, G, K*K]
        px = px[None, :, :, None, :] + dx.astype(jnp.float32)

        # normalize to [-1, 1] (align_corners=True pixel-index mapping)
        ny = jnp.where(H > 1, py / (H - 1) * 2 - 1, 0.0)
        nx_ = jnp.where(W > 1, px / (W - 1) * 2 - 1, 0.0)
        coords = jnp.stack([ny, nx_], axis=-1)  # [B, oh, ow, G, K*K, 2]

        # gather per deform-group over that group's channel slice
        cg = Cin // G
        xg = x.reshape(B, H, W, G, cg)
        samples = []
        for g in range(G):
            s = grid_sample_2d(
                xg[:, :, :, g, :], coords[:, :, :, g, :, :].reshape(B, -1, 2),
                align_corners=True, padding_mode="zeros",
            ).reshape(B, oh, ow, K * K, cg)
            if gate is not None:
                s = s * gate[:, :, :, g, :, None].astype(s.dtype)
            samples.append(s)
        sampled = jnp.concatenate(
            [s[:, :, :, :, None, :] for s in samples], axis=4
        ).reshape(B, oh, ow, K * K, Cin)

        # weight: torch layout (Cout, Cin/groups, K, K) -> store as
        # [K*K, Cin/groups, Cout] for one einsum per conv-group
        wg_cin = Cin // self.groups
        weight = self.param(
            "weight",
            nn.initializers.variance_scaling(1 / 3, "fan_in", "uniform"),
            (K * K, wg_cin, self.features),
            jnp.float32,
        ).astype(self.dtype)
        if self.groups == 1:
            out = jnp.einsum("bhwkc,kcf->bhwf", sampled, weight)
        else:
            fg = self.features // self.groups
            outs = []
            for g in range(self.groups):
                outs.append(
                    jnp.einsum(
                        "bhwkc,kcf->bhwf",
                        sampled[..., g * wg_cin : (g + 1) * wg_cin],
                        weight[..., g * fg : (g + 1) * fg],
                    )
                )
            out = jnp.concatenate(outs, axis=-1)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            out = out + bias.astype(self.dtype)
        return out
