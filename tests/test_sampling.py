"""Golden tests: occformer_tpu sampling ops vs torch CPU reference semantics.

The torch oracle is the ground truth the reference relies on
(grid_sample in multi_scale_deform_attn_3d.py:62-67, point_sample_3d in
mask2former/base/mmdet_utils.py:21-47, F.interpolate / adaptive_max_pool3d in
mask2former_occ.py:477-486,688-694).
"""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from occformer_tpu.ops import (
    adaptive_max_pool3d,
    grid_sample_2d,
    grid_sample_3d,
    point_sample_3d,
    resize_bilinear,
    resize_trilinear,
)


def _torch_grid_sample_3d(vol_bxyzc, coords_bp3, align_corners, padding_mode):
    """Oracle: torch expects [B,C,X,Y,Z] + grid (last dim reversed)."""
    vol_t = torch.from_numpy(np.moveaxis(vol_bxyzc, -1, 1).copy())
    # torch grid coord order indexes (W=Z, H=Y, D=X): reverse our (x,y,z)
    grid_t = torch.from_numpy(coords_bp3[..., ::-1].copy())[:, :, None, None, :]
    out = F.grid_sample(
        vol_t, grid_t, mode="bilinear", padding_mode=padding_mode,
        align_corners=align_corners,
    )  # [B, C, P, 1, 1]
    return out[..., 0, 0].permute(0, 2, 1).numpy()


@pytest.mark.parametrize("align_corners", [False, True])
@pytest.mark.parametrize("padding_mode", ["zeros", "border"])
@pytest.mark.quick
def test_grid_sample_3d_matches_torch(rng, align_corners, padding_mode):
    vol = rng.randn(2, 5, 6, 7, 3).astype(np.float32)
    coords = rng.uniform(-1.4, 1.4, size=(2, 50, 3)).astype(np.float32)
    ours = np.asarray(grid_sample_3d(jnp.asarray(vol), jnp.asarray(coords),
                                     align_corners, padding_mode))
    ref = _torch_grid_sample_3d(vol, coords, align_corners, padding_mode)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("align_corners", [False, True])
@pytest.mark.parametrize("padding_mode", ["zeros", "border"])
def test_grid_sample_2d_matches_torch(rng, align_corners, padding_mode):
    img = rng.randn(2, 9, 11, 4).astype(np.float32)
    coords = rng.uniform(-1.3, 1.3, size=(2, 37, 2)).astype(np.float32)
    ours = np.asarray(grid_sample_2d(jnp.asarray(img), jnp.asarray(coords),
                                     align_corners, padding_mode))
    img_t = torch.from_numpy(np.moveaxis(img, -1, 1).copy())
    grid_t = torch.from_numpy(coords[..., ::-1].copy())[:, :, None, :]
    ref = F.grid_sample(img_t, grid_t, mode="bilinear", padding_mode=padding_mode,
                        align_corners=align_corners)[..., 0].permute(0, 2, 1).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("align_corners", [False, True])
def test_point_sample_3d_matches_torch(rng, align_corners):
    vol = rng.randn(1, 8, 8, 4, 2).astype(np.float32)
    pts = rng.uniform(0, 1, size=(1, 64, 3)).astype(np.float32)
    ours = np.asarray(point_sample_3d(jnp.asarray(vol), jnp.asarray(pts),
                                      align_corners=align_corners))
    ref = _torch_grid_sample_3d(vol, pts * 2 - 1, align_corners, "zeros")
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("align_corners", [False, True])
@pytest.mark.parametrize("size", [(10, 12, 6), (3, 5, 2)])
def test_resize_trilinear_matches_torch(rng, align_corners, size):
    vol = rng.randn(2, 5, 6, 4, 3).astype(np.float32)
    ours = np.asarray(resize_trilinear(jnp.asarray(vol), size, align_corners))
    vol_t = torch.from_numpy(np.moveaxis(vol, -1, 1).copy())
    ref = F.interpolate(vol_t, size=size, mode="trilinear", align_corners=align_corners)
    ref = np.moveaxis(ref.numpy(), 1, -1)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("factors", [(2, 2, 2), (4, 2, 1), (1, 1, 3)])
def test_resize_trilinear_int_factor_matches_torch(rng, factors):
    """Integer-factor align_corners=False upsamples take the dense separable
    path (`_upsample_axis_int`, the round-4 FPN de-gather) — parity vs torch
    must hold bit-tight there too."""
    vol = rng.randn(2, 5, 6, 4, 3).astype(np.float32)
    size = (5 * factors[0], 6 * factors[1], 4 * factors[2])
    ours = np.asarray(resize_trilinear(jnp.asarray(vol), size, False))
    vol_t = torch.from_numpy(np.moveaxis(vol, -1, 1).copy())
    ref = F.interpolate(vol_t, size=size, mode="trilinear", align_corners=False)
    ref = np.moveaxis(ref.numpy(), 1, -1)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("align_corners", [False, True])
def test_resize_bilinear_matches_torch(rng, align_corners):
    img = rng.randn(2, 7, 9, 3).astype(np.float32)
    ours = np.asarray(resize_bilinear(jnp.asarray(img), (13, 5), align_corners))
    img_t = torch.from_numpy(np.moveaxis(img, -1, 1).copy())
    ref = F.interpolate(img_t, size=(13, 5), mode="bilinear", align_corners=align_corners)
    ref = np.moveaxis(ref.numpy(), 1, -1)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("out_size", [(4, 4, 2), (3, 5, 3)])
def test_adaptive_max_pool3d_matches_torch(rng, out_size):
    vol = rng.randn(2, 8, 10, 6, 3).astype(np.float32)
    ours = np.asarray(adaptive_max_pool3d(jnp.asarray(vol), out_size))
    vol_t = torch.from_numpy(np.moveaxis(vol, -1, 1).copy())
    ref = F.adaptive_max_pool3d(vol_t, out_size)
    ref = np.moveaxis(ref.numpy(), 1, -1)
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-6)
