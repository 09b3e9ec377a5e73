"""Bilinear / trilinear sampling with exact torch ``grid_sample`` semantics.

The reference leans on torch's CUDA ``grid_sample`` everywhere: deformable
attention 3D (projects/mmdet3d_plugin/occformer/necks/multi_scale_deform_attn_3d.py:62-67),
point-sampled losses (mask2former/base/mmdet_utils.py:21-47) and the LiDAR-point
readout (mask2former/mask2former_nusc_occ.py:505-542).  On TPU we express the
same math as XLA gathers + lerps over channels-last arrays, which XLA fuses into
a handful of dynamic-gather HLOs; a Pallas kernel can later specialize the hot
deformable-attention path.

Conventions (deliberately different from torch, saner for a native framework):
  * volumes are channels-last ``[B, X, Y, Z, C]``, images ``[B, H, W, C]``
  * coordinates are ordered to match the array axes directly:
    ``coords[..., 0]`` indexes axis 1 (X / H), ``coords[..., 1]`` axis 2, ...
    No ``[2, 1, 0]`` flips like the torch call sites need.
  * normalized range is [-1, 1] with torch's align_corners mapping.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def _unnormalize(coord: jnp.ndarray, size: int, align_corners: bool) -> jnp.ndarray:
    """[-1, 1] -> pixel index space (torch convention)."""
    if align_corners:
        return (coord + 1.0) * 0.5 * (size - 1)
    return ((coord + 1.0) * size - 1.0) * 0.5


def _gather_corner_weights(pix: jnp.ndarray, size: int, padding_mode: str):
    """Return (idx0, idx1, w1, inbounds0, inbounds1) for one axis.

    ``w1`` is the lerp weight of the upper corner.  For ``zeros`` padding the
    in-bounds masks zero contributions from out-of-range corners; for
    ``border`` indices are clamped (torch semantics).
    """
    i0f = jnp.floor(pix)
    w1 = pix - i0f
    i0 = i0f.astype(jnp.int32)
    i1 = i0 + 1
    if padding_mode == "border":
        ok0 = jnp.ones_like(pix, dtype=bool)
        ok1 = ok0
    elif padding_mode == "zeros":
        ok0 = (i0 >= 0) & (i0 <= size - 1)
        ok1 = (i1 >= 0) & (i1 <= size - 1)
    else:
        raise ValueError(f"unsupported padding_mode {padding_mode}")
    i0 = jnp.clip(i0, 0, size - 1)
    i1 = jnp.clip(i1, 0, size - 1)
    return i0, i1, w1, ok0, ok1


def grid_sample_3d(
    vol: jnp.ndarray,
    coords: jnp.ndarray,
    align_corners: bool = False,
    padding_mode: str = "zeros",
) -> jnp.ndarray:
    """Trilinear sampling of ``vol [B, X, Y, Z, C]`` at ``coords [B, ..., 3]``.

    coords are normalized to [-1, 1]; coords[..., i] indexes spatial axis i.
    Returns ``[B, ..., C]``.  Matches torch ``F.grid_sample(5d)`` bit-for-bit
    (modulo the layout/coordinate-order conventions in the module docstring).
    """
    B, X, Y, Z, C = vol.shape
    batch_shape = coords.shape[1:-1]
    coords = coords.reshape(B, -1, 3)
    ctype = jnp.promote_types(vol.dtype, jnp.float32)
    cx = _unnormalize(coords[..., 0].astype(ctype), X, align_corners)
    cy = _unnormalize(coords[..., 1].astype(ctype), Y, align_corners)
    cz = _unnormalize(coords[..., 2].astype(ctype), Z, align_corners)

    x0, x1, wx, okx0, okx1 = _gather_corner_weights(cx, X, padding_mode)
    y0, y1, wy, oky0, oky1 = _gather_corner_weights(cy, Y, padding_mode)
    z0, z1, wz, okz0, okz1 = _gather_corner_weights(cz, Z, padding_mode)

    flat = vol.reshape(B, X * Y * Z, C)
    # accumulate the lerp in >= fp32; gather first, convert after (so bool /
    # low-precision volumes never materialize as fp32 at full size)
    out_dtype = vol.dtype if jnp.issubdtype(vol.dtype, jnp.floating) else ctype

    def corner(ix, iy, iz, ok, w):
        lin = (ix * Y + iy) * Z + iz  # [B, P]
        g = jnp.take_along_axis(flat, lin[..., None], axis=1)  # [B, P, C]
        w = jnp.where(ok, w, 0.0)
        return g.astype(ctype) * w[..., None]

    out = (
        corner(x0, y0, z0, okx0 & oky0 & okz0, (1 - wx) * (1 - wy) * (1 - wz))
        + corner(x1, y0, z0, okx1 & oky0 & okz0, wx * (1 - wy) * (1 - wz))
        + corner(x0, y1, z0, okx0 & oky1 & okz0, (1 - wx) * wy * (1 - wz))
        + corner(x0, y0, z1, okx0 & oky0 & okz1, (1 - wx) * (1 - wy) * wz)
        + corner(x1, y1, z0, okx1 & oky1 & okz0, wx * wy * (1 - wz))
        + corner(x1, y0, z1, okx1 & oky0 & okz1, wx * (1 - wy) * wz)
        + corner(x0, y1, z1, okx0 & oky1 & okz1, (1 - wx) * wy * wz)
        + corner(x1, y1, z1, okx1 & oky1 & okz1, wx * wy * wz)
    )
    return out.astype(out_dtype).reshape(B, *batch_shape, C)


def grid_sample_2d(
    img: jnp.ndarray,
    coords: jnp.ndarray,
    align_corners: bool = False,
    padding_mode: str = "zeros",
) -> jnp.ndarray:
    """Bilinear sampling of ``img [B, H, W, C]`` at ``coords [B, ..., 2]``.

    coords[..., 0] indexes H, coords[..., 1] indexes W, normalized [-1, 1].
    """
    B, H, W, C = img.shape
    batch_shape = coords.shape[1:-1]
    coords = coords.reshape(B, -1, 2)
    ctype = jnp.promote_types(img.dtype, jnp.float32)
    ch = _unnormalize(coords[..., 0].astype(ctype), H, align_corners)
    cw = _unnormalize(coords[..., 1].astype(ctype), W, align_corners)

    h0, h1, wh, okh0, okh1 = _gather_corner_weights(ch, H, padding_mode)
    w0, w1, ww, okw0, okw1 = _gather_corner_weights(cw, W, padding_mode)

    flat = img.reshape(B, H * W, C)
    out_dtype = img.dtype if jnp.issubdtype(img.dtype, jnp.floating) else ctype

    def corner(ih, iw, ok, w):
        lin = ih * W + iw
        g = jnp.take_along_axis(flat, lin[..., None], axis=1)
        w = jnp.where(ok, w, 0.0)
        return g.astype(ctype) * w[..., None]

    out = (
        corner(h0, w0, okh0 & okw0, (1 - wh) * (1 - ww))
        + corner(h1, w0, okh1 & okw0, wh * (1 - ww))
        + corner(h0, w1, okh0 & okw1, (1 - wh) * ww)
        + corner(h1, w1, okh1 & okw1, wh * ww)
    )
    return out.astype(out_dtype).reshape(B, *batch_shape, C)


def grid_sample_3d_cfirst(
    vol_flat: jnp.ndarray,
    spatial: Tuple[int, int, int],
    coords: jnp.ndarray,
    align_corners: bool = False,
    padding_mode: str = "zeros",
    compute_dtype=None,
) -> jnp.ndarray:
    """Trilinear sampling over a channels-FIRST flat volume.

    vol_flat: [B, C, X*Y*Z]; coords: [B, S, 3] in [-1, 1] -> out [B, C, S].

    Same math as grid_sample_3d, but the gather's minor (lane) dimension is
    the large sample axis S instead of the channel axis — on TPU a small C
    (e.g. an attention head_dim of 24) in the minor dim pads to 128 lanes and
    inflates every corner gather ~5x; this layout keeps tiles dense.  Used by
    the deformable-attention hot path.
    """
    B, C, N = vol_flat.shape
    X, Y, Z = spatial
    assert N == X * Y * Z
    S = coords.shape[1]
    # compute_dtype=bfloat16 keeps the corner gather-multiply-accumulate in
    # bf16 — the deformable-attention hot path (which the reference runs
    # under fp16 autocast, so low-precision lerp is parity-faithful); the
    # default promotes to f32, matching torch grid_sample outside autocast.
    # At 896x1600 training the f32 backward temps of this lerp were the
    # largest remaining HBM consumers.  Coordinate/weight math always stays
    # in f32: bf16 has too few mantissa bits to address a 128-wide grid.
    wtype = jnp.promote_types(vol_flat.dtype, jnp.float32)
    ctype = compute_dtype or wtype
    cx = _unnormalize(coords[..., 0].astype(wtype), X, align_corners)
    cy = _unnormalize(coords[..., 1].astype(wtype), Y, align_corners)
    cz = _unnormalize(coords[..., 2].astype(wtype), Z, align_corners)
    x0, x1, wx, okx0, okx1 = _gather_corner_weights(cx, X, padding_mode)
    y0, y1, wy, oky0, oky1 = _gather_corner_weights(cy, Y, padding_mode)
    z0, z1, wz, okz0, okz1 = _gather_corner_weights(cz, Z, padding_mode)

    def corner(ix, iy, iz, ok, w):
        lin = (ix * Y + iy) * Z + iz  # [B, S]
        g = jnp.take_along_axis(
            vol_flat, lin[:, None, :].astype(jnp.int32), axis=2
        )  # [B, C, S]
        w = jnp.where(ok, w, 0.0)[:, None, :]
        return g.astype(ctype) * w.astype(ctype)

    out = (
        corner(x0, y0, z0, okx0 & oky0 & okz0, (1 - wx) * (1 - wy) * (1 - wz))
        + corner(x1, y0, z0, okx1 & oky0 & okz0, wx * (1 - wy) * (1 - wz))
        + corner(x0, y1, z0, okx0 & oky1 & okz0, (1 - wx) * wy * (1 - wz))
        + corner(x0, y0, z1, okx0 & oky0 & okz1, (1 - wx) * (1 - wy) * wz)
        + corner(x1, y1, z0, okx1 & oky1 & okz0, wx * wy * (1 - wz))
        + corner(x1, y0, z1, okx1 & oky0 & okz1, wx * (1 - wy) * wz)
        + corner(x0, y1, z1, okx0 & oky1 & okz1, (1 - wx) * wy * wz)
        + corner(x1, y1, z1, okx1 & oky1 & okz1, wx * wy * wz)
    )
    out_dtype = vol_flat.dtype if jnp.issubdtype(vol_flat.dtype, jnp.floating) else ctype
    return out.astype(out_dtype)


def point_sample_3d(
    vol: jnp.ndarray,
    points: jnp.ndarray,
    align_corners: bool = False,
    padding_mode: str = "zeros",
) -> jnp.ndarray:
    """Sample ``vol [B, X, Y, Z, C]`` at [0, 1]-normalized points ``[B, P, 3]``.

    Mirrors the reference's ``point_sample_3d`` wrapper
    (mask2former/base/mmdet_utils.py:21-47) which denormalizes [0,1] -> [-1,1];
    here points[..., i] directly indexes axis i (no coordinate flip needed).
    """
    return grid_sample_3d(vol, points * 2.0 - 1.0, align_corners, padding_mode)


def _resize_coords(out_size: int, in_size: int, align_corners: bool) -> jnp.ndarray:
    """Normalized [-1, 1] sample positions for a 1-axis resize (torch interp)."""
    idx = jnp.arange(out_size, dtype=jnp.float32)
    if align_corners:
        if out_size == 1:
            pix = jnp.zeros((1,), jnp.float32)
        else:
            pix = idx * (in_size - 1) / (out_size - 1)
        return jnp.where(in_size == 1, 0.0, pix / max(in_size - 1, 1) * 2.0 - 1.0)
    pix = (idx + 0.5) * in_size / out_size - 0.5
    return (2 * pix + 1) / in_size - 1.0


def _upsample_axis_int(x: jnp.ndarray, axis: int, s: int) -> jnp.ndarray:
    """Integer-factor linear upsample along one axis, torch half-pixel
    (align_corners=False) semantics, as DENSE phase-interleaved lerps.

    Output index ``i = s*k + p`` samples input coordinate
    ``k + (p + 0.5)/s - 0.5``: each phase ``p`` is a fixed 2-tap lerp of the
    input with its border-replicated left/right shift — no gather, so XLA
    emits pure vector adds instead of the serial per-element gather that made
    ``grid_sample_3d``-backed resizes a hot spot (round-4 train ablation).
    """
    if s == 1:
        return x
    x = jnp.moveaxis(x, axis, 0)
    prev = jnp.concatenate([x[:1], x[:-1]], axis=0)   # border-replicated left
    nxt = jnp.concatenate([x[1:], x[-1:]], axis=0)    # border-replicated right
    phases = []
    for p in range(s):
        f = (p + 0.5) / s - 0.5
        if f < 0:
            yp = (-f) * prev.astype(jnp.float32) + (1.0 + f) * x.astype(jnp.float32)
        else:
            yp = (1.0 - f) * x.astype(jnp.float32) + f * nxt.astype(jnp.float32)
        phases.append(yp.astype(x.dtype))
    y = jnp.stack(phases, axis=1)  # [n, s, ...]
    y = y.reshape((x.shape[0] * s,) + x.shape[1:])
    return jnp.moveaxis(y, 0, axis)


def resize_trilinear(
    vol: jnp.ndarray, size: Tuple[int, int, int], align_corners: bool = False
) -> jnp.ndarray:
    """Trilinear resize of ``[B, X, Y, Z, C]`` matching torch ``F.interpolate``.

    Used for FPN upsampling (necks/multiscale_deformattn_3d.py:232-238) and the
    test-time voxel rescale (mask2former_occ.py:688-694).

    Integer-factor upsamples with align_corners=False (the FPN case) take the
    dense separable path (`_upsample_axis_int`); everything else falls back to
    the gather-based ``grid_sample_3d`` formulation.
    """
    B, X, Y, Z, C = vol.shape
    ox, oy, oz = size
    if (not align_corners and ox % X == 0 and oy % Y == 0 and oz % Z == 0
            and (ox, oy, oz) != (X, Y, Z)):
        out = _upsample_axis_int(vol, 1, ox // X)
        out = _upsample_axis_int(out, 2, oy // Y)
        return _upsample_axis_int(out, 3, oz // Z)
    gx = _resize_coords(ox, X, align_corners)
    gy = _resize_coords(oy, Y, align_corners)
    gz = _resize_coords(oz, Z, align_corners)
    grid = jnp.stack(
        jnp.meshgrid(gx, gy, gz, indexing="ij"), axis=-1
    )  # [ox, oy, oz, 3]
    grid = jnp.broadcast_to(grid[None], (B, ox, oy, oz, 3))
    # border padding: a resize samples at most half a pixel out of range, and
    # torch clamps (replicates) there
    return grid_sample_3d(vol, grid, align_corners=align_corners, padding_mode="border")


def resize_bilinear(
    img: jnp.ndarray, size: Tuple[int, int], align_corners: bool = False
) -> jnp.ndarray:
    """Bilinear resize of ``[B, H, W, C]`` matching torch ``F.interpolate``."""
    B, H, W, C = img.shape
    oh, ow = size
    gh = _resize_coords(oh, H, align_corners)
    gw = _resize_coords(ow, W, align_corners)
    grid = jnp.stack(jnp.meshgrid(gh, gw, indexing="ij"), axis=-1)
    grid = jnp.broadcast_to(grid[None], (B, oh, ow, 2))
    return grid_sample_2d(img, grid, align_corners=align_corners, padding_mode="border")
