"""LSS camera geometry: frustum creation and camera -> ego unprojection.

Re-derivation of the reference's Lift-Splat-Shoot geometry
(projects/mmdet3d_plugin/occformer/image2bev/ViewTransformerLSSBEVDepth.py:104-150)
as pure jnp functions over static shapes.  Every step is a small batched
matmul/broadcast, which XLA fuses; there is no host round trip.
"""
from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax.numpy as jnp
import numpy as np


def gen_dx_bx(xbound, ybound, zbound) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Voxel sizes, first-voxel centers and counts per axis.

    Reference: ViewTransformerLSSBEVDepth.py:21-25.
    """
    dx = np.array([row[2] for row in (xbound, ybound, zbound)], np.float32)
    bx = np.array([row[0] + row[2] / 2.0 for row in (xbound, ybound, zbound)], np.float32)
    nx = np.array(
        [round((row[1] - row[0]) / row[2]) for row in (xbound, ybound, zbound)], np.int32
    )
    return dx, bx, nx


def create_frustum(
    grid_config: Dict, input_size: Tuple[int, int], downsample: int
) -> np.ndarray:
    """Frustum of (u, v, d) image-plane points, shape ``[D, fH, fW, 3]``.

    Reference: ViewTransformerLSSBEVDepth.py:104-115.  Computed once on host
    (numpy) and closed over as a constant by the jitted program.
    """
    ogfH, ogfW = input_size
    fH, fW = ogfH // downsample, ogfW // downsample
    d0, d1, dstep = grid_config["dbound"]
    ds = np.arange(d0, d1, dstep, dtype=np.float32).reshape(-1, 1, 1)
    D = ds.shape[0]
    ds = np.broadcast_to(ds, (D, fH, fW))
    xs = np.broadcast_to(
        np.linspace(0, ogfW - 1, fW, dtype=np.float32).reshape(1, 1, fW), (D, fH, fW)
    )
    ys = np.broadcast_to(
        np.linspace(0, ogfH - 1, fH, dtype=np.float32).reshape(1, fH, 1), (D, fH, fW)
    )
    return np.stack([xs, ys, ds], axis=-1)


def get_geometry(
    frustum: jnp.ndarray,
    rots: jnp.ndarray,
    trans: jnp.ndarray,
    intrins: jnp.ndarray,
    post_rots: jnp.ndarray,
    post_trans: jnp.ndarray,
    bda: jnp.ndarray,
) -> jnp.ndarray:
    """Ego-frame xyz of every frustum point: ``[B, N, D, fH, fW, 3]``.

    Pipeline (reference ViewTransformerLSSBEVDepth.py:117-150):
      1. undo the per-image augmentation homography (post_rot/post_tran)
      2. (u*d, v*d, d) homogeneous lift
      3. KITTI 3x4 intrinsics: subtract the projection shift column
      4. cam -> ego via rots @ inv(intrins), plus trans
      5. BEV-data-augmentation matrix (3x3 or 4x4)

    Args:
      frustum: [D, fH, fW, 3] (u, v, depth)
      rots/intrins/post_rots: [B, N, 3, 3] (intrins may be [B, N, 3, 4] for KITTI)
      trans/post_trans: [B, N, 3]
      bda: [B, 3, 3] or [B, 4, 4]
    """
    B, N = trans.shape[:2]
    pts = frustum[None, None] - post_trans[:, :, None, None, None, :]
    inv_post = jnp.linalg.inv(post_rots)
    pts = jnp.einsum("bnij,bndhwj->bndhwi", inv_post, pts, precision="highest")

    # (u, v, d) -> (u*d, v*d, d)
    pts = jnp.concatenate([pts[..., :2] * pts[..., 2:3], pts[..., 2:3]], axis=-1)

    if intrins.shape[-1] == 4:  # KITTI P2 is 3x4: remove the shift column first
        shift = intrins[:, :, :3, 3]
        pts = pts - shift[:, :, None, None, None, :]
        intrins = intrins[:, :, :3, :3]

    combine = jnp.einsum("bnij,bnjk->bnik", rots, jnp.linalg.inv(intrins), precision="highest")
    pts = jnp.einsum("bnij,bndhwj->bndhwi", combine, pts, precision="highest")
    pts = pts + trans[:, :, None, None, None, :]

    if bda.shape[-1] == 4:
        ones = jnp.ones(pts.shape[:-1] + (1,), pts.dtype)
        pts_h = jnp.concatenate([pts, ones], axis=-1)
        pts = jnp.einsum("bij,bndhwj->bndhwi", bda, pts_h, precision="highest")[..., :3]
    else:
        pts = jnp.einsum("bij,bndhwj->bndhwi", bda, pts, precision="highest")
    return pts


def compute_voxel_coords(
    geom: jnp.ndarray, dx: Sequence[float], bx: Sequence[float], nx: Sequence[int]
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Quantize ego xyz to integer voxel indices plus a validity mask.

    The reference drops out-of-range points with a boolean index
    (ViewTransformerLSSVoxel.py:90-94), creating dynamic shapes; here every
    point keeps a static slot and invalid ones are masked (SURVEY.md §7 hard
    part 1) — summation semantics are identical because scatter is additive.

    Returns (coords [..., 3] int32, valid [...] bool).
    """
    dx = jnp.asarray(dx, geom.dtype)
    bx = jnp.asarray(bx, geom.dtype)
    nx = jnp.asarray(nx, jnp.int32)
    # torch `.long()` truncates toward zero, so ratios in (-1, 0) land in
    # voxel 0 and are kept — int32 cast has the same round-toward-zero rule.
    coords = (geom - (bx - dx / 2.0)) / dx
    coords_i = coords.astype(jnp.int32)
    valid = jnp.all((coords_i >= 0) & (coords_i < nx), axis=-1)
    return coords_i, valid
