"""TPU-native point-cloud op family (the mmdet3d native-op surface).

Every CUDA op under mmdetection3d/mmdet3d/ops/ that the vendored framework
exposes (SURVEY.md §2.3) gets an XLA equivalent with static shapes: dynamic
point/voxel counts become fixed-capacity buffers + validity masks, gathers
replace scatter kernels where the transpose is cheaper, and sorting-based
formulations replace atomics.

Ops: hard/dynamic voxelization (ops/voxel), ball_query, knn, gather_points,
group_points, furthest_point_sample, three_nn/three_interpolate
(PointNet++ family), points_in_boxes (roiaware_pool3d), rotated BEV/3D IoU
and NMS (iou3d).
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

BIG = 1e10


# ---------------------------------------------------------------------------
# voxelization (mmdet3d/ops/voxel: hard + dynamic)
# ---------------------------------------------------------------------------

def dynamic_voxelize(
    points: jnp.ndarray,          # [N, C] (xyz first)
    valid: jnp.ndarray,           # [N]
    voxel_size: Sequence[float],
    pc_range: Sequence[float],
) -> jnp.ndarray:
    """Per-point voxel coords, -1 where out of range (dynamic voxelization)."""
    vs = jnp.asarray(voxel_size, jnp.float32)
    lo = jnp.asarray(pc_range[:3], jnp.float32)
    hi = jnp.asarray(pc_range[3:], jnp.float32)
    grid = jnp.round((hi - lo) / vs).astype(jnp.int32)
    coords = jnp.floor((points[:, :3] - lo) / vs).astype(jnp.int32)
    ok = valid & jnp.all((coords >= 0) & (coords < grid), axis=-1)
    return jnp.where(ok[:, None], coords, -1)


def hard_voxelize(
    points: jnp.ndarray,          # [N, C]
    valid: jnp.ndarray,           # [N]
    voxel_size: Sequence[float],
    pc_range: Sequence[float],
    max_points: int = 35,
    max_voxels: int = 20000,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Group points into at most ``max_voxels`` voxels of <= ``max_points``.

    Static-shape formulation of mmdet3d hard voxelization
    (ops/voxel/voxelization.py): sort points by voxel rank, number them
    within each run (slot), number runs (voxel id), then scatter into the
    fixed [max_voxels, max_points, C] buffer.  First-come order matches the
    CUDA kernel's first-fit semantics under a stable sort.

    Returns (voxels [V, P, C], coords [V, 3] (-1 padding), num_points [V]).
    """
    N, C = points.shape
    vs = jnp.asarray(voxel_size, jnp.float32)
    lo = jnp.asarray(pc_range[:3], jnp.float32)
    hi = jnp.asarray(pc_range[3:], jnp.float32)
    grid = jnp.round((hi - lo) / vs).astype(jnp.int32)
    coords = jnp.floor((points[:, :3] - lo) / vs).astype(jnp.int32)
    ok = valid & jnp.all((coords >= 0) & (coords < grid), axis=-1)

    rank = (coords[:, 0] * grid[1] + coords[:, 1]) * grid[2] + coords[:, 2]
    rank = jnp.where(ok, rank, jnp.iinfo(jnp.int32).max)  # invalid last
    order = jnp.argsort(rank, stable=True)
    rank_s = rank[order]
    pts_s = points[order]
    coords_s = coords[order]
    ok_s = ok[order]

    new_run = jnp.concatenate(
        [jnp.ones((1,), bool), rank_s[1:] != rank_s[:-1]]
    ) & ok_s
    voxel_id = jnp.cumsum(new_run) - 1                       # [N]
    run_start = jnp.maximum(
        jax.lax.associative_scan(
            jnp.maximum, jnp.where(new_run, jnp.arange(N), -1)
        ), 0,
    )
    slot = jnp.arange(N) - run_start                        # position in run

    keep = ok_s & (voxel_id < max_voxels) & (slot < max_points)
    flat = jnp.where(keep, voxel_id * max_points + slot, max_voxels * max_points)

    voxels = jnp.zeros((max_voxels * max_points + 1, C), points.dtype)
    voxels = voxels.at[flat].set(jnp.where(keep[:, None], pts_s, 0.0))
    voxels = voxels[:-1].reshape(max_voxels, max_points, C)

    num_points = jax.ops.segment_sum(
        keep.astype(jnp.int32), jnp.where(keep, voxel_id, max_voxels),
        num_segments=max_voxels + 1,
    )[:max_voxels]

    vcoords = jnp.full((max_voxels + 1, 3), -1, jnp.int32)
    vcoords = vcoords.at[jnp.where(new_run & keep, voxel_id, max_voxels)].set(coords_s)
    return voxels, vcoords[:max_voxels], num_points


# ---------------------------------------------------------------------------
# PointNet++ family (ops/{ball_query,knn,furthest_point_sample,...})
# ---------------------------------------------------------------------------

def square_distance(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """[.., N, 3] x [.., M, 3] -> [.., N, M] squared euclidean distances."""
    return jnp.sum((a[..., :, None, :] - b[..., None, :, :]) ** 2, axis=-1)


def ball_query(
    xyz: jnp.ndarray,       # [B, N, 3] all points
    new_xyz: jnp.ndarray,   # [B, S, 3] query centers
    radius: float,
    nsample: int,
    valid: Optional[jnp.ndarray] = None,  # [B, N]
) -> jnp.ndarray:
    """Indices [B, S, nsample] of points within radius; CUDA semantics: take
    the first ``nsample`` in index order, repeating the first hit to fill."""
    d2 = square_distance(new_xyz, xyz)  # [B, S, N]
    inside = d2 <= radius * radius
    if valid is not None:
        inside = inside & valid[:, None, :]
    N = xyz.shape[1]
    idx_row = jnp.broadcast_to(jnp.arange(N), inside.shape)
    cand = jnp.where(inside, idx_row, N)
    cand = jnp.sort(cand, axis=-1)[..., :nsample]  # first nsample by index
    first = cand[..., :1]
    return jnp.where(cand == N, first, cand).astype(jnp.int32)


def knn(k: int, xyz: jnp.ndarray, new_xyz: jnp.ndarray,
        valid: Optional[jnp.ndarray] = None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """k nearest neighbors: ([B, S, k] distances, [B, S, k] indices)."""
    d2 = square_distance(new_xyz, xyz)
    if valid is not None:
        d2 = jnp.where(valid[:, None, :], d2, BIG)
    neg_d, idx = jax.lax.top_k(-d2, k)
    return jnp.sqrt(jnp.maximum(-neg_d, 0.0)), idx.astype(jnp.int32)


def gather_points(feats: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """[B, N, C], [B, S] -> [B, S, C] (ops/gather_points)."""
    return jnp.take_along_axis(feats, idx[..., None], axis=1)


def group_points(feats: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """[B, N, C], [B, S, K] -> [B, S, K, C] (ops/group_points)."""
    B, N, C = feats.shape
    S, K = idx.shape[1:]
    flat = idx.reshape(B, S * K)
    out = jnp.take_along_axis(feats, flat[..., None], axis=1)
    return out.reshape(B, S, K, C)


def furthest_point_sample(
    xyz: jnp.ndarray, npoint: int, valid: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """Iterative farthest-point sampling, [B, N, 3] -> [B, npoint] indices.

    Same greedy recursion as the CUDA kernel (starts at index 0); the loop is
    a lax.fori_loop with a running min-distance buffer.
    """
    B, N, _ = xyz.shape
    mask_big = jnp.zeros((B, N)) if valid is None else jnp.where(valid, 0.0, BIG)

    def body(i, state):
        dist, idxs, last = state
        lastp = jnp.take_along_axis(xyz, last[:, None, None], axis=1)  # [B,1,3]
        d = jnp.sum((xyz - lastp) ** 2, axis=-1) + mask_big
        dist = jnp.minimum(dist, d)
        nxt = jnp.argmax(dist, axis=-1).astype(jnp.int32)
        idxs = idxs.at[:, i].set(nxt)
        return dist, idxs, nxt

    dist0 = jnp.full((B, N), BIG) + mask_big
    idxs0 = jnp.zeros((B, npoint), jnp.int32)
    start = jnp.zeros((B,), jnp.int32)
    idxs0 = idxs0.at[:, 0].set(start)
    _, idxs, _ = jax.lax.fori_loop(1, npoint, body, (dist0, idxs0, start))
    return idxs


def three_nn(unknown: jnp.ndarray, known: jnp.ndarray,
             valid: Optional[jnp.ndarray] = None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """3 nearest known points per unknown point (ops/interpolate three_nn)."""
    return knn(3, known, unknown, valid)


def three_interpolate(feats: jnp.ndarray, idx: jnp.ndarray,
                      weight: jnp.ndarray) -> jnp.ndarray:
    """Inverse-distance weighted interpolation: [B, M, C], [B, N, 3], [B, N, 3]
    -> [B, N, C]."""
    g = group_points(feats, idx)  # [B, N, 3, C]
    return jnp.sum(g * weight[..., None], axis=2)


# ---------------------------------------------------------------------------
# boxes (ops/{roiaware_pool3d, iou3d})
# ---------------------------------------------------------------------------

def points_in_boxes(points: jnp.ndarray, boxes: jnp.ndarray) -> jnp.ndarray:
    """[B, N, 3] x [B, M, 7] (x,y,z,dx,dy,dz,yaw; z = bottom center) ->
    [B, N, M] bool membership (roiaware_pool3d points_in_boxes semantics)."""
    ctr = boxes[..., :3]
    dims = boxes[..., 3:6]
    yaw = boxes[..., 6]
    rel = points[:, :, None, :] - ctr[:, None, :, :]
    c, s = jnp.cos(-yaw), jnp.sin(-yaw)
    lx = rel[..., 0] * c[:, None] - rel[..., 1] * s[:, None]
    ly = rel[..., 0] * s[:, None] + rel[..., 1] * c[:, None]
    lz = rel[..., 2]
    inx = jnp.abs(lx) <= dims[:, None, :, 0] / 2
    iny = jnp.abs(ly) <= dims[:, None, :, 1] / 2
    inz = (lz >= 0) & (lz <= dims[:, None, :, 2])
    return inx & iny & inz


def roiaware_pool3d(
    points: jnp.ndarray,       # [N, 3]
    feats: jnp.ndarray,        # [N, C]
    boxes: jnp.ndarray,        # [M, 7] (x, y, z, dx, dy, dz, yaw; z bottom)
    out_size: int = 7,
    mode: str = "max",
    valid: Optional[jnp.ndarray] = None,  # [N]
) -> jnp.ndarray:
    """RoI-aware pooling: per box, pool point features into a T^3 grid.

    TPU formulation of mmdet3d ops/roiaware_pool3d: canonicalize points into
    each box frame, quantize to grid cells, segment-max/mean per cell.
    Returns [M, T, T, T, C] (empty cells are 0).
    """
    M = boxes.shape[0]
    T = out_size
    C = feats.shape[-1]

    def one_box(box):
        ctr, dims, yaw = box[:3], box[3:6], box[6]
        rel = points - ctr
        c, s = jnp.cos(-yaw), jnp.sin(-yaw)
        lx = rel[:, 0] * c - rel[:, 1] * s
        ly = rel[:, 0] * s + rel[:, 1] * c
        lz = rel[:, 2]
        # normalized cell coords in [0, T)
        u = (lx / dims[0] + 0.5) * T
        v = (ly / dims[1] + 0.5) * T
        w = (lz / dims[2]) * T
        inside = (u >= 0) & (u < T) & (v >= 0) & (v < T) & (w >= 0) & (w < T)
        if valid is not None:
            inside = inside & valid
        cell = (u.astype(jnp.int32) * T + v.astype(jnp.int32)) * T + w.astype(jnp.int32)
        cell = jnp.where(inside, cell, T ** 3)
        if mode == "max":
            pooled = jax.ops.segment_max(
                jnp.where(inside[:, None], feats, -jnp.inf), cell,
                num_segments=T ** 3 + 1,
            )
            pooled = jnp.where(jnp.isfinite(pooled), pooled, 0.0)
        else:
            sums = jax.ops.segment_sum(
                jnp.where(inside[:, None], feats, 0.0), cell,
                num_segments=T ** 3 + 1,
            )
            cnt = jax.ops.segment_sum(
                inside.astype(feats.dtype), cell, num_segments=T ** 3 + 1
            )
            pooled = sums / jnp.maximum(cnt[:, None], 1.0)
        return pooled[: T ** 3].reshape(T, T, T, C)

    return jax.vmap(one_box)(boxes)


def _box_corners_bev(boxes: jnp.ndarray) -> jnp.ndarray:
    """[..., 5] (x, y, dx, dy, yaw) -> [..., 4, 2] corners (ccw)."""
    x, y, dx, dy, yaw = (boxes[..., i] for i in range(5))
    cx = jnp.stack([dx, dx, -dx, -dx], -1) / 2
    cy = jnp.stack([-dy, dy, dy, -dy], -1) / 2
    c, s = jnp.cos(yaw)[..., None], jnp.sin(yaw)[..., None]
    rx = cx * c - cy * s + x[..., None]
    ry = cx * s + cy * c + y[..., None]
    return jnp.stack([rx, ry], -1)


def _polygon_area(poly: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Shoelace area of a padded convex polygon [..., V, 2] with mask."""
    # replace invalid vertices with the first valid one (doesn't change area)
    first = poly[..., :1, :]
    p = jnp.where(valid[..., None], poly, first)
    nxt = jnp.roll(p, -1, axis=-2)
    cross = p[..., 0] * nxt[..., 1] - nxt[..., 0] * p[..., 1]
    return 0.5 * jnp.abs(jnp.sum(cross, axis=-1))


def rotated_box_intersection_area(b1: jnp.ndarray, b2: jnp.ndarray) -> jnp.ndarray:
    """Exact intersection area of two BEV boxes [..., 5] via
    Sutherland–Hodgman clipping (fixed 4+4 -> <= 8 vertex polygon)."""
    subject = _box_corners_bev(b1)          # [..., 4, 2]
    clip = _box_corners_bev(b2)             # [..., 4, 2]
    V = 8
    poly = jnp.concatenate([subject, jnp.zeros_like(subject)], axis=-2)  # pad to 8
    valid = jnp.concatenate(
        [jnp.ones(subject.shape[:-1], bool)[..., :4],
         jnp.zeros(subject.shape[:-1], bool)[..., :4]], axis=-1,
    )

    def clip_edge(i, state):
        poly, valid = state
        a = jnp.take(clip, i % 4, axis=-2)
        b = jnp.take(clip, (i + 1) % 4, axis=-2)
        edge = b - a  # clip edge; inside = left of a->b (ccw)

        def inside(p):
            return (edge[..., 0] * (p[..., 1] - a[..., 1])
                    - edge[..., 1] * (p[..., 0] - a[..., 0])) >= 0

        out_poly = jnp.zeros_like(poly)
        out_valid = jnp.zeros_like(valid)
        count = jnp.zeros(poly.shape[:-2], jnp.int32)

        n_valid = jnp.sum(valid, axis=-1)

        def emit(out_poly, out_valid, count, pt, do):
            # scatter along the vertex axis with a one-hot (shape-generic)
            idx = jnp.clip(count, 0, V - 1)
            onehot = jax.nn.one_hot(idx, V, dtype=poly.dtype) * do[..., None]
            out_poly = out_poly + onehot[..., None] * pt[..., None, :]
            out_valid = out_valid | (onehot > 0)
            count = count + do.astype(jnp.int32)
            return out_poly, out_valid, count

        for j in range(V):
            cur = poly[..., j, :]
            nxt_idx = (j + 1)
            # next valid vertex wraps to 0 — emulate ring over the valid prefix
            nxt = jnp.take(poly, nxt_idx % V, axis=-2)
            # for the ring, vertex j+1 beyond the valid prefix wraps to vertex 0
            wrap = (nxt_idx >= n_valid)
            nxt = jnp.where(wrap[..., None], poly[..., 0, :], nxt)
            seg_valid = valid[..., j]

            cur_in = inside(cur)
            nxt_in = inside(nxt)
            denom = (edge[..., 0] * (nxt[..., 1] - cur[..., 1])
                     - edge[..., 1] * (nxt[..., 0] - cur[..., 0]))
            t_num = (edge[..., 0] * (a[..., 1] - cur[..., 1])
                     - edge[..., 1] * (a[..., 0] - cur[..., 0]))
            t = t_num / jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
            inter = cur + t[..., None] * (nxt - cur)

            out_poly, out_valid, count = emit(
                out_poly, out_valid, count, cur, seg_valid & cur_in)
            out_poly, out_valid, count = emit(
                out_poly, out_valid, count, inter,
                seg_valid & (cur_in != nxt_in))
        return out_poly, out_valid

    poly, valid = jax.lax.fori_loop(0, 4, clip_edge, (poly, valid))
    return _polygon_area(poly, valid)


def boxes_iou_bev(b1: jnp.ndarray, b2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise rotated BEV IoU: [N, 5] x [M, 5] -> [N, M] (ops/iou3d)."""
    N, M = b1.shape[0], b2.shape[0]
    bb1 = jnp.broadcast_to(b1[:, None], (N, M, 5))
    bb2 = jnp.broadcast_to(b2[None, :], (N, M, 5))
    inter = rotated_box_intersection_area(bb1, bb2)
    a1 = b1[:, 2] * b1[:, 3]
    a2 = b2[:, 2] * b2[:, 3]
    union = a1[:, None] + a2[None, :] - inter
    return inter / jnp.maximum(union, 1e-7)


def boxes_iou_3d(b1: jnp.ndarray, b2: jnp.ndarray) -> jnp.ndarray:
    """Rotated 3D IoU: [N, 7] x [M, 7], z = bottom center."""
    bev = boxes_iou_bev(b1[:, [0, 1, 3, 4, 6]], b2[:, [0, 1, 3, 4, 6]])
    inter_bev = bev * (
        (b1[:, 3] * b1[:, 4])[:, None] + (b2[:, 3] * b2[:, 4])[None, :]
    ) / (1.0 + bev)  # recover intersection area from IoU
    z1_lo, z1_hi = b1[:, 2], b1[:, 2] + b1[:, 5]
    z2_lo, z2_hi = b2[:, 2], b2[:, 2] + b2[:, 5]
    zi = jnp.maximum(
        jnp.minimum(z1_hi[:, None], z2_hi[None, :])
        - jnp.maximum(z1_lo[:, None], z2_lo[None, :]), 0.0,
    )
    inter = inter_bev * zi
    v1 = b1[:, 3] * b1[:, 4] * b1[:, 5]
    v2 = b2[:, 3] * b2[:, 4] * b2[:, 5]
    return inter / jnp.maximum(v1[:, None] + v2[None, :] - inter, 1e-7)


def nms_bev(boxes: jnp.ndarray, scores: jnp.ndarray, iou_threshold: float,
            max_out: Optional[int] = None) -> jnp.ndarray:
    """Rotated-BEV NMS: returns keep mask [N] (ops/iou3d nms_gpu)."""
    N = boxes.shape[0]
    order = jnp.argsort(-scores)
    iou = boxes_iou_bev(boxes[order], boxes[order])

    def body(i, keep):
        sup = (iou[i] > iou_threshold) & keep[i]
        sup = sup & (jnp.arange(N) > i)
        return keep & ~sup

    keep_sorted = jax.lax.fori_loop(0, N, body, jnp.ones((N,), bool))
    keep = jnp.zeros((N,), bool).at[order].set(keep_sorted)
    return keep
