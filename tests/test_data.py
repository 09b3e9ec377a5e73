"""Data-layer tests: voxelizer vs reference algorithm oracle, BDA matrices,
image-aug homography, depth projection, collation."""
import numpy as np
import pytest

from occformer_tpu.data.voxelize import (
    bda_matrix,
    majority_vote_voxelize,
    voxel_transform,
)
from occformer_tpu.data.transforms import img_transform_matrices, get_rot
from occformer_tpu.data.loader import collate_batch, pad_points


def _oracle_voxelize(points, labels, grid_size, pcr, empty_id):
    """Literal re-implementation of the reference numba kernel semantics
    (loading_nusc_occ.py:97-138) in slow python."""
    grid_size = np.asarray(grid_size)
    pcr = np.asarray(pcr, np.float64)
    vs = (pcr[3:] - pcr[:3]) / grid_size
    eps = 1e-5
    pts = np.clip(points[:, :3], pcr[:3], pcr[3:] - eps)
    idx = np.floor((pts - pcr[:3]) / vs).astype(np.int64)
    out = np.full(tuple(grid_size), empty_id, np.uint8)
    votes = {}
    for i in range(len(idx)):
        key = tuple(idx[i])
        votes.setdefault(key, np.zeros(256, np.int64))[int(labels[i])] += 1
    for key, counter in votes.items():
        out[key] = int(np.argmax(counter))
    return out


@pytest.mark.quick
def test_majority_vote_voxelize_matches_oracle(rng):
    grid = (8, 8, 4)
    pcr = [-4, -4, -2, 4, 4, 2]
    pts = rng.uniform(-5, 5, size=(500, 3)).astype(np.float32)
    labels = rng.randint(0, 18, 500)
    ours = majority_vote_voxelize(pts, labels, grid, pcr, empty_id=17)
    ref = _oracle_voxelize(pts, labels, grid, pcr, empty_id=17)
    np.testing.assert_array_equal(ours, ref)


def test_bda_matrix_flips():
    m = bda_matrix(0.0, True, False, False)
    np.testing.assert_allclose(m, np.diag([-1.0, 1.0, 1.0]))
    m = bda_matrix(0.0, True, True, True)
    np.testing.assert_allclose(m, np.diag([-1.0, -1.0, -1.0]))
    m = bda_matrix(90.0, False, False, False)
    np.testing.assert_allclose(m @ np.array([1.0, 0, 0]), [0, 1, 0], atol=1e-6)


def test_voxel_transform_flip_consistency(rng):
    """Flipping the grid must equal transforming coordinates by bda."""
    labels = rng.randint(0, 5, size=(8, 8, 4))
    out, bda = voxel_transform(labels, 0.0, 1.0, True, False, False)
    np.testing.assert_array_equal(out, labels[::-1])
    assert bda.shape == (3, 3)
    # kitti variant: 4x4 with center conjugation
    center = np.array([4.0, 0.0, 0.0])
    out2, bda4 = voxel_transform(labels, 0.0, 1.0, True, False, False,
                                 transform_center=center)
    assert bda4.shape == (4, 4)
    # a point at center must map to itself
    p = np.array([4.0, 0.0, 0.0, 1.0])
    np.testing.assert_allclose(bda4 @ p, p, atol=1e-6)
    # x = 0 maps to x = 8 (mirror about 4)
    np.testing.assert_allclose((bda4 @ np.array([0.0, 1.0, 0.5, 1.0]))[:3],
                               [8.0, 1.0, 0.5], atol=1e-6)


def test_img_transform_homography_roundtrip(rng):
    """The accumulated (post_rot, post_tran) must map raw pixel coords to
    augmented pixel coords the same way the image ops do geometrically."""
    resize = 0.5
    crop = (10, 4, 74, 36)  # 64x32 crop
    # no flip, no rotation: aug(u) = u * resize - crop_offset
    pr, pt = img_transform_matrices(resize, crop, False, 0.0)
    u = np.array([100.0, 60.0])
    out = pr @ u + pt
    np.testing.assert_allclose(out, u * resize - np.array([10.0, 4.0]), atol=1e-5)
    # flip: u' = (W_crop - 1?) reference uses x' = (crop_w) - x convention
    pr, pt = img_transform_matrices(resize, crop, True, 0.0)
    out = pr @ u + pt
    fx = (crop[2] - crop[0]) - (u[0] * resize - crop[0])
    np.testing.assert_allclose(out[0], fx, atol=1e-5)


def test_pad_points_and_collate(rng):
    pts = rng.randn(50, 4).astype(np.float32)
    padded, valid = pad_points(pts, 64)
    assert padded.shape == (64, 4) and valid.sum() == 50
    padded2, valid2 = pad_points(pts, 32)
    assert valid2.all() and padded2.shape == (32, 4)

    sample = {
        "imgs": rng.randn(2, 8, 8, 3).astype(np.float32),
        "rots": np.eye(3, dtype=np.float32)[None].repeat(2, 0),
        "trans": np.zeros((2, 3), np.float32),
        "intrins": np.eye(3, dtype=np.float32)[None].repeat(2, 0),
        "post_rots": np.eye(3, dtype=np.float32)[None].repeat(2, 0),
        "post_trans": np.zeros((2, 3), np.float32),
        "bda": np.eye(3, dtype=np.float32),
        "gt_depth": np.zeros((2, 8, 8), np.float32),
        "gt_occ": rng.randint(0, 4, (8, 8, 4)),
        "points_occ": np.concatenate([rng.uniform(-4, 4, (30, 3)),
                                      rng.randint(0, 4, (30, 1))], 1).astype(np.float32),
        "pc_range": np.array([-4, -4, -2, 4, 4, 2], np.float32),
    }
    batch = collate_batch([sample, sample], max_points=40)
    assert batch["imgs"].shape == (2, 2, 8, 8, 3)
    assert batch["lidar_xyz"].shape == (2, 40, 3)
    assert batch["lidar_valid"].sum() == 60
    assert batch["gt_occ"].dtype == np.int32
    # x/y normalized into [0, 1] (z may exceed — out-of-range LiDAR points are
    # kept and sampled with border padding, mask2former_nusc_occ.py:243-246)
    lv = batch["lidar_valid"][0]
    xy = batch["lidar_xyz"][0][lv][:, :2]
    assert (xy >= 0).all() and (xy <= 1).all()


def test_create_data_sensor2lidar_roundtrip():
    """tools/create_data.py geometry: cam->lidar from pose chains must invert
    the global-frame composition exactly (devkit-free helper)."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from create_data import rt_to_mat, sensor2lidar

    rng = np.random.default_rng(0)

    def rand_rot():
        a, b, c = rng.uniform(-np.pi, np.pi, 3)
        Rz = np.array([[np.cos(a), -np.sin(a), 0], [np.sin(a), np.cos(a), 0], [0, 0, 1]])
        Ry = np.array([[np.cos(b), 0, np.sin(b)], [0, 1, 0], [-np.sin(b), 0, np.cos(b)]])
        Rx = np.array([[1, 0, 0], [0, np.cos(c), -np.sin(c)], [0, np.sin(c), np.cos(c)]])
        return Rz @ Ry @ Rx

    cam_r, cam_t = rand_rot(), rng.uniform(-2, 2, 3)
    came_r, came_t = rand_rot(), rng.uniform(-100, 100, 3)
    lid_r, lid_t = rand_rot(), rng.uniform(-2, 2, 3)
    lide_r, lide_t = rand_rot(), rng.uniform(-100, 100, 3)

    r, t = sensor2lidar(cam_r, cam_t, came_r, came_t, lid_r, lid_t, lide_r, lide_t)
    # a point at the camera origin maps to the camera center in lidar frame
    cam2global = rt_to_mat(came_r, came_t) @ rt_to_mat(cam_r, cam_t)
    lidar2global = rt_to_mat(lide_r, lide_t) @ rt_to_mat(lid_r, lid_t)
    p_cam = rng.uniform(-5, 5, 3)
    p_global = cam2global[:3, :3] @ p_cam + cam2global[:3, 3]
    p_lidar_ref = np.linalg.inv(lidar2global)[:3, :3] @ p_global + \
        np.linalg.inv(lidar2global)[:3, 3]
    np.testing.assert_allclose(r @ p_cam + t, p_lidar_ref, rtol=1e-9, atol=1e-9)


def test_mmlab_normalize_to_rgb_semantics():
    """to_rgb=False (caffe-style R101) feeds the network BGR with BGR means;
    to_rgb=True keeps PIL's RGB (mmcv imnormalize semantics)."""
    from PIL import Image
    from occformer_tpu.data.transforms import mmlab_normalize

    img = Image.fromarray(
        np.stack([np.full((2, 2), 200, np.uint8),     # R
                  np.full((2, 2), 100, np.uint8),     # G
                  np.full((2, 2), 50, np.uint8)], -1))  # B
    rgb_cfg = dict(mean=[10.0, 20.0, 30.0], std=[1.0, 2.0, 4.0], to_rgb=True)
    out = mmlab_normalize(img, rgb_cfg)
    np.testing.assert_allclose(out[0, 0], [(200 - 10) / 1, (100 - 20) / 2,
                                           (50 - 30) / 4])
    bgr_cfg = dict(mean=[10.0, 20.0, 30.0], std=[1.0, 2.0, 4.0], to_rgb=False)
    out = mmlab_normalize(img, bgr_cfg)
    np.testing.assert_allclose(out[0, 0], [(50 - 10) / 1, (100 - 20) / 2,
                                           (200 - 30) / 4])
