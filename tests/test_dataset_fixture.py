"""From-disk dataset fixtures: the REAL shipped-config pipelines over a tiny
synthetic nuScenes / SemanticKITTI tree.

This is the only place the full disk->batch chain is exercised the way
training runs it (dataset __getitem__ -> image load+aug -> CreateDepthFromLiDAR
-> occupancy voxelization -> ShardedLoader collate), mirroring the reference
data flow (SURVEY.md §3.4).  It exists because unit tests alone missed a
pipeline-order bug: CreateDepthFromLiDAR consumed a key only produced by the
NEXT step (reference lidar2depth.py:41-50 loads the raw cloud itself).
"""
import os
import pickle

import numpy as np
import pytest
from PIL import Image

from occformer_tpu.config import load_config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CAMS = ["CAM_FRONT_LEFT", "CAM_FRONT", "CAM_FRONT_RIGHT",
        "CAM_BACK_LEFT", "CAM_BACK", "CAM_BACK_RIGHT"]


def _make_nusc_tree(root, n_points=4000, seed=0):
    rng = np.random.RandomState(seed)
    os.makedirs(os.path.join(root, "samples", "LIDAR_TOP"))
    lidar_rel = "samples/LIDAR_TOP/tok0.bin"
    # cluster of points in front of the (identity-extrinsics) cameras plus
    # spread points for voxel coverage; z > 0 so they project
    cluster = np.stack([
        rng.uniform(-1.0, 1.0, n_points // 2),
        rng.uniform(-0.5, 0.5, n_points // 2),
        rng.uniform(0.5, 2.9, n_points // 2),
    ], axis=1)
    spread = np.stack([
        rng.uniform(-40.0, 40.0, n_points // 2),
        rng.uniform(-40.0, 40.0, n_points // 2),
        rng.uniform(-4.9, 2.9, n_points // 2),
    ], axis=1)
    xyz = np.concatenate([cluster, spread]).astype(np.float32)
    pts5 = np.concatenate(
        [xyz, rng.rand(n_points, 2).astype(np.float32)], axis=1)
    pts5.tofile(os.path.join(root, lidar_rel))

    os.makedirs(os.path.join(root, "lidarseg", "v1.0-trainval"))
    seg_rel = "lidarseg/v1.0-trainval/tok0_lidarseg.bin"
    labels = rng.randint(0, 32, n_points).astype(np.uint8)
    labels.tofile(os.path.join(root, seg_rel))

    cams = {}
    for ci, cam in enumerate(CAMS):
        cam_dir = os.path.join(root, "samples", cam)
        os.makedirs(cam_dir)
        img_rel = f"samples/{cam}/tok0.jpg"
        Image.fromarray(
            rng.randint(0, 255, (900, 1600, 3), np.uint8)
        ).save(os.path.join(root, img_rel))
        intrin = np.eye(3)
        intrin[0, 0] = intrin[1, 1] = 1266.0
        intrin[0, 2], intrin[1, 2] = 800.0, 450.0
        cams[cam] = dict(
            data_path="./data/nuscenes/" + img_rel,
            cam_intrinsic=intrin,
            sensor2lidar_rotation=np.eye(3),
            sensor2lidar_translation=np.zeros(3),
        )
    info = dict(
        token="tok0",
        lidar_path="./data/nuscenes/" + lidar_rel,
        timestamp=1,
        scene_token="scene0",
        lidarseg=seg_rel,
        cams=cams,
    )
    ann_file = os.path.join(root, "infos_train.pkl")
    with open(ann_file, "wb") as f:
        pickle.dump(dict(infos=[info], metadata=dict(version="v1.0-trainval")), f)
    return ann_file


def _build_nusc_dataset(tmp_path, train):
    cfg = load_config(os.path.join(
        REPO, "occformer_tpu/configs/occformer_nusc_r50_256x704.py"))
    root = str(tmp_path / "nuscenes")
    ann_file = _make_nusc_tree(root)
    dcfg = dict(cfg["data"]["train" if train else "val"])
    pipeline = [dict(p) for p in dcfg.pop("pipeline")]
    for p in pipeline:
        if p["type"] == "LoadNuscOccupancyAnnotations":
            p["data_root"] = root
    dcfg.update(data_root=root, ann_file=ann_file, pipeline=pipeline)
    dcfg.pop("type", None)

    from occformer_tpu.data.nuscenes import CustomNuScenesOccLSSDataset

    ds = CustomNuScenesOccLSSDataset(**dcfg)
    # deterministic aug draws
    for step in ds.pipeline:
        if hasattr(step, "rng"):
            step.rng = np.random.RandomState(0)
    return ds, cfg


@pytest.mark.quick
def test_nuscenes_train_pipeline_from_disk(tmp_path):
    ds, cfg = _build_nusc_dataset(tmp_path, train=True)
    assert len(ds) == 1
    s = ds[0]

    H, W = cfg["data_config"]["input_size"]
    assert s["imgs"].shape == (6, H, W, 3)
    assert np.isfinite(s["imgs"]).all()
    assert s["rots"].shape == (6, 3, 3)
    assert s["intrins"].shape == (6, 3, 3)

    # depth map: sparse, from the raw (pre-BDA) cloud
    assert s["gt_depth"].shape == (6, H, W)
    n_hits = int((s["gt_depth"] > 0).sum())
    assert n_hits > 100, f"only {n_hits} projected depth pixels"

    # every nonzero depth pixel must be consistent with projecting the raw
    # cloud through the RETURNED calibration (rots/trans/intrins/post_*) —
    # the exact contract the view transformer's depth loss relies on
    pts = np.fromfile(
        s["pts_filename"], np.float32).reshape(-1, 5)[:, :3]
    i = 1  # CAM_FRONT
    cam_pts = pts @ np.linalg.inv(s["rots"][i]).T - (
        np.linalg.inv(s["rots"][i]) @ s["trans"][i])
    proj = cam_pts @ s["intrins"][i].T
    z = proj[:, 2]
    uv = proj[:, :2] / np.maximum(z[:, None], 1e-5)
    uv = uv @ s["post_rots"][i][:2, :2].T + s["post_trans"][i][:2]
    valid = (z > 0) & (uv[:, 0] >= 0) & (uv[:, 0] <= W - 1) \
        & (uv[:, 1] >= 0) & (uv[:, 1] <= H - 1)
    assert valid.sum() > 50
    u = np.rint(uv[valid, 0]).astype(int)
    v = np.rint(uv[valid, 1]).astype(int)
    got = s["gt_depth"][i, v, u]
    # z-buffer: each hit pixel holds SOME valid point's depth <= this one's
    assert (got > 0).all()
    assert (got <= z[valid] + 1e-4).all()

    # occupancy: majority-vote voxel labels in the mapped 16-class space
    assert s["gt_occ"].shape == tuple(cfg["occ_size"])
    vals = np.unique(s["gt_occ"])
    assert set(vals).issubset(set(range(17)) | {255})
    assert (s["gt_occ"] == 0).any()  # empties exist
    assert s["points_occ"].shape[1] == 4
    assert s["bda"].shape == (3, 3)


def test_nuscenes_val_pipeline_and_loader(tmp_path):
    ds, cfg = _build_nusc_dataset(tmp_path, train=False)
    s = ds[0]
    assert "gt_depth" not in s  # test pipeline has no CreateDepthFromLiDAR
    assert np.allclose(s["bda"], np.eye(3))  # no aug at test time

    from occformer_tpu.data.loader import ShardedLoader

    loader = ShardedLoader(ds, batch_size=1, shuffle=False, max_points=5000)
    batch = next(iter(loader))
    H, W = cfg["data_config"]["input_size"]
    assert batch["imgs"].shape == (1, 6, H, W, 3)
    assert batch["gt_occ"].shape == (1, *cfg["occ_size"])
    assert batch["lidar_xyz"].shape == (1, 5000, 3)
    assert batch["lidar_valid"].dtype == bool
    # normalized to [0,1] over pc_range where valid
    xyz = batch["lidar_xyz"][batch["lidar_valid"]]
    assert xyz.min() >= -1e-5 and xyz.max() <= 1 + 1e-5
    assert batch["_meta"][0]["sample_idx"] == "tok0"


def test_nuscenes_panoptic_pipeline_from_disk(tmp_path):
    """Panoptic variant: class*1000+instance labels from the .npz sidecar
    (reference loading_nusc_panoptic_occ.py:33-170)."""
    cfg = load_config(os.path.join(
        REPO, "occformer_tpu/configs/occformer_nusc_panoptic_r50_256x704.py"))
    root = str(tmp_path / "nuscenes")
    ann_file = _make_nusc_tree(root)
    # panoptic sidecar: nuScenes format category*1000 + instance
    rng = np.random.RandomState(7)
    n = np.fromfile(os.path.join(
        root, "lidarseg/v1.0-trainval/tok0_lidarseg.bin"), np.uint8).size
    sem = rng.randint(0, 32, n).astype(np.int64)
    inst = rng.randint(0, 5, n).astype(np.int64)
    os.makedirs(os.path.join(root, "panoptic", "v1.0-trainval"))
    np.savez_compressed(
        os.path.join(root, "panoptic", "v1.0-trainval", "tok0_panoptic.npz"),
        data=(sem * 1000 + inst).astype(np.uint16))

    dcfg = dict(cfg["data"]["train"])
    pipeline = [dict(p) for p in dcfg.pop("pipeline")]
    for p in pipeline:
        if p["type"] == "LoadNuscPanopticOccupancyAnnotations":
            p["data_root"] = root
    dcfg.update(data_root=root, ann_file=ann_file, pipeline=pipeline)
    dcfg.pop("type", None)

    from occformer_tpu.data.nuscenes import CustomNuScenesOccLSSDataset

    ds = CustomNuScenesOccLSSDataset(**dcfg)
    for step in ds.pipeline:
        if hasattr(step, "rng"):
            step.rng = np.random.RandomState(1)
    s = ds[0]
    assert s["gt_occ"].shape == tuple(cfg["occ_size"])
    assert s["panoptic_ids"].shape == (100,)
    real = s["panoptic_ids"][s["panoptic_ids"] >= 0]
    assert len(real) > 0
    # semantic part of every voxel id is in the mapped 16-class space
    occ = s["gt_occ"]
    fg = occ[(occ > 0) & (occ < 65535)]
    assert fg.size and (fg // 1000 <= 16).all()
    assert s["gt_depth"].shape[0] == 6


def _make_kitti_tree(root, seed=0):
    rng = np.random.RandomState(seed)
    seq_dir = os.path.join(root, "dataset", "sequences", "08")
    for d in ("image_2", "image_3", "velodyne", "voxels"):
        os.makedirs(os.path.join(seq_dir, d))
    P = np.zeros((3, 4))
    P[0, 0] = P[1, 1] = 707.0
    P[0, 2], P[1, 2], P[2, 2] = 601.0, 183.0, 1.0
    with open(os.path.join(seq_dir, "calib.txt"), "w") as f:
        f.write("P0: " + " ".join(map(str, P.reshape(-1))) + "\n")
        f.write("P1: " + " ".join(map(str, P.reshape(-1))) + "\n")
        f.write("P2: " + " ".join(map(str, P.reshape(-1))) + "\n")
        f.write("P3: " + " ".join(map(str, P.reshape(-1))) + "\n")
        # velodyne->cam: x_cam = -y_velo, y_cam = -z_velo, z_cam = x_velo
        tr = np.array([[0, -1, 0, 0], [0, 0, -1, 0], [1, 0, 0, 0]], float)
        f.write("Tr: " + " ".join(map(str, tr.reshape(-1))) + "\n")
    Image.fromarray(
        rng.randint(0, 255, (370, 1226, 3), np.uint8)
    ).save(os.path.join(seq_dir, "image_2", "000000.png"))
    # velodyne cloud in front of the camera (x forward)
    xyz = np.stack([
        rng.uniform(3.0, 45.0, 3000),
        rng.uniform(-10.0, 10.0, 3000),
        rng.uniform(-1.8, 0.5, 3000),
    ], axis=1).astype(np.float32)
    pts4 = np.concatenate([xyz, rng.rand(3000, 1).astype(np.float32)], axis=1)
    pts4.tofile(os.path.join(seq_dir, "velodyne", "000000.bin"))
    open(os.path.join(seq_dir, "voxels", "000000.bin"), "wb").close()
    label_root = os.path.join(root, "labels")
    os.makedirs(os.path.join(label_root, "08"))
    vox = rng.randint(0, 20, (256, 256, 32)).astype(np.uint16)
    vox[rng.rand(256, 256, 32) < 0.9] = 0
    np.save(os.path.join(label_root, "08", "000000_1_1.npy"), vox)
    return label_root


def test_kitti_train_pipeline_from_disk(tmp_path):
    cfg = load_config(os.path.join(
        REPO, "occformer_tpu/configs/occformer_kitti.py"))
    root = str(tmp_path / "kitti")
    label_root = _make_kitti_tree(root)
    dcfg = dict(cfg["data"]["train"])
    dcfg.update(data_root=root, ann_file=label_root, split="val")
    dcfg.pop("type", None)

    from occformer_tpu.data.semantic_kitti import CustomSemanticKITTILssDataset

    ds = CustomSemanticKITTILssDataset(**dcfg)
    for step in ds.pipeline:
        if hasattr(step, "rng"):
            step.rng = np.random.RandomState(3)
    assert len(ds) == 1
    s = ds[0]

    H, W = cfg["data_config"]["input_size"]
    assert s["imgs"].shape == (1, H, W, 3)
    assert s["intrins"].shape == (1, 3, 4)
    assert s["gt_depth"].shape == (1, H, W)
    assert int((s["gt_depth"] > 0).sum()) > 100
    assert s["gt_occ"].shape == (256, 256, 32)
    assert s["bda"].shape == (4, 4)

    from occformer_tpu.data.loader import ShardedLoader

    batch = next(iter(ShardedLoader(ds, batch_size=1, shuffle=False)))
    assert batch["imgs"].shape == (1, 1, H, W, 3)
    assert batch["gt_occ"].shape == (1, 256, 256, 32)


def test_corrupt_sample_retry(tmp_path):
    """Train mode replaces a corrupt sample with a random other one
    (reference _rand_another loop, nuscenes_lss_dataset.py:23-29); test mode
    surfaces the error."""
    cfg = load_config(os.path.join(
        REPO, "occformer_tpu/configs/occformer_kitti.py"))
    root = str(tmp_path / "kitti")
    label_root = _make_kitti_tree(root)
    seq_dir = os.path.join(root, "dataset", "sequences", "08")
    # second frame: valid voxels/velodyne/labels but a truncated image
    np.fromfile(os.path.join(seq_dir, "velodyne", "000000.bin"),
                np.float32).tofile(os.path.join(seq_dir, "velodyne",
                                                "000001.bin"))
    open(os.path.join(seq_dir, "voxels", "000001.bin"), "wb").close()
    with open(os.path.join(seq_dir, "image_2", "000001.png"), "wb") as f:
        f.write(b"\x89PNG\r\n\x1a\nnot-really-a-png")
    np.save(os.path.join(label_root, "08", "000001_1_1.npy"),
            np.zeros((256, 256, 32), np.uint16))

    from occformer_tpu.data.semantic_kitti import CustomSemanticKITTILssDataset

    dcfg = dict(cfg["data"]["train"])
    dcfg.update(data_root=root, ann_file=label_root, split="val")
    dcfg.pop("type", None)
    ds = CustomSemanticKITTILssDataset(**dcfg)
    assert len(ds) == 2
    np.random.seed(0)
    s = ds[1]  # corrupt index -> retries into the good sample
    assert s["frame_id"] == "000000"

    ds_test = CustomSemanticKITTILssDataset(**{**dcfg, "test_mode": True})
    with pytest.raises(Exception):
        ds_test[1]
