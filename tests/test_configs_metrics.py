"""Config-system tests (every shipped config loads/builds) + metric goldens."""
import os

import numpy as np
import pytest

from occformer_tpu.config import load_config, apply_overrides
from occformer_tpu.utils.metrics import SSCMetrics, cm_to_ious, fast_hist, per_class_iou

CFG_DIR = os.path.join(os.path.dirname(__file__), "..", "occformer_tpu", "configs")
CONFIGS = [
    "occformer_nusc_r50_256x704.py",
    "occformer_nusc_r101_896x1600.py",
    "occformer_nusc_r101_896x1600_trainval.py",
    "occformer_nusc_panoptic_r50_256x704.py",
    "occformer_kitti.py",
    "occformer_kitti_submit.py",
    "occformer_kitti_video_demo.py",
]


@pytest.mark.parametrize("name", CONFIGS)
@pytest.mark.quick
def test_config_loads_and_translates(name):
    cfg = load_config(os.path.join(CFG_DIR, name))
    assert cfg["model"]["type"] == "OccupancyFormer"
    # every component has a registered translation
    import jax.numpy as jnp

    from occformer_tpu.models.detector import translate_cfg

    for key in ("img_backbone", "img_neck", "img_view_transformer",
                "img_bev_encoder_backbone", "img_bev_encoder_neck",
                "pts_bbox_head"):
        cls, kwargs = translate_cfg(dict(cfg["model"][key]), False, jnp.float32)
        assert cls is not None, key
    # runtime fields inherited from _base_
    assert "checkpoint_config" in cfg
    assert cfg["runner"]["max_epochs"] in (24, 30)


def test_r101_config_overrides_backbone():
    cfg = load_config(os.path.join(CFG_DIR, "occformer_nusc_r101_896x1600.py"))
    assert cfg["model"]["img_backbone"]["depth"] == 101
    assert cfg["model"]["img_backbone"]["dcn"] is not None
    assert cfg["model"]["img_view_transformer"]["data_config"]["input_size"] == (896, 1600)
    # untouched keys inherited from the r50 base
    assert cfg["model"]["pts_bbox_head"]["num_queries"] == 100


def test_cfg_options_dot_paths():
    cfg = load_config(
        os.path.join(CFG_DIR, "occformer_nusc_r50_256x704.py"),
        overrides={"model.pts_bbox_head.num_queries": 50, "runner.max_epochs": 2},
    )
    assert cfg["model"]["pts_bbox_head"]["num_queries"] == 50
    assert cfg["runner"]["max_epochs"] == 2


def test_loss_cfg_from_configs():
    from occformer_tpu.engine.train import build_loss_cfg

    nusc = load_config(os.path.join(CFG_DIR, "occformer_nusc_r50_256x704.py"))
    lc = build_loss_cfg(dict(nusc["model"]["pts_bbox_head"]),
                        dict(nusc["model"]["train_cfg"]["pts"]))
    assert lc.use_lidar_points and not lc.align_corners
    assert lc.num_points == 12544 * 4
    assert len(lc.class_weight) == 18  # 17 classes + bg
    assert lc.class_weight[-1] == 0.1

    kitti = load_config(os.path.join(CFG_DIR, "occformer_kitti.py"))
    lk = build_loss_cfg(dict(kitti["model"]["pts_bbox_head"]),
                        dict(kitti["model"]["train_cfg"]["pts"]))
    assert not lk.use_lidar_points and lk.align_corners
    assert lk.num_points == 12544 * 4  # occformer_kitti.py:196
    assert lk.sample_weights is not None and len(lk.sample_weights) == 20
    # 1/log frequency weights normalized by class 0
    assert abs(lk.class_weight[0] - 1.0) < 1e-6
    assert lk.class_weight[2] > lk.class_weight[0]  # rare class weighted up


def test_panoptic_config_ships_full_density_feature_readout():
    """The shipped panoptic config must train at the reference's full point
    density (reference config occformer_nusc_panoptic_r50_256x704.py:202
    num_points=12544*4, read at mask2former_nusc_panoptic_occ.py:132) via the
    feature-space readout — the measured-stable program on the axon backend
    (NOTES.md 'Structural dodge', on-chip 2026-08-19).  Guards against a
    silent regression to the retired 37632-point safe mode or to the
    mask-volume path (exec-2 backend fault) or to an unchunked readout
    (compile-time HBM OOM at 16.8G)."""
    from occformer_tpu.engine.train import build_loss_cfg

    cfg = load_config(os.path.join(CFG_DIR, "occformer_nusc_panoptic_r50_256x704.py"))
    lc = build_loss_cfg(dict(cfg["model"]["pts_bbox_head"]),
                        dict(cfg["model"]["train_cfg"]["pts"]))
    assert lc.panoptic
    assert lc.num_points == 50176          # full reference density
    assert lc.match_num_points is None     # matching at full density too
    assert lc.feature_readout              # no [G, P] scatter family
    assert lc.point_chunks == 8            # bounds [g, P, C] gather temps
    assert lc.gt_chunks == 2


@pytest.mark.quick
def test_ssc_metrics_golden():
    m = SSCMetrics(3)
    pred = np.array([[0, 1, 2, 1], [0, 0, 2, 2]])
    tgt = np.array([[0, 1, 1, 255], [0, 2, 2, 2]])
    m.update(pred, tgt)
    r = m.compute()
    # occupancy: pred>0 vs tgt>0 over valid 7 cells:
    # tp = cells where both >0: (1,1),(2,1)?,... compute: preds>0: [F,T,T] [F,F,T,T]
    # valid tgt: [0,1,1] and [0,2,2,2]
    # pairs: (1,1)tp,(2,1)tp | (0,2)fn,(2,2)tp,(2,2)tp -> tp=4, fp=0, fn=1
    assert abs(r["sc_iou"] - 4 / 5) < 1e-6
    # class1: tp=1 (pred1,tgt1), fp=0 (the stray pred1 sits on a 255 cell),
    # fn=1 (tgt1 pred2) -> iou 1/2
    assert abs(r["iou_per_class"][1] - 0.5) < 1e-6


def test_fast_hist_and_iou():
    pred = np.array([1, 1, 2, 0])
    label = np.array([1, 2, 2, 0])
    h = fast_hist(pred, label, 3)
    assert h[1, 1] == 1 and h[2, 1] == 1 and h[2, 2] == 1 and h[0, 0] == 1
    ious = per_class_iou(h)
    assert abs(ious[1] - 0.5) < 1e-6
    ious2 = cm_to_ious(h)
    np.testing.assert_allclose(ious, ious2)
