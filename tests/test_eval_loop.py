"""End-to-end eval loop on the tiny model with a synthetic loader."""
import numpy as np
import pytest

import jax

from occformer_tpu.engine.eval import evaluate, build_eval_step
from occformer_tpu.models.detector import OccupancyFormer

import tiny_cfg


@pytest.mark.slow
@pytest.mark.quick
def test_evaluate_accumulates_metrics():
    cfg = tiny_cfg.model_cfg()
    model = OccupancyFormer(
        **{k: cfg[k] for k in (
            "img_backbone", "img_neck", "img_view_transformer",
            "img_bev_encoder_backbone", "img_bev_encoder_neck", "pts_bbox_head",
        )}
    )
    rng = np.random.RandomState(0)
    base = tiny_cfg.make_batch(rng)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), base)

    def loader():
        for i in range(2):
            b = tiny_cfg.make_batch(np.random.RandomState(i))
            b["lidar_xyz"] = np.random.rand(1, 32, 3).astype(np.float32)
            b["lidar_valid"] = np.ones((1, 32), bool)
            b["lidar_label"] = np.random.randint(1, tiny_cfg.NUM_CLASSES, (1, 32)).astype(np.int32)
            b["gt_occ"] = np.random.randint(
                0, tiny_cfg.NUM_CLASSES, (1, *tiny_cfg.OCC_SIZE)).astype(np.int32)
            yield b

    results = evaluate(
        model, variables, loader(), occ_size=tuple(tiny_cfg.OCC_SIZE),
        num_classes=tiny_cfg.NUM_CLASSES,
        class_names=[f"c{i}" for i in range(tiny_cfg.NUM_CLASSES)],
        compute_ssc=True,
    )
    assert "nuScenes_lidarseg_mean" in results
    assert "semkitti_SSC_mIoU" in results
    assert 0.0 <= results["semkitti_SC_IoU"] <= 1.0
    assert np.isfinite(results["nuScenes_lidarseg_mean"])

@pytest.mark.slow
def test_evaluate_panoptic_pq():
    """Panoptic eval: per-query point mask logits -> host formatting ->
    PQ/SQ/RQ accumulated over the split (lidar_label = class*1000+instance)."""
    cfg = tiny_cfg.model_cfg()
    model = OccupancyFormer(
        **{k: cfg[k] for k in (
            "img_backbone", "img_neck", "img_view_transformer",
            "img_bev_encoder_backbone", "img_bev_encoder_neck", "pts_bbox_head",
        )}
    )
    rng = np.random.RandomState(0)
    base = tiny_cfg.make_batch(rng)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), base)

    def loader():
        for i in range(2):
            r = np.random.RandomState(i)
            b = tiny_cfg.make_batch(r)
            P = 64
            b["lidar_xyz"] = r.rand(1, P, 3).astype(np.float32)
            b["lidar_valid"] = np.ones((1, P), bool)
            sem = r.randint(1, tiny_cfg.NUM_CLASSES, (1, P))
            inst = r.randint(0, 3, (1, P))
            b["lidar_label"] = (sem * 1000 + inst).astype(np.int32)
            yield b

    results = evaluate(
        model, variables, loader(), occ_size=tuple(tiny_cfg.OCC_SIZE),
        num_classes=tiny_cfg.NUM_CLASSES,
        panoptic=True, thing_indices=[1, 2],
    )
    for k in ("nuScenes_panoptic_PQ", "nuScenes_panoptic_SQ",
              "nuScenes_panoptic_RQ"):
        assert k in results and np.isfinite(results[k]), (k, results)
    assert 0.0 <= results["nuScenes_panoptic_PQ"] <= 1.0
    # semantic confusion matrix still accumulated from the sem part
    assert "nuScenes_lidarseg_mean" in results
