"""PanopticEval golden tests + panoptic formatting behavior."""
import numpy as np
import pytest

from occformer_tpu.utils.panoptic import PanopticEval, format_panoptic_results


@pytest.mark.quick
def test_panoptic_eval_perfect_prediction():
    ev = PanopticEval(n_classes=4, ignore=(0,), min_points=1)
    sem = np.array([1, 1, 2, 2, 3, 3, 3])
    pan = np.array([1001, 1001, 2001, 2001, 3001, 3001, 3002])
    ev.add_batch(sem, pan, sem, pan)
    pq, sq, rq, *_ = ev.get_pq()
    assert abs(pq - 1.0) < 1e-6
    assert abs(sq - 1.0) < 1e-6
    assert abs(rq - 1.0) < 1e-6


def test_panoptic_eval_partial_overlap():
    ev = PanopticEval(n_classes=2, ignore=(0,), min_points=1)
    # one GT instance of 10 points; prediction covers 6 -> IoU 0.6 (> 0.5 TP)
    sem_gt = np.ones(10, np.int64)
    pan_gt = np.full(10, 1001)
    sem_pred = np.ones(10, np.int64)
    pan_pred = np.where(np.arange(10) < 6, 1001, 1002)
    ev.add_batch(sem_pred, pan_pred, sem_gt, pan_gt)
    pq, sq, rq, *_ = ev.get_pq()
    # TP=1 (iou .6), FP=1 (the 4-point fragment), FN=0
    assert abs(sq - 0.6) < 1e-6
    assert abs(rq - 1 / 1.5) < 1e-6
    assert abs(pq - 0.6 / 1.5) < 1e-6


def test_panoptic_eval_ignores_class_zero():
    ev = PanopticEval(n_classes=3, ignore=(0,), min_points=1)
    sem_gt = np.array([0, 0, 1, 1])
    pan_gt = np.array([0, 0, 1001, 1001])
    sem_pred = np.array([2, 2, 1, 1])  # wrong on ignored points: no penalty
    pan_pred = np.array([2001, 2001, 1001, 1001])
    ev.add_batch(sem_pred, pan_pred, sem_gt, pan_gt)
    pq, *_ = ev.get_pq()
    assert abs(pq - 0.5) < 1e-6  # class1 perfect, class2 zero


def test_format_panoptic_results_stuff_and_things(rng):
    Q, C = 4, 5
    cls_logits = np.zeros((Q, C + 1), np.float32)
    cls_logits[0, 1] = 10.0  # query0 -> class 1 (thing)
    cls_logits[1, 1] = 10.0  # query1 -> class 1 (thing)
    cls_logits[2, 3] = 10.0  # query2 -> class 3 (stuff)
    cls_logits[3, 2] = 10.0
    mask_logits = rng.randn(Q, 10).astype(np.float32) * 0.01
    mask_logits[0, :3] = 5.0
    mask_logits[1, 3:6] = 5.0
    mask_logits[2, 6:] = 5.0
    sem, pan = format_panoptic_results(cls_logits, mask_logits, thing_indices=[1])
    np.testing.assert_array_equal(sem[:3], 1)
    np.testing.assert_array_equal(sem[3:6], 1)
    np.testing.assert_array_equal(sem[6:], 3)
    # two distinct instances for class 1, one stuff segment for class 3
    assert pan[0] != pan[3]
    assert pan[0] // 1000 == 1 and pan[3] // 1000 == 1
    np.testing.assert_array_equal(pan[6:], 3000)


def test_preprocess_panoptic_gt_static():
    import jax.numpy as jnp

    from occformer_tpu.losses.mask2former_loss import preprocess_panoptic_gt

    gt = np.zeros((1, 4, 4, 2), np.int64)
    gt[0, :2] = 1001
    gt[0, 2:, :2] = 2000
    ids = np.array([[1001, 2000, -1, -1]])
    masks, labels, valid = preprocess_panoptic_gt(
        jnp.asarray(gt), jnp.asarray(ids), num_classes=5
    )
    assert masks.shape == (1, 4, 4, 4, 2)
    np.testing.assert_array_equal(np.asarray(valid)[0], [True, True, False, False])
    np.testing.assert_array_equal(np.asarray(labels)[0, :2], [1, 2])
    assert float(masks[0, 0].sum()) == 16  # 2x4x2 block
