from .semkitti import semantic_kitti_class_frequencies, kitti_class_names
from .metrics import fast_hist, per_class_iou, cm_to_ious, SSCMetrics

__all__ = [
    "semantic_kitti_class_frequencies",
    "kitti_class_names",
    "fast_hist",
    "per_class_iou",
    "cm_to_ious",
    "SSCMetrics",
]
