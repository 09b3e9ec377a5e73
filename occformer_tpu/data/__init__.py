from .transforms import (
    LoadMultiViewImageFromFiles_OccFormer,
    LoadMultiViewImageFromFiles_SemanticKitti,
    CreateDepthFromLiDAR,
    img_transform_matrices,
    mmlab_normalize,
)
from .voxelize import (
    LoadNuscOccupancyAnnotations,
    LoadSemKittiAnnotation,
    majority_vote_voxelize,
    voxel_transform,
    sample_3d_augmentation,
)
from .nuscenes import CustomNuScenesOccLSSDataset
from .synthetic import SyntheticOccDataset
from .semantic_kitti import CustomSemanticKITTILssDataset
from .loader import build_dataloader, collate_batch

__all__ = [
    "LoadMultiViewImageFromFiles_OccFormer",
    "LoadMultiViewImageFromFiles_SemanticKitti",
    "CreateDepthFromLiDAR",
    "LoadNuscOccupancyAnnotations",
    "LoadSemKittiAnnotation",
    "majority_vote_voxelize",
    "voxel_transform",
    "sample_3d_augmentation",
    "img_transform_matrices",
    "mmlab_normalize",
    "CustomNuScenesOccLSSDataset",
    "SyntheticOccDataset",
    "CustomSemanticKITTILssDataset",
    "build_dataloader",
    "collate_batch",
]
