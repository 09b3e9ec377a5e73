from .sampling import (
    grid_sample_2d,
    grid_sample_3d,
    point_sample_3d,
    resize_bilinear,
    resize_trilinear,
)
from .scatter import voxel_scatter
from .geometry import gen_dx_bx, create_frustum, get_geometry, compute_voxel_coords
from .pooling import adaptive_max_pool3d

__all__ = [
    "grid_sample_2d",
    "grid_sample_3d",
    "point_sample_3d",
    "resize_bilinear",
    "resize_trilinear",
    "voxel_scatter",
    "gen_dx_bx",
    "create_frustum",
    "get_geometry",
    "compute_voxel_coords",
    "adaptive_max_pool3d",
]
