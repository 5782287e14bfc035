"""Device kernels: crops, cloud preprocessing, projections, voxelization."""

from .cloud import estimate_normals_knn, voxel_downsample
from .crop import (
    collect_candidate_clouds,
    collect_grasp_clouds,
    crop_closing_region,
    grasp_frame_from_config,
)
from .projection import gpd_projection_features, project_to_image

__all__ = [s for s in dir() if not s.startswith("_")]
