"""Device kernels: crops, cloud preprocessing, projections, voxelization."""

from .cloud import estimate_normals_knn, voxel_downsample
from .crop import (
    collect_candidate_clouds,
    collect_grasp_clouds,
    crop_closing_region,
    grasp_frame_from_config,
)
from .mesh_to_sdf import mesh_to_sdf
from .pointnet_trunk_pallas import fold_trunk_params, fused_trunk
from .projection import gpd_projection_features, project_to_image

__all__ = [s for s in dir() if not s.startswith("_")]
