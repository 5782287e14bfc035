"""Model family: PointNet classifiers + GPD projection CNN (functional JAX)."""

from .convert import convert_state_dict, load_torch_checkpoint
from .gpd import apply_gpd_classifier, init_gpd_classifier
from .pointnet import (
    apply_dual_pointnet_feat,
    apply_pointnet_cls,
    apply_pointnet_dense_cls,
    apply_pointnet_feat,
    apply_stn,
    init_dual_pointnet_feat,
    init_pointnet_cls,
    init_pointnet_dense_cls,
    init_pointnet_feat,
    init_stn,
    pointnet_cls_infer,
)

__all__ = [
    "convert_state_dict",
    "load_torch_checkpoint",
    "apply_gpd_classifier",
    "init_gpd_classifier",
    "apply_dual_pointnet_feat",
    "apply_pointnet_cls",
    "apply_pointnet_dense_cls",
    "apply_pointnet_feat",
    "apply_stn",
    "init_dual_pointnet_feat",
    "init_pointnet_cls",
    "init_pointnet_dense_cls",
    "init_pointnet_feat",
    "init_stn",
    "pointnet_cls_infer",
]
