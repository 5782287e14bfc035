"""Batched grasp scorers: the deployed models as one-device-call-per-scene
programs (PointNet family + the GPD projection-CNN baseline)."""

from .gpd_scorer import GPDScorer, score_candidates_gpd
from .scorer import GraspScorer, score_candidates_fused, score_cloud_batch

__all__ = ["GPDScorer", "GraspScorer", "score_candidates_fused",
           "score_candidates_gpd", "score_cloud_batch"]
