"""Robust (Monte-Carlo) grasp quality: expected metric under uncertainty.

Re-design of the reference's robust quality (reference:
dex-net/src/dexnet/grasping/robust_grasp_quality.py:85-166): the reference
draws one perturbation per bandit iteration (25 ``num_quality_samples``
through GaussianUniformAllocationMean, each a full host-side quality
evaluation); here ALL perturbation samples for ALL grasps evaluate in one
batched device call, then the Gaussian-model mean/variance are computed the
same way.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .evaluation import evaluate_ferrari_canny, evaluate_force_closure
from .random_variables import (
    ParallelJawGraspPoseGaussianRV,
    ParamsGaussianRV,
)


def expected_quality(
    sdf,
    configs,
    center_of_mass,
    *,
    metric: str = "ferrari_canny_l1_force_only",
    friction_coef: float = 0.5,
    num_quality_samples: int = 25,
    grasp_rv: ParallelJawGraspPoseGaussianRV | None = None,
    params_rv: ParamsGaussianRV | None = None,
    num_samples_loa: int = 40,
    rng=None,
):
    """(mean, std) of the metric under grasp-pose + friction uncertainty.

    configs: (G, 10). Returns (means (G,), stds (G,)). Object-pose
    uncertainty is folded into grasp-pose uncertainty (perturbing the grasp
    relative to a fixed SDF is equivalent for the contact computation and
    avoids resampling the SDF — documented deviation from the reference's
    separate object-pose RV, robust_grasp_quality.py:95-105).
    """
    rng = rng or np.random.RandomState(0)
    grasp_rv = grasp_rv or ParallelJawGraspPoseGaussianRV()
    params_rv = params_rv or ParamsGaussianRV()
    configs = np.asarray(configs)
    g = configs.shape[0]
    n = num_quality_samples

    all_configs = np.concatenate([
        grasp_rv.sample_configs(c, n, rng) for c in configs
    ])                                                   # (G*N, >=10)
    frictions = np.concatenate([
        params_rv.sample_friction(friction_coef, n, rng) for _ in range(g)
    ])                                                   # (G*N,)

    if metric == "ferrari_canny_l1_force_only":
        quals, _ = evaluate_ferrari_canny(
            sdf, jnp.asarray(all_configs), jnp.asarray(center_of_mass),
            jnp.asarray(frictions), num_samples=num_samples_loa)
    elif metric == "force_closure":
        quals, _ = evaluate_force_closure(
            sdf, jnp.asarray(all_configs), jnp.asarray(frictions),
            num_samples=num_samples_loa)
    else:
        raise ValueError(f"unknown metric {metric}")

    quals = np.asarray(quals, dtype=np.float64).reshape(g, n)
    return quals.mean(axis=1), quals.std(axis=1)
