"""pointnetgpd_tpu — a TPU-native (JAX/XLA/Pallas/pjit) grasp-evaluation framework.

Re-implements the capabilities of PointNetGPD (lianghongzhuo/PointNetGPD) as a
TPU-first design: vmapped/fused device code for the per-candidate preprocessing
and the PointNet classifier family, batched grasp-quality kernels, and a
data-parallel pjit training loop over a `jax.sharding.Mesh`.

Subpackages
-----------
- ``models``    — PointNet classifier family + GPD projection CNN (pure-functional JAX)
- ``ops``       — device kernels: closing-region crop, resampling, KNN normals, voxel ops
- ``geometry``  — SDF grid / mesh geometry core (JAX) + host-side file IO
- ``grasping``  — grasp frame math, contact model, quality metrics, candidate samplers
- ``parallel``  — device-mesh / sharding helpers (DP over ICI, psum grad all-reduce)
- ``training``  — data pipeline, train/eval steps, checkpointing (orbax + torch import)
- ``inference`` — batched candidate scorer (hundreds of grasps per device call)
- ``utils``     — config system, logging, metrics
"""

__version__ = "0.1.0"
