"""Device mesh + sharding helpers: the framework's distributed layer.

The reference's only parallelism is single-process multi-GPU
``nn.DataParallel`` (reference: PointNetGPD/main_1v.py:162-165) with NCCL
under the hood. The TPU-native equivalent is a ``jax.sharding.Mesh`` over the
ICI-connected chips with the batch axis sharded ('dp') and parameters
replicated; XLA inserts the psum gradient all-reduce automatically from the
sharding annotations. Multi-host extends the same mesh over DCN via
``jax.distributed`` — no NCCL/MPI code anywhere.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis_name: str = "dp") -> Mesh:
    """1-D data-parallel mesh over the first ``n_devices`` devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "dp") -> NamedSharding:
    """Shard the leading (batch) axis over the mesh; replicate the rest."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis_name: str = "dp"):
    """Place a pytree of host arrays with the batch axis sharded over ICI."""
    sharding = batch_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)


def replicate_tree(tree, mesh: Mesh):
    """Replicate a pytree (params / optimizer state) across the mesh."""
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def initialize_distributed(coordinator_address: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None) -> None:
    """Multi-host initialization (the framework's communication-layer entry:
    SURVEY.md §5 — jax.distributed + ICI/DCN collectives replace the
    reference's absent NCCL/MPI layer). No-op on single-host; env-driven when
    args are omitted (JAX reads the cluster env)."""
    import jax

    if coordinator_address is None and num_processes is None:
        try:
            jax.distributed.initialize()
        except Exception:
            return  # single-host / no cluster env: run locally
    else:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
