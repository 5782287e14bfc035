"""Tensor-parallel shardings for the PointNet parameter tree.

The model is small (~3.5M params), so DP is the production layout
(SURVEY.md §2.5: "DP-only sharding ... Not required for parity"). This module
adds a 2-D ``(dp, mp)`` mesh layout anyway — the wide layers (the 1024-wide
trunk output, the 1024->512 head) shard their feature dimension over ``mp``
— to exercise/validate multi-axis GSPMD propagation: XLA inserts the
all-gathers/psums from the parameter shardings alone, no comms code.

Layout:
- ``feat.conv3`` (1024, 128): output features sharded over mp -> the (B, N,
  1024) activation is mp-sharded, the max-pool stays sharded, and
- ``fc1`` (512, 1024): input features sharded over mp -> contracting with the
  sharded activation yields a psum over mp (Megatron-style pair).
- BN3/bias vectors of width 1024 shard over mp to match.
- everything else replicated; batch sharded over dp.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_2d_mesh(n_devices: int | None = None, mp: int = 2,
                 axis_names=("dp", "mp")) -> Mesh:
    devices = jax.devices() if n_devices is None else jax.devices()[:n_devices]
    n = len(devices)
    if n % mp != 0:
        raise ValueError(f"{n} devices not divisible by mp={mp}")
    arr = np.asarray(devices).reshape(n // mp, mp)
    return Mesh(arr, axis_names)


def tp_param_shardings(params, mesh: Mesh):
    """Sharding pytree for PointNetCls params: the conv3/fc1 Megatron pair
    sharded over 'mp', everything else replicated."""
    rep = NamedSharding(mesh, P())

    def spec_for(path, leaf):
        keys = [getattr(p, "key", None) for p in path]
        if "feat" in keys and "conv3" in keys:
            # w: (1024, in) -> shard rows (output features); b: (1024,)
            if keys[-1] == "w":
                return NamedSharding(mesh, P("mp", None))
            return NamedSharding(mesh, P("mp"))
        if "feat" in keys and keys[-2] == "bn3":
            return NamedSharding(mesh, P("mp"))
        if keys[0] == "fc1" and keys[-1] == "w":
            # w: (512, 1024) -> shard the contracting (input) dim
            return NamedSharding(mesh, P(None, "mp"))
        return rep

    return jax.tree_util.tree_map_with_path(spec_for, params)


def tp_state_shardings(state, mesh: Mesh):
    rep = NamedSharding(mesh, P())

    def spec_for(path, leaf):
        keys = [getattr(p, "key", None) for p in path]
        if "feat" in keys and "bn3" in keys:
            return NamedSharding(mesh, P("mp"))
        return rep

    return jax.tree_util.tree_map_with_path(spec_for, state)


def shard_params_tp(params, state, mesh: Mesh):
    """Place the param/state trees with the TP layout."""
    p_sh = tp_param_shardings(params, mesh)
    s_sh = tp_state_shardings(state, mesh)
    params = jax.tree_util.tree_map(jax.device_put, params, p_sh)
    state = jax.tree_util.tree_map(jax.device_put, state, s_sh)
    return params, state


def batch_sharding_2d(mesh: Mesh) -> NamedSharding:
    """Batch over dp, everything else replicated (mp handled by params)."""
    return NamedSharding(mesh, P("dp"))
