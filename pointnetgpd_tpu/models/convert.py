"""Convert reference PyTorch checkpoints to pointnetgpd_tpu param/state pytrees.

The reference saves *whole pickled modules* (``torch.save(model)`` at
reference PointNetGPD/main_1v.py:178) and reloads them with the class
definitions on sys.path (main_test.py:42). Here we convert either a pickled
module or a plain ``state_dict`` into our nested param/state dicts, whose
nesting deliberately mirrors the torch module tree (see models/pointnet.py).

Mapping rules:
- ``*.weight`` on Conv1d (O, I, 1)  -> ``w`` (O, I)           [squeeze kernel dim]
- ``*.weight`` on Conv2d (O, I, H, W) -> ``w`` (H, W, I, O)   [OIHW -> HWIO]
- ``*.weight`` on Linear (O, I)     -> ``w`` unchanged
- ``*.bias``                        -> ``b``
- BatchNorm ``weight``/``bias``     -> params ``scale``/``bias``
- BatchNorm ``running_mean``/``running_var`` -> state ``mean``/``var``
- ``num_batches_tracked``           -> dropped

No torch import is needed at module load; torch is only required inside
``load_torch_checkpoint``.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

_BN_PARAM_KEYS = {"weight": "scale", "bias": "bias"}
_BN_STATE_KEYS = {"running_mean": "mean", "running_var": "var"}


def _set(tree: dict, path: list, leaf_name: str, value):
    node = tree
    for part in path:
        node = node.setdefault(part, {})
    node[leaf_name] = value


def convert_state_dict(state_dict):
    """torch ``state_dict`` (str -> tensor/ndarray) -> ``(params, state)`` pytrees."""
    params: dict = {}
    state: dict = {}
    for key, value in state_dict.items():
        # copy=True: torch's .numpy() returns a VIEW of the tensor storage and
        # jnp.asarray is zero-copy on the CPU backend, so without the copy the
        # converted pytree would alias live torch buffers (e.g. BN running
        # stats mutated in-place by later torch forwards).
        arr = np.array(value.detach().cpu().numpy() if hasattr(value, "detach") else value,
                       copy=True)
        *path, leaf = key.split(".")
        if leaf == "num_batches_tracked":
            continue
        is_bn = path and path[-1].startswith("bn")
        if is_bn and leaf in _BN_STATE_KEYS:
            _set(state, path, _BN_STATE_KEYS[leaf], jnp.asarray(arr))
        elif is_bn and leaf in _BN_PARAM_KEYS:
            _set(params, path, _BN_PARAM_KEYS[leaf], jnp.asarray(arr))
        elif leaf == "weight":
            if arr.ndim == 3:       # Conv1d (O, I, 1) -> (O, I)
                arr = arr[:, :, 0]
            elif arr.ndim == 4:     # Conv2d OIHW -> HWIO
                arr = arr.transpose(2, 3, 1, 0)
            _set(params, path, "w", jnp.asarray(arr))
        elif leaf == "bias":
            _set(params, path, "b", jnp.asarray(arr))
        else:
            raise ValueError(f"unrecognized state_dict key: {key}")
    return params, state


def export_torch_state_dict(params, state, path=None):
    """Reverse conversion: our param/state pytrees -> a torch-format
    state_dict (reference key names), optionally saved with torch.save.

    The result loads into the reference's model classes via
    ``model.load_state_dict(torch.load(path))`` — users migrating back (or
    validating against the reference) keep checkpoint interop both ways.
    """
    import torch

    sd = {}

    def walk(p_node, s_node, prefix):
        for name, leaf in p_node.items():
            key = f"{prefix}{name}"
            if isinstance(leaf, dict):
                walk(leaf, (s_node or {}).get(name), key + ".")
            elif name == "w":
                arr = np.asarray(leaf)
                if arr.ndim == 4:  # HWIO -> OIHW
                    arr = arr.transpose(3, 2, 0, 1)
                elif prefix.rstrip(".").split(".")[-1].startswith("conv"):
                    arr = arr[:, :, None]  # (O, I) -> Conv1d (O, I, 1)
                sd[prefix.rstrip(".") + ".weight"] = torch.from_numpy(
                    arr.copy())
            elif name == "b":
                sd[prefix.rstrip(".") + ".bias"] = torch.from_numpy(
                    np.asarray(leaf).copy())
            elif name == "scale":
                sd[prefix.rstrip(".") + ".weight"] = torch.from_numpy(
                    np.asarray(leaf).copy())
            elif name == "bias":
                sd[prefix.rstrip(".") + ".bias"] = torch.from_numpy(
                    np.asarray(leaf).copy())

    def walk_state(s_node, prefix):
        for name, leaf in s_node.items():
            key = f"{prefix}{name}"
            if isinstance(leaf, dict):
                walk_state(leaf, key + ".")
            elif name == "mean":
                sd[prefix.rstrip(".") + ".running_mean"] = torch.from_numpy(
                    np.asarray(leaf).copy())
            elif name == "var":
                sd[prefix.rstrip(".") + ".running_var"] = torch.from_numpy(
                    np.asarray(leaf).copy())

    walk(params, state, "")
    walk_state(state, "")
    if path is not None:
        torch.save(sd, path)
    return sd


def load_torch_checkpoint(path, ref_paths=()):
    """Load a reference checkpoint file and convert it.

    Handles both pickled whole modules (the reference's format) and plain
    state_dicts. ``ref_paths`` are inserted into ``sys.path`` so that pickled
    module classes (e.g. ``model.pointnet.PointNetCls``) can be resolved when
    the original repo is available on disk.
    """
    import sys

    import torch

    for p in ref_paths:
        if p not in sys.path:
            sys.path.insert(0, str(p))
    obj = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(obj, "state_dict"):
        if obj.__class__.__name__ == "DataParallel":
            obj = obj.module
        sd = obj.state_dict()
    elif isinstance(obj, dict):
        sd = obj
    else:
        raise TypeError(f"unsupported checkpoint object: {type(obj)}")
    return convert_state_dict(sd)
