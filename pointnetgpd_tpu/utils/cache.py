"""Persistent XLA compilation cache setup.

TPU compiles of the fused programs take tens of seconds to minutes; the
persistent cache makes every process after the first start warm. Called from
the package entry points (bench, CLIs, __graft_entry__); safe to call more
than once.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    path = path or os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.expanduser("~/.cache/pointnetgpd_tpu_xla"))
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without the knobs: skip silently
