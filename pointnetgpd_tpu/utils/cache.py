"""Persistent XLA compilation cache setup.

TPU compiles of the fused programs take tens of seconds to minutes; the
persistent cache makes every process after the first start warm. Called from
the package entry points (bench, CLIs, __graft_entry__); safe to call more
than once.
"""

from __future__ import annotations

import hashlib
import os


def _machine_key() -> str:
    """Cache partition key: backend, plus host-CPU features for the CPU
    backend.

    XLA:CPU AOT results embed the compile host's CPU feature set; loading
    them on a different machine logs "could lead to execution errors such as
    SIGILL" (observed in MULTICHIP_r03 when the CPU dryrun loaded artifacts
    compiled on the TPU bench host). TPU executables don't depend on host CPU
    features, so the TPU partition is shared across hosts.

    Calling jax.default_backend() here is deliberate: every caller enables
    the cache after the backend choice is settled (bench waits for the probe
    first; the dryrun forces the virtual CPU platform first).
    """
    import jax

    backend = jax.default_backend()
    if backend != "cpu":
        return backend
    flags = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    flags = line
                    break
    except OSError:
        pass
    return "cpu-" + hashlib.sha1(flags.encode()).hexdigest()[:10]


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    path = path or os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.expanduser("~/.cache/pointnetgpd_tpu_xla"))
    path = os.path.join(path, _machine_key())
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without the knobs: skip silently


def disable_compilation_cache() -> None:
    """Turn the persistent cache OFF for this process.

    Used by the CPU multichip dryrun: XLA:CPU AOT artifacts embed compiler-
    chosen pseudo-features (+prefer-no-gather/scatter) that the loader's
    LLVM host detection never reports, so EVERY reload — even on the machine
    that compiled them — logs a "could lead to SIGILL" error wall (verified:
    the machine-keyed partition above still warns on same-host reload). The
    dryrun's tiny-shape compiles are cheap; a silent cold compile beats a
    warm start buried in spurious loader errors.
    """
    import jax

    try:
        jax.config.update("jax_enable_compilation_cache", False)
    except Exception:
        pass
