"""Persistent XLA compilation cache.

Parity with the reference's precompiled-fatbin startup path
(src/cuda/py_nvcc_utils.py:12-31, installer/build_all.ps1): the reference
ships nvcc fatbins so the installed app skips its ~30s runtime JIT
(readme.md:85).  Here the equivalent is JAX's on-disk compilation cache —
enable it once and every app/bench start after the first reuses the compiled
TPU executables."""

from __future__ import annotations

import os


def enable_compilation_cache(path: str = None):
    """Turn on the persistent compilation cache (idempotent)."""
    import jax

    path = path or os.environ.get(
        "BEATS3D_COMPILE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "beats3d_tpu_xla"),
    )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
