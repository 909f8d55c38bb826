"""Persistent XLA compilation cache setup.

The pipeline's big unrolled graphs (6-iteration tracker, LM loop) take
minutes to compile over a remote-compile TPU link; a persistent on-disk
cache makes every run after the first load in milliseconds. Call
`enable_compilation_cache()` once at process start (runner / bench do).
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.expanduser("~/.cache/vggsfm_tpu_xla")


def enable_compilation_cache(path: str | None = None) -> str | None:
    import jax

    # CPU executable (de)serialization segfaults in this environment —
    # never persist-cache on the CPU backend (tests construct runners
    # under JAX_PLATFORMS=cpu; a half-written entry then crashes every
    # later run that reads it)
    if os.environ.get("JAX_PLATFORMS", "") == "cpu" \
            or jax.default_backend() == "cpu":
        return None
    path = path or os.environ.get("VGGSFM_TPU_XLA_CACHE", _DEFAULT_DIR)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return path
