"""Make the JAX_PLATFORMS env var actually effective.

Some environments force-register an out-of-tree TPU backend via
sitecustomize, which overrides the JAX_PLATFORMS environment variable
read at import time — `JAX_PLATFORMS=cpu python demo.py` still lands on
the TPU. Calling this right after `import jax` re-applies the user's
choice through the config API (which the plugin cannot override).
CLI entry points call it; library code never does.
"""

from __future__ import annotations

import os


def honor_jax_platforms_env() -> str | None:
    """Re-apply JAX_PLATFORMS from the environment via jax.config.

    Returns the platform string applied, or None if the env var is unset.
    """
    plat = os.environ.get("JAX_PLATFORMS")
    if not plat:
        return None
    import jax

    jax.config.update("jax_platforms", plat)
    return plat
