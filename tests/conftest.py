"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Multi-chip sharding paths are validated against
`--xla_force_host_platform_device_count=8` (same mechanism as the driver's
multichip dryrun). The environment may pre-register a TPU backend and force
`jax_platforms` via sitecustomize, so we both set the env vars and override
the config after import.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

# NOTE: do not enable the persistent compilation cache here — JAX's CPU
# executable serialization segfaults in this environment (the cache is for
# the TPU path; see vggsfm_tpu.utils.cache).

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running integration test")
