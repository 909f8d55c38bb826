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
    _flags = (_flags + " --xla_force_host_platform_device_count=8").strip()
# XLA:CPU's parallel LLVM codegen segfaults intermittently in this
# environment after many compiles in one process — serialize it. (Run the
# suite with `pytest -n 4` so compiles also spread over processes.)
if "xla_cpu_parallel_codegen_split_count" not in _flags:
    _flags = (_flags + " --xla_cpu_parallel_codegen_split_count=1").strip()
# ...and the thunk runtime still aborts after ~dozens of compiles in one
# process (deterministically reproducible with tests/test_video.py run
# single-process). The legacy CPU runtime does not: 7/7 video tests pass
# where the thunk runtime dies at the 3rd.
if "xla_cpu_use_thunk_runtime" not in _flags:
    _flags = (_flags + " --xla_cpu_use_thunk_runtime=false").strip()
os.environ["XLA_FLAGS"] = _flags
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
