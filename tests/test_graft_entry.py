"""Driver-contract tests: run the EXACT entry points the round driver runs.

The driver validates `__graft_entry__.entry()` by jit-compiling it on one
chip and `__graft_entry__.dryrun_multichip(8)` on a forced 8-virtual-device
CPU mesh. Round 4 shipped a dryrun regression (0-size corr-pyramid level ->
ZeroDivisionError in chunk sizing) precisely because no test invoked these
entries at the driver's shapes — this file closes that gap by executing them
verbatim, in a fresh subprocess with the driver's own XLA flags so the
forced device count cannot be polluted by this process's backend state.
"""

import os
import pathlib
import subprocess
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parents[1]


def _run_entry_subprocess(code: str, timeout: int = 900):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        "--xla_force_host_platform_device_count=8 "
        "--xla_cpu_parallel_codegen_split_count=1 "
        "--xla_cpu_use_thunk_runtime=false"
    )
    env.pop("JAX_PLATFORM_NAME", None)
    return subprocess.run(
        [sys.executable, "-c", code], cwd=str(REPO), env=env,
        capture_output=True, text=True, timeout=timeout)


@pytest.mark.slow
def test_dryrun_multichip_8_devices():
    """The driver's multichip contract, verbatim: dryrun_multichip(8)."""
    r = _run_entry_subprocess(
        "import __graft_entry__ as g\n"
        "g.dryrun_multichip(8)\n"
        "print('DRYRUN_OK')\n")
    assert r.returncode == 0, (
        f"dryrun_multichip(8) failed (rc={r.returncode})\n"
        f"stdout:\n{r.stdout[-2000:]}\nstderr:\n{r.stderr[-4000:]}")
    assert "DRYRUN_OK" in r.stdout


@pytest.mark.slow
def test_entry_single_chip_compile():
    """The driver's single-chip contract: jit(entry fn)(*example_args)."""
    r = _run_entry_subprocess(
        "import jax\n"
        "import __graft_entry__ as g\n"
        "fn, args = g.entry()\n"
        "out = jax.jit(fn)(*args)\n"
        "jax.block_until_ready(out)\n"
        "print('ENTRY_OK')\n")
    assert r.returncode == 0, (
        f"entry() compile check failed (rc={r.returncode})\n"
        f"stdout:\n{r.stdout[-2000:]}\nstderr:\n{r.stderr[-4000:]}")
    assert "ENTRY_OK" in r.stdout


def test_corr_pyramid_stops_before_zero_size():
    """Unit guard for the r04 regression: tiny maps must not emit a 0-size
    pyramid level, and corr_sample's chunk sizing must not divide by zero.

    dryrun shapes: 64x64 images -> 8x8 coarse fmap; corr_levels=5 would
    pool 8->4->2->1->0 without the early stop."""
    import jax.numpy as jnp

    from vggsfm_tpu.models.tracker import build_corr_pyramid, corr_sample

    fmaps = jnp.ones((1, 2, 8, 8, 16), jnp.float32)
    for cfirst in (False, True):
        pyr = build_corr_pyramid(fmaps, 5, cfirst=cfirst)
        spatial = [(p.shape[-2], p.shape[-1]) if cfirst
                   else (p.shape[2], p.shape[3]) for p in pyr]
        assert all(h >= 1 and w >= 1 for h, w in spatial), spatial
        assert spatial[-1] == (1, 1)
        assert len(pyr) == 4  # 8, 4, 2, 1 — level 5 (0x0) dropped

    # the N >= 64 chunked-GEMM branch at the dryrun's track count
    pyr = build_corr_pyramid(fmaps, 5)
    coords = jnp.full((1, 2, 64, 2), 4.0, jnp.float32)
    tf = jnp.ones((1, 2, 64, 16), jnp.float32)
    out = corr_sample(pyr, coords, tf, radius=4)
    assert out.shape == (1, 2, 64, 4 * 81)
    assert bool(jnp.all(jnp.isfinite(out)))
