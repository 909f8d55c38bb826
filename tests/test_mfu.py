"""Unit tests for the FLOP-ledger / MFU accounting (utils/mfu.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vggsfm_tpu.utils import mfu


@pytest.fixture(autouse=True)
def _clean_ledger():
    mfu.reset()
    yield
    mfu.reset()
    mfu.SYNC_TIMING = False


class TestLedger:
    def test_record_and_flops(self):
        fn = jax.jit(lambda a, b: a @ b)
        a = jnp.ones((64, 64), jnp.float32)
        out = mfu.timed_call("mm", fn, (a, a), {})
        np.testing.assert_allclose(np.asarray(out), 64.0)
        rep = mfu.flops_report()
        assert rep["mm"]["calls"] == 1
        # 64^3 multiply-adds = 2 * 64^3 = 524288 flops (XLA may count
        # multiply-add as 2); accept any positive count near that scale
        assert rep["mm"]["flops_per_call"] > 1e5
        mfu.timed_call("mm", fn, (a, a), {})
        assert mfu.flops_report()["mm"]["calls"] == 2

    def test_trace_time_calls_skip(self):
        inner = jax.jit(lambda x: x * 2)

        @jax.jit
        def outer(x):
            return mfu.timed_call("inner", inner, (x,), {})

        outer(jnp.ones((4,)))
        assert "inner" not in mfu.flops_report()

    def test_sync_timing_accumulates_seconds(self):
        mfu.SYNC_TIMING = True
        fn = jax.jit(lambda a: a @ a)
        a = jnp.ones((128, 128), jnp.float32)
        mfu.timed_call("mm2", fn, (a,), {})
        mfu.timed_call("mm2", fn, (a,), {})
        rep = mfu.flops_report()
        assert rep["mm2"]["device_s"] > 0
        assert rep["mm2"]["calls"] == 2

    def test_kwargs_and_none_args(self):
        fn = jax.jit(lambda a, b=None, scale=1.0: a * scale)
        a = jnp.ones((8,))
        mfu.timed_call("k", fn, (a, None), {"scale": 3.0})
        rep = mfu.flops_report()
        assert rep["k"]["flops_per_call"] is not None

    def test_peak_table(self):
        class FakeDev:
            device_kind = "TPU v5 lite"

        assert mfu.peak_flops(FakeDev()) == 197e12
        assert mfu.mfu(197e12, 1.0, FakeDev()) == pytest.approx(1.0)
        # CPU backend: unknown peak -> None, mfu None
        assert mfu.mfu(1e12, 1.0, jax.devices()[0]) is None


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
