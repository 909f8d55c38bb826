"""Checkpoint keys-manifest gate (VERDICT r2 item 10).

`tests/fixtures/vggsfm_v2_keys.json` records the exact state_dict key set
+ shapes of the reference checkpoint `vggsfm_v2_0_0.bin` (generated from
the instantiated reference torch modules by tools/gen_keys_manifest.py;
the torch.hub DINOv2 subtree is synthesized from public dinov2 naming).
The converter must consume EVERY key and miss NONE — so conversion breaks
loudly today, not the day the real file finally arrives (zero-egress env).
"""

import json
import os

import numpy as np
import pytest

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "vggsfm_v2_keys.json")


@pytest.fixture(scope="module")
def manifest():
    with open(FIXTURE) as f:
        return json.load(f)["keys"]


@pytest.fixture(scope="module")
def fake_state_dict(manifest):
    return {k: np.zeros(shape, np.float32)
            for k, shape in manifest.items()}


class TestKeysManifest:
    def test_manifest_nonempty(self, manifest):
        assert len(manifest) > 600
        assert "track_predictor.coarse_fnet.conv1.weight" in manifest
        assert ("camera_predictor.backbone.blocks.11.attn.qkv.weight"
                in manifest)

    def test_conversion_consumes_every_key(self, fake_state_dict):
        import sys

        sys.path.insert(0, os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        from parity_check import audit_conversion

        params, report = audit_conversion(fake_state_dict)
        assert report["missing_keys"] == [], (
            "converter asked for keys the checkpoint will not have: "
            f"{report['missing_keys'][:10]}")
        assert report["unconsumed_keys"] == [], (
            "checkpoint keys the converter never reads: "
            f"{report['unconsumed_keys'][:10]}")
        assert report["ok"], report
        assert params is not None

    def test_converted_shapes_load_into_models(self, fake_state_dict):
        """The converted pytree must match our Flax modules' init shapes
        exactly — a transpose bug or a wrong hidden size fails here."""
        import jax
        import jax.numpy as jnp

        from vggsfm_tpu.models.convert import convert_vggsfm_checkpoint
        from vggsfm_tpu.runner import RunnerConfig, VGGSfMRunner

        conv = convert_vggsfm_checkpoint(fake_state_dict)
        runner = VGGSfMRunner(RunnerConfig(img_size=64, max_query_pts=16,
                                           query_method="harris",
                                           fine_tracking=True))
        for name in ("tracker", "camera"):
            ref = runner.params[name]
            got = conv[name]
            ref_shapes = jax.tree.map(jnp.shape, ref)
            got_shapes = jax.tree.map(lambda x: tuple(np.shape(x)), got)
            flat_ref = jax.tree.leaves_with_path(ref_shapes)
            flat_got = dict(jax.tree.leaves_with_path(got_shapes))
            for path, shape in flat_ref:
                assert path in flat_got, f"{name}: missing {path}"
                assert flat_got[path] == shape, (
                    f"{name}{jax.tree_util.keystr(path)}: converted "
                    f"{flat_got[path]} vs model {shape}")


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
