"""Batched query extraction: equivalence + the trace-time cache bug.

Round-5 regression source: the extractor param loaders, first touched
inside an enclosing jit trace, cached TRACERS (breaking every later
extractor program with UnexpectedTracerError) and inlined the random
init into the compiled program. These tests pin both properties: the
loaders return concrete arrays even when first called under a trace,
and the vmapped multi-frame path matches per-frame extraction exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np

from vggsfm_tpu.extractors import get_query_points


def test_params_concrete_when_first_loaded_under_trace():
    from vggsfm_tpu.extractors import cnn

    cnn._CACHE.pop("aliked_params", None)
    cnn._CACHE.pop("aliked_apply", None)

    @jax.jit
    def traced_load(x):
        p = cnn.load_aliked_params()
        leaf = jax.tree_util.tree_leaves(p)[0]
        assert isinstance(leaf, jnp.ndarray) and not isinstance(
            leaf, jax.core.Tracer), "param loader cached a tracer"
        return x + 1

    traced_load(jnp.zeros(()))
    leaf = jax.tree_util.tree_leaves(cnn._CACHE["aliked_params"])[0]
    assert not isinstance(leaf, jax.core.Tracer)
    # a later, different program must be able to reuse the cache
    out = get_query_points(
        jnp.asarray(np.random.default_rng(0).uniform(
            size=(128, 128, 3)).astype(np.float32)),
        jax.random.PRNGKey(0), "aliked", 64)
    assert out[0].shape == (64, 2)


def test_batched_matches_per_frame(rng):
    imgs = jnp.asarray(rng.uniform(size=(3, 128, 128, 3)).astype(
        np.float32))
    keys = jax.random.split(jax.random.PRNGKey(7), 3)

    singles = [get_query_points(imgs[i], keys[i], "sift+harris", 128)
               for i in range(3)]
    batched = jax.jit(lambda ims, ks: jax.vmap(
        lambda im, k: get_query_points(im, k, "sift+harris", 128)
    )(ims, ks))(imgs, keys)

    for i in range(3):
        np.testing.assert_array_equal(np.asarray(singles[i][0]),
                                      np.asarray(batched[0][i]))
        np.testing.assert_array_equal(np.asarray(singles[i][1]),
                                      np.asarray(batched[1][i]))
