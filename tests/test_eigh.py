import jax.numpy as jnp
import numpy as np

from vggsfm_tpu.ops import eigh_small, smallest_eigenvector


def random_symmetric(rng, b, n, scale=1.0):
    A = rng.normal(size=(b, n, n)) * scale
    return (A + A.transpose(0, 2, 1)) / 2


def test_eigh_matches_numpy_3x3(rng):
    A = random_symmetric(rng, 512, 3)
    w, V = eigh_small(jnp.asarray(A))
    w_np, _ = np.linalg.eigh(A)
    np.testing.assert_allclose(np.asarray(w), w_np, atol=1e-5)
    # Check eigen-equation instead of comparing vectors (sign/degeneracy)
    resid = np.einsum("bij,bjk->bik", A, np.asarray(V)) - np.asarray(
        V
    ) * np.asarray(w)[:, None, :]
    assert np.abs(resid).max() < 1e-4


def test_eigh_matches_numpy_4x4(rng):
    A = random_symmetric(rng, 512, 4)
    w, V = eigh_small(jnp.asarray(A))
    w_np, _ = np.linalg.eigh(A)
    np.testing.assert_allclose(np.asarray(w), w_np, atol=1e-5)
    resid = np.einsum("bij,bjk->bik", A, np.asarray(V)) - np.asarray(
        V
    ) * np.asarray(w)[:, None, :]
    assert np.abs(resid).max() < 1e-4


def test_eigh_badly_scaled(rng):
    A = random_symmetric(rng, 64, 4, scale=1e4)
    w, V = eigh_small(jnp.asarray(A, dtype=jnp.float32))
    w_np, _ = np.linalg.eigh(A)
    np.testing.assert_allclose(np.asarray(w), w_np, rtol=1e-4, atol=1e-2)


def test_smallest_eigenvector(rng):
    A = random_symmetric(rng, 256, 4)
    v = smallest_eigenvector(jnp.asarray(A))
    w_np, V_np = np.linalg.eigh(A)
    v_np = V_np[:, :, 0]
    # compare up to sign
    dots = np.abs(np.sum(np.asarray(v) * v_np, axis=-1))
    np.testing.assert_allclose(dots, 1.0, atol=1e-4)


def test_orthonormal_eigenvectors(rng):
    A = random_symmetric(rng, 128, 4)
    _, V = eigh_small(jnp.asarray(A))
    VtV = np.einsum("bij,bik->bjk", np.asarray(V), np.asarray(V))
    np.testing.assert_allclose(
        VtV, np.broadcast_to(np.eye(4), VtV.shape), atol=1e-5
    )


def test_huge_batch_no_cap(rng):
    # The reference had to split at 1.024M matrices for cuSOLVER; we don't.
    A = random_symmetric(rng, 1_100_000 // 500, 4)  # keep CI fast; shape-free path
    A = np.tile(A, (500, 1, 1))
    v = smallest_eigenvector(jnp.asarray(A, dtype=jnp.float32))
    assert v.shape == (A.shape[0], 4)
