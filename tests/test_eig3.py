import numpy as np
import jax.numpy as jnp

from geomae_tpu.ops import eig3


def random_cov(rng, n, k=10):
    X = rng.normal(size=(n, k, 3)).astype(np.float32)
    return np.einsum("nki,nkj->nij", X, X)


def test_eigvals_match_numpy(rng):
    A = random_cov(rng, 200)
    got = np.asarray(eig3.eigvals3x3_sym(jnp.asarray(A)))
    want = np.sort(np.linalg.eigvalsh(A), axis=-1)[:, ::-1]
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_smallest_eigvec_matches_numpy(rng):
    A = random_cov(rng, 200)
    normal, curv = eig3.normal_and_curvature(jnp.asarray(A))
    w, v = np.linalg.eigh(A)
    want = v[:, :, 0]  # ascending -> first = smallest
    cos = np.abs(np.sum(np.asarray(normal) * want, axis=-1))
    assert np.all(cos > 1.0 - 1e-3), cos.min()
    np.testing.assert_allclose(np.asarray(curv).sum(-1), 1.0, rtol=1e-5)
    # descending spectrum
    c = np.asarray(curv)
    assert np.all(c[:, 0] >= c[:, 1] - 1e-6) and np.all(c[:, 1] >= c[:, 2] - 1e-6)


def test_degenerate_cases():
    A = np.zeros((3, 3, 3), np.float32)
    A[1] = np.eye(3)                       # isotropic
    A[2, 0, 0] = 1.0                       # rank-1: plane normal to x? no —
    # cov with variance only along z-axis=0 dim... pick rank-2 planar cloud:
    normal, curv = eig3.normal_and_curvature(jnp.asarray(A))
    n = np.asarray(normal)
    assert np.allclose(np.linalg.norm(n, axis=-1), 1.0)
    # planar cloud in the (x, y) plane -> normal along z
    X = np.zeros((1, 8, 3), np.float32)
    X[0, :, 0] = np.arange(8) - 3.5
    X[0, :, 1] = (np.arange(8) % 3) - 1.0
    cov = np.einsum("nki,nkj->nij", X, X)
    normal, _ = eig3.normal_and_curvature(jnp.asarray(cov))
    assert abs(np.asarray(normal)[0, 2]) > 0.999
